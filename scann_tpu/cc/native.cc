// Host-side native index runtime for scann_tpu.
//
// TPU-native counterpart of the reference's host-side C++ index plumbing:
// the 4-bit code packing of PackedDataset/CreatePackedDataset
// (scann/hashes/asymmetric_hashing2/querying.h:73-105) and the leaf-major
// slot layout work of TreeAHHybridResidual::BuildLeafSearchers /
// InvertCentersToSearch (tree_ah_hybrid_residual.cc:325, :610-622).  The
// device-side scoring consumes int8 codes; this library handles the
// memory-layout transformations on the host: pair-packing two 4-bit codes
// per byte for storage/serialization, unpacking for device upload, and a
// counting sort that produces the leaf-sorted slot order in O(n + L)
// instead of numpy's O(n log n) argsort.
//
// Exposed as a plain C ABI consumed via ctypes (scann_tpu/utils/native.py);
// every entry point is pure (caller-allocated outputs, no global state), so
// the Python layer can fall back to numpy transparently when the shared
// library is unavailable.

#include <cstdint>
#include <cstring>

extern "C" {

// Pack two 4-bit codes per byte: out[i, b] = codes[i, 2b] | codes[i, 2b+1]<<4.
// n: rows, blocks: codes per row (must be even after caller padding).
void scann_pack4(const int8_t* codes, uint8_t* out, int64_t n,
                 int64_t blocks) {
  const int64_t half = blocks / 2;
  for (int64_t i = 0; i < n; ++i) {
    const int8_t* row = codes + i * blocks;
    uint8_t* orow = out + i * half;
    for (int64_t b = 0; b < half; ++b) {
      orow[b] = static_cast<uint8_t>(row[2 * b] & 0x0F) |
                static_cast<uint8_t>((row[2 * b + 1] & 0x0F) << 4);
    }
  }
}

// Inverse of scann_pack4.
void scann_unpack4(const uint8_t* packed, int8_t* out, int64_t n,
                   int64_t blocks) {
  const int64_t half = blocks / 2;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* row = packed + i * half;
    int8_t* orow = out + i * blocks;
    for (int64_t b = 0; b < half; ++b) {
      orow[2 * b] = static_cast<int8_t>(row[b] & 0x0F);
      orow[2 * b + 1] = static_cast<int8_t>(row[b] >> 4);
    }
  }
}

// Stable counting sort of slots by leaf id.  leaf: (n,) int32 in
// [0, num_leaves); order: (n,) int64 output such that leaf[order] is
// sorted; counts: (num_leaves,) int64 scratch+output of per-leaf sizes.
void scann_sort_by_leaf(const int32_t* leaf, int64_t n, int64_t num_leaves,
                        int64_t* order, int64_t* counts) {
  std::memset(counts, 0, sizeof(int64_t) * num_leaves);
  for (int64_t i = 0; i < n; ++i) ++counts[leaf[i]];
  // exclusive prefix sum -> starting offset per leaf
  int64_t acc = 0;
  for (int64_t l = 0; l < num_leaves; ++l) {
    const int64_t c = counts[l];
    counts[l] = acc;
    acc += c;
  }
  for (int64_t i = 0; i < n; ++i) {
    order[counts[leaf[i]]++] = i;
  }
  // counts now holds end offsets; convert back to sizes
  int64_t prev = 0;
  for (int64_t l = 0; l < num_leaves; ++l) {
    const int64_t end = counts[l];
    counts[l] = end - prev;
    prev = end;
  }
}

// Gather rows of an int8 matrix: out[i] = src[order[i]].
void scann_gather_rows_i8(const int8_t* src, const int64_t* order,
                          int8_t* out, int64_t n, int64_t width) {
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(out + i * width, src + order[i] * width, width);
  }
}

// Gather rows of an int32 vector.
void scann_gather_i32(const int32_t* src, const int64_t* order, int32_t* out,
                      int64_t n) {
  for (int64_t i = 0; i < n; ++i) out[i] = src[order[i]];
}

// Exact sparse-vs-sparse rescoring of candidate lists: out[q, j] =
// <queries[q], db[cand[q, j]]> via a two-pointer merge over the sorted
// CSR index lists (the host-side counterpart of the reference's sparse
// one-to-one distance kernels, distance_measures/one_to_one sparse
// overloads).  cand entries < 0 produce -inf.
void scann_sparse_rescore(const int64_t* q_indptr, const int64_t* q_indices,
                          const float* q_values, const int64_t* db_indptr,
                          const int64_t* db_indices, const float* db_values,
                          const int32_t* cand, int64_t nq, int64_t k,
                          float* out) {
  for (int64_t q = 0; q < nq; ++q) {
    const int64_t qs = q_indptr[q], qe = q_indptr[q + 1];
    for (int64_t j = 0; j < k; ++j) {
      const int32_t dp = cand[q * k + j];
      float* o = out + q * k + j;
      if (dp < 0) {
        *o = -__builtin_inff();
        continue;
      }
      const int64_t rs = db_indptr[dp], re = db_indptr[dp + 1];
      double acc = 0.0;
      int64_t a = qs, b = rs;
      while (a < qe && b < re) {
        const int64_t ca = q_indices[a], cb = db_indices[b];
        if (ca == cb) {
          acc += static_cast<double>(q_values[a]) * db_values[b];
          ++a;
          ++b;
        } else if (ca < cb) {
          ++a;
        } else {
          ++b;
        }
      }
      *o = static_cast<float>(acc);
    }
  }
}

}  // extern "C"
