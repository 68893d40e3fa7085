"""Generate golden byte fixtures for the reference asset interop
(VERDICT r4 next-10).

These bytes are assembled with a SELF-CONTAINED minimal proto encoder —
deliberately NOT scann_tpu.utils.ref_assets' writer — directly from the
reference proto schemas, so tests/test_ref_assets_golden.py pins the
loader to the WIRE FORMAT rather than to the repo's own writer:

  * proto/centers.proto:25-35        CentersForAllSubspaces/
                                     CentersForSubspace/GFV
  * data_format/features.proto:23-47 GenericFeatureVector
  * trees/kmeans_tree/kmeans_tree.proto:21-47  SerializedKMeansTree
  * partitioning/serialized_partitioners.proto SerializedPartitioner

Run from the repo root to (re)generate:
    python tests/data/make_golden_ref_fixtures.py
"""

import os
import struct

import numpy as np

OUT = os.path.dirname(os.path.abspath(__file__))


def varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64  # proto2 two's-complement int fields
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def field(num: int, wire: int, payload) -> bytes:
    tag = varint((num << 3) | wire)
    if wire == 0:
        return tag + varint(payload)
    if wire == 2:
        return tag + varint(len(payload)) + payload
    raise ValueError(wire)


def packed_f32(num: int, vals) -> bytes:
    return field(num, 2, b"".join(struct.pack("<f", float(v))
                                  for v in vals))


def packed_f64(num: int, vals) -> bytes:
    return field(num, 2, b"".join(struct.pack("<d", float(v))
                                  for v in vals))


def gfv_float(vals) -> bytes:
    # GenericFeatureVector: feature_type = 1 (FLOAT = 2),
    # feature_value_float = 4 [packed].
    return field(1, 0, 2) + packed_f32(4, vals)


def codebook_pb(cb: np.ndarray) -> bytes:
    # CentersForAllSubspaces.subspace_centers = 1 (CentersForSubspace),
    # CentersForSubspace.center = 1 (GFV).
    out = []
    for block in cb:
        centers = b"".join(field(1, 2, gfv_float(c)) for c in block)
        out.append(field(1, 2, centers))
    return b"".join(out)


def tree_node(centers, children=(), leaf_id=None) -> bytes:
    # SerializedKMeansTree.Node: centers = 1 (Center.dimension = 1
    # packed double), children = 3, leaf_id = 5.
    parts = [field(1, 2, packed_f64(1, c)) for c in centers]
    parts += [field(3, 2, ch) for ch in children]
    if leaf_id is not None:
        parts.append(field(5, 0, leaf_id))
    return b"".join(parts)


def partitioner_pb(root_node: bytes, n_tokens: int) -> bytes:
    # SerializedPartitioner: n_tokens = 1, kmeans = 2
    # (KMeansTreePartitionerProto.kmeans_tree = 1 -> SerializedKMeansTree
    # .root = 1).
    tree = field(1, 2, root_node)
    km = field(1, 2, tree)
    return field(1, 0, n_tokens) + field(2, 2, km)


def main():
    rng = np.random.default_rng(42)

    # --- ah_codebook, 16 centers/block (LUT16 shape: 3 blocks x 16 x 2).
    cb16 = rng.standard_normal((3, 16, 2)).astype(np.float32)
    with open(os.path.join(OUT, "golden_codebook16.pb"), "wb") as f:
        f.write(codebook_pb(cb16))

    # --- ah_codebook, 256 centers/block (lut256: 2 blocks x 256 x 3).
    cb256 = rng.standard_normal((2, 256, 3)).astype(np.float32)
    with open(os.path.join(OUT, "golden_codebook256.pb"), "wb") as f:
        f.write(codebook_pb(cb256))

    # --- flat partitioner: 5 leaves, d=4, leaf children in order.
    flat_centers = rng.standard_normal((5, 4)).astype(np.float32)
    children = [tree_node([], leaf_id=i) for i in range(5)]
    root = tree_node(flat_centers, children, leaf_id=-1)
    with open(os.path.join(OUT, "golden_partitioner_flat.pb"), "wb") as f:
        f.write(partitioner_pb(root, 5))

    # --- hierarchical (two-level) partitioner: 2 top nodes x 3 leaves.
    top_centers = rng.standard_normal((2, 4)).astype(np.float32)
    leaf_centers = rng.standard_normal((6, 4)).astype(np.float32)
    internal = []
    lid = 0
    for t in range(2):
        leaves = [tree_node([], leaf_id=lid + j) for j in range(3)]
        internal.append(tree_node(leaf_centers[lid:lid + 3], leaves,
                                  leaf_id=-1))
        lid += 3
    root = tree_node(top_centers, internal, leaf_id=-1)
    with open(os.path.join(OUT, "golden_partitioner_hier.pb"), "wb") as f:
        f.write(partitioner_pb(root, 6))

    np.savez(os.path.join(OUT, "golden_ref_expected.npz"),
             cb16=cb16, cb256=cb256, flat_centers=flat_centers,
             top_centers=top_centers, leaf_centers=leaf_centers,
             upper_assign=np.repeat(np.arange(2), 3).astype(np.int32))
    print("golden fixtures written to", OUT)


if __name__ == "__main__":
    main()
