"""Dataset containers and docid collections.

TPU-native equivalent of the reference's data plane
(scann/data_format/dataset.h: Dataset/TypedDataset/DenseDataset :53-300,
docid_collection.h).  Device compute consumes plain arrays; this layer
provides the host-side container semantics: typed dense datasets with
normalization tags, docid lookup, and mutation, used by the serving
wrappers.  Sparse datasets (SparseDataset, dataset.h:639) are not supported
on TPU — dense MXU scoring is the hardware-native representation; callers
densify or project sparse inputs upstream.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

UNITL2NORM = "unitl2norm"
NONE = "none"


class DenseDataset:
    """An owning (n, d) float32 dataset with optional docids and
    normalization tag (reference: DenseDataset<T>, dataset.h:300)."""

    def __init__(self, data, docids: Optional[Iterable[str]] = None,
                 normalization: str = NONE):
        data = np.asarray(data)
        # Typed datasets (reference TypedDataset<uint8_t/int8_t>,
        # dataset.h:219) keep their 1 B/dim storage; everything else is
        # float32.  Normalization forces float (it cannot stay integral).
        if data.dtype in (np.int8, np.uint8) and normalization == NONE:
            self.data = data
        else:
            self.data = np.asarray(data, np.float32)
        if self.data.ndim != 2:
            raise ValueError("DenseDataset requires a 2d array")
        self.docids = list(docids) if docids is not None else None
        if self.docids is not None and len(self.docids) != len(self.data):
            raise ValueError("docids must match dataset size")
        self.normalization = NONE
        if normalization == UNITL2NORM:
            self.set_unit_l2_norm()

    def __len__(self):
        return self.data.shape[0]

    @property
    def dimensionality(self) -> int:
        return self.data.shape[1]

    def set_unit_l2_norm(self):
        """Normalize rows in place (Dataset::SetNormalizationTag +
        NormalizeUnitL2, dataset.h)."""
        norms = np.linalg.norm(self.data, axis=1, keepdims=True)
        self.data = self.data / np.maximum(norms, 1e-20)
        self.normalization = UNITL2NORM
        return self

    def docid_for_index(self, i: int):
        return self.docids[i] if self.docids is not None else None

    def append(self, rows, docids: Optional[Iterable[str]] = None):
        """Mutator append (Dataset::Mutator, dataset.h:204)."""
        rows = np.asarray(rows, self.data.dtype)
        if rows.ndim == 1:
            rows = rows[None, :]
        if self.normalization == UNITL2NORM:
            rows = rows / np.maximum(
                np.linalg.norm(rows, axis=1, keepdims=True), 1e-20)
        self.data = np.concatenate([self.data, rows], axis=0)
        if self.docids is not None:
            if docids is None:
                raise ValueError("dataset has docids; append requires them")
            self.docids.extend(docids)
        return self


class MetadataGetter:
    """Optional per-neighbor metadata lookup attached to a searcher
    (reference: metadata/metadata_getter.{h,cc} — a stub in the OSS tree
    too).  Subclass and override get() for custom payloads."""

    def __init__(self, payloads=None):
        self._payloads = payloads

    def get(self, datapoint_index: int):
        if self._payloads is None:
            return None
        return self._payloads[datapoint_index]

    def batch_get(self, indices):
        return [self.get(int(i)) for i in np.asarray(indices).reshape(-1)]
