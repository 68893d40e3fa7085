"""scann_tpu: a TPU-native vector similarity search framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ScaNN
(github.com/google-research/google-research/tree/master/scann): k-means-tree
partitioning with SOAR spilled assignment and AVQ, asymmetric-hashing (4-bit
product quantization) scoring with anisotropic (score-aware) code assignment,
and exact float32/bfloat16/int8 rescoring — re-designed for the MXU, VMEM and
ICI mesh rather than translated from the reference's AVX kernels.

Quick start (mirrors the reference scann_ops_pybind API)::

    import scann_tpu
    searcher = (scann_tpu.builder(db, 10, "dot_product")
                .tree(num_leaves=2000, num_leaves_to_search=100)
                .score_ah(2, anisotropic_quantization_threshold=0.2)
                .reorder(100)
                .build())
    neighbors, distances = searcher.search_batched(queries)
"""

from scann_tpu.builder import ScannBuilder, ReorderType, builder
from scann_tpu.config import (ScannConfig, PartitioningConfig,
                              AsymmetricHashConfig, BruteForceConfig,
                              ReorderConfig, SoarConfig, ProjectionConfig)
from scann_tpu.factory import create_searcher

__version__ = "0.1.0"


def load_searcher(artifacts_dir):
    """Load a serialized searcher (reference: scann_ops_pybind.load_searcher,
    scann_ops_pybind.py:251-273)."""
    from scann_tpu.utils import serialization
    return serialization.load_searcher(artifacts_dir)


def searcher_to_tensors(searcher):
    """Searcher -> flat numpy-tensor dict for embedding in model
    checkpoints (reference: scann_searcher_to_tensors,
    scann_ops/cc/ops/scann_ops.cc:56-95)."""
    from scann_tpu.utils import serialization
    return serialization.searcher_to_tensors(searcher)


def searcher_from_tensors(tensors):
    """Inverse of searcher_to_tensors (reference: tensors_to_scann)."""
    from scann_tpu.utils import serialization
    return serialization.searcher_from_tensors(tensors)


def save_exported_searcher(path, searcher, **kwargs):
    """Export the search program (StableHLO via jax.export) + index state
    for graph embedding (reference: SavedModel export,
    scann_ops.py:41-73; see scann_tpu/export.py)."""
    from scann_tpu import export as _export
    return _export.save_exported_searcher(path, searcher, **kwargs)


def load_exported_searcher(path):
    """Reload a save_exported_searcher artifact and search it without
    constructing a searcher (reference: tensors_to_scann role)."""
    from scann_tpu import export as _export
    return _export.load_exported_searcher(path)


def load_reference_assets(artifacts_dir):
    """Load a reference-format (scann_assets.pbtxt) artifact directory into
    a live searcher — migration path for indexes serialized by the
    reference library (ScannInterface::LoadArtifacts role,
    scann_ops/cc/scann.cc:105-263)."""
    from scann_tpu.utils import ref_assets
    return ref_assets.load_reference_assets(artifacts_dir)


def save_reference_assets(searcher, artifacts_dir,
                          lossy_reorder_downgrade=False):
    """Write a searcher as a reference-format artifact directory readable
    by the reference's load_searcher (ScannInterface::Serialize role,
    scann_ops/cc/scann.cc:504-601).  lossy_reorder_downgrade: re-quantize
    residual-int8 reorder rows to the reference's absolute-int8
    FixedPoint format instead of raising."""
    from scann_tpu.utils import ref_assets
    return ref_assets.save_reference_assets(
        searcher, artifacts_dir,
        lossy_reorder_downgrade=lossy_reorder_downgrade)


def builder_from_pbtxt(db, config_text):
    """Canonicalize a reference ScannConfig TEXT proto (the format
    scann_builder.py:385-470 emits and ScaNN's docs show) onto this
    package's builder (utils/scann_config_utils.cc canonicalization
    role).  Returns a configured builder; call .build() on it."""
    from scann_tpu.utils import config_text as _ct
    return _ct.builder_from_pbtxt(db, config_text)


def searcher_from_pbtxt(db, config_text):
    """Build a searcher straight from a reference ScannConfig textproto."""
    from scann_tpu.utils import config_text as _ct
    return _ct.searcher_from_pbtxt(db, config_text)


def serve(artifacts_dir, host="0.0.0.0", port=8080, block=True):
    """Serve a serialized index over HTTP (the reference's TF-Serving
    deployment role; see scann_tpu.serving)."""
    from scann_tpu import serving
    return serving.serve(artifacts_dir, host=host, port=port, block=block)
