"""Golden wire-format fixtures for the reference-asset interop
(VERDICT r4 next-10).

The fixture bytes in tests/data/ were assembled by an INDEPENDENT minimal
encoder (make_golden_ref_fixtures.py) straight from the reference proto
schemas (proto/centers.proto, trees/kmeans_tree/kmeans_tree.proto,
data_format/features.proto) — so these tests pin the loader to the wire
format itself, not to scann_tpu's own writer.  Caveat (documented in
utils/ref_assets.py): no artifact produced by the actual reference binary
has been loaded — the reference wheel is uninstallable offline; these
schema-derived fixtures are the next-best pin.
"""

import os

import numpy as np

from scann_tpu.utils import ref_assets

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
EXP = np.load(os.path.join(DATA, "golden_ref_expected.npz"))


def _read(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def test_golden_codebook_lut16():
    cb = ref_assets.decode_codebook(_read("golden_codebook16.pb"))
    np.testing.assert_array_equal(cb, EXP["cb16"])


def test_golden_codebook_lut256():
    cb = ref_assets.decode_codebook(_read("golden_codebook256.pb"))
    assert cb.shape == (2, 256, 3)
    np.testing.assert_array_equal(cb, EXP["cb256"])


def test_golden_partitioner_flat():
    centers, upper_c, upper_a = ref_assets.decode_partitioner_tree(
        _read("golden_partitioner_flat.pb"))
    np.testing.assert_allclose(centers, EXP["flat_centers"], rtol=1e-6)
    assert upper_c is None and upper_a is None


def test_golden_partitioner_hierarchical():
    centers, upper_c, upper_a = ref_assets.decode_partitioner_tree(
        _read("golden_partitioner_hier.pb"))
    np.testing.assert_allclose(centers, EXP["leaf_centers"], rtol=1e-6)
    np.testing.assert_allclose(upper_c, EXP["top_centers"], rtol=1e-6)
    np.testing.assert_array_equal(upper_a, EXP["upper_assign"])


def test_own_writer_matches_golden_wire():
    """The repo's encoders emit bytes the independent fixtures' decoder
    layout also describes: re-encode the golden arrays and decode them
    back to identical values (writer <-> wire <-> reader closure)."""
    cb = EXP["cb16"]
    again = ref_assets.decode_codebook(ref_assets.encode_codebook(cb))
    np.testing.assert_array_equal(again, cb)
    centers = EXP["flat_centers"]
    got = ref_assets.decode_partitioner(
        ref_assets.encode_partitioner(centers))
    np.testing.assert_allclose(got, centers, rtol=1e-6)
