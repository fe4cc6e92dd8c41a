"""Recorded-golden validation of the GENERALIZED model geometries.

The flagship golden fixture (test_golden_model.py) pins only the 1-layer
H=128 geometry. These fixtures — recorded by the reference's own model /
DataStore / Stitch code via tests/golden/make_golden_geom.py — pin the two
generality axes of models/transducer.py end to end, with no torch and no
/root/reference needed at test time (the byte-identity tests load the
vendored NATIVE .npz conversion of each reference pkl; loading the pkl
itself requires torch, so that equivalence is pinned separately below,
torch-gated):

  * ``l2_h128``: 2 stacked bidirectional GRU layers (checkpoint layout with
    "l1" sibling keys; reference TransducerModel.py parameterizes
    gru_layers, loader rebuilds from checkpoint fields ModelHander.py:50-63);
  * ``h160``: hidden_size 160 — NOT a lane-width multiple, so
    resolve_backend routes the whole pipeline down the lax.scan xla path
    (the fallback rung the Pallas kernels can't serve).
"""
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
GEOMETRIES = {
    "l2_h128": {"gru_layers": 2, "hidden_size": 128},
    "h160": {"gru_layers": 1, "hidden_size": 160},
}

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLDEN_DIR, "golden_l2_h128.npz")),
    reason="geometry golden fixtures not generated",
)


@pytest.fixture(scope="module")
def image_file(tmp_path_factory):
    from tests.test_golden_model import stage_golden_images

    return stage_golden_images(str(tmp_path_factory.mktemp("geom_images")))


@pytest.mark.parametrize("name", sorted(GEOMETRIES))
def test_geometry_npz_reproduces_recorded_fasta(image_file, tmp_path, name):
    """vendored native checkpoint -> consensus -> stitch must reproduce the
    reference-recorded FASTA bytes for the stacked and non-lane-multiple
    geometries (torch-free)."""
    from helen_tpu.infer.consensus import call_consensus
    from helen_tpu.infer.polish import perform_stitch
    from helen_tpu.io.checkpoint import load_model_any
    from helen_tpu.models.transducer import model_geometry

    npz = os.path.join(GOLDEN_DIR, f"golden_{name}.npz")
    params, meta = load_model_any(npz)
    geom = model_geometry(params)
    assert geom.gru_layers == GEOMETRIES[name]["gru_layers"]
    assert geom.hidden_size == GEOMETRIES[name]["hidden_size"]

    out = str(tmp_path / "out")
    call_consensus(image_files=[image_file], model_path=npz, output_dir=out,
                   batch_size=4, num_workers=2)
    fasta = perform_stitch(out, out, "polished", threads=1)
    with open(os.path.join(GOLDEN_DIR, f"golden_{name}.fa"), "rb") as f:
        want = f.read()
    with open(fasta, "rb") as f:
        got = f.read()
    assert got == want


@pytest.mark.parametrize("name", sorted(GEOMETRIES))
def test_geometry_labels_match(image_file, name):
    """Per-image consensus labels equal the recorded reference vote-loop
    output (localizes a FASTA mismatch to model/vote vs store/stitch)."""
    from helen_tpu.io.checkpoint import load_model_any
    from helen_tpu.io.images import MarginPolishDataset, batched_image_iterator
    from helen_tpu.infer.consensus import make_consensus_step

    golden = np.load(os.path.join(GOLDEN_DIR, f"golden_{name}_labels.npz"))
    params, _ = load_model_any(os.path.join(GOLDEN_DIR, f"golden_{name}.npz"))
    step, _ = make_consensus_step(params, data_parallel=False)
    dataset = MarginPolishDataset([image_file])
    checked = 0
    for batch in batched_image_iterator(dataset, 4, num_workers=2):
        base, rle = step(batch.images)[:2]
        for j, rec in enumerate(batch.records[: batch.valid]):
            key = (f"{rec.contig}-{rec.contig_start}-{rec.contig_end}-"
                   f"{rec.chunk_id}")
            assert (np.asarray(base[j]) == golden[f"base/{key}"]).all(), key
            assert (np.asarray(rle[j]) == golden[f"rle/{key}"]).all(), key
            checked += 1
    assert checked == len(golden.files) // 2 > 0


@pytest.mark.parametrize("name", sorted(GEOMETRIES))
def test_geometry_pkl_matches_vendored_npz(name):
    """The vendored npz IS the pkl: loading the reference-format pkl (torch
    path) yields the identical parameter pytree, so the torch-free tests
    above transitively pin the pkl journey too."""
    pytest.importorskip("torch")
    from helen_tpu.io.checkpoint import load_model_any

    import jax

    p_pkl, _ = load_model_any(os.path.join(GOLDEN_DIR, f"golden_{name}.pkl"))
    p_npz, _ = load_model_any(os.path.join(GOLDEN_DIR, f"golden_{name}.npz"))
    leaves_pkl = jax.tree_util.tree_leaves_with_path(p_pkl)
    leaves_npz = jax.tree_util.tree_leaves_with_path(p_npz)
    assert len(leaves_pkl) == len(leaves_npz) > 0
    for (ka, a), (kb, b) in zip(leaves_pkl, leaves_npz):
        assert ka == kb
        assert np.array_equal(np.asarray(a), np.asarray(b)), ka
