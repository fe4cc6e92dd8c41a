"""Recorded-golden validation of the GENERALIZED model geometries.

The flagship golden fixture (test_golden_model.py) pins only the 1-layer
H=128 geometry. These fixtures — recorded by the reference's own model /
DataStore / Stitch code via tests/golden/make_golden_geom.py — pin the two
generality axes of models/transducer.py end to end, with no torch and no
/root/reference needed at test time:

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
    not os.path.exists(os.path.join(GOLDEN_DIR, "golden_l2_h128.pkl")),
    reason="geometry golden fixtures not generated",
)


@pytest.fixture(scope="module")
def image_file(tmp_path_factory):
    from tests.test_golden_model import stage_golden_images

    return stage_golden_images(str(tmp_path_factory.mktemp("geom_images")))


@pytest.mark.parametrize("name", sorted(GEOMETRIES))
def test_geometry_pkl_reproduces_recorded_fasta(image_file, tmp_path, name):
    """reference-format pkl -> consensus -> stitch must reproduce the
    reference-recorded FASTA bytes for the stacked and non-lane-multiple
    geometries."""
    from helen_tpu.infer.consensus import call_consensus
    from helen_tpu.infer.polish import perform_stitch
    from helen_tpu.io.checkpoint import load_model_any
    from helen_tpu.models.transducer import model_geometry

    pkl = os.path.join(GOLDEN_DIR, f"golden_{name}.pkl")
    params, meta = load_model_any(pkl)
    geom = model_geometry(params)
    assert geom.gru_layers == GEOMETRIES[name]["gru_layers"]
    assert geom.hidden_size == GEOMETRIES[name]["hidden_size"]

    out = str(tmp_path / "out")
    call_consensus(image_files=[image_file], model_path=pkl, output_dir=out,
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
    params, _ = load_model_any(os.path.join(GOLDEN_DIR, f"golden_{name}.pkl"))
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
