"""Opt-in validation against a REAL published HELEN checkpoint.

The vendored golden fixture (tests/test_golden_model.py) proves the release
pkl FORMAT, the converter, and the arithmetic with reference-saved seeded
weights; what it cannot prove from an air-gapped box is the BASELINE north
star's "reference v1 model" clause — byte identity with the actually
published weights. These tests close that clause the day the suite runs
anywhere a released pkl is reachable:

  HELEN_MODEL_PKL=/path/to/HELEN_v0_guppy_235.pkl  python -m pytest \
      tests/test_released_model.py -v

or, with network egress to the reference's GCS manifest
(DownloadModel.py:8-27; mirrored manifests via HELEN_TPU_MODEL_MANIFEST):

  HELEN_ALLOW_NETWORK=1  python -m pytest tests/test_released_model.py -v

Skipped otherwise (this environment has no DNS — verified round 2).
"""
import os

import numpy as np
import pytest

REF = "/root/reference"


@pytest.fixture(scope="module")
def released_pkl(tmp_path_factory):
    path = os.environ.get("HELEN_MODEL_PKL")
    if path:
        assert os.path.exists(path), f"HELEN_MODEL_PKL not found: {path}"
        return path
    if os.environ.get("HELEN_ALLOW_NETWORK") != "1":
        pytest.skip(
            "released-model validation is opt-in: set HELEN_MODEL_PKL to a "
            "published checkpoint, or HELEN_ALLOW_NETWORK=1 to download one "
            "from the reference manifest (tracked evidence gap #2, "
            "docs/evidence_gaps.md)"
        )
    from helen_tpu.io.download import download_models

    try:
        paths = download_models(str(tmp_path_factory.mktemp("models")))
    except Exception as exc:  # no DNS / manifest moved: report, don't fail
        pytest.skip(f"model manifest unreachable: {exc}")
    pkls = [p for p in paths if p.endswith(".pkl")]
    if not pkls:
        pytest.skip(f"manifest listed no .pkl checkpoints in {paths}")
    return pkls[0]


def test_released_pkl_converts_and_polishes(released_pkl, tmp_path):
    """The released pkl must import (DDP-prefix strip, geometry recovery),
    convert to the native npz with identical params, and drive the full
    consensus + stitch pipeline."""
    from helen_tpu.cli import main
    from helen_tpu.infer.consensus import call_consensus
    from helen_tpu.infer.polish import perform_stitch
    from helen_tpu.io.checkpoint import load_model_any
    from helen_tpu.io.synthetic import random_sequence, write_image_file
    from helen_tpu.models.transducer import model_geometry

    params, meta = load_model_any(released_pkl)
    geom = model_geometry(params)
    assert meta["hidden_size"] == geom.hidden_size
    assert meta["gru_layers"] == geom.gru_layers

    npz = str(tmp_path / "released.npz")
    assert main(["convert", "-i", released_pkl, "-o", npz]) == 0
    params2, meta2 = load_model_any(npz)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    image_file = str(tmp_path / "images.h5")
    truth = random_sequence(9000, seed=77)
    write_image_file(image_file, {"ctgR": truth}, region_cols=1500,
                     overlap_cols=120, noise=0.1, with_labels=False)
    out = str(tmp_path / "out")
    call_consensus(image_files=[image_file], model_path=released_pkl,
                   output_dir=out, batch_size=8, num_workers=2)
    fasta = perform_stitch(out, out, "released", threads=1)
    body = "".join(l.strip() for l in open(fasta)
                   if not l.startswith(">"))
    assert len(body) > 0


def test_released_pkl_fasta_byte_identity_vs_reference(released_pkl, tmp_path):
    """BASELINE north star, closed with the real weights: our pipeline's
    FASTA == a FASTA produced entirely by the reference's own code (model
    class + verbatim predict loop + DataStore + Stitch) loading the SAME
    released pkl."""
    if not os.path.isdir(os.path.join(REF, "helen")):
        pytest.skip("reference checkout not available")
    pytest.importorskip("torch")
    from tests.test_reference_oracle import (
        fasta_byte_identity_check,
        import_reference,
    )

    fasta_byte_identity_check(import_reference(), released_pkl, tmp_path)
