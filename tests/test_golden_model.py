"""Recorded-golden validation of the published-model workflow.

The released HELEN checkpoints live behind a GCS manifest
(reference DownloadModel.py:8-27; helen_tpu/io/download.py holds the real
URL) that this environment cannot reach, so the vendored fixture in
tests/golden/ stands in for a release pkl: a checkpoint in the exact
published format, created by the reference's own ModelHandler, with its
consensus labels and polished FASTA recorded by reference code
(tests/golden/make_golden.py). These tests prove the full published-model
user journey — download(-format) pkl -> convert -> call_consensus ->
stitch -> FASTA — reproduces the recorded reference outputs byte for byte,
WITHOUT needing /root/reference at test time.
"""
import hashlib
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
GOLDEN_PKL = os.path.join(GOLDEN_DIR, "golden_model.pkl")
GOLDEN_FASTA = os.path.join(GOLDEN_DIR, "golden.fa")
GOLDEN_LABELS = os.path.join(GOLDEN_DIR, "golden_labels.npz")

# the deterministic synthetic image set the golden outputs were recorded on
# (make_golden.py imports this so the two can never drift)
GOLDEN_IMAGE_SPEC = {"gA": (12000, 31), "gB": (8200, 32), "gC": (4600, 33)}
GOLDEN_IMAGES_GZ = os.path.join(GOLDEN_DIR, "golden_images.h5.gz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN_PKL), reason="golden fixture not generated"
)


def stage_golden_images(directory: str) -> str:
    """Stage the fixture's image file.

    The vendored gzip is the source of truth: numpy exempts Generator
    DISTRIBUTION methods (integers, standard_normal, ...) from its stream-
    compatibility guarantee — only RandomState carries it — so regenerating
    the images on a future numpy could silently produce different bytes and
    fail every golden byte-identity test even with a correct pipeline.
    Regeneration (make_golden.py, or the fallback below when the gz is
    absent) must be paired with re-recording the golden outputs."""
    import gzip

    path = os.path.join(directory, "golden_images.h5")
    if os.path.exists(GOLDEN_IMAGES_GZ):
        with gzip.open(GOLDEN_IMAGES_GZ, "rb") as src, open(path, "wb") as dst:
            dst.write(src.read())
        return path
    from helen_tpu.io.synthetic import random_sequence, write_image_file

    contigs = {name: random_sequence(n, seed=seed)
               for name, (n, seed) in GOLDEN_IMAGE_SPEC.items()}
    write_image_file(path, contigs, region_cols=1500, overlap_cols=120,
                     noise=0.15, with_labels=False, seed=9)
    return path


@pytest.fixture(scope="module")
def image_file(tmp_path_factory):
    return stage_golden_images(str(tmp_path_factory.mktemp("golden_images")))


def _polish(image_file, model_path, out_dir):
    from helen_tpu.infer.consensus import call_consensus
    from helen_tpu.infer.polish import perform_stitch

    call_consensus(image_files=[image_file], model_path=model_path,
                   output_dir=out_dir, batch_size=4, num_workers=2)
    return perform_stitch(out_dir, out_dir, "polished", threads=1)


def test_golden_pkl_reproduces_recorded_fasta(image_file, tmp_path):
    """pkl -> consensus -> stitch must reproduce the reference-recorded
    FASTA bytes."""
    fasta = _polish(image_file, GOLDEN_PKL, str(tmp_path / "out"))
    with open(GOLDEN_FASTA, "rb") as f:
        want = f.read()
    with open(fasta, "rb") as f:
        got = f.read()
    assert hashlib.sha256(got).hexdigest() == hashlib.sha256(want).hexdigest()


def test_converted_npz_reproduces_recorded_fasta(image_file, tmp_path):
    """The convert CLI round-trip (release pkl -> native npz) must leave the
    pipeline output byte-identical."""
    from helen_tpu.cli import main

    npz = str(tmp_path / "golden_model.npz")
    assert main(["convert", "-i", GOLDEN_PKL, "-o", npz]) == 0
    fasta = _polish(image_file, npz, str(tmp_path / "out"))
    with open(GOLDEN_FASTA, "rb") as f:
        want = f.read()
    with open(fasta, "rb") as f:
        got = f.read()
    assert got == want


def test_golden_labels_match(image_file):
    """Per-image consensus labels equal the recorded reference vote-loop
    output (localizes a FASTA mismatch to model/vote vs store/stitch)."""
    from helen_tpu.io.checkpoint import load_model_any
    from helen_tpu.io.images import MarginPolishDataset, batched_image_iterator
    from helen_tpu.infer.consensus import make_consensus_step

    golden = np.load(GOLDEN_LABELS)
    params, _ = load_model_any(GOLDEN_PKL)
    step, mult = make_consensus_step(params, data_parallel=False)
    dataset = MarginPolishDataset([image_file])
    checked = 0
    for batch in batched_image_iterator(dataset, 4, num_workers=2):
        base, rle = step(batch.images)[:2]
        for j, rec in enumerate(batch.records[: batch.valid]):
            key = f"{rec.contig}-{rec.contig_start}-{rec.contig_end}-{rec.chunk_id}"
            assert (np.asarray(base[j]) == golden[f"base/{key}"]).all(), key
            assert (np.asarray(rle[j]) == golden[f"rle/{key}"]).all(), key
            checked += 1
    assert checked == len(golden.files) // 2 > 0
