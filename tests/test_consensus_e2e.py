"""End-to-end pipeline parity: images -> consensus -> stitch -> FASTA.

The same synthetic images and the same (randomly initialized) model are run
through (a) helen_tpu's full pipeline on an 8-device virtual CPU mesh and
(b) a torch replay of the reference algorithm; the polished FASTA must be
byte-identical.
"""
import os

import numpy as np
import pytest
torch = pytest.importorskip("torch")

from helen_tpu.config import IMAGE
from helen_tpu.infer.consensus import call_consensus
from helen_tpu.infer.polish import perform_stitch, polish
from helen_tpu.io.fasta import read_fasta
from helen_tpu.io.images import MarginPolishDataset
from helen_tpu.io.prediction_store import PredictionStore
from helen_tpu.io.synthetic import random_sequence, write_image_file
from helen_tpu.stitch import stitch_contig

from tests.torch_reference import TorchTransducer, reference_consensus


@pytest.fixture(scope="module")
def pipeline_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    image_dir = root / "images"
    image_dir.mkdir()
    contigs = {
        "ctgA": random_sequence(15000, seed=1),
        "ctgB": random_sequence(8000, seed=2),
    }
    write_image_file(
        str(image_dir / "images_0.h5"), contigs,
        region_cols=900, overlap_cols=80, noise=0.2,
    )
    torch.manual_seed(123)
    model = TorchTransducer()
    pkl = str(root / "model.pkl")
    torch.save(
        {"model_state_dict": model.state_dict(), "model_optimizer": {},
         "hidden_size": 128, "gru_layers": 1, "epochs": 0},
        pkl,
    )
    return {"root": root, "image_dir": str(image_dir), "model": model, "pkl": pkl}


def _torch_pipeline_fasta(setup, out_dir):
    """Reference-algorithm replay: torch consensus labels -> store -> stitch."""
    os.makedirs(out_dir, exist_ok=True)
    dataset = MarginPolishDataset([os.path.join(setup["image_dir"], f)
                                   for f in sorted(os.listdir(setup["image_dir"]))])
    store_path = os.path.join(out_dir, "torch_pred_0.hdf")
    records = [dataset.load(i) for i in range(len(dataset))]
    images = np.stack([r.image for r in records]).astype(np.float32)
    _, _, base_labels, rle_labels = reference_consensus(setup["model"], images)
    with PredictionStore(store_path, "w") as store:
        for j, rec in enumerate(records):
            store.write_prediction(
                rec.contig, rec.contig_start, rec.contig_end, rec.chunk_id,
                rec.position, base_labels[j], rle_labels[j],
            )
    fastas = {}
    for contig in ("ctgA", "ctgB"):
        fastas[contig] = stitch_contig([store_path], contig, threads=1)
    return fastas


def test_full_pipeline_matches_reference(pipeline_setup, tmp_path):
    out_dir = str(tmp_path / "out")
    fasta = polish(
        image_dir=pipeline_setup["image_dir"],
        model_path=pipeline_setup["pkl"],
        output_dir=out_dir,
        batch_size=8,
        num_workers=2,
        threads=2,
    )
    ours = dict(read_fasta(fasta))
    theirs = _torch_pipeline_fasta(pipeline_setup, str(tmp_path / "torch_out"))
    assert set(ours.keys()) == {"ctgA", "ctgB"}
    for contig in ours:
        assert ours[contig] == theirs[contig], f"FASTA mismatch on {contig}"


def test_consensus_resume_skips_written(pipeline_setup, tmp_path):
    out_dir = str(tmp_path / "resume_out")
    files1 = call_consensus(
        image_dir=pipeline_setup["image_dir"],
        model_path=pipeline_setup["pkl"],
        output_dir=out_dir,
        batch_size=8,
        num_workers=2,
        output_prefix="pred",
    )
    mtime = os.path.getmtime(files1[0])
    size = os.path.getsize(files1[0])
    # resume run must not recompute or grow the store
    files2 = call_consensus(
        image_dir=pipeline_setup["image_dir"],
        model_path=pipeline_setup["pkl"],
        output_dir=out_dir,
        batch_size=8,
        num_workers=2,
        output_prefix="pred",
        resume=True,
    )
    assert files1 == files2
    assert os.path.getsize(files2[0]) == size


def test_pipeline_depths_identical_output(pipeline_setup, tmp_path):
    """--pipeline_depth 1 and 3 must produce byte-identical prediction
    stores to the default depth-2 path (the pipeline reorders only WHEN
    work happens, never what is computed or written)."""
    import hashlib

    import h5py

    def store_digest(path):
        h = hashlib.sha256()
        with h5py.File(path, "r") as f:
            def visit(name, obj):
                if isinstance(obj, h5py.Dataset):
                    h.update(name.encode())
                    h.update(np.ascontiguousarray(obj[()]).tobytes())
            f.visititems(visit)
        return h.hexdigest()

    digests = []
    for depth in (1, 2, 3):
        out_dir = str(tmp_path / f"depth{depth}")
        files = call_consensus(
            image_dir=pipeline_setup["image_dir"],
            model_path=pipeline_setup["pkl"],
            output_dir=out_dir,
            batch_size=4,
            num_workers=2,
            pipeline_depth=depth,
        )
        digests.append(store_digest(files[0]))
    assert digests[0] == digests[1] == digests[2]


def test_consensus_rejects_empty_dir(tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        call_consensus(image_dir=str(empty), model_path="x", output_dir=str(tmp_path))


def test_pallas_backend_falls_back_to_xla_off_tpu():
    """Explicitly requesting a Mosaic backend on a non-TPU platform must
    fall back to the xla path with a warning, not crash in kernel lowering
    (e.g. --fast under --platform cpu)."""
    import jax

    from helen_tpu.infer.consensus import ConsensusStep
    from helen_tpu.models.transducer import init_params

    params = init_params(jax.random.PRNGKey(0))
    step = ConsensusStep(params, data_parallel=False, backend="pallas_fast")
    assert step.backend == "xla"
    base, rle = step(np.zeros((2, 1000, 90), dtype=np.uint8))
    assert base.shape == (2, 1000)
