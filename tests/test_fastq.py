"""FASTQ quality output (helen_tpu extension; the reference discards the
vote probabilities, predict_gpu.py:155-159)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
torch = pytest.importorskip("torch")

from helen_tpu.cli import main
from helen_tpu.io.fasta import read_fasta, read_fastq
from helen_tpu.io.synthetic import random_sequence, write_image_file, write_prediction_file
from helen_tpu.models.transducer import (
    consensus_labels,
    consensus_labels_and_quality,
    init_params,
)

from tests.torch_reference import TorchTransducer


def test_quality_labels_match_plain_labels(rng):
    params = init_params(jax.random.PRNGKey(2))
    images = jnp.asarray(
        rng.integers(0, 40, size=(2, 1000, 90)), jnp.float32
    )
    b1, r1 = consensus_labels(params, images)
    b2, r2, q = consensus_labels_and_quality(params, images)
    assert (np.asarray(b1) == np.asarray(b2)).all()
    assert (np.asarray(r1) == np.asarray(r2)).all()
    q = np.asarray(q)
    assert q.dtype == np.uint8 and q.shape == (2, 1000)
    assert q.max() <= 60
    # random weights -> near-uniform votes -> low confidence
    assert q.mean() < 30


def test_oracle_fastq_stitch(tmp_path):
    """Oracle predictions with constant q40 stitch to the exact sequence with
    a quality string of the same length and value (anchor joins must cut the
    quality rope at the same offsets as the sequence rope)."""
    from helen_tpu.infer.polish import perform_stitch

    seq = random_sequence(20000, seed=11)
    preds = tmp_path / "preds"
    preds.mkdir()
    write_prediction_file(str(preds / "p_0.hdf"), {"chr_q": seq},
                          region_cols=900, overlap_cols=80, qual=40)
    out = perform_stitch(str(preds), str(tmp_path), "polished", threads=2,
                         fastq=True)
    assert out.endswith(".fq")
    records = list(read_fastq(out))
    assert len(records) == 1
    name, got_seq, got_qual = records[0]
    assert name == "chr_q"
    assert got_seq == seq
    assert len(got_qual) == len(got_seq)
    assert set(got_qual) == {chr(40 + 33)}


def test_fastq_without_quals_is_clear_error(tmp_path):
    from helen_tpu.infer.polish import perform_stitch

    preds = tmp_path / "preds"
    preds.mkdir()
    write_prediction_file(str(preds / "p_0.hdf"),
                          {"c": random_sequence(3000, seed=1)},
                          region_cols=600, overlap_cols=60)
    with pytest.raises(ValueError, match="--qualities"):
        perform_stitch(str(preds), str(tmp_path), "x", threads=1, fastq=True)


def test_cli_polish_fastq(tmp_path):
    """polish --fastq end-to-end: FASTQ out, sequence identical to the FASTA
    a plain polish of the same inputs produces."""
    image_dir = tmp_path / "images"
    image_dir.mkdir()
    write_image_file(str(image_dir / "img.h5"),
                     {"ctgF": random_sequence(6000, seed=6)},
                     region_cols=900, overlap_cols=80, noise=0.1)
    torch.manual_seed(4)
    pkl = str(tmp_path / "m.pkl")
    torch.save({"model_state_dict": TorchTransducer().state_dict(),
                "model_optimizer": {}, "hidden_size": 128, "gru_layers": 1,
                "epochs": 0}, pkl)
    rc = main(["polish", "-i", str(image_dir), "-m", pkl,
               "-o", str(tmp_path / "out_fq"), "-b", "8", "-w", "2",
               "-t", "1", "--fastq"])
    assert rc in (0, None)
    fq = os.path.join(str(tmp_path / "out_fq"), "HELEN_prediction.fq")
    records = list(read_fastq(fq))
    assert len(records) == 1 and records[0][0] == "ctgF"
    assert len(records[0][1]) == len(records[0][2]) > 4000

    rc = main(["polish", "-i", str(image_dir), "-m", pkl,
               "-o", str(tmp_path / "out_fa"), "-b", "8", "-w", "2", "-t", "1"])
    assert rc in (0, None)
    fa = dict(read_fasta(os.path.join(str(tmp_path / "out_fa"),
                                      "HELEN_prediction.fa")))
    assert fa["ctgF"] == records[0][1]


def test_pool_writers_with_qualities(tmp_path):
    """--writers and --qualities compose: quals route through the writer
    pool and stitch --fastq merges them across the per-writer shards."""
    from helen_tpu.infer.consensus import call_consensus
    from helen_tpu.infer.polish import perform_stitch

    image_dir = tmp_path / "images"
    image_dir.mkdir()
    write_image_file(str(image_dir / "img.h5"),
                     {"ctgW": random_sequence(4000, seed=13)},
                     region_cols=600, overlap_cols=60, noise=0.1)
    torch.manual_seed(9)
    pkl = str(tmp_path / "m.pkl")
    torch.save({"model_state_dict": TorchTransducer().state_dict(),
                "model_optimizer": {}, "hidden_size": 128, "gru_layers": 1,
                "epochs": 0}, pkl)
    out_dir = str(tmp_path / "preds")
    call_consensus(image_dir=str(image_dir), model_path=pkl,
                   output_dir=out_dir, batch_size=4, num_workers=2,
                   num_writers=2, qualities=True)
    fq = perform_stitch(out_dir, str(tmp_path), "pq", threads=1, fastq=True)
    name, seq, qual = next(read_fastq(fq))
    assert name == "ctgW" and len(seq) == len(qual) > 3000
