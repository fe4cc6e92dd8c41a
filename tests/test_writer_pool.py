"""Multi-process prediction writer pool: routing, dedupe, resume, stitch."""
import os

import numpy as np
import pytest

from helen_tpu.io.prediction_store import list_contigs, list_region_keys
from helen_tpu.io.synthetic import random_sequence, rle_encode
from helen_tpu.io.writer_pool import PredictionWriterPool
from helen_tpu.stitch import stitch_contig


def _region_records(seq, region_cols=300, overlap_cols=40, chunk_cols=120):
    """(contig_start, contig_end, chunk_id, position, bases, rles) records
    covering ``seq`` with overlapping base-space regions split into chunks
    (same layout as io.synthetic.write_prediction_file)."""
    from helen_tpu.io.synthetic import partition_regions

    bases, rles = rle_encode(seq)
    records = []
    for region in partition_regions(bases, rles, "ctg", region_cols, overlap_cols):
        ncols = region.bases.shape[0]
        position = np.zeros((ncols, 3), dtype=np.int64)
        position[:, 0] = np.arange(region.col_start, region.col_start + ncols)
        for ci, cs in enumerate(range(0, ncols, chunk_cols)):
            ce = min(cs + chunk_cols, ncols)
            records.append((
                region.contig_start, region.contig_end, ci,
                position[cs:ce], region.bases[cs:ce], region.runs[cs:ce],
            ))
    return records


def test_pool_stitch_roundtrip(tmp_path):
    seq = random_sequence(6000, seed=9)
    paths = [str(tmp_path / f"pred_0_w{k}.hdf") for k in range(3)]
    with PredictionWriterPool(paths, "w") as pool:
        for start, end, ci, pos, b, r in _region_records(seq):
            assert pool.write_prediction("ctg", start, end, ci, pos, b, r)
            # duplicate is dropped pool-wide regardless of routing
            assert not pool.write_prediction("ctg", start, end, ci, pos, b, r)
    # chunks landed across several files, regions grouped across all of them
    sizes = [os.path.getsize(p) for p in paths]
    assert sum(1 for s in sizes if s > 2000) >= 2, sizes
    assert list_contigs(paths) == ["ctg"]
    assert stitch_contig(paths, "ctg", threads=1) == seq


def test_pool_resume_skips_existing(tmp_path):
    seq = random_sequence(3000, seed=4)
    records = _region_records(seq)
    paths = [str(tmp_path / f"pred_0_w{k}.hdf") for k in range(2)]
    half = len(records) // 2
    with PredictionWriterPool(paths, "w") as pool:
        for start, end, ci, pos, b, r in records[:half]:
            pool.write_prediction("ctg", start, end, ci, pos, b, r)
    with PredictionWriterPool(paths, "a") as pool:
        # startup collected every shard's chunks into the union set
        s0 = records[0]
        assert pool.has_chunk("ctg", s0[0], s0[1], s0[2])
        for start, end, ci, pos, b, r in records:
            wrote = pool.write_prediction("ctg", start, end, ci, pos, b, r)
            assert wrote == ((start, end, ci) not in
                             {(x[0], x[1], x[2]) for x in records[:half]})
    assert stitch_contig(paths, "ctg", threads=1) == seq


def test_pool_rejects_slash_contig(tmp_path):
    paths = [str(tmp_path / "p_w0.hdf")]
    with PredictionWriterPool(paths, "w") as pool:
        with pytest.raises(ValueError, match="contains '/'"):
            pool.write_prediction("a/b", 0, 10, 0,
                                  np.zeros((2, 3)), np.zeros(2), np.zeros(2))


def test_pool_startup_error_propagates(tmp_path):
    bad = str(tmp_path / "no_such_dir" / "x.hdf")
    with pytest.raises(RuntimeError, match="failed to start"):
        PredictionWriterPool([bad], "w")


def test_consensus_driver_with_pool(tmp_path):
    """call_consensus(num_writers=2) end-to-end on synthetic images."""
    import torch

    from helen_tpu.infer.consensus import call_consensus
    from helen_tpu.io.synthetic import write_image_file
    from tests.torch_reference import TorchTransducer

    image_dir = tmp_path / "images"
    image_dir.mkdir()
    write_image_file(str(image_dir / "img.h5"),
                     {"ctgP": random_sequence(4000, seed=2)},
                     region_cols=600, overlap_cols=60, noise=0.1)
    torch.manual_seed(1)
    pkl = str(tmp_path / "m.pkl")
    torch.save({"model_state_dict": TorchTransducer().state_dict(),
                "model_optimizer": {}, "hidden_size": 128, "gru_layers": 1,
                "epochs": 0}, pkl)
    out = call_consensus(
        image_dir=str(image_dir), model_path=pkl,
        output_dir=str(tmp_path / "out"), batch_size=4, num_workers=2,
        num_writers=2,
    )
    assert len(out) == 2
    assert all(os.path.exists(p) for p in out)
    # both single-file and pool outputs hold the same labels: compare against
    # a single-writer run
    out1 = call_consensus(
        image_dir=str(image_dir), model_path=pkl,
        output_dir=str(tmp_path / "out1"), batch_size=4, num_workers=2,
    )
    a = stitch_contig(out, "ctgP", threads=1)
    b = stitch_contig(out1, "ctgP", threads=1)
    assert a == b and len(a) > 3000


def test_resume_across_pool_size_change(tmp_path):
    """A run resumed with a different --writers count (or single-writer)
    must skip chunks that live in the previous layout's shards, not
    recompute and duplicate them."""
    import torch

    from helen_tpu.infer.consensus import call_consensus
    from helen_tpu.io.synthetic import write_image_file
    from tests.torch_reference import TorchTransducer

    image_dir = tmp_path / "images"
    image_dir.mkdir()
    write_image_file(str(image_dir / "img.h5"),
                     {"ctgR": random_sequence(4000, seed=12)},
                     region_cols=600, overlap_cols=60, noise=0.1)
    torch.manual_seed(2)
    pkl = str(tmp_path / "m.pkl")
    torch.save({"model_state_dict": TorchTransducer().state_dict(),
                "model_optimizer": {}, "hidden_size": 128, "gru_layers": 1,
                "epochs": 0}, pkl)
    out_dir = str(tmp_path / "out")
    # first run: 2 writers
    call_consensus(image_dir=str(image_dir), model_path=pkl,
                   output_dir=out_dir, batch_size=4, num_workers=2,
                   num_writers=2)
    # resume single-writer: everything is already present in the _w* shards
    call_consensus(image_dir=str(image_dir), model_path=pkl,
                   output_dir=out_dir, batch_size=4, num_workers=2,
                   resume=True)
    single = os.path.join(out_dir, "helen_predictions_0.hdf")
    assert os.path.exists(single)
    # the single-writer file holds NO chunks (all were skipped via preload)
    import h5py

    with h5py.File(single) as f:
        n = sum(
            1
            for contig in f.get("predictions", {})
            for region in f["predictions"][contig]
            for k in f["predictions"][contig][region]
            if k not in ("contig_start", "contig_end")
        ) if "predictions" in f else 0
    assert n == 0, f"resume recomputed {n} chunks already present in pool shards"
    # and the union of all shards still stitches the full contig
    shards = [os.path.join(out_dir, p) for p in sorted(os.listdir(out_dir))
              if p.endswith(".hdf")]
    seq = stitch_contig(shards, "ctgR", threads=1)
    assert len(seq) > 3000


def test_lean_worker_env_scrubs_children_and_restores(monkeypatch):
    """Children spawned inside lean_worker_env must not see the
    accelerator-bootstrap trigger vars; the parent env is restored even on
    error; HELEN_TPU_SCRUB_WORKER_ENV overrides the list."""
    import multiprocessing
    import os

    from helen_tpu.utils.procs import lean_worker_env

    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    ctx = multiprocessing.get_context("spawn")
    with lean_worker_env():
        assert "PALLAS_AXON_POOL_IPS" not in os.environ
        q = ctx.Queue()
        p = ctx.Process(target=_env_probe, args=(q,))
        p.start()
        p.join(60)
        assert q.get(timeout=10) == "absent"
    assert os.environ["PALLAS_AXON_POOL_IPS"] == "10.0.0.1"

    # restore-on-error
    try:
        with lean_worker_env():
            assert "PALLAS_AXON_POOL_IPS" not in os.environ
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert os.environ["PALLAS_AXON_POOL_IPS"] == "10.0.0.1"

    # override list: empty string disables scrubbing
    monkeypatch.setenv("HELEN_TPU_SCRUB_WORKER_ENV", "")
    with lean_worker_env():
        assert "PALLAS_AXON_POOL_IPS" in os.environ
    monkeypatch.setenv("HELEN_TPU_SCRUB_WORKER_ENV", "MY_TRIGGER")
    monkeypatch.setenv("MY_TRIGGER", "1")
    with lean_worker_env():
        assert "MY_TRIGGER" not in os.environ
        assert "PALLAS_AXON_POOL_IPS" in os.environ
    assert os.environ["MY_TRIGGER"] == "1"


def _env_probe(q):
    import os

    q.put("absent" if "PALLAS_AXON_POOL_IPS" not in os.environ else "present")


def test_orphaned_writers_release_locks(tmp_path):
    """SIGKILL the DRIVER process: its daemon writer children must notice
    the parent's death, close their shards (releasing HDF5 write locks)
    and exit — otherwise a --resume attempt dies with 'unable to lock
    file' (observed live, r5)."""
    import signal
    import subprocess
    import sys
    import time

    import h5py

    script = tmp_path / "driver.py"
    script.write_text(f"""
import sys, time, json
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
import numpy as np

def main():
    from helen_tpu.io.writer_pool import PredictionWriterPool
    paths = [{repr(str(tmp_path / 'w0.hdf'))}, {repr(str(tmp_path / 'w1.hdf'))}]
    pool = PredictionWriterPool(paths, "w")
    pos = np.zeros((10, 3), np.int64)
    pool.write_prediction("c", 0, 100, 0, pos,
                          np.zeros(10, np.uint8), np.zeros(10, np.uint8))
    pool.flush()
    with open({repr(str(tmp_path / 'pids.json'))}, "w") as f:
        json.dump([p.pid for p in pool._procs], f)
    print("READY", flush=True)
    time.sleep(120)  # parked: the test SIGKILLs us here

if __name__ == "__main__":
    main()
""")
    p = subprocess.Popen([sys.executable, str(script)],
                         stdout=subprocess.PIPE, text=True)
    assert p.stdout.readline().strip() == "READY"
    import json

    pids = json.load(open(tmp_path / "pids.json"))
    os.kill(p.pid, signal.SIGKILL)
    p.wait()

    def alive(pid):
        try:
            os.kill(pid, 0)
            return True
        except ProcessLookupError:
            return False

    deadline = time.time() + 30
    while time.time() < deadline and any(alive(pid) for pid in pids):
        time.sleep(0.5)
    assert not any(alive(pid) for pid in pids), "orphaned writers survived"
    # locks released: both shards reopen for WRITE (what --resume needs)
    for name in ("w0.hdf", "w1.hdf"):
        with h5py.File(str(tmp_path / name), "a") as f:
            assert "predictions" in f
