"""Hardened multi-host coverage: 4-process job, barrier timeout behavior,
and host-death -> --resume recovery (VERDICT r1 items 3/4).

All jobs run real jax.distributed processes on CPU (2 virtual devices per
process). The recovery test SIGKILLs one host mid-consensus — the flushed
prediction store must stay readable and a re-run with --resume must finish
the missing work and stitch a FASTA identical to an uninterrupted run's.
"""
import os
import signal
import socket
import subprocess
import sys
import time

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_hard_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    return env


def _spawn(mode, pid, nprocs, port, workdir=None):
    args = [sys.executable, WORKER, mode, str(pid), str(nprocs), str(port)]
    if workdir:
        args.append(workdir)
    return subprocess.Popen(args, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True, env=_env())


@pytest.mark.timeout(300)
def test_four_process_job():
    """4 hosts x 2 devices: coordination client, allsum, complete sharding,
    and one global-mesh dp train step with identical loss on every host."""
    port = _free_port()
    procs = [_spawn("four", pid, 4, port) for pid in range(4)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("4-process worker timed out")
        assert p.returncode == 0, f"worker failed:\nstdout:{out}\nstderr:{err}"
        outs.append(out)
    losses = {o.strip().splitlines()[-1].split()[-1] for o in outs}
    assert len(losses) == 1, f"hosts disagree on loss: {outs}"


@pytest.mark.timeout(300)
def test_barrier_timeout_raises():
    """A host alone at a barrier must get a timeout error after timeout_s —
    never hang for the peers, never silently degrade."""
    port = _free_port()
    p0 = _spawn("timeout", 0, 2, port)
    p1 = _spawn("timeout", 1, 2, port)
    try:
        out, err = p0.communicate(timeout=180)
    except subprocess.TimeoutExpired:
        p0.kill()
        pytest.fail("process 0 hung at the barrier instead of timing out")
    finally:
        p1.send_signal(signal.SIGKILL)
        p1.communicate(timeout=30)
    assert p0.returncode == 0, f"stdout:{out}\nstderr:{err}"
    assert "TIMEOUT_RAISED" in out, out


def _stage_consensus_job(tmp_path):
    import torch

    from helen_tpu.io.synthetic import random_sequence, write_image_file
    from tests.torch_reference import TorchTransducer

    images = tmp_path / "images"
    images.mkdir()
    # enough images per host (~24) that the killed host has flushed at least
    # one 10-batch cadence (batch_size=2) before the SIGKILL lands
    write_image_file(str(images / "a.h5"),
                     {"cA": random_sequence(30000, seed=1)},
                     region_cols=900, overlap_cols=60, noise=0.1)
    write_image_file(str(images / "b.h5"),
                     {"cB": random_sequence(30000, seed=2)},
                     region_cols=900, overlap_cols=60, noise=0.1)
    torch.manual_seed(3)
    torch.save(
        {"model_state_dict": TorchTransducer().state_dict(),
         "model_optimizer": {}, "hidden_size": 128, "gru_layers": 1,
         "epochs": 0},
        str(tmp_path / "model.pkl"),
    )


def _stage_train_job(tmp_path):
    from helen_tpu.io.synthetic import random_sequence, write_image_file

    train = tmp_path / "train"
    test = tmp_path / "test"
    train.mkdir()
    test.mkdir()
    # 16 labeled images -> 4 global batches at global batch_size 4
    write_image_file(str(train / "t.h5"),
                     {"cT": random_sequence(16000, seed=7)},
                     region_cols=1000, overlap_cols=0, noise=0.05)
    write_image_file(str(test / "e.h5"),
                     {"cE": random_sequence(4000, seed=8)},
                     region_cols=1000, overlap_cols=0, noise=0.05)


@pytest.mark.timeout(580)
def test_train_kill_host_then_resume_matches_uninterrupted(tmp_path):
    """SIGKILL a host mid-epoch in a 2-process psum training job, restart
    both hosts from HELEN_latest_checkpoint.npz, and require (a) no hang on
    the restart's barrier/psum lockstep and (b) epoch-1 params byte-equal an
    uninterrupted 2-process run's (mid-epoch resume replays the exact data
    order; optimizer + scheduler state ride the checkpoint)."""
    from helen_tpu.io.checkpoint import load_checkpoint

    _stage_train_job(tmp_path)
    workdir = str(tmp_path)

    # golden: uninterrupted 2-host epoch into models_golden/
    port = _free_port()
    procs = [_spawn("train_golden", pid, 2, port, workdir) for pid in range(2)]
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("golden training run timed out")
        assert p.returncode == 0, f"golden run failed:\n{out}\n{err}"

    # phase 1: same job into models/; kill host 1 once a mid-epoch latest
    # checkpoint (batch_in_epoch >= 2 of 4) exists, then host 0 — a psum
    # peer cannot outlive the job (jax's coordination heartbeat would tear
    # it down in ~100s anyway); the restart is what's under test.
    port = _free_port()
    procs = [_spawn("train_kill", pid, 2, port, workdir) for pid in range(2)]
    latest = os.path.join(workdir, "models", "HELEN_latest_checkpoint.npz")
    deadline = time.monotonic() + 300
    seen = None
    while time.monotonic() < deadline:
        if procs[0].poll() is not None or procs[1].poll() is not None:
            break
        if os.path.exists(latest):
            try:
                _, meta, _ = load_checkpoint(latest)
            except Exception:
                meta = None  # save is atomic, but be tolerant anyway
            if (meta and meta.get("epochs") == 0
                    and meta.get("batch_in_epoch", 0) >= 2):
                seen = meta
                break
        time.sleep(0.25)
    if seen is None:
        for q in procs:
            q.kill()
            q.communicate(timeout=30)
        pytest.fail("no mid-epoch checkpoint appeared before the deadline")
    procs[1].send_signal(signal.SIGKILL)
    time.sleep(1.0)
    procs[0].send_signal(signal.SIGKILL)
    for p in procs:
        p.communicate(timeout=60)

    # phase 2: restart BOTH hosts from the latest checkpoint; must finish
    # without hanging and without retraining the already-trained batches
    port = _free_port()
    procs = [_spawn("train_resume", pid, 2, port, workdir) for pid in range(2)]
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("resumed training hung")
        assert p.returncode == 0, f"resume failed:\nstdout:{out}\nstderr:{err}"
        assert "mid-epoch resume: skipping" in err, err

    want, _, _ = load_checkpoint(
        os.path.join(workdir, "models_golden", "HELEN_epoch_1_checkpoint.npz"))
    got, _, _ = load_checkpoint(
        os.path.join(workdir, "models", "HELEN_epoch_1_checkpoint.npz"))
    import jax

    import numpy as np

    wleaves, wdef = jax.tree_util.tree_flatten(want)
    gleaves, gdef = jax.tree_util.tree_flatten(got)
    assert wdef == gdef
    for w, g in zip(wleaves, gleaves):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


@pytest.mark.timeout(580)
def test_kill_host_then_resume_recovers(tmp_path):
    """SIGKILL host 1 mid-consensus; a --resume re-run must skip everything
    already flushed, finish the rest, and stitch a FASTA byte-identical to
    an uninterrupted single-process run."""
    _stage_consensus_job(tmp_path)
    workdir = str(tmp_path)

    # golden: uninterrupted single-process polish over the same inputs
    from helen_tpu.infer.consensus import call_consensus
    from helen_tpu.infer.polish import perform_stitch

    golden_dir = str(tmp_path / "golden")
    call_consensus(
        image_dir=os.path.join(workdir, "images"),
        model_path=os.path.join(workdir, "model.pkl"),
        output_dir=golden_dir, batch_size=2, num_workers=2,
    )
    golden_fa = perform_stitch(golden_dir, golden_dir, "golden", threads=1)

    # phase 1: 2-host job, host 1 killed once its shard has flushed data
    port = _free_port()
    procs = [_spawn("consensus", pid, 2, port, workdir) for pid in range(2)]
    victim_shard = os.path.join(workdir, "preds", "helen_predictions_1.hdf")
    deadline = time.monotonic() + 240
    killed = False
    while time.monotonic() < deadline:
        if procs[1].poll() is not None:
            break  # host 1 finished before we could kill it — still a valid
            # (weaker) run; the resume phase then just verifies idempotence
        if os.path.exists(victim_shard) and os.path.getsize(victim_shard) > 60_000:
            procs[1].send_signal(signal.SIGKILL)
            killed = True
            break
        time.sleep(0.5)
    assert killed or procs[1].poll() is not None, "host 1 never flushed data"
    procs[1].communicate(timeout=60)
    # host 0 runs no collectives during consensus; it must finish its own
    # shard despite the dead peer (share-nothing inference; the worker's
    # shards-complete barrier tolerates the dead peer with a 45 s timeout)
    try:
        out0, err0 = procs[0].communicate(timeout=240)
    except subprocess.TimeoutExpired:
        procs[0].kill()
        out0, err0 = procs[0].communicate(timeout=30)
        pytest.fail(f"host 0 hung in phase 1 despite the barrier timeout:"
                    f"\n{out0}\n{err0}")
    assert procs[0].returncode == 0 or killed, (
        f"host 0 failed in phase 1:\n{out0}\n{err0}"
    )

    # the partial shard left by the SIGKILL must be readable (flush cadence)
    from helen_tpu.io.writer_pool import _chunk_keys

    partial = _chunk_keys(victim_shard)
    if killed:
        assert partial, "flushed shard unreadable after SIGKILL"

    # phase 2: fresh 2-host job with --resume, then process 0 stitches
    port = _free_port()
    procs = [_spawn("resume", pid, 2, port, workdir) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("resume worker timed out")
        assert p.returncode == 0, f"resume worker failed:\nstdout:{out}\nstderr:{err}"
        outs.append((out, err))
    # resume actually skipped the flushed chunks instead of recomputing:
    # host 0's complete shard is skipped entirely, host 1 skips whatever its
    # pre-kill flushes persisted (everything, when the kill lost the race)
    import re

    skipped = [int(m.group(1)) for _, err in outs
               for m in [re.search(r"(\d+) skipped \(resume\)", err)] if m]
    assert len(skipped) == 2 and sum(skipped) > 0, outs

    recovered = os.path.join(workdir, "recovered.fa")
    with open(golden_fa, "rb") as f:
        want = f.read()
    with open(recovered, "rb") as f:
        got = f.read()
    assert got == want, "recovered FASTA differs from the uninterrupted run"
