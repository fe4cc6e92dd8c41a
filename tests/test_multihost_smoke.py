"""Real 2-process jax.distributed smoke test on CPU.

Launches two worker processes that join one distributed job (4 global
devices), reduce a confusion matrix across hosts, and run a full dp x tp
sharded training step over the global mesh. Both must report the same loss.
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(300)
def test_two_process_distributed_job(tmp_path):
    # stage a tiny two-contig image set + model for the inference-pipeline leg
    import torch

    from helen_tpu.io.synthetic import random_sequence, write_image_file
    from tests.torch_reference import TorchTransducer

    workdir = str(tmp_path)
    images = tmp_path / "images"
    images.mkdir()
    # two files; image-granular sharding round-robins the images across the
    # hosts, and region_cols > 1000 means each region's chunks are split
    # across the two hosts' prediction shards (the stitcher must merge them)
    write_image_file(str(images / "a.h5"), {"cA": random_sequence(3000, seed=1)},
                     region_cols=1500, overlap_cols=60, noise=0.1)
    write_image_file(str(images / "b.h5"), {"cB": random_sequence(3000, seed=2)},
                     region_cols=1500, overlap_cols=60, noise=0.1)
    torch.manual_seed(3)
    torch.save(
        {"model_state_dict": TorchTransducer().state_dict(), "model_optimizer": {},
         "hidden_size": 128, "gru_layers": 1, "epochs": 0},
        str(tmp_path / "model.pkl"),
    )

    # distributed-Trainer leg: 16 one-image contigs (divisible by the global
    # batch of 8, so single-host masked-tail and multi-host wrap padding are
    # both no-ops) + a single-process golden run to compare against
    import dataclasses as _dc

    import numpy as np

    from helen_tpu.config import TRAIN
    from helen_tpu.train.train_loop import Trainer
    from helen_tpu.utils.filesystem import list_image_files

    train_images = tmp_path / "train_images"
    train_images.mkdir()
    contigs = {f"t{i}": random_sequence(600, seed=10 + i) for i in range(16)}
    write_image_file(str(train_images / "train.h5"), contigs,
                     region_cols=900, overlap_cols=60, noise=0.1)
    cfg = _dc.replace(TRAIN, batch_size=8, learning_rate=1e-3, seed=7)
    golden = Trainer(
        train_files=list_image_files(str(train_images)),
        test_files=list_image_files(str(train_images)),
        cfg=cfg,
        model_dir=str(tmp_path / "golden_out" / "models"),
        stats_dir=str(tmp_path / "golden_out" / "stats"),
        num_workers=2,
    )
    assert len(golden.dataset) == 16 and golden.eff_batch == 8
    golden.run(1)
    flat = {}

    def _flatten(prefix, tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                _flatten(f"{prefix}{k}/", v)
            else:
                flat[f"{prefix}{k}"] = np.asarray(v)

    _flatten("", golden.params)
    np.savez(str(tmp_path / "golden_params.npz"), **flat)
    np.savez(str(tmp_path / "golden_sched.npz"), **golden.scheduler.state_dict())

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), workdir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, f"worker failed:\nstdout:{out}\nstderr:{err}"
        outs.append(out)
    # everything after "OK <pid>" (train loss + sharded eval loss) must be
    # digit-identical across hosts — scheduler-lockstep evidence
    tails = {" ".join(o.strip().splitlines()[-1].split()[2:]) for o in outs}
    assert len(tails) == 1, f"hosts disagree on losses: {outs}"
