"""Preemption-safe training: mid-epoch checkpoint + exact resume."""
import dataclasses
import os

import numpy as np
import pytest

from helen_tpu.config import TRAIN
from helen_tpu.io.checkpoint import load_checkpoint
from helen_tpu.io.synthetic import random_sequence, write_image_file
from helen_tpu.parallel.multihost import host_image_shard
from helen_tpu.train.train_loop import Trainer
from helen_tpu.utils.filesystem import list_image_files


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("resume_data")
    # ~50 images -> ~7 batches at the 8-wide virtual-device batch
    write_image_file(str(d / "t.h5"), {"c": random_sequence(150000, seed=5)},
                     region_cols=1000, overlap_cols=0, noise=0.05)
    return str(d)


def test_latest_checkpoint_written_midepoch(data_dir, tmp_path):
    cfg = dataclasses.replace(TRAIN, batch_size=2, learning_rate=1e-3, seed=0)
    t = Trainer(list_image_files(data_dir), list_image_files(data_dir), cfg,
                model_dir=str(tmp_path / "m"), stats_dir=str(tmp_path / "s"),
                num_workers=1, checkpoint_every_batches=2)
    t.train_one_epoch(0)
    latest = str(tmp_path / "m" / "HELEN_latest_checkpoint.npz")
    assert os.path.exists(latest)
    _, meta, _ = load_checkpoint(latest)
    assert meta["epochs"] == 0 and meta["batch_in_epoch"] >= 2


def test_midepoch_resume_matches_uninterrupted(data_dir, tmp_path):
    """Training 'interrupted' at batch K and resumed from the latest
    checkpoint must produce the same params as an uninterrupted epoch."""
    cfg = dataclasses.replace(TRAIN, batch_size=2, learning_rate=1e-3, seed=0)

    def fresh(outdir):
        return Trainer(
            list_image_files(data_dir), list_image_files(data_dir), cfg,
            model_dir=str(tmp_path / outdir / "m"),
            stats_dir=str(tmp_path / outdir / "s"),
            num_workers=1, checkpoint_every_batches=3,
        )

    # uninterrupted: full epoch 0
    t_full = fresh("full")
    t_full.train_one_epoch(0)
    full_head = np.asarray(t_full.params["base_head"]["w"])

    # interrupted: run only the first 3 batches (simulated by slicing the
    # deterministic epoch order), saved as the latest checkpoint
    t_part = fresh("part")
    indices = t_part._epoch_indices(0)
    import jax.numpy as jnp
    from helen_tpu.io.images import batched_image_iterator

    for bi, batch in enumerate(
        batched_image_iterator(t_part.dataset, t_part.eff_batch, 1,
                               indices=indices[: 3 * t_part.eff_batch])
    ):
        t_part.params, t_part.opt_state, *_ = t_part.step_fn(
            t_part.params, t_part.opt_state, jnp.float32(t_part.scheduler.lr),
            batch.images, batch.labels_base.astype(np.int32),
            batch.labels_rle.astype(np.int32), batch.valid,
        )
    t_part._save_latest(0, 3)
    latest = os.path.join(t_part.model_dir, "HELEN_latest_checkpoint.npz")

    # resume and finish the epoch
    t_resume = Trainer(
        list_image_files(data_dir), list_image_files(data_dir), cfg,
        model_dir=str(tmp_path / "res" / "m"),
        stats_dir=str(tmp_path / "res" / "s"),
        num_workers=1, retrain_model_path=latest,
    )
    assert t_resume.start_epoch == 0 and t_resume.start_batch == 3
    t_resume.train_one_epoch(0, skip_batches=t_resume.start_batch)
    resumed_head = np.asarray(t_resume.params["base_head"]["w"])
    np.testing.assert_allclose(resumed_head, full_head, atol=1e-6)


def test_host_image_shard():
    # contiguous equal-count blocks (sequential reads / packed slab reads)
    assert host_image_shard(7, 0, 3) == [0, 1]
    assert host_image_shard(7, 1, 3) == [2, 3]
    assert host_image_shard(7, 2, 3) == [4, 5, 6]
    # complete and disjoint
    all_idx = sorted(sum((host_image_shard(100, i, 4) for i in range(4)), []))
    assert all_idx == list(range(100))
