"""Checkpoint conversion round-trips (convert CLI, scheduler restore)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from helen_tpu.cli import main
from helen_tpu.config import TRAIN
from helen_tpu.io.checkpoint import load_model_any, save_checkpoint
from helen_tpu.models import forward, init_hidden, init_params


def test_convert_npz_to_pkl_and_back(tmp_path, capsys, rng):
    params = init_params(jax.random.PRNGKey(7))
    npz = str(tmp_path / "m.npz")
    save_checkpoint(npz, params, meta={"epochs": 5, "hidden_size": 128, "gru_layers": 1})

    pkl = str(tmp_path / "m.pkl")
    assert main(["convert", "-i", npz, "-o", pkl]) == 0
    capsys.readouterr()
    npz2 = str(tmp_path / "m2.npz")
    assert main(["convert", "-i", pkl, "-o", npz2]) == 0

    # the round-tripped model computes identical outputs
    p2, meta2 = load_model_any(npz2)
    assert meta2["epochs"] == 5
    x = jnp.asarray(rng.standard_normal((2, 50, 90)), dtype=jnp.float32)
    b1, _, _ = forward(params, x, init_hidden(2))
    b2, _, _ = forward(jax.tree_util.tree_map(jnp.asarray, p2), x, init_hidden(2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))

    # and torch can load the exported pkl directly
    ckpt = torch.load(pkl, map_location="cpu", weights_only=False)
    assert ckpt["hidden_size"] == 128
    assert "gru_encoder.weight_ih_l0" in ckpt["model_state_dict"]


def test_scheduler_state_restored_on_retrain(tmp_path):
    from helen_tpu.train.train_loop import Trainer
    from helen_tpu.io.synthetic import random_sequence, write_image_file
    from helen_tpu.utils.filesystem import list_image_files

    d = tmp_path / "imgs"
    d.mkdir()
    write_image_file(str(d / "t.h5"), {"c": random_sequence(4000, seed=3)},
                     region_cols=1000, overlap_cols=0, noise=0.05)
    cfg = dataclasses.replace(TRAIN, batch_size=4, learning_rate=1e-3, seed=0)
    t1 = Trainer(list_image_files(str(d)), list_image_files(str(d)), cfg,
                 model_dir=str(tmp_path / "m"), stats_dir=str(tmp_path / "s"),
                 num_workers=1)
    t1.scheduler.lr = 5e-4  # pretend plateau reduced it
    t1.run(epochs=1)
    ckpt = str(tmp_path / "m" / "HELEN_epoch_1_checkpoint.npz")
    t2 = Trainer(list_image_files(str(d)), list_image_files(str(d)), cfg,
                 model_dir=str(tmp_path / "m2"), stats_dir=str(tmp_path / "s2"),
                 num_workers=1, retrain_model_path=ckpt)
    assert t2.scheduler.lr == pytest.approx(5e-4)
