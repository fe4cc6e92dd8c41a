"""Checkpoint conversion round-trips (convert CLI, scheduler restore)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
torch = pytest.importorskip("torch")

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


def test_convert_stacked_pkl_roundtrip(tmp_path, rng):
    """A 2-layer / hidden-64 reference checkpoint (the reference loader
    rebuilds from hidden_size/gru_layers, ModelHander.py:50-63) imports,
    runs, and round-trips through the convert CLI."""
    from tests.torch_reference import TorchTransducer

    torch.manual_seed(3)
    model = TorchTransducer(hidden=64, gru_layers=2)
    pkl = str(tmp_path / "stacked.pkl")
    torch.save(
        {"model_state_dict": model.state_dict(), "model_optimizer": {},
         "hidden_size": 64, "gru_layers": 2, "epochs": 1},
        pkl,
    )
    params, meta = load_model_any(pkl)
    assert meta["gru_layers"] == 2 and meta["hidden_size"] == 64
    params = jax.tree_util.tree_map(jnp.asarray, params)

    x = rng.standard_normal((2, 100, 90)).astype(np.float32)
    h = np.zeros((2, 4, 64), np.float32)
    with torch.no_grad():
        tb, _, th = model(torch.from_numpy(x), torch.from_numpy(h))
    jb, _, jh = forward(params, jnp.asarray(x), jnp.asarray(h),
                        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(jb), tb.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), atol=2e-5, rtol=1e-4)

    npz = str(tmp_path / "stacked.npz")
    assert main(["convert", "-i", pkl, "-o", npz]) == 0
    p2, meta2 = load_model_any(npz)
    pkl2 = str(tmp_path / "stacked2.pkl")
    assert main(["convert", "-i", npz, "-o", pkl2]) == 0
    sd2 = torch.load(pkl2, map_location="cpu", weights_only=False)
    assert sd2["gru_layers"] == 2 and sd2["hidden_size"] == 64
    model2 = TorchTransducer(hidden=64, gru_layers=2)
    model2.load_state_dict(sd2["model_state_dict"])  # shapes + names line up
