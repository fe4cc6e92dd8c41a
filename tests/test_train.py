"""Training tests: loss parity vs torch, one-step optimizer parity,
learnability on synthetic data, checkpoint resume."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
torch = pytest.importorskip("torch")

from helen_tpu.config import TRAIN
from helen_tpu.io.checkpoint import params_from_torch_state_dict
from helen_tpu.io.synthetic import random_sequence, write_image_file
from helen_tpu.models.transducer import forward, init_hidden
from helen_tpu.train.loss import cross_entropy, weighted_cross_entropy
from helen_tpu.train.train_loop import (
    PlateauScheduler,
    Trainer,
    make_optimizer,
    make_train_step,
)
from helen_tpu.utils.filesystem import list_image_files

from tests.torch_reference import TorchTransducer

HIGH = jax.lax.Precision.HIGHEST


def test_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((4, 7, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (4, 7))
    t = torch.nn.CrossEntropyLoss()(
        torch.from_numpy(logits).reshape(-1, 5), torch.from_numpy(labels).reshape(-1)
    )
    j = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(j), float(t), rtol=1e-6)


def test_weighted_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((6, 11)).astype(np.float32)
    labels = rng.integers(0, 11, (6,))
    w = np.asarray(TRAIN.rle_class_weights, dtype=np.float32)
    t = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w))(
        torch.from_numpy(logits), torch.from_numpy(labels)
    )
    j = weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w))
    np.testing.assert_allclose(float(j), float(t), rtol=1e-6)


def test_one_window_adam_step_matches_torch(rng):
    """One TBPTT window: loss, gradients and the Adam update must track torch."""
    torch.manual_seed(3)
    model = TorchTransducer()
    params = jax.tree_util.tree_map(
        jnp.asarray,
        params_from_torch_state_dict(
            {k: v.detach().numpy() for k, v in model.state_dict().items()}
        ),
    )
    x = rng.standard_normal((3, 100, 90)).astype(np.float32)
    yb = rng.integers(0, 5, (3, 100))
    yr = rng.integers(0, 11, (3, 100))
    w = torch.tensor(TRAIN.rle_class_weights)
    lr = 1e-3

    opt = torch.optim.Adam(model.parameters(), lr=lr)
    ob, orle, _ = model(torch.from_numpy(x), torch.zeros(3, 2, 128))
    loss_t = torch.nn.CrossEntropyLoss()(ob.reshape(-1, 5), torch.from_numpy(yb).reshape(-1)) + \
        torch.nn.CrossEntropyLoss(weight=w)(orle.reshape(-1, 11), torch.from_numpy(yr).reshape(-1))
    opt.zero_grad()
    loss_t.backward()
    opt.step()

    rle_w = jnp.asarray(TRAIN.rle_class_weights, dtype=jnp.float32)

    def loss_fn(p):
        base, rle, _ = forward(p, jnp.asarray(x), init_hidden(3), precision=HIGH)
        return cross_entropy(base, jnp.asarray(yb)) + weighted_cross_entropy(
            rle, jnp.asarray(yr), rle_w
        )

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()), rtol=1e-5)

    import optax

    tx = make_optimizer(0.0)
    opt_state = tx.init(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
    new_params = optax.apply_updates(params, updates)

    torch_after = params_from_torch_state_dict(
        {k: v.detach().numpy() for k, v in model.state_dict().items()}
    )
    enc = np.asarray(new_params["encoder"]["fwd"]["w_ih"])
    np.testing.assert_allclose(enc, torch_after["encoder"]["fwd"]["w_ih"], atol=2e-5)
    head = np.asarray(new_params["base_head"]["w"])
    np.testing.assert_allclose(head, torch_after["base_head"]["w"], atol=2e-5)


@pytest.fixture(scope="module")
def labeled_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_data")
    train_dir, test_dir = root / "train", root / "test"
    train_dir.mkdir()
    test_dir.mkdir()
    write_image_file(
        str(train_dir / "t.h5"), {"c1": random_sequence(40000, seed=10)},
        region_cols=1000, overlap_cols=0, noise=0.05,
    )
    write_image_file(
        str(test_dir / "e.h5"), {"c2": random_sequence(8000, seed=11)},
        region_cols=1000, overlap_cols=0, noise=0.05,
    )
    return str(train_dir), str(test_dir)


def test_training_learns_synthetic(labeled_data, tmp_path):
    """The model must learn the synthetic feature->label mapping quickly."""
    train_dir, test_dir = labeled_data
    cfg = dataclasses.replace(TRAIN, batch_size=8, learning_rate=3e-3, seed=0)
    trainer = Trainer(
        train_files=list_image_files(train_dir),
        test_files=list_image_files(test_dir),
        cfg=cfg,
        model_dir=str(tmp_path / "models"),
        stats_dir=str(tmp_path / "stats"),
        num_workers=2,
    )
    history = trainer.run(epochs=3)
    assert len(history) == 3
    assert history[-1].test_loss < history[0].test_loss
    assert history[-1].base_accuracy > 90.0
    assert history[-1].rle_accuracy > 90.0
    # artifacts exist
    assert os.path.exists(tmp_path / "models" / "HELEN_epoch_3_checkpoint.npz")
    assert os.path.exists(tmp_path / "stats" / "train_loss.csv")
    assert os.path.exists(tmp_path / "stats" / "test_loss.csv")


def test_model_parallel_trainer_matches_data_parallel(labeled_data, tmp_path):
    """--model_parallel trains through the GSPMD dp x tp step
    (parallel/sharding.py): params tensor-sharded over the 8-virtual-device
    CPU mesh. One epoch must produce the same weights as the shard_map
    data-parallel trainer (identical math, different partitioning), and the
    sharded params must round-trip into an ordinary checkpoint."""
    train_dir, test_dir = labeled_data
    cfg = dataclasses.replace(TRAIN, batch_size=8, learning_rate=1e-3, seed=3)

    def run_one(subdir, **kw):
        t = Trainer(
            train_files=list_image_files(train_dir),
            test_files=list_image_files(test_dir),
            cfg=cfg,
            model_dir=str(tmp_path / subdir / "models"),
            stats_dir=str(tmp_path / subdir / "stats"),
            num_workers=2,
            **kw,
        )
        t.run(epochs=1)
        return t

    t_mp = run_one("mp", model_parallel=2)
    assert t_mp.shard_multiple == 4  # 8 devices -> data=4 x model=2
    import jax
    leaf = jax.tree_util.tree_leaves(t_mp.params)[0]
    assert len(leaf.sharding.device_set) == 8  # actually on the mesh
    t_dp = run_one("dp")
    for (k, a), (_, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(t_mp.params), key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(t_dp.params), key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4, err_msg=str(k))
    assert os.path.exists(tmp_path / "mp" / "models" / "HELEN_epoch_1_checkpoint.npz")


def test_retrain_resumes_epoch_numbering(labeled_data, tmp_path):
    train_dir, test_dir = labeled_data
    cfg = dataclasses.replace(TRAIN, batch_size=8, learning_rate=1e-3, seed=1)
    t1 = Trainer(
        train_files=list_image_files(train_dir),
        test_files=list_image_files(test_dir),
        cfg=cfg,
        model_dir=str(tmp_path / "m1"),
        stats_dir=str(tmp_path / "s1"),
        num_workers=2,
    )
    t1.run(epochs=1)
    ckpt = str(tmp_path / "m1" / "HELEN_epoch_1_checkpoint.npz")
    t2 = Trainer(
        train_files=list_image_files(train_dir),
        test_files=list_image_files(test_dir),
        cfg=cfg,
        model_dir=str(tmp_path / "m2"),
        stats_dir=str(tmp_path / "s2"),
        num_workers=2,
        retrain_model_path=ckpt,
    )
    assert t2.start_epoch == 1
    history = t2.run(epochs=1)
    assert history[0].epoch == 2
    assert os.path.exists(tmp_path / "m2" / "HELEN_epoch_2_checkpoint.npz")


def test_plateau_scheduler():
    s = PlateauScheduler(lr=1.0, factor=0.5, patience=2)
    for loss in [1.0, 0.9, 0.8]:
        assert s.step(loss) == 1.0  # improving
    assert s.step(0.85) == 1.0  # bad 1
    assert s.step(0.85) == 1.0  # bad 2
    assert s.step(0.85) == 0.5  # bad 3 > patience -> reduce
    assert s.step(0.4) == 0.5  # new best resets


def test_host_indices_pad_small_dataset(labeled_data):
    """DistributedSampler semantics: a dataset smaller than the global batch
    wrap-pads by REPEATING the permutation, so every host gets the same
    number of full batches (anything else hangs the psum collective)."""
    train_dir, test_dir = labeled_data
    cfg = dataclasses.replace(TRAIN, batch_size=8, seed=0)
    tr = Trainer(
        train_files=list_image_files(train_dir),
        test_files=list_image_files(test_dir),
        cfg=cfg,
        model_dir="/tmp/unused_m", stats_dir="/tmp/unused_s",
        num_workers=1, data_parallel=False,
    )
    # simulate a 4-host job with a global batch larger than the dataset
    tr.n_procs, tr.eff_batch, tr.eff_local = 4, 32, 8
    small = list(range(10))  # 10 images < eff_batch 32
    lengths = set()
    union = set()
    for pid in range(4):
        tr.pid = pid
        local, iter_batch = tr._host_indices(list(small))
        assert iter_batch == 8
        assert len(local) % iter_batch == 0
        lengths.add(len(local))
        union.update(local)
    assert lengths == {8}, lengths  # every host: exactly one full batch
    assert union <= set(small)
