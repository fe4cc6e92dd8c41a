"""Checkpoint format tests: native npz, torch pkl import, optimizer state."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
torch = pytest.importorskip("torch")

from helen_tpu.io.checkpoint import (
    import_torch_checkpoint,
    load_checkpoint,
    load_model_any,
    save_checkpoint,
)
from helen_tpu.models import init_params, forward, init_hidden

from tests.torch_reference import TorchTransducer


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert len(la) == len(lb)
    key = lambda kv: str(kv[0])
    for (pa, va), (pb, vb) in zip(sorted(la, key=key), sorted(lb, key=key)):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_native_roundtrip(tmp_path):
    params = init_params(jax.random.PRNGKey(3))
    path = str(tmp_path / "model.npz")
    save_checkpoint(path, params, meta={"epochs": 4, "hidden_size": 128})
    params2, meta, _ = load_checkpoint(path)
    assert meta["epochs"] == 4 and meta["format_version"] == 1
    _tree_equal(params, params2)


def test_optimizer_state_roundtrip(tmp_path):
    params = init_params(jax.random.PRNGKey(5))
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)
    # take one step so state is non-trivial
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)

    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, params, meta={"epochs": 1}, opt_state=opt_state)
    template = opt.init(init_params(jax.random.PRNGKey(0)))
    params2, meta, opt_state2 = load_checkpoint(path, opt_state_template=template)
    _tree_equal(params, params2)
    _tree_equal(opt_state, opt_state2)


def test_torch_pkl_import(tmp_path):
    """A reference-format pkl (incl. DDP 'module.' prefixes) imports correctly:
    the imported params reproduce the torch model's forward outputs."""
    torch.manual_seed(11)
    model = TorchTransducer()
    # reference checkpoint layout (ModelHander.py:127-133), with DDP prefixes
    sd = {"module." + k: v for k, v in model.state_dict().items()}
    pkl = str(tmp_path / "ref_model.pkl")
    torch.save(
        {
            "model_state_dict": sd,
            "model_optimizer": {},
            "hidden_size": 128,
            "gru_layers": 1,
            "epochs": 7,
        },
        pkl,
    )
    params, meta = import_torch_checkpoint(pkl)
    assert meta == {"hidden_size": 128, "gru_layers": 1, "epochs": 7, "source": "ref_model.pkl"}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 100, 90)).astype(np.float32)
    with torch.no_grad():
        tb, _, _ = model(torch.from_numpy(x), torch.zeros(2, 2, 128))
    jb, _, _ = forward(
        jax.tree_util.tree_map(jnp.asarray, params),
        jnp.asarray(x),
        init_hidden(2),
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(np.asarray(jb), tb.numpy(), atol=2e-5, rtol=1e-4)


def test_load_model_any_dispatch(tmp_path):
    params = init_params(jax.random.PRNGKey(9))
    npz = str(tmp_path / "m.npz")
    save_checkpoint(npz, params, meta={"epochs": 2})
    p1, m1 = load_model_any(npz)
    assert m1["epochs"] == 2

    torch.manual_seed(2)
    model = TorchTransducer()
    pkl = str(tmp_path / "m.pkl")
    torch.save(
        {"model_state_dict": model.state_dict(), "model_optimizer": {},
         "hidden_size": 128, "gru_layers": 1, "epochs": 3},
        pkl,
    )
    p2, m2 = load_model_any(pkl)
    assert m2["epochs"] == 3
    assert p2["encoder"]["fwd"]["w_ih"].shape == (90, 384)
