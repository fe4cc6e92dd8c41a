"""Numerical parity of the JAX transducer vs torch CPU (the reference engine)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
torch = pytest.importorskip("torch")

from helen_tpu.config import MODEL, WINDOW
from helen_tpu.io.checkpoint import (
    export_torch_state_dict,
    params_from_torch_state_dict,
)
from helen_tpu.models import consensus_probs, forward, init_hidden, init_params, num_params
from helen_tpu.models.transducer import consensus_labels

from tests.torch_reference import TorchTransducer, reference_consensus

HIGH = jax.lax.Precision.HIGHEST


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(7)
    return TorchTransducer()


@pytest.fixture(scope="module")
def params(torch_model):
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    return jax.tree_util.tree_map(jnp.asarray, params_from_torch_state_dict(sd))


def test_param_count(params):
    # reference model is ~470K params (SURVEY.md §7)
    n = num_params(params)
    assert 460_000 < n < 480_000


def test_single_window_forward_parity(torch_model, params, rng):
    x = rng.standard_normal((4, 100, 90)).astype(np.float32)
    h = rng.standard_normal((4, 2, 128)).astype(np.float32)
    with torch.no_grad():
        tb, tr, th = torch_model(torch.from_numpy(x), torch.from_numpy(h))
    jb, jr, jh = forward(params, jnp.asarray(x), jnp.asarray(h), precision=HIGH)
    np.testing.assert_allclose(np.asarray(jb), tb.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jr), tr.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), atol=2e-5, rtol=1e-4)


def test_hidden_carry_parity(torch_model, params, rng):
    """Chained windows (the transducer contract) must track torch through the
    full recurrence depth of a 1000-column image."""
    x = rng.standard_normal((2, 1000, 90)).astype(np.float32)
    th = torch.zeros(2, 2, 128)
    jh = init_hidden(2)
    for i in range(0, 1000, 50):
        if i + 100 > 1000:
            break
        with torch.no_grad():
            _, _, th = torch_model(torch.from_numpy(x[:, i : i + 100]), th)
        _, _, jh = forward(params, jnp.asarray(x[:, i : i + 100]), jh, precision=HIGH)
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), atol=5e-5, rtol=1e-3)


def test_consensus_vote_parity(torch_model, params, rng):
    """Summed softmax votes and argmax labels must match the reference loop."""
    # realistic input scale: uint8 pileup weights
    images = rng.integers(0, 40, size=(3, 1000, 90)).astype(np.float32)
    tb_probs, tr_probs, tb_lab, tr_lab = reference_consensus(torch_model, images)
    jb_probs, jr_probs = jax.jit(
        lambda p, im: consensus_probs(p, im, WINDOW, MODEL, precision=HIGH)
    )(params, jnp.asarray(images))
    np.testing.assert_allclose(np.asarray(jb_probs), tb_probs, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jr_probs), tr_probs, atol=1e-4, rtol=1e-3)
    jb_lab, jr_lab = consensus_labels(params, jnp.asarray(images), precision=HIGH)
    assert (np.asarray(jb_lab) == tb_lab).all()
    assert (np.asarray(jr_lab) == tr_lab).all()


def test_window_starts_contract():
    # 19 windows over a 1000-column image (SURVEY.md §4 "windowing contract")
    assert WINDOW.num_windows(1000) == 19
    assert WINDOW.starts(1000)[0] == 0
    assert WINDOW.starts(1000)[-1] == 900


def test_torch_roundtrip(params):
    sd = export_torch_state_dict(params)
    params2 = params_from_torch_state_dict(sd)
    key = lambda kv: str(kv[0])
    for (k1, a), (k2, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(params), key=key),
        sorted(jax.tree_util.tree_leaves_with_path(params2), key=key),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_init_params_shapes():
    p = init_params(jax.random.PRNGKey(0))
    assert p["encoder"]["fwd"]["w_ih"].shape == (90, 384)
    assert p["decoder"]["fwd"]["w_ih"].shape == (256, 384)
    assert p["base_head"]["w"].shape == (256, 5)
    assert p["rle_head"]["w"].shape == (256, 11)
    assert 460_000 < num_params(p) < 480_000


def test_parity_backends_request_high_precision():
    """The TPU MXU's DEFAULT fp32 dot rounds operands to bf16 (~0.5% label
    flips vs the fp32 reference, measured on v5e — docs/performance.md); the
    parity backends must therefore request HIGH/HIGHEST matmul precision
    explicitly. Guard the default so a refactor cannot silently drop it."""
    import jax

    from helen_tpu.config import MODEL, WINDOW
    from helen_tpu.models.transducer import consensus_labels, init_params

    params = init_params(jax.random.PRNGKey(0), MODEL)
    x = jnp.zeros((8, 1000, 90), jnp.float32)
    for backend in ("xla", "pallas"):
        jaxpr = str(jax.make_jaxpr(
            lambda p, im: consensus_labels(p, im, WINDOW, MODEL, backend=backend)
        )(params, x))
        assert "Precision.HIGH" in jaxpr, backend
        if backend == "pallas":
            # the kernel's parity product is the manual bf16x3 hi/lo split
            assert "bfloat16" in jaxpr, "pallas kernel lost its bf16x3 split"


# ---------------------------------------------------------------------------
# generalized geometry: the reference parameterizes TransducerGRU by
# (gru_layers, hidden_size) and rebuilds models from those checkpoint fields
# (reference ModelHander.py:50-63); helen_tpu must run any such model
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def torch_model_2l():
    torch.manual_seed(11)
    return TorchTransducer(hidden=64, gru_layers=2)


@pytest.fixture(scope="module")
def params_2l(torch_model_2l):
    sd = {k: v.detach().numpy() for k, v in torch_model_2l.state_dict().items()}
    return jax.tree_util.tree_map(jnp.asarray, params_from_torch_state_dict(sd))


def test_model_geometry_inference(params, params_2l):
    from helen_tpu.models.transducer import model_geometry

    g1 = model_geometry(params)
    assert (g1.hidden_size, g1.gru_layers, g1.input_features) == (128, 1, 90)
    g2 = model_geometry(params_2l)
    assert (g2.hidden_size, g2.gru_layers, g2.input_features) == (64, 2, 90)
    assert (g2.num_base_classes, g2.num_rle_classes) == (5, 11)


def test_stacked_forward_parity(torch_model_2l, params_2l, rng):
    x = rng.standard_normal((3, 100, 90)).astype(np.float32)
    h = rng.standard_normal((3, 4, 64)).astype(np.float32)  # (B, 2L, H)
    with torch.no_grad():
        tb, tr, th = torch_model_2l(torch.from_numpy(x), torch.from_numpy(h))
    jb, jr, jh = forward(params_2l, jnp.asarray(x), jnp.asarray(h), precision=HIGH)
    np.testing.assert_allclose(np.asarray(jb), tb.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jr), tr.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), atol=2e-5, rtol=1e-4)


def test_stacked_consensus_vote_parity(torch_model_2l, params_2l, rng):
    images = rng.integers(0, 40, size=(2, 1000, 90)).astype(np.float32)
    tb_probs, tr_probs, tb_lab, tr_lab = reference_consensus(torch_model_2l, images)
    jb_probs, jr_probs = jax.jit(
        lambda p, im: consensus_probs(p, im, WINDOW, precision=HIGH)
    )(params_2l, jnp.asarray(images))
    np.testing.assert_allclose(np.asarray(jb_probs), tb_probs, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jr_probs), tr_probs, atol=1e-4, rtol=1e-3)
    jb_lab, jr_lab = consensus_labels(params_2l, jnp.asarray(images), precision=HIGH)
    assert (np.asarray(jb_lab) == tb_lab).all()
    assert (np.asarray(jr_lab) == tr_lab).all()


def test_stacked_torch_roundtrip(params_2l):
    sd = export_torch_state_dict(params_2l)
    assert "gru_encoder.weight_ih_l1" in sd
    assert "gru_decoder.weight_hh_l1_reverse" in sd
    params2 = params_from_torch_state_dict(sd)
    key = lambda kv: str(kv[0])
    for (k1, a), (k2, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(params_2l), key=key),
        sorted(jax.tree_util.tree_leaves_with_path(params2), key=key),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stacked_init_params_matches_torch_shapes(torch_model_2l):
    import dataclasses

    from helen_tpu.io.checkpoint import export_torch_state_dict as exp

    cfg = dataclasses.replace(MODEL, hidden_size=64, gru_layers=2)
    p = init_params(jax.random.PRNGKey(0), cfg)
    ours = {k: v.shape for k, v in exp(p).items()}
    theirs = {k: tuple(v.shape) for k, v in torch_model_2l.state_dict().items()}
    assert ours == theirs


def test_non_kernel_geometry_falls_back_to_xla(params_2l, caplog):
    """Pallas kernels are compiled for hidden 128; other geometries must
    resolve to the lax.scan backend instead of failing at lowering."""
    from helen_tpu.models.transducer import resolve_backend
    from helen_tpu.obs import get_logger

    log = get_logger("test")
    assert resolve_backend("xla", "infer", log, params=params_2l) == "xla"
    # on CPU hosts pallas already falls back; exercise the geometry check
    # directly via the resolved-path branch
    p128 = init_params(jax.random.PRNGKey(0))
    import jax as _jax
    on_tpu = _jax.local_devices()[0].platform in ("tpu", "axon")
    if on_tpu:
        assert resolve_backend("pallas", "infer", log, params=params_2l) == "xla"
        assert resolve_backend("pallas", "infer", log, params=p128) == "pallas"
