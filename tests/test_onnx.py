"""ONNX export tests: the hand-serialized ModelProto (io/onnx_export.py)
must decode back structurally, and its numpy evaluation must match BOTH the
jax transducer forward and the torch replica of the reference model — the
evaluator implements the ONNX GRU spec (gate order [z, r, h]) independently
of the exporter's [r, z, n] reordering, so either side mis-transcribing the
layout fails these tests.

Reference interface matched: predict_cpu.py:224-239 (input_image /
input_hidden -> output_pred / output_rle / output_hidden, raw logits)."""
import dataclasses

import jax
import numpy as np
import pytest
torch = pytest.importorskip("torch")

from helen_tpu.config import MODEL, WINDOW
from helen_tpu.io.checkpoint import params_from_torch_state_dict
from helen_tpu.io.onnx_export import build_onnx, export_onnx, parse_onnx, run_onnx
from helen_tpu.models.transducer import forward, init_params

from tests.torch_reference import TorchTransducer


def _params(hidden=64, layers=1, seed=0):
    cfg = dataclasses.replace(MODEL, hidden_size=hidden, gru_layers=layers)
    return init_params(jax.random.PRNGKey(seed), cfg)


def test_parse_roundtrip_structure():
    params = _params()
    model = parse_onnx(build_onnx(params))
    assert model["inputs"] == ["input_image", "input_hidden"]
    assert model["outputs"] == ["output_pred", "output_rle", "output_hidden"]
    ops = [n["op"] for n in model["nodes"]]
    assert ops.count("GRU") == 2  # encoder + decoder (1 layer each)
    gru = next(n for n in model["nodes"] if n["op"] == "GRU")
    assert gru["attrs"]["direction"] == "bidirectional"
    assert int(gru["attrs"]["linear_before_reset"]) == 1
    assert int(gru["attrs"]["hidden_size"]) == 64
    # initializers carry the ONNX (2, 3H, in) stacked-direction layout
    w = model["inits"]["encoder0_W"]
    assert w.shape == (2, 3 * 64, MODEL.input_features)


@pytest.mark.parametrize("hidden,layers", [(64, 1), (48, 2)])
def test_onnx_matches_jax_forward(hidden, layers):
    params = _params(hidden, layers, seed=1)
    data = build_onnx(params, seq_len=20)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 20, MODEL.input_features)).astype(np.float32)
    hid = rng.standard_normal((3, 2 * layers, hidden)).astype(np.float32)
    got = run_onnx(data, {"input_image": x, "input_hidden": hid})
    import jax.numpy as jnp
    from jax.lax import Precision

    base, rle, hout = forward(params, jnp.asarray(x), jnp.asarray(hid),
                              precision=Precision.HIGHEST)
    np.testing.assert_allclose(got["output_pred"], np.asarray(base), atol=1e-4)
    np.testing.assert_allclose(got["output_rle"], np.asarray(rle), atol=1e-4)
    np.testing.assert_allclose(got["output_hidden"], np.asarray(hout), atol=1e-4)


@pytest.mark.parametrize("hidden,layers", [(32, 1), (32, 2)])
def test_onnx_matches_torch_model(hidden, layers):
    """Export a model that originated as TORCH weights and check the ONNX
    evaluation against torch's own nn.GRU forward — validates the exporter
    against the engine the reference actually runs, not just our jax port."""
    torch.manual_seed(7)
    model = TorchTransducer(hidden=hidden, gru_layers=layers)
    model.eval()
    params = params_from_torch_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}
    )
    data = build_onnx(params, seq_len=12)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 12, MODEL.input_features)).astype(np.float32)
    hid = rng.standard_normal((2, 2 * layers, hidden)).astype(np.float32)
    got = run_onnx(data, {"input_image": x, "input_hidden": hid})
    with torch.no_grad():
        base, rle, hout = model(torch.from_numpy(x), torch.from_numpy(hid))
    np.testing.assert_allclose(got["output_pred"], base.numpy(), atol=1e-4)
    np.testing.assert_allclose(got["output_rle"], rle.numpy(), atol=1e-4)
    np.testing.assert_allclose(got["output_hidden"], hout.numpy(), atol=1e-4)


def test_export_onnx_self_verify(tmp_path):
    """export_onnx(verify=True) writes the file only after the parsed bytes
    reproduce the jax forward; default seq_len is the inference window."""
    params = _params(hidden=32)
    path = export_onnx(params, str(tmp_path / "m.onnx"))
    model = parse_onnx(open(path, "rb").read())
    # static seq dim = window size; batch dim is the dynamic "batch_size"
    assert model["inputs"] == ["input_image", "input_hidden"]
    assert WINDOW.window == 100  # interface contract baked into export


def test_onnxruntime_cross_check(tmp_path):
    """Exported bytes must execute identically under a REAL ONNX runtime —
    the engine the reference's CPU path actually runs
    (predict_cpu.py:57-64,116-121) — not only our independent numpy
    evaluator. Skips where onnxruntime isn't installed; anywhere it is,
    this closes the interop claim end-to-end: onnxruntime session ==
    run_onnx == jax forward on the same input_image/input_hidden feeds."""
    # tracked evidence gap #3 (docs/evidence_gaps.md) where the wheel is absent
    ort = pytest.importorskip("onnxruntime")
    params = _params(hidden=48, layers=2, seed=3)
    path = export_onnx(params, str(tmp_path / "m.onnx"), seq_len=20)
    with open(path, "rb") as f:
        data = f.read()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, 20, MODEL.input_features)).astype(np.float32)
    hid = rng.standard_normal((3, 4, 48)).astype(np.float32)
    feeds = {"input_image": x, "input_hidden": hid}

    sess = ort.InferenceSession(path, providers=["CPUExecutionProvider"])
    assert [i.name for i in sess.get_inputs()] == ["input_image",
                                                   "input_hidden"]
    names = [o.name for o in sess.get_outputs()]
    assert names == ["output_pred", "output_rle", "output_hidden"]
    got_ort = dict(zip(names, sess.run(None, feeds)))

    got_np = run_onnx(data, feeds)
    import jax.numpy as jnp
    from jax.lax import Precision

    base, rle, hout = forward(params, jnp.asarray(x), jnp.asarray(hid),
                              precision=Precision.HIGHEST)
    want = {"output_pred": np.asarray(base), "output_rle": np.asarray(rle),
            "output_hidden": np.asarray(hout)}
    for name in names:
        np.testing.assert_allclose(got_ort[name], got_np[name], atol=1e-4,
                                   err_msg=f"onnxruntime vs evaluator: {name}")
        np.testing.assert_allclose(got_ort[name], want[name], atol=1e-4,
                                   err_msg=f"onnxruntime vs jax: {name}")


def test_convert_cli_exports_onnx(tmp_path):
    from helen_tpu.cli import main
    from helen_tpu.io.checkpoint import save_checkpoint

    params = _params(hidden=32)
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, params, meta={"hidden_size": 32, "gru_layers": 1})
    out = str(tmp_path / "m.onnx")
    assert main(["convert", "-i", ckpt, "-o", out]) == 0
    model = parse_onnx(open(out, "rb").read())
    assert model["outputs"] == ["output_pred", "output_rle", "output_hidden"]
