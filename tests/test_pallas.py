"""Fused Pallas GRU kernel tests (interpret mode on CPU; the real-TPU path
is exercised by bench.py and was audited on hardware against a torch-CPU
replay: full-fp32 precision gives max vote error ~1e-5, ~2 near-tie label
flips per 64k — docs/performance.md)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helen_tpu.models.gru import bigru_apply, bigru_init
from helen_tpu.ops.gru_pallas import _pick_block, bigru_apply_fused
from helen_tpu.ops.gru_pallas_train import bigru_apply_fused_train


def test_pick_block():
    assert _pick_block(64) == 64
    assert _pick_block(1024) == 256
    assert _pick_block(512) == 256
    assert _pick_block(320) == 160
    # the batch block scales down with the hidden size to hold the kernel's
    # VMEM residency roughly constant across geometries
    assert _pick_block(1024, h=256) == 128
    assert _pick_block(1024, h=512) == 64
    assert _pick_block(48, h=256) == 48


@pytest.mark.parametrize(
    "T,B,D,H", [(8, 16, 90, 128), (5, 8, 256, 128), (5, 8, 90, 256),
                (5, 8, 90, 160)]
)
def test_fused_matches_scan_interpret(T, B, D, H):
    """Infer-kernel parity vs lax.scan, incl. a non-flagship hidden size
    (H=256) and an OFF-lane-grid one (H=160, served zero-padded to 256
    with outputs sliced back — r5)."""
    params = jax.tree_util.tree_map(
        jnp.asarray, bigru_init(jax.random.PRNGKey(0), D, H)
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, B, D)), dtype=jnp.float32)
    h0f = jnp.asarray(rng.standard_normal((B, H)), dtype=jnp.float32)
    h0b = jnp.asarray(rng.standard_normal((B, H)), dtype=jnp.float32)
    ref_out, ref_hf, ref_hb = bigru_apply(params, x, h0f, h0b)
    got_out, got_hf, got_hb = bigru_apply_fused(
        params, x, h0f, h0b, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_hf), np.asarray(ref_hf), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_hb), np.asarray(ref_hb), atol=1e-5)


@pytest.mark.parametrize(
    "T,B,D,H", [(8, 16, 90, 128), (5, 8, 256, 128), (5, 8, 90, 256),
                (5, 8, 90, 160)]
)
def test_inproj_single_matches_scan_interpret(T, B, D, H):
    """In-kernel-projection single-stream kernel vs lax.scan (f32 input:
    full in-kernel bf16x3 projection), incl. a padded feature dim (90->128),
    a non-flagship hidden size, and an off-lane-grid H=160 (zero-padded)."""
    from helen_tpu.ops.gru_pallas import bigru_apply_inproj

    params = jax.tree_util.tree_map(
        jnp.asarray, bigru_init(jax.random.PRNGKey(7), D, H)
    )
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((T, B, D)), dtype=jnp.float32)
    h0f = jnp.asarray(rng.standard_normal((B, H)), dtype=jnp.float32)
    h0b = jnp.asarray(rng.standard_normal((B, H)), dtype=jnp.float32)
    ref_out, ref_hf, ref_hb = bigru_apply(params, x, h0f, h0b)
    of, ob, hf, hb = bigru_apply_inproj(params, x, h0f, h0b, interpret=True)
    got_out = jnp.concatenate([of, ob], axis=-1)
    # bf16x3 error grows ~sqrt(K) with the contraction size (K up to 256
    # here vs 128 for the classic kernel's w_hh product): 2e-5, not 1e-5
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(ref_hf), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hb), np.asarray(ref_hb), atol=2e-5)


def test_split_bf16x2_residual_survives_jit():
    """The hi/lo split must be computed with Veltkamp splitting (mul/sub),
    NOT a bf16 round-trip: XLA's excess-precision pass elides the
    bf16->f32 convert pair and rewrites ``w - f32(bf16(w))`` to zero
    (observed on the live v5e stack 2026-08-20 — every hi/lo product
    silently degraded to one bf16 pass, ~0.3% label flips). Pin that the
    in-jit residual is nonzero, that hi is the round-to-nearest bf16, and
    that hi + lo reconstructs w to ~2**-16 relative."""
    from helen_tpu.ops.gru_pallas import _split_bf16x2

    rng = np.random.default_rng(13)
    w = jnp.asarray((rng.standard_normal((64, 128)) * 0.1).astype(np.float32))
    hi, lo = jax.jit(_split_bf16x2)(w)
    assert hi.dtype == jnp.bfloat16 and lo.dtype == jnp.bfloat16
    lo_np = np.asarray(lo, dtype=np.float32)
    assert (lo_np != 0).mean() > 0.9, "residual was elided to zero"
    # hi must equal the round-to-nearest-even bf16 (host-computed, outside
    # any compiler's reach)
    hi_ref = np.asarray(jnp.asarray(np.asarray(w)).astype(jnp.bfloat16))
    np.testing.assert_array_equal(np.asarray(hi), hi_ref)
    recon = np.asarray(hi, np.float32) + lo_np
    # residual of the 16-bit split: ~2**-16 relative of max|w| (~0.4)
    np.testing.assert_allclose(recon, np.asarray(w), rtol=0, atol=8e-6)
    # exactly-representable values (uint8 counts) split losslessly: lo == 0
    xi = jnp.asarray(rng.integers(0, 256, size=(32, 32)).astype(np.float32))
    hi_i, lo_i = jax.jit(_split_bf16x2)(xi)
    assert not np.asarray(lo_i, np.float32).any()
    np.testing.assert_array_equal(np.asarray(hi_i, np.float32), np.asarray(xi))


def test_inproj_exact_uint8_two_pass_matches_three_pass_bitwise():
    """For uint8-valued inputs the exact-bf16 2-pass layer-0 projection must
    be BIT-IDENTICAL to the full bf16x3 product (TPU HIGH's construction:
    x_hi@w_hi + x_lo@w_hi + x_hi@w_lo summed in f32): x_lo is exactly zero
    for bf16-representable values, f32 addition of exact zero is the
    identity, and f32 addition is commutative. (That the TPU's own
    Precision.HIGH equals the explicit 3-pass construction is a hardware
    property validated on the live chip — tools/parity_flips.py; CPU's HIGH
    is true fp32, so the XLA-HIGH comparison cannot run here.)"""
    from helen_tpu.ops.gru_pallas import _split_bf16x2

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.integers(0, 256, size=(64, 90)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((90, 384)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((384,)).astype(np.float32))
    w_hi, w_lo = _split_bf16x2(w)
    x_hi, x_lo = _split_bf16x2(x)
    assert not np.asarray(x_lo).any()  # uint8 values are exact in bf16
    f32 = jnp.float32
    three_pass = (
        jnp.dot(x_hi, w_hi, preferred_element_type=f32)
        + jnp.dot(x_lo, w_hi, preferred_element_type=f32)
        + jnp.dot(x_hi, w_lo, preferred_element_type=f32)
    ) + b
    xb = x.astype(jnp.bfloat16)  # exact for integer values 0..255
    two_pass = (
        jnp.dot(xb, w_hi, preferred_element_type=f32)
        + jnp.dot(xb, w_lo, preferred_element_type=f32)
    ) + b
    np.testing.assert_array_equal(np.asarray(three_pass), np.asarray(two_pass))


@pytest.mark.parametrize("H", [128, 160])
def test_inproj_pair_matches_scan_interpret(H):
    """Pair-stream kernel (decoder / stacked layers): consuming the previous
    layer's (out_f, out_b) halves must match the scan bi-GRU on their
    concatenation — incl. off-lane-grid H=160, where the pair path pads
    each input half's weight rows separately (r5)."""
    from helen_tpu.ops.gru_pallas import bigru_apply_inproj

    T, B = 6, 8
    params = jax.tree_util.tree_map(
        jnp.asarray, bigru_init(jax.random.PRNGKey(8), 2 * H, H)
    )
    rng = np.random.default_rng(8)
    xa = jnp.asarray(rng.standard_normal((T, B, H)), dtype=jnp.float32)
    xb = jnp.asarray(rng.standard_normal((T, B, H)), dtype=jnp.float32)
    h0f = jnp.asarray(rng.standard_normal((B, H)), dtype=jnp.float32)
    h0b = jnp.asarray(rng.standard_normal((B, H)), dtype=jnp.float32)
    ref_out, ref_hf, ref_hb = bigru_apply(
        params, jnp.concatenate([xa, xb], axis=-1), h0f, h0b)
    of, ob, hf, hb = bigru_apply_inproj(
        params, (xa, xb), h0f, h0b, interpret=True)
    got_out = jnp.concatenate([of, ob], axis=-1)
    # bf16x3 error grows ~sqrt(K) with the contraction size (K up to 256
    # here vs 128 for the classic kernel's w_hh product): 2e-5, not 1e-5
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(ref_hf), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hb), np.asarray(ref_hb), atol=2e-5)


def test_inproj_fast_mode_close():
    from helen_tpu.ops.gru_pallas import bigru_apply_inproj

    params = jax.tree_util.tree_map(
        jnp.asarray, bigru_init(jax.random.PRNGKey(9), 90, 128)
    )
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((6, 8, 90)), dtype=jnp.float32)
    h0 = jnp.zeros((8, 128))
    ref_out, _, _ = bigru_apply(params, x, h0, h0)
    of, ob, _, _ = bigru_apply_inproj(
        params, x, h0, h0, fast=True, interpret=True)
    fast_out = jnp.concatenate([of, ob], axis=-1)
    np.testing.assert_allclose(np.asarray(fast_out), np.asarray(ref_out), atol=0.05)


def test_inproj_vmem_gate():
    """The in-projection kernels carry more VMEM (the (2H, 3H) input-weight
    blocks): past that budget forward() falls back to the classic xp-stream
    kernel, which still serves before xla takes over."""
    from helen_tpu.ops.gru_pallas import (
        infer_fits_vmem, inproj_fits_vmem, inproj_vmem_bytes)

    floor = 16 * 1024 * 1024
    big = 128 * 1024 * 1024
    assert inproj_vmem_bytes(128) < inproj_vmem_bytes(512)
    assert inproj_fits_vmem(128, floor)
    # H=512 at the floor: inproj's 18.9 MB of weights exceed it, but the
    # classic kernel still fits — the ladder degrades gracefully
    assert not inproj_fits_vmem(512, floor)
    assert infer_fits_vmem(512, floor)
    assert inproj_fits_vmem(512, big)


@pytest.mark.parametrize(
    "T,B,D,H", [(7, 16, 90, 128), (4, 8, 256, 128), (4, 8, 90, 256)]
)
def test_train_kernel_grad_matches_scan_interpret(T, B, D, H):
    """Value AND gradient parity of the fused train kernel (custom VJP) vs the
    lax.scan bi-GRU, in interpret mode: d/d{params, x, h0} of a loss that
    exercises every output cotangent (outputs + both final hiddens). Includes
    a non-flagship hidden size (H=256): kernels serve any lane-width
    multiple."""
    params = jax.tree_util.tree_map(
        jnp.asarray, bigru_init(jax.random.PRNGKey(2), D, H)
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((T, B, D)), dtype=jnp.float32)
    h0f = jnp.asarray(rng.standard_normal((B, H)), dtype=jnp.float32)
    h0b = jnp.asarray(rng.standard_normal((B, H)), dtype=jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((T, B, 2 * H)), dtype=jnp.float32)
    w_hf = jnp.asarray(rng.standard_normal((B, H)), dtype=jnp.float32)
    w_hb = jnp.asarray(rng.standard_normal((B, H)), dtype=jnp.float32)

    def loss(apply_fn, p, xx, hf0, hb0):
        out, hf, hb = apply_fn(p, xx, hf0, hb0)
        return (
            jnp.sum(out * w_out) + jnp.sum(hf * w_hf) + jnp.sum(hb * w_hb)
        ) / (T * B)

    ref_val, ref_grads = jax.value_and_grad(
        lambda *a: loss(bigru_apply, *a), argnums=(0, 1, 2, 3)
    )(params, x, h0f, h0b)
    fused = lambda p, xx, hf0, hb0: bigru_apply_fused_train(
        p, xx, hf0, hb0, interpret=True
    )
    got_val, got_grads = jax.value_and_grad(
        lambda *a: loss(fused, *a), argnums=(0, 1, 2, 3)
    )(params, x, h0f, h0b)

    np.testing.assert_allclose(float(got_val), float(ref_val), rtol=1e-6)
    flat_ref, _ = jax.tree_util.tree_flatten(ref_grads)
    flat_got, tree_got = jax.tree_util.tree_flatten(got_grads)
    assert len(flat_ref) == len(flat_got)
    for g_ref, g_got in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-5
        )


def test_train_kernel_grad_multi_batch_block_interpret():
    """B=512 splits into two Bt=256 grid blocks: pins the dW/db VMEM
    accumulation across batch blocks (the (b==0)&(t==0) init vs accumulate
    guards in _bwd_kernel) — unit batches never exercise it."""
    params = jax.tree_util.tree_map(
        jnp.asarray, bigru_init(jax.random.PRNGKey(5), 90, 128)
    )
    rng = np.random.default_rng(6)
    T, B = 3, 512
    x = jnp.asarray(rng.standard_normal((T, B, 90)), dtype=jnp.float32)
    h0 = jnp.asarray(rng.standard_normal((B, 128)), dtype=jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((T, B, 256)), dtype=jnp.float32)

    def loss(apply_fn, p):
        out, hf, hb = apply_fn(p, x, h0, h0)
        return (jnp.sum(out * w_out) + hf.sum() + hb.sum()) / (T * B)

    ref_grads = jax.grad(lambda p: loss(bigru_apply, p))(params)
    got_grads = jax.grad(
        lambda p: loss(
            lambda *a: bigru_apply_fused_train(*a, interpret=True), p
        )
    )(params)
    for g_ref, g_got in zip(
        jax.tree_util.tree_leaves(ref_grads), jax.tree_util.tree_leaves(got_grads)
    ):
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-5
        )


def test_resolve_backend_validation():
    from helen_tpu.models.transducer import resolve_backend

    # on CPU (conftest forces it) auto resolves to xla for both surfaces
    assert resolve_backend(None, "infer") == "xla"
    assert resolve_backend("auto", "train") == "xla"
    # explicit Pallas backends fall back to xla off TPU
    assert resolve_backend("pallas", "infer") == "xla"
    assert resolve_backend("pallas_train", "train") == "xla"
    # cross-surface backends are rejected, not silently run
    with pytest.raises(ValueError):
        resolve_backend("pallas_train", "infer")
    with pytest.raises(ValueError):
        resolve_backend("pallas", "train")


def test_resolve_backend_geometry_gate(monkeypatch):
    """On TPU, the INFERENCE Pallas backends serve any hidden size — off-
    lane-grid H runs zero-padded (r5); the TRAIN kernels still require
    H % 128 == 0 and fall back to xla otherwise (resolve_backend gates on
    the model geometry recovered from the params pytree)."""
    import dataclasses

    from helen_tpu.config import MODEL
    from helen_tpu.models.transducer import init_params, resolve_backend

    class _FakeTpu:
        platform = "tpu"

    monkeypatch.setattr(jax, "local_devices", lambda: [_FakeTpu()])
    p128 = init_params(jax.random.PRNGKey(0), MODEL)
    p256 = init_params(
        jax.random.PRNGKey(0), dataclasses.replace(MODEL, hidden_size=256)
    )
    p100 = init_params(
        jax.random.PRNGKey(0), dataclasses.replace(MODEL, hidden_size=100)
    )
    assert resolve_backend("pallas", "infer", params=p128) == "pallas"
    assert resolve_backend("pallas", "infer", params=p256) == "pallas"
    assert resolve_backend("pallas_train", "train", params=p256) == "pallas_train"
    # inference: lane-padded serving (estimated at the padded width).
    # H=100 pads to 128 at 78% utilization -> padded pallas wins
    assert resolve_backend("pallas", "infer", params=p100) == "pallas"
    # H=160 pads to 256 at 62.5% utilization: the measured v5e curve has
    # the fp32(HIGH) scan FASTER than the padded parity kernel there
    # (170K vs 144K w/s), so parity dispatches to xla — while the fast
    # tier pads at any utilization (304K vs the 170K parity-grade scan)
    p160 = init_params(
        jax.random.PRNGKey(0), dataclasses.replace(MODEL, hidden_size=160)
    )
    assert resolve_backend("pallas", "infer", params=p160) == "xla"
    assert resolve_backend("pallas_fast", "infer", params=p160) == "pallas_fast"
    # train: the backward kernels are not padded — still lane-gated
    assert resolve_backend("pallas_train", "train", params=p100) == "xla"


def test_resolve_backend_vmem_gate(monkeypatch):
    """H % 128 == 0 is necessary but not sufficient: the kernels hold
    O(H^2) grid-constant weight blocks in VMEM (24*H^2 bytes parity infer,
    72*H^2 fp32 for the train backward). Geometries whose residency
    estimate exceeds the per-core budget must fall back to xla instead of
    dying with a Mosaic resource-exhausted compile error mid-job."""
    import dataclasses

    from helen_tpu.config import MODEL
    from helen_tpu.models.transducer import init_params, resolve_backend
    from helen_tpu.ops.gru_pallas import (
        infer_fits_vmem,
        infer_vmem_bytes,
        vmem_budget_bytes,
    )
    from helen_tpu.ops.gru_pallas_train import train_fits_vmem, train_vmem_bytes

    class _FakeTpu:
        platform = "tpu"  # no device_kind -> the 16 MiB floor budget

    class _FakeV5e:
        platform = "tpu"
        device_kind = "TPU v5 lite"

    monkeypatch.setattr(jax, "local_devices", lambda: [_FakeTpu()])
    floor = 16 * 1024 * 1024
    assert vmem_budget_bytes() == floor
    assert vmem_budget_bytes(_FakeV5e()) == 128 * 1024 * 1024
    # estimator sanity: weight blocks alone dominate at large H
    assert infer_vmem_bytes(1024) > 24 * 1024 * 1024  # 25 MB of weights
    assert train_vmem_bytes(512) > 72 * 512 * 512     # 18.9 MB of weights
    # at the floor budget (v4-class / unknown chips)
    assert infer_fits_vmem(128, floor) and infer_fits_vmem(512, floor)
    assert not infer_fits_vmem(1024, floor)
    assert train_fits_vmem(128, floor) and train_fits_vmem(256, floor)
    assert not train_fits_vmem(512, floor)
    # a 128 MiB generation admits what the floor rejects (H=1024 infer was
    # validated live on the v5e: ~27 MiB resident, compiles and runs)
    assert infer_fits_vmem(1024, 128 * 1024 * 1024)
    assert train_fits_vmem(512, 128 * 1024 * 1024)
    # ...but the train kernels hit a measured Mosaic resource wall well
    # below nominal VMEM (H=640 fails on the live v5e): the empirical cap
    # must reject it regardless of chip budget
    assert not train_fits_vmem(640, 128 * 1024 * 1024)

    p_big = init_params(
        jax.random.PRNGKey(0), dataclasses.replace(MODEL, hidden_size=1024)
    )
    # the fake device has no device_kind -> floor budget -> fall back
    assert resolve_backend("pallas", "infer", params=p_big) == "xla"
    assert resolve_backend("pallas_fast", "infer", params=p_big) == "xla"
    assert resolve_backend("pallas_train", "train", params=p_big) == "xla"
    # the train budget is tighter than infer: at the floor, H=512 trains on
    # xla but infers on the fused kernel
    p512 = init_params(
        jax.random.PRNGKey(0), dataclasses.replace(MODEL, hidden_size=512)
    )
    assert resolve_backend("pallas", "infer", params=p512) == "pallas"
    assert resolve_backend("pallas_train", "train", params=p512) == "xla"
    # on a 128 MiB chip both serve the fused kernels
    monkeypatch.setattr(jax, "local_devices", lambda: [_FakeV5e()])
    assert resolve_backend("pallas", "infer", params=p_big) == "pallas"
    assert resolve_backend("pallas_train", "train", params=p512) == "pallas_train"


def test_train_kernel_forward_matches_scan_interpret():
    params = jax.tree_util.tree_map(
        jnp.asarray, bigru_init(jax.random.PRNGKey(3), 90, 128)
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((9, 8, 90)), dtype=jnp.float32)
    h0 = jnp.asarray(rng.standard_normal((8, 128)), dtype=jnp.float32)
    ref_out, ref_hf, ref_hb = bigru_apply(params, x, h0, h0)
    got_out, got_hf, got_hb = bigru_apply_fused_train(
        params, x, h0, h0, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_hf), np.asarray(ref_hf), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_hb), np.asarray(ref_hb), atol=1e-5)


def test_fused_fast_mode_close(rng):
    params = jax.tree_util.tree_map(
        jnp.asarray, bigru_init(jax.random.PRNGKey(1), 90, 128)
    )
    x = jnp.asarray(rng.standard_normal((6, 8, 90)), dtype=jnp.float32)
    h0 = jnp.zeros((8, 128))
    ref_out, _, _ = bigru_apply(params, x, h0, h0)
    fast_out, _, _ = bigru_apply_fused(params, x, h0, h0, interpret=True, fast=True)
    np.testing.assert_allclose(np.asarray(fast_out), np.asarray(ref_out), atol=0.05)


def test_stacked_transducer_train_kernel_grads_interpret():
    """2-layer stacks run the fused train kernels per layer; gradients must
    match the lax.scan path (exact in interpret mode up to f32 roundoff)."""
    import dataclasses

    from helen_tpu.config import MODEL
    from helen_tpu.models.gru import bigru_apply as scan_bigru
    from helen_tpu.models.transducer import _stack_layers, init_params

    cfg = dataclasses.replace(MODEL, gru_layers=2)
    params = init_params(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 100, 90)), jnp.float32)
    xt = jnp.swapaxes(x, 0, 1)
    h = jnp.zeros((4, 4, 128))

    def run(params, bigru):
        out = xt
        finals = []
        for li, lp in enumerate(_stack_layers(params["encoder"])):
            out, hf, hb = bigru(lp, out, h[:, 2 * li], h[:, 2 * li + 1])
            finals.append((hf, hb))
        for li, lp in enumerate(_stack_layers(params["decoder"])):
            out, hf, hb = bigru(lp, out, finals[li][0], finals[li][1])
        return out.sum() + hf.sum() + hb.sum()

    fused = lambda p: run(
        p, lambda *a: bigru_apply_fused_train(*a, interpret=True)
    )
    scan = lambda p: run(p, lambda *a: scan_bigru(*a))
    gf = jax.grad(fused)(params)
    gs = jax.grad(scan)(params)
    key = lambda kv: str(kv[0])
    for (k, a), (_, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gf), key=key),
        sorted(jax.tree_util.tree_leaves_with_path(gs), key=key),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3, err_msg=str(k))


def test_engaged_kernel_matches_dispatch_predicate():
    """engaged_kernel must report exactly what forward dispatches: both go
    through _inproj_route (a r4 self-review finding — a hand-duplicated
    predicate let bench/validation records diverge from reality)."""
    import jax
    from jax import lax

    from helen_tpu.config import ModelConfig
    from helen_tpu.models.transducer import (
        _inproj_route,
        engaged_kernel,
        init_params,
        model_geometry,
    )

    p = init_params(jax.random.PRNGKey(0))
    geom = model_geometry(p)
    assert _inproj_route(geom, None)
    assert engaged_kernel(p, "pallas") == "pallas_inproj"
    assert engaged_kernel(p, "pallas_fast") == "pallas_fast_inproj"
    assert engaged_kernel(p, "xla") == "xla"
    # an explicit precision ABOVE HIGH skips the inproj route (its GRU
    # projections always run bf16x3 == HIGH) — ADVICE r3
    assert not _inproj_route(geom, lax.Precision.HIGHEST)
    assert engaged_kernel(p, "pallas",
                          precision=lax.Precision.HIGHEST) == "pallas_xp"
    # wide-input geometry (D > 2H): the input-width-aware VMEM estimate
    # must gate BOTH the dispatch and the report identically
    from helen_tpu.ops.gru_pallas import inproj_fits_vmem

    wide = ModelConfig(input_features=4096)
    assert _inproj_route(wide, None) == inproj_fits_vmem(
        wide.hidden_size, d=wide.input_features)
    with pytest.raises(ValueError):
        engaged_kernel(p, "auto")


@pytest.mark.parametrize("fast", [False, True])
def test_fused_encdec_bit_identical_to_chained(fast):
    """The fused encoder+decoder window kernel (r5) must be BIT-IDENTICAL
    to the chained inproj kernels — same ops on the same values; only the
    stack boundary moves from HBM to VMEM scratch."""
    from helen_tpu.ops.gru_pallas import (
        bigru_apply_inproj,
        transducer_apply_fused_encdec,
    )

    T, B, D, H = 7, 8, 90, 128
    enc = jax.tree_util.tree_map(
        jnp.asarray, bigru_init(jax.random.PRNGKey(10), D, H))
    dec = jax.tree_util.tree_map(
        jnp.asarray, bigru_init(jax.random.PRNGKey(11), 2 * H, H))
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.integers(0, 40, size=(T, B, D)), dtype=jnp.uint8)
    h0f = jnp.asarray(rng.standard_normal((B, H)), dtype=jnp.float32)
    h0b = jnp.asarray(rng.standard_normal((B, H)), dtype=jnp.float32)

    xin = x if not fast else x  # uint8 either way; exact_input drives cast
    eof, eob, ehf, ehb = bigru_apply_inproj(
        enc, xin, h0f, h0b, fast=fast, exact_input=True, interpret=True)
    dof, dob, dhf, dhb = bigru_apply_inproj(
        dec, (eof, eob), ehf, ehb, fast=fast, interpret=True)
    fof, fob, fhf, fhb = transducer_apply_fused_encdec(
        enc, dec, xin, h0f, h0b, fast=fast, exact_input=True,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(fof), np.asarray(dof))
    np.testing.assert_array_equal(np.asarray(fob), np.asarray(dob))
    np.testing.assert_array_equal(np.asarray(fhf), np.asarray(dhf))
    np.testing.assert_array_equal(np.asarray(fhb), np.asarray(dhb))


def test_fused_encdec_vmem_estimator():
    """The refuted-but-kept fused kernel's VMEM estimator: scratch scales
    with T*Bt*H, the block target shrinks until the budget fits, and the
    fits gate holds at the smallest block."""
    from helen_tpu.ops.gru_pallas import (
        _pick_block_fused_target,
        fused_encdec_fits_vmem,
        fused_encdec_vmem_bytes,
    )

    small = fused_encdec_vmem_bytes(128, bt=8, d=90, t=100)
    big = fused_encdec_vmem_bytes(128, bt=256, d=90, t=100)
    assert big > small > 0
    # 16 MiB floor budget forces a small block; 128 MiB admits 256
    assert _pick_block_fused_target(128, 90, 100,
                                    budget=16 * 1024 * 1024) <= 64
    assert _pick_block_fused_target(128, 90, 100,
                                    budget=128 * 1024 * 1024) == 256
    assert fused_encdec_fits_vmem(128, d=90, budget=16 * 1024 * 1024)
    assert not fused_encdec_fits_vmem(2048, d=90, budget=16 * 1024 * 1024)
