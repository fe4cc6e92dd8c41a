"""Pallas TPU kernels: fused bidirectional GRU window for TRAINING.

The TBPTT train step (reference train.py:174-212 — 19 windows, each a full
forward+backward+Adam update) spends most of its time in the GRU recurrences.
Under lax.scan each of the ~7,600 recurrence steps per batch (100 steps x
2 directions x 2 layers x 19 windows) is its own XLA loop iteration with HBM
round-trips for the hidden state; this module runs each window's recurrence —
forward AND backward — as one kernel launch per direction pair, exactly like
the inference kernel (ops/gru_pallas.py) but differentiable:

  * the forward kernel is the plain recurrence — it saves NOTHING beyond its
    ordinary outputs. The backward pass recomputes the gates: its inputs are
    streams that already exist — the pre-projections ``xp`` (the primal
    input) and the per-step previous hidden, which is just the forward
    output stream shifted one step (``h_prev[s] = out[s -/+ 1]``, with h0 at
    the window boundary). Recomputing r/z/n from the same inputs with the
    same ops reproduces the forward values EXACTLY, so this costs no
    gradient accuracy — and it halves the forward kernel's HBM write
    traffic, which measured as the binding resource (the kernels are
    stream-bandwidth-bound; docs/performance.md "Training throughput");
  * the backward kernel replays the window in reverse recurrence order with
    the hidden cotangent resident in VMEM, emitting the input-projection
    cotangent ``dxp`` per step AND accumulating the weight/bias cotangents
    (dW_hh += h_prev^T dhp, db_hh += sum dhp) in VMEM-resident output
    blocks across the whole grid — doing these as XLA einsums instead was
    measured to dominate backward-pass HBM traffic at large batch (they
    re-read streams and materialize dhp in HBM);
  * ``jax.custom_vjp`` stitches the two kernels into a drop-in
    differentiable bi-GRU window (``bigru_apply_fused_train``). Its
    residuals (xp, out, h0, weights) are all arrays the surrounding program
    keeps alive anyway — the VJP adds no activation memory at all.

Precision: training runs the TPU's DEFAULT matmul precision (bf16 operands,
f32 accumulation — docs/performance.md "Training throughput"); the in-kernel
``jnp.dot`` on f32 operands lowers to exactly that on Mosaic, so gradients
match the lax.scan training path to f32-roundoff (asserted in
tests/test_pallas.py grad-parity tests, exact in interpret mode).

2026-08-21: the IN-PROJECTION variants (_fwd_kernel_ip/_bwd_kernel_ip,
default when train_inproj_fits_vmem) apply the inference kernels' stream
redesign here: the raw (T, B, D<=2H) input streams in, the forward
projects in-kernel, the backward recomputes xp in-kernel and emits
per-direction dx streams plus VMEM-accumulated dW_ih/db_ih — the
(T, B, 3H) xp/dxp arrays (each written and re-read up to 3x per window by
the XLA projection chain) never exist. Measured on v5e: 125-130K -> 143K
train-windows/s at B=256, and the old large-batch falloff (95K at B=1024)
flattens to 134K — it WAS the xp/dxp bandwidth. The classic xp-stream
kernels below remain the fallback for geometries whose input-weight VMEM
class does not fit.

Backward recurrence (per direction; gate order [r, z, n], b_hh inside the
reset product — models/gru.py):

    h_t = (1-z) n + z h_prev,  n = tanh(x_n + r hp_n),  hp = h_prev W_hh + b_hh
    dh      = dout_t + dh_carry (+ dh_final at t = T-1)
    dz      = dh (h_prev - n);        dn = dh (1 - z)
    da      = dn (1 - n^2)            # pre-tanh
    dr      = da hp_n;                dhp_n = da r
    drpre   = dr r (1-r);             dzpre = dz z (1-z)
    dxp     = [drpre | dzpre | da]    # streamed out
    dhp     = [drpre | dzpre | dhp_n] # = dxp with the n block scaled by r
    dh_carry' = dh z + dhp W_hh^T
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from helen_tpu.ops.gru_pallas import (
    H,
    _VMEM_USABLE,
    _block_target,
    _pick_block,
    vmem_budget_bytes,
)


def train_vmem_bytes(h: int, bt: int = 0) -> int:
    """Worst-case VMEM residency of the TRAIN kernels — the backward pass
    dominates: per direction it holds w, wT (inputs) and the dw accumulator
    (output) grid-constant in fp32, i.e. 72*h^2 bytes of weight-class blocks
    alone, plus the double-buffered xp/h_prev/dout/dxp streams. Used by
    resolve_backend to reject geometries Mosaic could not fit."""
    bt = bt or _block_target(h)
    weights = (4 + 2) * 3 * h * h * 4        # w + wT in, dw out, per direction
    streams = (2 * 3 * h + 2 * h + 2 * h + 2 * 3 * h) * 2 * 4 * bt
    vectors = 8 * bt * h * 4                 # h0/dh/dh0 vecs + scratch
    return weights + streams + vectors


# Empirical cap for the TRAIN kernels, measured on the live v5e (128 MiB
# VMEM): H=512 (23 MiB estimate) compiles and runs, H=640 (32.8 MiB) fails
# in the Mosaic compile — the backward's grid-revisited dw accumulators hit
# a resource wall well below the chip's nominal VMEM. The infer kernel has
# no such cap (validated through H=1536, 56 MiB resident).
_TRAIN_VMEM_CAP = 32 * 1024 * 1024


def train_fits_vmem(h: int, budget: int = 0) -> bool:
    budget = min(budget or vmem_budget_bytes(), _TRAIN_VMEM_CAP)
    return train_vmem_bytes(h) <= int(budget * _VMEM_USABLE)


def _gates_train(h_prev, xp, w, b_hh):
    """Recurrence gates at DEFAULT matmul precision; returns hp_n too so the
    backward pass can reuse it."""
    H = h_prev.shape[1]  # static inside the kernel; any lane-width multiple
    hp = jnp.dot(h_prev, w, preferred_element_type=jnp.float32) + b_hh
    r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
    z = jax.nn.sigmoid(xp[:, H : 2 * H] + hp[:, H : 2 * H])
    hp_n = hp[:, 2 * H :]
    n = jnp.tanh(xp[:, 2 * H :] + r * hp_n)
    return r, z, n, hp_n


def _fwd_kernel(
    xp_f_ref, xp_b_ref, h0_f_ref, h0_b_ref,
    wf_ref, wb_ref, bh_f_ref, bh_b_ref,
    out_f_ref, out_b_ref, hf_ref, hb_ref,
    h_f, h_b,
    *, T: int,
):
    import jax.experimental.pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_f[:] = h0_f_ref[:]
        h_b[:] = h0_b_ref[:]

    hprev_f, hprev_b = h_f[:], h_b[:]
    r_f, z_f, n_f, _ = _gates_train(hprev_f, xp_f_ref[0], wf_ref[:], bh_f_ref[:])
    r_b, z_b, n_b, _ = _gates_train(hprev_b, xp_b_ref[0], wb_ref[:], bh_b_ref[:])
    hf_new = (1.0 - z_f) * n_f + z_f * hprev_f
    hb_new = (1.0 - z_b) * n_b + z_b * hprev_b
    h_f[:] = hf_new
    h_b[:] = hb_new
    out_f_ref[0] = hf_new
    out_b_ref[0] = hb_new

    @pl.when(t == T - 1)
    def _final():
        hf_ref[:] = hf_new
        hb_ref[:] = hb_new


def _bwd_dir(xp, h_prev, dout, dh_carry, w_ref, wT_ref, bh_ref):
    # recompute the gates from xp + h_prev — bit-identical to the forward
    r, z, n, hp_n = _gates_train(h_prev, xp, w_ref[:], bh_ref[:])
    dh = dout + dh_carry
    dz = dh * (h_prev - n)
    da = dh * (1.0 - z) * (1.0 - n * n)
    dr = da * hp_n
    drpre = dr * r * (1.0 - r)
    dzpre = dz * z * (1.0 - z)
    dxp = jnp.concatenate([drpre, dzpre, da], axis=1)
    dhp = jnp.concatenate([drpre, dzpre, da * r], axis=1)
    dh_next = dh * z + jnp.dot(dhp, wT_ref[:], preferred_element_type=jnp.float32)
    return dxp, dhp, dh_next


def _bwd_kernel(
    xp_f_ref, xp_b_ref, hp_f_ref, hp_b_ref, h0_f_ref, h0_b_ref,
    dout_f_ref, dout_b_ref, dhf_ref, dhb_ref,
    wf_ref, wb_ref, wTf_ref, wTb_ref, bh_f_ref, bh_b_ref,
    dxp_f_ref, dxp_b_ref, dh0_f_ref, dh0_b_ref,
    dw_f_ref, dw_b_ref, db_f_ref, db_b_ref,
    dh_f, dh_b,
    *, T: int,
):
    import jax.experimental.pallas as pl
    from jax import lax

    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        # the final hidden hf/hb are extra outputs of the forward; their
        # cotangents seed the carry at the last time step
        dh_f[:] = dhf_ref[:]
        dh_b[:] = dhb_ref[:]

    # h_prev per step is the forward out stream shifted one step; at the
    # window boundary (grid t == T-1 unwinds recurrence step 0 for the
    # forward direction and step T-1 for the backward direction — both
    # boundaries land on the same grid step) it is the initial hidden
    at_boundary = t == T - 1
    hprev_f = jnp.where(at_boundary, h0_f_ref[:], hp_f_ref[0])
    hprev_b = jnp.where(at_boundary, h0_b_ref[:], hp_b_ref[0])

    dxp_f, dhp_f, dhf_new = _bwd_dir(
        xp_f_ref[0], hprev_f, dout_f_ref[0], dh_f[:], wf_ref, wTf_ref, bh_f_ref
    )
    dxp_b, dhp_b, dhb_new = _bwd_dir(
        xp_b_ref[0], hprev_b, dout_b_ref[0], dh_b[:], wb_ref, wTb_ref, bh_b_ref
    )
    dxp_f_ref[0] = dxp_f
    dxp_b_ref[0] = dxp_b
    dh_f[:] = dhf_new
    dh_b[:] = dhb_new

    # weight/bias cotangents accumulated in VMEM across the whole grid
    # (dw/db block index maps are constant, so the blocks stay resident):
    # dW_hh += h_prev^T dhp via dot_general contracting the batch dim
    # (no transpose op — gentler on the Mosaic emitter), db_hh += sum dhp.
    batch_contract = (((0,), (0,)), ((), ()))
    dw_step_f = lax.dot_general(hprev_f, dhp_f, batch_contract,
                                preferred_element_type=jnp.float32)
    dw_step_b = lax.dot_general(hprev_b, dhp_b, batch_contract,
                                preferred_element_type=jnp.float32)
    db_step_f = jnp.sum(dhp_f, axis=0, keepdims=True)
    db_step_b = jnp.sum(dhp_b, axis=0, keepdims=True)

    @pl.when((b == 0) & (t == 0))
    def _init_grads():
        dw_f_ref[:] = dw_step_f
        dw_b_ref[:] = dw_step_b
        db_f_ref[:] = db_step_f
        db_b_ref[:] = db_step_b

    @pl.when((b > 0) | (t > 0))
    def _acc_grads():
        dw_f_ref[:] += dw_step_f
        dw_b_ref[:] += dw_step_b
        db_f_ref[:] += db_step_f
        db_b_ref[:] += db_step_b

    @pl.when(t == T - 1)
    def _final():
        dh0_f_ref[:] = dhf_new
        dh0_b_ref[:] = dhb_new


def train_inproj_vmem_bytes(h: int, bt: int = 0, d: int = 0) -> int:
    """VMEM residency of the IN-PROJECTION train kernels (backward
    dominates): adds the input-weight class — per direction w_ih (2h, 3h)
    + its transpose + the dW_ih accumulator, all fp32 grid-constant
    (144*h^2 bytes on top of the 72*h^2 w_hh class). ``d`` is the raw
    layer-0 input width; widths past 2h pad to a 128 multiple and scale
    the input-weight class accordingly (ADVICE r3)."""
    bt = bt or _block_target(h)
    dp = max(-(-d // 128) * 128, 2 * h) if d else 2 * h
    weights = (4 + 2) * 3 * h * h * 4 + 3 * dp * (3 * h) * 4 * 2
    streams = (4 * 2 * h + 2 * h + 2 * h + 2 * 2 * h) * 2 * 4 * bt
    vectors = 8 * bt * h * 4
    return weights + streams + vectors


def train_inproj_fits_vmem(h: int, budget: int = 0, d: int = 0) -> bool:
    budget = min(budget or vmem_budget_bytes(), _TRAIN_VMEM_CAP)
    return train_inproj_vmem_bytes(h, d=d) <= int(budget * _VMEM_USABLE)


def _fwd_kernel_ip(
    x_f_ref, x_b_ref, h0_f_ref, h0_b_ref,
    wi_f_ref, wi_b_ref, wf_ref, wb_ref,
    bi_f_ref, bi_b_ref, bh_f_ref, bh_b_ref,
    out_f_ref, out_b_ref, hf_ref, hb_ref,
    h_f, h_b,
    *, T: int,
):
    """Training forward window with the input projection IN-KERNEL: streams
    the raw (Bt, D) input instead of the (Bt, 3H) pre-projection — the
    train kernels are stream-bandwidth-bound (module docstring) and the
    xp/dxp streams were the widest thing they touched. DEFAULT matmul
    precision throughout, like the XLA-side projection it replaces."""
    import jax.experimental.pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_f[:] = h0_f_ref[:]
        h_b[:] = h0_b_ref[:]

    f32 = jnp.float32
    xp_f = jnp.dot(x_f_ref[0], wi_f_ref[:], preferred_element_type=f32) + bi_f_ref[:]
    xp_b = jnp.dot(x_b_ref[0], wi_b_ref[:], preferred_element_type=f32) + bi_b_ref[:]
    hprev_f, hprev_b = h_f[:], h_b[:]
    r_f, z_f, n_f, _ = _gates_train(hprev_f, xp_f, wf_ref[:], bh_f_ref[:])
    r_b, z_b, n_b, _ = _gates_train(hprev_b, xp_b, wb_ref[:], bh_b_ref[:])
    hf_new = (1.0 - z_f) * n_f + z_f * hprev_f
    hb_new = (1.0 - z_b) * n_b + z_b * hprev_b
    h_f[:] = hf_new
    h_b[:] = hb_new
    out_f_ref[0] = hf_new
    out_b_ref[0] = hb_new

    @pl.when(t == T - 1)
    def _final():
        hf_ref[:] = hf_new
        hb_ref[:] = hb_new


def _bwd_dir_ip(x, h_prev, dout, dh_carry, wi_ref, wiT_ref, bi_ref,
                w_ref, wT_ref, bh_ref):
    """One direction's backward step with in-kernel xp recompute (from the
    raw x stream — bit-identical to the forward's in-kernel projection) and
    in-kernel dx = dxp @ W_ih^T."""
    f32 = jnp.float32
    xp = jnp.dot(x, wi_ref[:], preferred_element_type=f32) + bi_ref[:]
    r, z, n, hp_n = _gates_train(h_prev, xp, w_ref[:], bh_ref[:])
    dh = dout + dh_carry
    dz = dh * (h_prev - n)
    da = dh * (1.0 - z) * (1.0 - n * n)
    dr = da * hp_n
    drpre = dr * r * (1.0 - r)
    dzpre = dz * z * (1.0 - z)
    dxp = jnp.concatenate([drpre, dzpre, da], axis=1)
    dhp = jnp.concatenate([drpre, dzpre, da * r], axis=1)
    dh_next = dh * z + jnp.dot(dhp, wT_ref[:], preferred_element_type=f32)
    dx = jnp.dot(dxp, wiT_ref[:], preferred_element_type=f32)
    return dx, dxp, dhp, dh_next


def _bwd_kernel_ip(
    x_f_ref, x_b_ref, hp_f_ref, hp_b_ref, h0_f_ref, h0_b_ref,
    dout_f_ref, dout_b_ref, dhf_ref, dhb_ref,
    wi_f_ref, wi_b_ref, wiT_f_ref, wiT_b_ref,
    wf_ref, wb_ref, wTf_ref, wTb_ref,
    bi_f_ref, bi_b_ref, bh_f_ref, bh_b_ref,
    dx_f_ref, dx_b_ref, dh0_f_ref, dh0_b_ref,
    dwi_f_ref, dwi_b_ref, dbi_f_ref, dbi_b_ref,
    dw_f_ref, dw_b_ref, db_f_ref, db_b_ref,
    dh_f, dh_b,
    *, T: int,
):
    """Backward window, in-projection variant: instead of streaming dxp out
    for XLA-side dW_ih/dx contractions, the kernel emits per-direction dx
    streams (dxp @ W_ih^T; summed by XLA — the two directions unwind
    different time rows at the same grid step, so they cannot share one
    output block) and accumulates dW_ih += x^T dxp / db_ih += sum dxp in
    VMEM-resident blocks across the grid, exactly like dW_hh."""
    import jax.experimental.pallas as pl
    from jax import lax

    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        dh_f[:] = dhf_ref[:]
        dh_b[:] = dhb_ref[:]

    at_boundary = t == T - 1
    hprev_f = jnp.where(at_boundary, h0_f_ref[:], hp_f_ref[0])
    hprev_b = jnp.where(at_boundary, h0_b_ref[:], hp_b_ref[0])

    x_f = x_f_ref[0]
    x_b = x_b_ref[0]
    dx_f, dxp_f, dhp_f, dhf_new = _bwd_dir_ip(
        x_f, hprev_f, dout_f_ref[0], dh_f[:],
        wi_f_ref, wiT_f_ref, bi_f_ref, wf_ref, wTf_ref, bh_f_ref)
    dx_b, dxp_b, dhp_b, dhb_new = _bwd_dir_ip(
        x_b, hprev_b, dout_b_ref[0], dh_b[:],
        wi_b_ref, wiT_b_ref, bi_b_ref, wb_ref, wTb_ref, bh_b_ref)
    dx_f_ref[0] = dx_f
    dx_b_ref[0] = dx_b
    dh_f[:] = dhf_new
    dh_b[:] = dhb_new

    batch_contract = (((0,), (0,)), ((), ()))
    dw_step_f = lax.dot_general(hprev_f, dhp_f, batch_contract,
                                preferred_element_type=jnp.float32)
    dw_step_b = lax.dot_general(hprev_b, dhp_b, batch_contract,
                                preferred_element_type=jnp.float32)
    dwi_step_f = lax.dot_general(x_f, dxp_f, batch_contract,
                                 preferred_element_type=jnp.float32)
    dwi_step_b = lax.dot_general(x_b, dxp_b, batch_contract,
                                 preferred_element_type=jnp.float32)
    db_step_f = jnp.sum(dhp_f, axis=0, keepdims=True)
    db_step_b = jnp.sum(dhp_b, axis=0, keepdims=True)
    dbi_step_f = jnp.sum(dxp_f, axis=0, keepdims=True)
    dbi_step_b = jnp.sum(dxp_b, axis=0, keepdims=True)

    @pl.when((b == 0) & (t == 0))
    def _init_grads():
        dw_f_ref[:] = dw_step_f
        dw_b_ref[:] = dw_step_b
        db_f_ref[:] = db_step_f
        db_b_ref[:] = db_step_b
        dwi_f_ref[:] = dwi_step_f
        dwi_b_ref[:] = dwi_step_b
        dbi_f_ref[:] = dbi_step_f
        dbi_b_ref[:] = dbi_step_b

    @pl.when((b > 0) | (t > 0))
    def _acc_grads():
        dw_f_ref[:] += dw_step_f
        dw_b_ref[:] += dw_step_b
        db_f_ref[:] += db_step_f
        db_b_ref[:] += db_step_b
        dwi_f_ref[:] += dwi_step_f
        dwi_b_ref[:] += dwi_step_b
        dbi_f_ref[:] += dbi_step_f
        dbi_b_ref[:] += dbi_step_b

    @pl.when(t == T - 1)
    def _final():
        dh0_f_ref[:] = dhf_new
        dh0_b_ref[:] = dhb_new


def _specs(T: int, Bt: int, H: int = H):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def stream(width: int, rev: bool):
        return pl.BlockSpec(
            (1, Bt, width),
            (lambda b, t: (T - 1 - t, b, 0)) if rev else (lambda b, t: (t, b, 0)),
            memory_space=pltpu.VMEM,
        )

    def stream_shifted(width: int, rev: bool):
        # the h_prev streams: forward-direction unwind at grid t is
        # recurrence step s = T-1-t and needs out[s-1] -> block T-2-t
        # (clamped; the t == T-1 read is discarded for h0); backward-
        # direction unwind at grid t is step s = t and needs out[s+1]
        # -> block t+1 (clamped likewise)
        if rev:
            index = lambda b, t: (jnp.maximum(T - 2 - t, 0), b, 0)
        else:
            index = lambda b, t: (jnp.minimum(t + 1, T - 1), b, 0)
        return pl.BlockSpec((1, Bt, width), index, memory_space=pltpu.VMEM)

    return dict(
        stream=stream,
        stream_shifted=stream_shifted,
        vec=pl.BlockSpec((Bt, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        w=lambda r, c: pl.BlockSpec((r, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        bias=pl.BlockSpec((1, 3 * H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bigru_window_train_fwd(
    xp_f, xp_b, h0_f, h0_b, w_f, w_b, bh_f, bh_b, interpret: bool = False
):
    """Forward window for training: returns (out_f, out_b, hf, hb) — the
    plain recurrence, nothing saved (the backward recomputes gates)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, threeH = xp_f.shape
    Hm = h0_f.shape[1]  # model hidden size: any lane-width multiple
    assert threeH == 3 * Hm and Hm % 128 == 0, (threeH, Hm)
    Bt = _pick_block(B, h=Hm)
    assert B % Bt == 0
    sp = _specs(T, Bt, Hm)
    grid = (B // Bt, T)
    out_f, out_b, hf, hb = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T),
        grid=grid,
        in_specs=[
            sp["stream"](3 * Hm, False), sp["stream"](3 * Hm, True),
            sp["vec"], sp["vec"],
            sp["w"](Hm, 3 * Hm), sp["w"](Hm, 3 * Hm),
            sp["bias"], sp["bias"],
        ],
        out_specs=[
            sp["stream"](Hm, False), sp["stream"](Hm, True),
            sp["vec"], sp["vec"],
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, Hm), jnp.float32),
            jax.ShapeDtypeStruct((T, B, Hm), jnp.float32),
            jax.ShapeDtypeStruct((B, Hm), jnp.float32),
            jax.ShapeDtypeStruct((B, Hm), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bt, Hm), jnp.float32),
            pltpu.VMEM((Bt, Hm), jnp.float32),
        ],
        interpret=interpret,
    )(xp_f, xp_b, h0_f, h0_b, w_f, w_b, bh_f, bh_b)
    return out_f, out_b, hf, hb


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bigru_window_train_bwd(
    xp_f, xp_b, out_f, out_b, h0_f, h0_b, dout_f, dout_b, dhf, dhb,
    w_f, w_b, bh_f, bh_b,
    interpret: bool = False,
):
    """Backward window: returns (dxp_f, dxp_b, dh0_f, dh0_b,
    dw_f, dw_b, db_f, db_b) — the weight/bias cotangents are accumulated
    in-kernel (VMEM-resident) across the whole grid."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, threeH = xp_f.shape
    Hm = h0_f.shape[1]  # model hidden size: any lane-width multiple
    assert threeH == 3 * Hm and Hm % 128 == 0, (threeH, Hm)
    Bt = _pick_block(B, h=Hm)
    sp = _specs(T, Bt, Hm)
    grid = (B // Bt, T)
    # time-reversed streams for the forward direction (its recurrence is
    # unwound T-1 -> 0), forward-ordered for the backward direction (its
    # recurrence ran reversed, so its unwind runs 0 -> T-1)
    (dxp_f, dxp_b, dh0_f, dh0_b,
     dw_f, dw_b, db_f, db_b) = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T),
        grid=grid,
        in_specs=[
            sp["stream"](3 * Hm, True), sp["stream"](3 * Hm, False),
            sp["stream_shifted"](Hm, True), sp["stream_shifted"](Hm, False),
            sp["vec"], sp["vec"],
            sp["stream"](Hm, True), sp["stream"](Hm, False),
            sp["vec"], sp["vec"],
            sp["w"](Hm, 3 * Hm), sp["w"](Hm, 3 * Hm),
            sp["w"](3 * Hm, Hm), sp["w"](3 * Hm, Hm),
            sp["bias"], sp["bias"],
        ],
        out_specs=[
            sp["stream"](3 * Hm, True), sp["stream"](3 * Hm, False),
            sp["vec"], sp["vec"],
            sp["w"](Hm, 3 * Hm), sp["w"](Hm, 3 * Hm),
            sp["bias"], sp["bias"],
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, 3 * Hm), jnp.float32),
            jax.ShapeDtypeStruct((T, B, 3 * Hm), jnp.float32),
            jax.ShapeDtypeStruct((B, Hm), jnp.float32),
            jax.ShapeDtypeStruct((B, Hm), jnp.float32),
            jax.ShapeDtypeStruct((Hm, 3 * Hm), jnp.float32),
            jax.ShapeDtypeStruct((Hm, 3 * Hm), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * Hm), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * Hm), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bt, Hm), jnp.float32),
            pltpu.VMEM((Bt, Hm), jnp.float32),
        ],
        interpret=interpret,
    )(xp_f, xp_b, out_f, out_b, h0_f, h0_b, dout_f, dout_b, dhf, dhb,
      w_f, w_b, jnp.swapaxes(w_f, 0, 1), jnp.swapaxes(w_b, 0, 1), bh_f, bh_b)
    return dxp_f, dxp_b, dh0_f, dh0_b, dw_f, dw_b, db_f, db_b


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bigru_window_train_fwd_ip(
    x, h0_f, h0_b, wi_f, wi_b, w_f, w_b, bi_f, bi_b, bh_f, bh_b,
    interpret: bool = False,
):
    """In-projection training forward window. ``x`` is the raw (T, B, D)
    layer input, D % 128 == 0 (wrapper pads)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, D = x.shape
    Hm = h0_f.shape[1]
    assert D % 128 == 0 and Hm % 128 == 0, (D, Hm)
    Bt = _pick_block(B, h=Hm)
    assert B % Bt == 0
    sp = _specs(T, Bt, Hm)
    grid = (B // Bt, T)
    out_f, out_b, hf, hb = pl.pallas_call(
        functools.partial(_fwd_kernel_ip, T=T),
        grid=grid,
        in_specs=[
            sp["stream"](D, False), sp["stream"](D, True),
            sp["vec"], sp["vec"],
            sp["w"](D, 3 * Hm), sp["w"](D, 3 * Hm),
            sp["w"](Hm, 3 * Hm), sp["w"](Hm, 3 * Hm),
            sp["bias"], sp["bias"], sp["bias"], sp["bias"],
        ],
        out_specs=[
            sp["stream"](Hm, False), sp["stream"](Hm, True),
            sp["vec"], sp["vec"],
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, Hm), jnp.float32),
            jax.ShapeDtypeStruct((T, B, Hm), jnp.float32),
            jax.ShapeDtypeStruct((B, Hm), jnp.float32),
            jax.ShapeDtypeStruct((B, Hm), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bt, Hm), jnp.float32),
            pltpu.VMEM((Bt, Hm), jnp.float32),
        ],
        interpret=interpret,
    )(x, x, h0_f, h0_b, wi_f, wi_b, w_f, w_b, bi_f, bi_b, bh_f, bh_b)
    return out_f, out_b, hf, hb


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bigru_window_train_bwd_ip(
    x, out_f, out_b, h0_f, h0_b, dout_f, dout_b, dhf, dhb,
    wi_f, wi_b, w_f, w_b, bi_f, bi_b, bh_f, bh_b,
    interpret: bool = False,
):
    """In-projection backward window: returns (dx, dh0_f, dh0_b,
    dwi_f, dwi_b, dbi_f, dbi_b, dw_f, dw_b, db_f, db_b). dx is the summed
    per-direction streams; dW_ih/db_ih accumulate in-kernel like dW_hh."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, D = x.shape
    Hm = h0_f.shape[1]
    assert D % 128 == 0 and Hm % 128 == 0, (D, Hm)
    Bt = _pick_block(B, h=Hm)
    sp = _specs(T, Bt, Hm)
    grid = (B // Bt, T)
    (dx_f, dx_b, dh0_f, dh0_b,
     dwi_f, dwi_b, dbi_f, dbi_b,
     dw_f, dw_b, db_f, db_b) = pl.pallas_call(
        functools.partial(_bwd_kernel_ip, T=T),
        grid=grid,
        in_specs=[
            sp["stream"](D, True), sp["stream"](D, False),
            sp["stream_shifted"](Hm, True), sp["stream_shifted"](Hm, False),
            sp["vec"], sp["vec"],
            sp["stream"](Hm, True), sp["stream"](Hm, False),
            sp["vec"], sp["vec"],
            sp["w"](D, 3 * Hm), sp["w"](D, 3 * Hm),
            sp["w"](3 * Hm, D), sp["w"](3 * Hm, D),
            sp["w"](Hm, 3 * Hm), sp["w"](Hm, 3 * Hm),
            sp["w"](3 * Hm, Hm), sp["w"](3 * Hm, Hm),
            sp["bias"], sp["bias"], sp["bias"], sp["bias"],
        ],
        out_specs=[
            sp["stream"](D, True), sp["stream"](D, False),
            sp["vec"], sp["vec"],
            sp["w"](D, 3 * Hm), sp["w"](D, 3 * Hm),
            sp["bias"], sp["bias"],
            sp["w"](Hm, 3 * Hm), sp["w"](Hm, 3 * Hm),
            sp["bias"], sp["bias"],
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, D), jnp.float32),
            jax.ShapeDtypeStruct((T, B, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Hm), jnp.float32),
            jax.ShapeDtypeStruct((B, Hm), jnp.float32),
            jax.ShapeDtypeStruct((D, 3 * Hm), jnp.float32),
            jax.ShapeDtypeStruct((D, 3 * Hm), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * Hm), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * Hm), jnp.float32),
            jax.ShapeDtypeStruct((Hm, 3 * Hm), jnp.float32),
            jax.ShapeDtypeStruct((Hm, 3 * Hm), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * Hm), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * Hm), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bt, Hm), jnp.float32),
            pltpu.VMEM((Bt, Hm), jnp.float32),
        ],
        interpret=interpret,
    )(x, x, out_f, out_b, h0_f, h0_b, dout_f, dout_b, dhf, dhb,
      wi_f, wi_b, jnp.swapaxes(wi_f, 0, 1), jnp.swapaxes(wi_b, 0, 1),
      w_f, w_b, jnp.swapaxes(w_f, 0, 1), jnp.swapaxes(w_b, 0, 1),
      bi_f, bi_b, bh_f, bh_b)
    return (dx_f + dx_b, dh0_f, dh0_b,
            dwi_f, dwi_b, dbi_f, dbi_b, dw_f, dw_b, db_f, db_b)


@functools.lru_cache(maxsize=None)
def _window_core_ip(interpret: bool):
    """custom_vjp-wrapped in-projection bi-GRU training window."""

    @jax.custom_vjp
    def core(x, h0_f, h0_b, wi_f, wi_b, w_f, w_b, bi_f, bi_b, bh_f, bh_b):
        return fused_bigru_window_train_fwd_ip(
            x, h0_f, h0_b, wi_f, wi_b, w_f, w_b, bi_f, bi_b, bh_f, bh_b,
            interpret=interpret)

    def fwd(x, h0_f, h0_b, wi_f, wi_b, w_f, w_b, bi_f, bi_b, bh_f, bh_b):
        out_f, out_b, hf, hb = fused_bigru_window_train_fwd_ip(
            x, h0_f, h0_b, wi_f, wi_b, w_f, w_b, bi_f, bi_b, bh_f, bh_b,
            interpret=interpret)
        res = (x, out_f, out_b, h0_f, h0_b,
               wi_f, wi_b, w_f, w_b, bi_f, bi_b, bh_f, bh_b)
        return (out_f, out_b, hf, hb), res

    def bwd(res, cts):
        (x, out_f, out_b, h0_f, h0_b,
         wi_f, wi_b, w_f, w_b, bi_f, bi_b, bh_f, bh_b) = res
        dout_f, dout_b, dhf, dhb = cts
        (dx, dh0_f, dh0_b, dwi_f, dwi_b, dbi_f, dbi_b,
         dw_f, dw_b, db_f, db_b) = fused_bigru_window_train_bwd_ip(
            x, out_f, out_b, h0_f, h0_b, dout_f, dout_b, dhf, dhb,
            wi_f, wi_b, w_f, w_b, bi_f, bi_b, bh_f, bh_b,
            interpret=interpret)
        # cotangent order mirrors core's argument order
        return (dx, dh0_f, dh0_b, dwi_f, dwi_b, dw_f, dw_b,
                dbi_f, dbi_b, db_f, db_b)

    core.defvjp(fwd, bwd)
    return core


@functools.lru_cache(maxsize=None)
def _window_core(interpret: bool):
    """custom_vjp-wrapped differentiable bi-GRU window (cached per mode)."""

    @jax.custom_vjp
    def core(xp_f, xp_b, h0_f, h0_b, w_f, w_b, bh_f, bh_b):
        return fused_bigru_window_train_fwd(
            xp_f, xp_b, h0_f, h0_b, w_f, w_b, bh_f, bh_b, interpret=interpret
        )

    def fwd(xp_f, xp_b, h0_f, h0_b, w_f, w_b, bh_f, bh_b):
        out_f, out_b, hf, hb = fused_bigru_window_train_fwd(
            xp_f, xp_b, h0_f, h0_b, w_f, w_b, bh_f, bh_b, interpret=interpret
        )
        res = (xp_f, xp_b, out_f, out_b, h0_f, h0_b, w_f, w_b, bh_f, bh_b)
        return (out_f, out_b, hf, hb), res

    def bwd(res, cts):
        xp_f, xp_b, out_f, out_b, h0_f, h0_b, w_f, w_b, bh_f, bh_b = res
        dout_f, dout_b, dhf, dhb = cts
        # all cotangents come out of the kernel — no XLA-side (T*B)
        # contractions, no dhp materialization, no saved activations
        return fused_bigru_window_train_bwd(
            xp_f, xp_b, out_f, out_b, h0_f, h0_b, dout_f, dout_b, dhf, dhb,
            w_f, w_b, bh_f, bh_b, interpret=interpret,
        )

    core.defvjp(fwd, bwd)
    return core


def bigru_apply_fused_train(
    params,
    x: jnp.ndarray,  # (T, B, D) time-major
    h0_fwd: jnp.ndarray,
    h0_bwd: jnp.ndarray,
    precision=None,  # accepted for interface parity; training uses DEFAULT
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Differentiable drop-in for models.gru.bigru_apply using the fused
    training kernels.

    When the geometry fits (train_inproj_fits_vmem), the IN-PROJECTION
    kernels run: the raw (T, B, D) input streams into the window kernel
    (padded to a lane multiple — jnp.pad is differentiable, so the pad
    rows'/cols' cotangents slice away automatically), the backward
    recomputes xp in-kernel and emits dx / dW_ih / db_ih itself — no
    (T, B, 3H) xp or dxp stream ever hits HBM. Larger geometries keep the
    classic xp-stream kernels; resolve_backend's train gate handles the
    final fall back to lax.scan."""
    del precision
    f, b = params["fwd"], params["bwd"]
    Hm = h0_fwd.shape[-1]
    if train_inproj_fits_vmem(Hm, d=x.shape[-1]):
        D = x.shape[-1]
        Dp = -(-D // 128) * 128
        wi_f, wi_b = f["w_ih"], b["w_ih"]
        if Dp != D:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, Dp - D)))
            wi_f = jnp.pad(wi_f, ((0, Dp - D), (0, 0)))
            wi_b = jnp.pad(wi_b, ((0, Dp - D), (0, 0)))
        core = _window_core_ip(interpret)
        out_f, out_b, hf, hb = core(
            x, h0_fwd, h0_bwd, wi_f, wi_b, f["w_hh"], b["w_hh"],
            f["b_ih"].reshape(1, -1), b["b_ih"].reshape(1, -1),
            f["b_hh"].reshape(1, -1), b["b_hh"].reshape(1, -1),
        )
        return jnp.concatenate([out_f, out_b], axis=-1), hf, hb
    xp_f = jnp.dot(x, f["w_ih"]) + f["b_ih"]
    xp_b = jnp.dot(x, b["w_ih"]) + b["b_ih"]
    core = _window_core(interpret)
    out_f, out_b, hf, hb = core(
        xp_f, xp_b, h0_fwd, h0_bwd, f["w_hh"], b["w_hh"],
        f["b_hh"].reshape(1, -1), b["b_hh"].reshape(1, -1),
    )
    return jnp.concatenate([out_f, out_b], axis=-1), hf, hb
