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
    training kernels. Input projections (and their gradients) stay in XLA."""
    del precision
    f, b = params["fwd"], params["bwd"]
    xp_f = jnp.dot(x, f["w_ih"]) + f["b_ih"]
    xp_b = jnp.dot(x, b["w_ih"]) + b["b_ih"]
    core = _window_core(interpret)
    out_f, out_b, hf, hb = core(
        xp_f, xp_b, h0_fwd, h0_bwd, f["w_hh"], b["w_hh"],
        f["b_hh"].reshape(1, -1), b["b_hh"].reshape(1, -1),
    )
    return jnp.concatenate([out_f, out_b], axis=-1), hf, hb
