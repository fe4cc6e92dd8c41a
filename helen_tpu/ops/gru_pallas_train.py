"""Pallas TPU kernels: fused bidirectional GRU window for TRAINING.

The TBPTT train step (reference train.py:174-212 — 19 windows, each a full
forward+backward+Adam update) spends most of its time in the GRU recurrences.
Under lax.scan each of the ~7,600 recurrence steps per batch (100 steps x
2 directions x 2 layers x 19 windows) is its own XLA loop iteration with HBM
round-trips for the hidden state; this module runs each window's recurrence —
forward AND backward — as one kernel launch per direction pair, exactly like
the inference kernel (ops/gru_pallas.py) but differentiable:

  * the forward kernel additionally streams out the per-step activations the
    backward pass needs: ``save = [r | z | n | h_prev]`` (T, B, 4H);
  * the backward kernel replays the window in reverse recurrence order with
    the hidden cotangent resident in VMEM, emitting the input-projection
    cotangent ``dxp`` per step AND accumulating the weight/bias cotangents
    (dW_hh += h_prev^T dhp, db_hh += sum dhp) in VMEM-resident output
    blocks across the whole grid — doing these as XLA einsums instead was
    measured to dominate backward-pass HBM traffic at large batch (they
    re-read the save/dxp streams and materialize dhp);
  * ``jax.custom_vjp`` stitches the two kernels into a drop-in
    differentiable bi-GRU window (``bigru_apply_fused_train``).

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

from helen_tpu.ops.gru_pallas import H, _pick_block


def _gates_train(h_prev, xp, w, b_hh):
    hp = jnp.dot(h_prev, w, preferred_element_type=jnp.float32) + b_hh
    r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
    z = jax.nn.sigmoid(xp[:, H : 2 * H] + hp[:, H : 2 * H])
    n = jnp.tanh(xp[:, 2 * H :] + r * hp[:, 2 * H :])
    h_new = (1.0 - z) * n + z * h_prev
    return h_new, r, z, n


def _fwd_kernel(
    xp_f_ref, xp_b_ref, h0_f_ref, h0_b_ref,
    wf_ref, wb_ref, bh_f_ref, bh_b_ref,
    out_f_ref, out_b_ref, hf_ref, hb_ref, save_f_ref, save_b_ref,
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
    hf_new, r_f, z_f, n_f = _gates_train(hprev_f, xp_f_ref[0], wf_ref[:], bh_f_ref[:])
    hb_new, r_b, z_b, n_b = _gates_train(hprev_b, xp_b_ref[0], wb_ref[:], bh_b_ref[:])
    h_f[:] = hf_new
    h_b[:] = hb_new
    out_f_ref[0] = hf_new
    out_b_ref[0] = hb_new
    save_f_ref[0] = jnp.concatenate([r_f, z_f, n_f, hprev_f], axis=1)
    save_b_ref[0] = jnp.concatenate([r_b, z_b, n_b, hprev_b], axis=1)

    @pl.when(t == T - 1)
    def _final():
        hf_ref[:] = hf_new
        hb_ref[:] = hb_new


def _bwd_dir(save, dout, dh_carry, w_ref, wT_ref, bh_ref):
    r = save[:, :H]
    z = save[:, H : 2 * H]
    n = save[:, 2 * H : 3 * H]
    h_prev = save[:, 3 * H :]
    # recompute hp_n = h_prev @ W_hn + b_hn (cheaper than streaming it)
    hp_n = (
        jnp.dot(h_prev, w_ref[:, 2 * H :], preferred_element_type=jnp.float32)
        + bh_ref[:, 2 * H :]
    )
    dh = dout + dh_carry
    dz = dh * (h_prev - n)
    da = dh * (1.0 - z) * (1.0 - n * n)
    dr = da * hp_n
    drpre = dr * r * (1.0 - r)
    dzpre = dz * z * (1.0 - z)
    dxp = jnp.concatenate([drpre, dzpre, da], axis=1)
    dhp = jnp.concatenate([drpre, dzpre, da * r], axis=1)
    dh_next = dh * z + jnp.dot(dhp, wT_ref[:], preferred_element_type=jnp.float32)
    return dxp, dhp, h_prev, dh_next


def _bwd_kernel(
    save_f_ref, save_b_ref, dout_f_ref, dout_b_ref, dhf_ref, dhb_ref,
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

    dxp_f, dhp_f, hprev_f, dhf_new = _bwd_dir(
        save_f_ref[0], dout_f_ref[0], dh_f[:], wf_ref, wTf_ref, bh_f_ref
    )
    dxp_b, dhp_b, hprev_b, dhb_new = _bwd_dir(
        save_b_ref[0], dout_b_ref[0], dh_b[:], wb_ref, wTb_ref, bh_b_ref
    )
    dxp_f_ref[0] = dxp_f
    dxp_b_ref[0] = dxp_b
    dh_f[:] = dhf_new
    dh_b[:] = dhb_new

    # weight/bias cotangents accumulated in VMEM across the whole grid
    # (dw/db block index maps are constant, so the blocks stay resident):
    # dW_hh += h_prev^T dhp via dot_general contracting the batch dim
    # (no transpose op — gentler on the Mosaic emitter), db_hh += sum dhp.
    # This replaces two (T*B)-row XLA einsums that re-read the save and
    # dxp streams and materialized dhp in HBM — the dominant backward-pass
    # HBM traffic at large batch (docs/performance.md).
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


def _specs(T: int, Bt: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def stream(width: int, rev: bool):
        return pl.BlockSpec(
            (1, Bt, width),
            (lambda b, t: (T - 1 - t, b, 0)) if rev else (lambda b, t: (t, b, 0)),
            memory_space=pltpu.VMEM,
        )

    return dict(
        stream=stream,
        vec=pl.BlockSpec((Bt, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        w=lambda r, c: pl.BlockSpec((r, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        bias=pl.BlockSpec((1, 3 * H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bigru_window_train_fwd(
    xp_f, xp_b, h0_f, h0_b, w_f, w_b, bh_f, bh_b, interpret: bool = False
):
    """Forward window for training: returns (out_f, out_b, hf, hb,
    save_f, save_b) with save = [r|z|n|h_prev] per step (T, B, 4H)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, threeH = xp_f.shape
    assert threeH == 3 * H
    Bt = _pick_block(B)
    assert B % Bt == 0
    sp = _specs(T, Bt)
    grid = (B // Bt, T)
    out_f, out_b, hf, hb, save_f, save_b = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T),
        grid=grid,
        in_specs=[
            sp["stream"](3 * H, False), sp["stream"](3 * H, True),
            sp["vec"], sp["vec"],
            sp["w"](H, 3 * H), sp["w"](H, 3 * H),
            sp["bias"], sp["bias"],
        ],
        out_specs=[
            sp["stream"](H, False), sp["stream"](H, True),
            sp["vec"], sp["vec"],
            sp["stream"](4 * H, False), sp["stream"](4 * H, True),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, 4 * H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bt, H), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
        ],
        interpret=interpret,
    )(xp_f, xp_b, h0_f, h0_b, w_f, w_b, bh_f, bh_b)
    return out_f, out_b, hf, hb, save_f, save_b


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bigru_window_train_bwd(
    save_f, save_b, dout_f, dout_b, dhf, dhb, w_f, w_b, bh_f, bh_b,
    interpret: bool = False,
):
    """Backward window: returns (dxp_f, dxp_b, dh0_f, dh0_b,
    dw_f, dw_b, db_f, db_b) — the weight/bias cotangents are accumulated
    in-kernel (VMEM-resident) across the whole grid."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, fourH = save_f.shape
    assert fourH == 4 * H
    Bt = _pick_block(B)
    sp = _specs(T, Bt)
    grid = (B // Bt, T)
    # time-reversed streams for the forward direction (its recurrence is
    # unwound T-1 -> 0), forward-ordered for the backward direction (its
    # recurrence ran reversed, so its unwind runs 0 -> T-1)
    (dxp_f, dxp_b, dh0_f, dh0_b,
     dw_f, dw_b, db_f, db_b) = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T),
        grid=grid,
        in_specs=[
            sp["stream"](4 * H, True), sp["stream"](4 * H, False),
            sp["stream"](H, True), sp["stream"](H, False),
            sp["vec"], sp["vec"],
            sp["w"](H, 3 * H), sp["w"](H, 3 * H),
            sp["w"](3 * H, H), sp["w"](3 * H, H),
            sp["bias"], sp["bias"],
        ],
        out_specs=[
            sp["stream"](3 * H, True), sp["stream"](3 * H, False),
            sp["vec"], sp["vec"],
            sp["w"](H, 3 * H), sp["w"](H, 3 * H),
            sp["bias"], sp["bias"],
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bt, H), jnp.float32),
            pltpu.VMEM((Bt, H), jnp.float32),
        ],
        interpret=interpret,
    )(save_f, save_b, dout_f, dout_b, dhf, dhb,
      w_f, w_b, jnp.swapaxes(w_f, 0, 1), jnp.swapaxes(w_b, 0, 1), bh_f, bh_b)
    return dxp_f, dxp_b, dh0_f, dh0_b, dw_f, dw_b, db_f, db_b


@functools.lru_cache(maxsize=None)
def _window_core(interpret: bool):
    """custom_vjp-wrapped differentiable bi-GRU window (cached per mode)."""

    @jax.custom_vjp
    def core(xp_f, xp_b, h0_f, h0_b, w_f, w_b, bh_f, bh_b):
        out_f, out_b, hf, hb, _, _ = fused_bigru_window_train_fwd(
            xp_f, xp_b, h0_f, h0_b, w_f, w_b, bh_f, bh_b, interpret=interpret
        )
        return out_f, out_b, hf, hb

    def fwd(xp_f, xp_b, h0_f, h0_b, w_f, w_b, bh_f, bh_b):
        out_f, out_b, hf, hb, save_f, save_b = fused_bigru_window_train_fwd(
            xp_f, xp_b, h0_f, h0_b, w_f, w_b, bh_f, bh_b, interpret=interpret
        )
        return (out_f, out_b, hf, hb), (save_f, save_b, w_f, w_b, bh_f, bh_b)

    def bwd(res, cts):
        save_f, save_b, w_f, w_b, bh_f, bh_b = res
        dout_f, dout_b, dhf, dhb = cts
        # weight/bias cotangents come out of the kernel (accumulated in
        # VMEM) — no XLA-side (T*B) contractions or dhp materialization
        return fused_bigru_window_train_bwd(
            save_f, save_b, dout_f, dout_b, dhf, dhb, w_f, w_b, bh_f, bh_b,
            interpret=interpret,
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
