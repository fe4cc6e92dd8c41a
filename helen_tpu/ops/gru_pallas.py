"""Pallas TPU kernel: fused bidirectional GRU window scan.

The consensus hot loop is a sequential recurrence: per time step, a small
(B, H) x (H, 3H) matmul plus elementwise gates. Under plain XLA each step is
its own fusion with HBM round-trips for the hidden state and per-step
scheduling overhead. This kernel runs the **whole 100-step window for both
directions in one kernel launch**:

  * grid = (batch_blocks, T); the Pallas pipeline machinery streams the
    pre-projected inputs ``x @ W_ih + b_ih + b_hh`` (one (Bt, 3H) block per
    step/direction) through VMEM with automatic double buffering;
  * the hidden states for both directions live in VMEM scratch for the whole
    window — no HBM traffic for the recurrence itself;
  * the backward direction reads its input blocks reversed in time
    (index_map t -> T-1-t) and writes outputs back at original positions,
    exactly matching ``lax.scan(reverse=True)`` semantics;
  * both per-step matmuls hit the MXU ((Bt,128) x (128,384)); gates run on
    the VPU in the same kernel.

Biases: the input-side bias b_ih folds into the pre-projection, but b_hh must
stay inside the kernel — the candidate gate applies it *inside* the reset
multiplication (n = tanh(x_in + r * (W_hn h + b_hn))), so hp = h @ W_hh + b_hh
is computed per step, bit-equivalent to the reference recurrence
(models/gru.py gru_scan).

Used on the inference path (helen_tpu.infer); training has its own fused
forward+backward kernels with a custom VJP (ops/gru_pallas_train.py).

Explored and rejected layouts (2026-08, libtpu of that era): (a) a single
stacked (T, 2, B, 3H) input with one batched dot_general measured ~1.8x
faster in isolation, but passing the same array through forward- and
reverse-indexed BlockSpecs crashes the Mosaic pipeline emitter
(math_util.cc FromMixedRadix check), and the stacked variant with (2,1,3H)
bias blocks crashes ApplyVectorLayout (array.h Slice check); (b) host-side
time-flips to avoid reverse streams cost ~0.5 ms/window of HBM traffic,
cancelling the gain; (c) whole-image hoisting of the encoder input
projection (project once, slice windows) is bit-identical but measured
426K -> 332K w/s: the 2x1.5 GB full-image projections add HBM residency
and every slice becomes an HBM copy into the stream; (d) computing the
gates in bf16 (fast mode) trips a Mosaic verifier bug ('vector.broadcast'
f32 -> bf16 in the logistic lowering) — and an ablation shows the kernel is
VPU-transcendental-bound anyway (~1.5 us/grid-step vs ~0.13 us of MXU dot
at Bt=256; 38 chained launches = 70% of the whole fast program), so exact
sigmoid/tanh put fast mode near its per-chip floor.

Retested 2026-08-19 on the then-current Mosaic: the (a)-class emitter bugs
are FIXED (dual-direction same-input streams, (2,1,3H) bias blocks, and
batched (2,Bt,H)x(2,H,3H) dot_general all compile), but a stacked-state
variant (per-direction MXU dots + direction-stacked VPU gates, bit-exact
outputs) measures 1.00x parity / 1.03x fast — confirming the kernel is
VPU-transcendental-THROUGHPUT-bound, not op-count-bound, so the stacked
layout's old 1.8x isolation number does not transfer into this kernel.
(A fully-batched dot feeding a broadcast-bias add + sigmoid still crashes
ApplyVectorLayout, array.h:480 limits<=dim(i), inside the full grid — but
the working per-direction-dot variant shows there is nothing to gain.)
Cheap gate-math rewrites (sigmoid as 0.5*tanh(0.5x)+0.5; h = n + z*(h-n))
measure at most 1.04x and perturb last-ulp rounding — rejected to keep the
parity tier's audited numerics. (d) still fails verification on bf16
vectors. Conclusion: the per-step recurrence is at its per-chip floor;
remaining end-to-end headroom lives outside this kernel.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# Flagship hidden size (config.MODEL.hidden_size). The kernels themselves
# serve ANY hidden size that is a lane-width multiple (H % 128 == 0): gate
# slices land on 128-aligned lane offsets and block shapes scale with H.
# models.transducer.resolve_backend gates on that condition AND on the
# VMEM residency estimate below (the grid-constant weight blocks are
# O(H^2) and outgrow VMEM around H=768); other geometries fall back to
# lax.scan.
H = 128


def _split_bf16x2(w):
    """Split fp32 into (hi, lo) bf16 parts with hi + lo covering ~fp32 mantissa."""
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _gru_gates(h, xp, w_hi, w_lo, b_hh):
    H = h.shape[1]  # static inside the kernel; any lane-width multiple
    # xp may be bf16 (fast mode); accumulation and gates always f32.
    # fast mode (w_lo is None): a single bf16 MXU product.
    # parity mode: the MXU's DEFAULT fp32 dot rounds operands to bf16
    # (~3e-3 vote error, ~0.5% label flips vs the fp32 reference), and
    # Mosaic implements neither Precision.HIGH nor a cheap true-fp32 pass —
    # so run the bf16x3 ("Precision.HIGH") product manually: h and w split
    # into hi+lo bf16 halves, the three significant cross products summed in
    # f32 (w is pre-split outside the kernel). Measured on v5e: label parity
    # identical to an in-kernel Precision.HIGHEST dot (2+2 near-tie flips
    # per 128k labels, ~1e-5 vote error vs the fp32 reference) at ~8% more
    # throughput — ~39% over HIGHEST-everywhere
    # (docs/performance.md, "The fp32 parity trap on TPU").
    if w_lo is None:
        hp = jnp.dot(h.astype(w_hi.dtype), w_hi,
                     preferred_element_type=jnp.float32) + b_hh
    else:
        h_hi, h_lo = _split_bf16x2(h)
        f32 = jnp.float32
        hp = (jnp.dot(h_hi, w_hi, preferred_element_type=f32)
              + jnp.dot(h_lo, w_hi, preferred_element_type=f32)
              + jnp.dot(h_hi, w_lo, preferred_element_type=f32)) + b_hh
    xp = xp.astype(jnp.float32)
    r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
    z = jax.nn.sigmoid(xp[:, H : 2 * H] + hp[:, H : 2 * H])
    n = jnp.tanh(xp[:, 2 * H :] + r * hp[:, 2 * H :])
    return (1.0 - z) * n + z * h


def _kernel(
    xp_f_ref, xp_b_ref, h0_f_ref, h0_b_ref,
    wf_hi_ref, wb_hi_ref, wf_lo_ref, wb_lo_ref,
    bh_f_ref, bh_b_ref,
    out_f_ref, out_b_ref, hf_ref, hb_ref,
    h_f, h_b,
    *, T: int, fast: bool,
):
    import jax.experimental.pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_f[:] = h0_f_ref[:]
        h_b[:] = h0_b_ref[:]

    wf_lo = None if fast else wf_lo_ref[:]
    wb_lo = None if fast else wb_lo_ref[:]
    hf_new = _gru_gates(h_f[:], xp_f_ref[0], wf_hi_ref[:], wf_lo, bh_f_ref[:])
    hb_new = _gru_gates(h_b[:], xp_b_ref[0], wb_hi_ref[:], wb_lo, bh_b_ref[:])
    h_f[:] = hf_new
    h_b[:] = hb_new
    out_f_ref[0] = hf_new
    out_b_ref[0] = hb_new

    @pl.when(t == T - 1)
    def _final():
        hf_ref[:] = hf_new
        hb_ref[:] = hb_new


# Per-core VMEM floor for unknown/older TPU generations. The gate keeps a
# headroom fraction free for Mosaic's own spills, semaphores and pipeline
# bookkeeping.
VMEM_BUDGET_BYTES = 16 * 1024 * 1024
_VMEM_USABLE = 0.9
# Generations with 128 MiB of per-core VMEM (matched as substrings of
# device_kind, lowercased — the live v5e here reports "TPU v5 lite").
# v4 also carries 128 MiB per the public hardware tables (jax-ml scaling
# book, "TPU v4: VMEM 128 MiB/core"); no v4 chip is reachable from this
# environment for a live calibration, but the gate already holds back a
# 10% headroom and the same estimate was validated live on v5e (below),
# so v4 is classified by spec rather than pinned to the 16 MiB floor
# (which would push every H>640 geometry onto the slower xla scan).
_BIG_VMEM_KINDS = ("v4", "v5 lite", "v5litepod", "v5e", "v5p", "v6")


def vmem_budget_bytes(device=None) -> int:
    """Per-core VMEM of the local accelerator. v5e/v5p/v6e carry 128 MiB;
    unknown kinds get the conservative 16 MiB floor. Calibrated on the live
    v5e: an H=1024 parity kernel (~27 MiB resident) compiles and runs,
    while the floor alone would reject anything past H=640."""
    import jax

    try:
        dev = device if device is not None else jax.local_devices()[0]
        kind = str(getattr(dev, "device_kind", "")).lower()
    except Exception:
        return VMEM_BUDGET_BYTES
    if any(k in kind for k in _BIG_VMEM_KINDS):
        return 128 * 1024 * 1024
    return VMEM_BUDGET_BYTES


def _block_target(h: int) -> int:
    """Batch-block target for hidden size h: scale down with h so the
    stream-side VMEM residency (~ Bt*h) stays constant."""
    return max(8, (256 * H // h) // 8 * 8)


def infer_vmem_bytes(h: int, bt: int = 0) -> int:
    """Worst-case (parity-mode) VMEM residency of :func:`fused_bigru_window`.

    The weight blocks are grid-constant and O(h^2): 4 bf16 (h, 3h) blocks
    (hi+lo per direction). Streams (xp in, out) are double-buffered and
    O(Bt*h). Only Bt scales down with h, so past a hidden size the weights
    alone exceed VMEM — resolve_backend must reject those geometries rather
    than let Mosaic fail the compile mid-job."""
    bt = bt or _block_target(h)
    weights = 4 * 3 * h * h * 2              # wf/wb hi+lo, bf16
    streams = (2 * 3 * h + 2 * h) * 2 * 4 * bt  # xp in + out, f32, 2x buffered
    vectors = 6 * bt * h * 4                 # h0 + hfin + scratch per direction
    return weights + streams + vectors


def infer_fits_vmem(h: int, budget: int = 0) -> bool:
    budget = budget or vmem_budget_bytes()
    return infer_vmem_bytes(h) <= int(budget * _VMEM_USABLE)


def _pick_block(B: int, target: int = 0, h: int = H) -> int:
    if not target:
        # scale the batch block down with the hidden size so the kernel's
        # VMEM residency (streams + weights + double buffers ~ Bt*H) stays
        # inside the ~16 MB budget at larger geometries
        target = _block_target(h)
    if B <= target:
        return B
    b = target
    while B % b != 0:
        b -= 8 if b > 8 else 1
        if b <= 8:
            return B if B % 8 else 8
    return b


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def fused_bigru_window(
    xp_f: jnp.ndarray,  # (T, B, 3H): x @ W_ih_f + b_ih_f + b_hh_f
    xp_b: jnp.ndarray,  # (T, B, 3H): same for the backward direction
    h0_f: jnp.ndarray,  # (B, H)
    h0_b: jnp.ndarray,  # (B, H)
    w_f: jnp.ndarray,  # (H, 3H)
    w_b: jnp.ndarray,  # (H, 3H)
    bh_f: jnp.ndarray,  # (1, 3H) hidden bias (inside the reset gate product)
    bh_b: jnp.ndarray,  # (1, 3H)
    block_b: int = 0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run both GRU directions over a window. Returns (out_f (T,B,H),
    out_b (T,B,H) in original time order, h_final_f, h_final_b)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, threeH = xp_f.shape
    Hm = h0_f.shape[1]  # model hidden size: any lane-width multiple
    assert threeH == 3 * Hm, f"expected 3H={3 * Hm}, got {threeH}"
    assert Hm % 128 == 0, (
        f"fused kernel needs hidden_size % 128 == 0, got {Hm} "
        "(resolve_backend falls back to xla for other geometries)"
    )
    Bt = block_b or _pick_block(B, h=Hm)
    assert B % Bt == 0, f"batch {B} not divisible by block {Bt}"

    # bf16 weights select fast mode (single bf16 product); fp32 weights are
    # pre-split into hi+lo bf16 halves for the in-kernel bf16x3 parity
    # product (see _gru_gates)
    fast = w_f.dtype == jnp.bfloat16
    if fast:
        wf_hi, wb_hi = w_f, w_b
        wf_lo, wb_lo = jnp.zeros_like(w_f), jnp.zeros_like(w_b)  # never read
    else:
        wf_hi, wf_lo = _split_bf16x2(w_f)
        wb_hi, wb_lo = _split_bf16x2(w_b)

    grid = (B // Bt, T)
    specs = dict(
        xp=lambda rev: pl.BlockSpec(
            (1, Bt, 3 * Hm),
            (lambda b, t: (T - 1 - t, b, 0)) if rev else (lambda b, t: (t, b, 0)),
            memory_space=pltpu.VMEM,
        ),
        h0=pl.BlockSpec((Bt, Hm), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        w=pl.BlockSpec((Hm, 3 * Hm), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        bias=pl.BlockSpec((1, 3 * Hm), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        out=lambda rev: pl.BlockSpec(
            (1, Bt, Hm),
            (lambda b, t: (T - 1 - t, b, 0)) if rev else (lambda b, t: (t, b, 0)),
            memory_space=pltpu.VMEM,
        ),
        hfin=pl.BlockSpec((Bt, Hm), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
    )

    out_f, out_b, hf, hb = pl.pallas_call(
        functools.partial(_kernel, T=T, fast=fast),
        grid=grid,
        in_specs=[
            specs["xp"](False), specs["xp"](True),
            specs["h0"], specs["h0"],
            specs["w"], specs["w"], specs["w"], specs["w"],
            specs["bias"], specs["bias"],
        ],
        out_specs=[
            specs["out"](False), specs["out"](True),
            specs["hfin"], specs["hfin"],
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
    )(xp_f, xp_b, h0_f, h0_b, wf_hi, wb_hi, wf_lo, wb_lo, bh_f, bh_b)
    return out_f, out_b, hf, hb


def bigru_apply_fused(
    params,
    x: jnp.ndarray,  # (T, B, D) time-major
    h0_fwd: jnp.ndarray,
    h0_bwd: jnp.ndarray,
    precision=None,
    interpret: bool = False,
    fast: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for models.gru.bigru_apply using the fused kernel.

    The input projections stay in XLA (one large MXU matmul over all
    timesteps); only the sequential recurrence runs in Pallas.

    fast=True runs the matmuls (input projections and the recurrence) in
    bfloat16 with float32 accumulation and gates — ~2x MXU throughput and
    half the stream bandwidth, at the cost of strict bit-parity with the
    reference (argmax labels flip only where votes are near-ties).
    """
    f, b = params["fwd"], params["bwd"]
    if fast:
        xb = x.astype(jnp.bfloat16)
        xp_f = (
            jnp.dot(xb, f["w_ih"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + f["b_ih"]
        ).astype(jnp.bfloat16)
        xp_b = (
            jnp.dot(xb, b["w_ih"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + b["b_ih"]
        ).astype(jnp.bfloat16)
        w_f = f["w_hh"].astype(jnp.bfloat16)
        w_b = b["w_hh"].astype(jnp.bfloat16)
    else:
        xp_f = jnp.dot(x, f["w_ih"], precision=precision) + f["b_ih"]
        xp_b = jnp.dot(x, b["w_ih"], precision=precision) + b["b_ih"]
        w_f, w_b = f["w_hh"], b["w_hh"]
    out_f, out_b, hf, hb = fused_bigru_window(
        xp_f, xp_b, h0_fwd, h0_bwd, w_f, w_b,
        f["b_hh"].reshape(1, -1), b["b_hh"].reshape(1, -1),
        interpret=interpret,
    )
    return jnp.concatenate([out_f, out_b], axis=-1), hf, hb
