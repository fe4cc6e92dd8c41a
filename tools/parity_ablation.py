"""Parity-tier time-split ablation (where do the parity program's ms go?).

The fast tier's floor was established by ablation (38 chained kernel
launches = 70% of the whole program; ops/gru_pallas.py:29-60). This tool
applies the same rigor to the PARITY tier: it times, under the bench
protocol (device-resident inputs, pipelined scalar readback, steady state),

  full    — the complete parity program (consensus_labels, backend=pallas:
            HIGH input projections + bf16x3 fused kernel + HIGH heads +
            softmax vote + argmax)
  kernel  — 38 chained fused-kernel launches alone (19 windows x enc+dec),
            chained through the final-hidden outputs so each launch depends
            on the previous; the out-stream HBM writes still happen
            (pallas_call outputs cannot be dead-code-eliminated per-output)
  proj    — the Precision.HIGH input projections alone, replayed in the
            same scan-over-windows shape as the real program (encoder
            90->384 and decoder 256->384, both directions)
  vote    — heads (HIGH) + softmax + vote accumulate + final argmax alone,
            same scan shape, on a carried pseudo decoder output

Parts overlap on hardware (MXU matmuls pipeline against VPU gate math and
HBM streams), so shares are reported against the full program rather than
expected to sum to 100%.

Usage:  python tools/parity_ablation.py  [batch [steps]]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def _steady_state(fn, args, steps: int) -> float:
    """Seconds/step at steady state with a pipelined scalar readback."""
    out = fn(*args)
    _ = [float(np.asarray(o).ravel()[0]) for o in out]  # compile + warmup
    t0 = time.perf_counter()
    prev = fn(*args)
    for _ in range(steps - 1):
        cur = fn(*args)
        float(np.asarray(prev[0]).ravel()[0])
        prev = cur
    float(np.asarray(prev[0]).ravel()[0])
    return (time.perf_counter() - t0) / steps


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from helen_tpu.config import WINDOW
    from helen_tpu.models.transducer import consensus_labels, init_params
    from helen_tpu.ops.gru_pallas import fused_bigru_window
    from helen_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    L, F, H, W = 1000, 90, 128, WINDOW.window
    n_windows = WINDOW.num_windows(L)
    windows_per_batch = B * n_windows

    rng = np.random.default_rng(0)
    params = jax.device_put(init_params(jax.random.PRNGKey(0)))
    images_u8 = jax.device_put(
        rng.integers(0, 40, size=(B, L, F)).astype(np.uint8))

    results = {}

    # ---- full parity program -------------------------------------------
    full_fn = jax.jit(lambda p, im: [
        o.sum() for o in consensus_labels(p, im.astype(jnp.float32),
                                          backend="pallas")
    ])
    results["full"] = _steady_state(full_fn, (params, images_u8), steps)

    # ---- kernel-only: 38 chained launches ------------------------------
    xp_f = jax.device_put(rng.standard_normal((W, B, 3 * H)).astype(np.float32))
    xp_b = jax.device_put(rng.standard_normal((W, B, 3 * H)).astype(np.float32))
    w_f = jax.device_put(rng.standard_normal((H, 3 * H)).astype(np.float32) * 0.05)
    w_b = jax.device_put(rng.standard_normal((H, 3 * H)).astype(np.float32) * 0.05)
    bh = jax.device_put(np.zeros((1, 3 * H), np.float32))

    def kernel_chain(xpf, xpb, wf, wb, b):
        hf = jnp.zeros((B, H), jnp.float32)
        hb = jnp.zeros((B, H), jnp.float32)
        for _ in range(2 * n_windows):  # encoder + decoder per window
            _, _, hf, hb = fused_bigru_window(xpf, xpb, hf, hb, wf, wb, b, b)
        return [hf.sum()]

    results["kernel"] = _steady_state(
        jax.jit(kernel_chain), (xp_f, xp_b, w_f, w_b, bh), steps)

    # ---- HIGH input projections alone, real scan shape ------------------
    def proj_program(p, im):
        images = im.astype(jnp.float32)
        starts = jnp.asarray(WINDOW.starts(L), dtype=jnp.int32)
        enc_f, enc_b = p["encoder"]["fwd"], p["encoder"]["bwd"]
        dec_f, dec_b = p["decoder"]["fwd"], p["decoder"]["bwd"]
        hi = lax.Precision.HIGH

        def body(carry, start):
            x = lax.dynamic_slice(images, (0, start, 0), (B, W, F))
            xt = jnp.swapaxes(x, 0, 1)
            pf = jnp.dot(xt, enc_f["w_ih"], precision=hi) + enc_f["b_ih"]
            pb = jnp.dot(xt, enc_b["w_ih"], precision=hi) + enc_b["b_ih"]
            # pseudo decoder input with the right (W, B, 2H) shape, derived
            # from the encoder projections so nothing folds away
            d_in = jnp.concatenate([pf[:, :, :H], pb[:, :, :H]], axis=-1)
            df = jnp.dot(d_in, dec_f["w_ih"], precision=hi) + dec_f["b_ih"]
            db = jnp.dot(d_in, dec_b["w_ih"], precision=hi) + dec_b["b_ih"]
            return carry + pf.sum() + pb.sum() + df.sum() + db.sum(), None

        acc, _ = lax.scan(body, jnp.float32(0), starts)
        return [acc]

    results["proj"] = _steady_state(
        jax.jit(proj_program), (params, images_u8), steps)

    # ---- heads + softmax + vote + argmax alone --------------------------
    def vote_program(p, im):
        images = im.astype(jnp.float32)
        starts = jnp.asarray(WINDOW.starts(L), dtype=jnp.int32)
        hi = lax.Precision.HIGH
        base_acc = jnp.zeros((B, L, 5), jnp.float32)
        rle_acc = jnp.zeros((B, L, 11), jnp.float32)
        dec0 = jnp.tile(images[:, :W, :1], (1, 1, 2 * H)) * 0.01

        def body(carry, start):
            dec_out, base_acc, rle_acc = carry
            base = jnp.dot(dec_out, p["base_head"]["w"], precision=hi) + p["base_head"]["b"]
            rle = jnp.dot(dec_out, p["rle_head"]["w"], precision=hi) + p["rle_head"]["b"]
            bp = jax.nn.softmax(base, axis=-1)
            rp = jax.nn.softmax(rle, axis=-1)
            bc = lax.dynamic_slice(base_acc, (0, start, 0), (B, W, 5))
            rc = lax.dynamic_slice(rle_acc, (0, start, 0), (B, W, 11))
            base_acc = lax.dynamic_update_slice(base_acc, bc + bp, (0, start, 0))
            rle_acc = lax.dynamic_update_slice(rle_acc, rc + rp, (0, start, 0))
            # perturb the carried pseudo dec_out so windows stay dependent
            dec_out = dec_out + bp[:, :, :1] * 1e-3
            return (dec_out, base_acc, rle_acc), None

        (_, base_acc, rle_acc), _ = lax.scan(
            body, (dec0, base_acc, rle_acc), starts)
        return [jnp.argmax(base_acc, -1).sum(), jnp.argmax(rle_acc, -1).sum()]

    results["vote"] = _steady_state(
        jax.jit(vote_program), (params, images_u8), steps)

    full = results["full"]
    print(f"B={B} steps={steps} windows/batch={windows_per_batch}")
    print(f"{'part':<8}{'s/step':>10}{'windows/s':>14}{'share of full':>16}")
    for k, v in results.items():
        print(f"{k:<8}{v:>10.4f}{windows_per_batch / v:>14,.0f}"
              f"{v / full:>15.1%}")
    unacc = full - results["kernel"] - results["proj"] - results["vote"]
    print(f"unaccounted (overlap/fusion): {unacc:+.4f}s = {unacc / full:+.1%}")


if __name__ == "__main__":
    main()
