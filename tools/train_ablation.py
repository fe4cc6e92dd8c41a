"""Incremental TRAIN-tier ablation: strip the TBPTT step stage by stage.

The inference tier got a serial-increment floor characterization
(tools/parity_ablation2.py: HBM-stream-bound -> in-kernel projections;
then VPU-transcendental-bound at the fast tier); the training tier's
~150K windows/s had none (VERDICT r4 item 5). Same protocol here: each
variant is the REAL 19-window TBPTT scan (same carried hidden, same
params/opt_state carry) with suffix stages removed, so

    full   - noopt   = the 19 per-window Adam updates
    noopt  - nograd  = the whole backward pass (kernel VJPs + head/CE
                       backward + dw/dx accumulation)
    nograd - fwdonly = cross-entropy forward (masked CE + weighted CE)
    fwdonly          = forward kernels + head matmuls + scan machinery

Every variant keeps the cross-window data dependence (hidden carried; in
grad-bearing variants the carry also folds a grad leaf so XLA cannot dead-
code the backward), and `full` cross-checks against the production
build_tbptt_fn program.

Usage:  python tools/train_ablation.py [batch [steps [backend]]]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def _steady_state(fn, args, steps: int) -> float:
    out = fn(*args)
    float(np.asarray(out[0]).ravel()[0])
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

    from helen_tpu.config import IMAGE, TRAIN, WINDOW
    from helen_tpu.models.transducer import (
        forward,
        init_hidden_for,
        init_params,
    )
    from helen_tpu.train.loss import (
        masked_cross_entropy_parts,
        masked_weighted_cross_entropy_parts,
    )
    from helen_tpu.train.train_loop import build_tbptt_fn, make_optimizer
    from helen_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    backend = sys.argv[3] if len(sys.argv) > 3 else "pallas_train"
    L, F, W = IMAGE.seq_length, IMAGE.feature_dim, WINDOW.window
    n_windows = WINDOW.num_windows(L)
    wps = B * n_windows

    rng = np.random.default_rng(0)
    params = jax.device_put(init_params(jax.random.PRNGKey(0)))
    images = jax.device_put(
        rng.integers(0, 40, size=(B, L, F)).astype(np.uint8))
    yb = jax.device_put(rng.integers(0, 5, size=(B, L)).astype(np.int32))
    yr = jax.device_put(rng.integers(0, 11, size=(B, L)).astype(np.int32))
    tx = make_optimizer(0.0)
    opt_state = tx.init(params)
    lr = jnp.float32(1e-4)
    starts = jnp.asarray(WINDOW.starts(L), dtype=jnp.int32)
    rle_w = jnp.asarray(TRAIN.rle_class_weights, dtype=jnp.float32)

    def make_variant(mode: str):
        def window_loss(p, x, hidden, yb_w, yr_w, row_mask):
            base, rle, hidden_new = forward(p, x, hidden, backend=backend)
            if mode == "fwdonly":
                return base.sum() + rle.sum(), hidden_new
            nb, db = masked_cross_entropy_parts(base, yb_w, row_mask)
            nr, dr = masked_weighted_cross_entropy_parts(
                rle, yr_w, rle_w, row_mask)
            return (nb / jnp.maximum(db, 1.0)
                    + nr / jnp.maximum(dr, 1e-12)), hidden_new

        grad_fn = jax.value_and_grad(window_loss, has_aux=True)

        def program(p, o, imgs, yb_a, yr_a):
            im_f = imgs.astype(jnp.float32)
            hidden = init_hidden_for(p, B)
            row_mask = jnp.ones((B,), jnp.float32)

            def body(carry, start):
                p, o, hidden, tot = carry
                x = lax.dynamic_slice(im_f, (0, start, 0), (B, W, F))
                yb_w = lax.dynamic_slice(yb_a, (0, start), (B, W))
                yr_w = lax.dynamic_slice(yr_a, (0, start), (B, W))
                if mode in ("nograd", "fwdonly"):
                    loss, hidden = window_loss(p, x, hidden, yb_w, yr_w,
                                               row_mask)
                    return (p, o, hidden, tot + loss), None
                (loss, hidden), grads = grad_fn(p, x, hidden, yb_w, yr_w,
                                                row_mask)
                if mode == "noopt":
                    # fold EVERY grad leaf into the carry: with only a head
                    # grad kept, XLA dead-codes the entire GRU backward
                    # (observed at B=1024 — noopt == nograd exactly);
                    # params stay constant
                    gsum = sum(g.sum() for g in
                               jax.tree_util.tree_leaves(grads))
                    return (p, o, hidden, tot + loss + gsum), None
                updates, o = tx.update(grads, o, p)
                updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
                import optax

                p = optax.apply_updates(p, updates)
                return (p, o, hidden, tot + loss), None

            (p, o, hidden, tot), _ = lax.scan(
                body, (p, o, hidden, jnp.float32(0)), starts)
            return [tot]

        return jax.jit(program)

    results = {}
    for mode in ("full", "noopt", "nograd", "fwdonly"):
        results[mode] = _steady_state(
            make_variant(mode), (params, opt_state, images, yb, yr), steps)

    # cross-check vs the production TBPTT program
    prod_fn = jax.jit(build_tbptt_fn(tx, backend=backend))
    prod = jax.jit(lambda p, o, imgs, yb_a, yr_a: [
        prod_fn(p, o, lr, imgs, yb_a, yr_a, B)[2]])
    results["production"] = _steady_state(
        prod, (params, opt_state, images, yb, yr), steps)

    full = results["full"]
    print(f"B={B} steps={steps} backend={backend} windows/batch={n_windows}")
    print(f"{'variant':<12}{'s/step':>10}{'windows/s':>14}{'share':>9}")
    for k, v in results.items():
        print(f"{k:<12}{v:>10.4f}{wps / v:>14,.0f}{v / full:>8.1%}")
    print("\nserial increments (of full):")
    incs = [
        ("adam updates x19", full - results["noopt"]),
        ("backward pass", results["noopt"] - results["nograd"]),
        ("CE loss forward", results["nograd"] - results["fwdonly"]),
        ("forward+heads+scan", results["fwdonly"]),
    ]
    for name, v in incs:
        print(f"  {name:<22}{v:>9.4f}s {v / full:>7.1%}")


if __name__ == "__main__":
    main()
