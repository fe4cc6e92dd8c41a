"""Serial-increment ablation of the CURRENT (in-projection) parity program.

tools/parity_ablation2.py characterized the classic xp-stream program and
motivated the in-kernel-projection redesign; this is the same protocol on
the redesigned program, to attribute what remains at 482K windows/s and
bound the payoff of the next candidate (a fused encoder+decoder window
kernel that would keep the inter-stack halves in VMEM):

    full - novote   = softmax + vote-accumulate + argmax increment
    novote - nohead = head matmul increment
    nohead - nodec  = DECODER increment (the pair kernel: reads the
                      encoder halves 4x — fwd and reversed per direction —
                      the traffic an enc+dec fusion would eliminate)
    nodec           = encoder inproj kernel + scan/slice machinery

Usage:  PYTHONPATH=. python tools/parity_ablation3.py [batch [steps [fast]]]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def _steady_state(fn, args, steps: int) -> float:
    out = fn(*args)
    _ = [float(np.asarray(o).ravel()[0]) for o in out]
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

    from helen_tpu.config import MODEL, WINDOW
    from helen_tpu.models.transducer import (
        _stack_layers,
        consensus_labels,
        init_params,
    )
    from helen_tpu.ops.gru_pallas import bigru_apply_inproj
    from helen_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    fast = len(sys.argv) > 3 and sys.argv[3] == "fast"
    L, F, H, W = 1000, 90, MODEL.hidden_size, WINDOW.window
    n_windows = WINDOW.num_windows(L)
    wps = B * n_windows

    rng = np.random.default_rng(0)
    params = jax.device_put(init_params(jax.random.PRNGKey(0)))
    images_u8 = jax.device_put(
        rng.integers(0, 40, size=(B, L, F)).astype(np.uint8))
    hi = lax.Precision.HIGH

    def make_variant(mode: str):
        def program(p, im):
            starts = jnp.asarray(WINDOW.starts(L), dtype=jnp.int32)
            enc = _stack_layers(p["encoder"])[0]
            dec = _stack_layers(p["decoder"])[0]
            base_acc = jnp.zeros((B, L, 5), jnp.float32)
            rle_acc = jnp.zeros((B, L, 11), jnp.float32)
            h0 = (jnp.zeros((B, H), jnp.float32),) * 4  # ehf, ehb, dhf, dhb

            def body(carry, start):
                (ehf, ehb, dhf, dhb), base_acc, rle_acc, acc = carry
                x = lax.dynamic_slice(im, (0, start, 0), (B, W, F))
                xt = jnp.swapaxes(x, 0, 1)  # uint8 (W, B, F)
                of, ob, ehf, ehb = bigru_apply_inproj(
                    enc, xt, dhf, dhb, fast=fast, exact_input=True)
                if mode == "nodec":
                    return ((ehf, ehb, ehf, ehb), base_acc, rle_acc,
                            acc + of.sum() + ob.sum()), None
                df, db, dhf, dhb = bigru_apply_inproj(
                    dec, (of, ob), ehf, ehb, fast=fast)
                dec_out = jnp.swapaxes(
                    jnp.concatenate([df, db], axis=-1), 0, 1)
                if mode == "nohead":
                    return ((ehf, ehb, dhf, dhb), base_acc, rle_acc,
                            acc + dec_out.sum()), None
                prec = None if fast else hi
                base = jnp.dot(dec_out, p["base_head"]["w"],
                               precision=prec) + p["base_head"]["b"]
                rle = jnp.dot(dec_out, p["rle_head"]["w"],
                              precision=prec) + p["rle_head"]["b"]
                if mode == "novote":
                    return ((ehf, ehb, dhf, dhb), base_acc, rle_acc,
                            acc + base.sum() + rle.sum()), None
                bp = jax.nn.softmax(base, axis=-1)
                rp = jax.nn.softmax(rle, axis=-1)
                bc = lax.dynamic_slice(base_acc, (0, start, 0), (B, W, 5))
                rc = lax.dynamic_slice(rle_acc, (0, start, 0), (B, W, 11))
                base_acc = lax.dynamic_update_slice(
                    base_acc, bc + bp, (0, start, 0))
                rle_acc = lax.dynamic_update_slice(
                    rle_acc, rc + rp, (0, start, 0))
                return ((ehf, ehb, dhf, dhb), base_acc, rle_acc, acc), None

            carry, _ = lax.scan(
                body, (h0, base_acc, rle_acc, jnp.float32(0)), starts)
            (_, base_acc, rle_acc, acc) = carry
            if mode == "full":
                return [jnp.argmax(base_acc, -1).sum(),
                        jnp.argmax(rle_acc, -1).sum()]
            return [acc]

        return jax.jit(program)

    results = {}
    for mode in ("full", "novote", "nohead", "nodec"):
        results[mode] = _steady_state(
            make_variant(mode), (params, images_u8), steps)

    prod = jax.jit(lambda p, im: [
        o.astype(jnp.uint32).sum() for o in consensus_labels(
            p, im, backend="pallas_fast" if fast else "pallas")])
    results["production"] = _steady_state(prod, (params, images_u8), steps)

    full = results["full"]
    tier = "fast" if fast else "parity"
    print(f"B={B} steps={steps} tier={tier} windows/batch={n_windows}")
    print(f"{'variant':<12}{'s/step':>10}{'windows/s':>14}{'share':>9}")
    for k, v in results.items():
        print(f"{k:<12}{v:>10.4f}{wps / v:>14,.0f}{v / full:>8.1%}")
    print("\nserial increments (of full):")
    incs = [
        ("vote+argmax", full - results["novote"]),
        ("heads", results["novote"] - results["nohead"]),
        ("decoder pair kernel", results["nohead"] - results["nodec"]),
        ("encoder kernel+scan", results["nodec"]),
    ]
    for name, v in incs:
        print(f"  {name:<22}{v:>9.4f}s {v / full:>7.1%}")


if __name__ == "__main__":
    main()
