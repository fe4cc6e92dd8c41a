"""Incremental parity-tier ablation: strip the program stage by stage.

tools/parity_ablation.py times each stage IN ISOLATION; parts overlap on
hardware and share scan machinery, so shares summed to ~147% of the full
program. This tool measures the SERIAL increments instead: each variant is
the real consensus program (same lax.scan over 19 windows, same carried
hidden) with suffix stages removed, so

    full - novote   = softmax + vote-accumulate + argmax increment
    novote - nohead = head matmul increment
    nohead - nodec  = decoder (HIGH proj + fused kernel) increment
    nodec - noenc   = encoder kernel increment (noenc keeps the HIGH
                      projections but replaces the kernel with a cheap sum)
    noenc           = encoder HIGH projections + scan/slice machinery

Each variant keeps the cross-window data dependence (the decoder — or, when
the decoder is stripped, the encoder — final hidden still seeds the next
window) so XLA cannot parallelize across windows any more than the real
program can.

Usage:  python tools/parity_ablation2.py [batch [steps]]
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
        consensus_labels, init_params, _stack_layers)
    from helen_tpu.ops.gru_pallas import bigru_apply_fused
    from helen_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    L, F, H, W = 1000, 90, MODEL.hidden_size, WINDOW.window
    n_windows = WINDOW.num_windows(L)
    wps = B * n_windows

    rng = np.random.default_rng(0)
    params = jax.device_put(init_params(jax.random.PRNGKey(0)))
    images_u8 = jax.device_put(
        rng.integers(0, 40, size=(B, L, F)).astype(np.uint8))

    hi = lax.Precision.HIGH

    def make_variant(mode: str):
        """The real consensus scan with suffix stages stripped per `mode`."""

        def program(p, im):
            images = im.astype(jnp.float32)
            starts = jnp.asarray(WINDOW.starts(L), dtype=jnp.int32)
            enc = _stack_layers(p["encoder"])[0]
            dec = _stack_layers(p["decoder"])[0]
            base_acc = jnp.zeros((B, L, 5), jnp.float32)
            rle_acc = jnp.zeros((B, L, 11), jnp.float32)
            h0 = (jnp.zeros((B, H), jnp.float32),) * 2

            def body(carry, start):
                (hf, hb), base_acc, rle_acc, acc = carry
                x = lax.dynamic_slice(images, (0, start, 0), (B, W, F))
                xt = jnp.swapaxes(x, 0, 1)
                if mode == "noenc":
                    # HIGH projections only; a cheap reduction stands in for
                    # the kernel so the carry still depends on this window
                    pf = jnp.dot(xt, enc["fwd"]["w_ih"], precision=hi) + enc["fwd"]["b_ih"]
                    pb = jnp.dot(xt, enc["bwd"]["w_ih"], precision=hi) + enc["bwd"]["b_ih"]
                    hf = hf + pf.mean(axis=0)[:, :H] + pb.mean(axis=0)[:, :H]
                    return ((hf, hb), base_acc, rle_acc, acc + hf.sum()), None
                out, ehf, ehb = bigru_apply_fused(enc, xt, hf, hb, precision=hi)
                if mode == "nodec":
                    return ((ehf, ehb), base_acc, rle_acc, acc + out.sum()), None
                out, dhf, dhb = bigru_apply_fused(dec, out, ehf, ehb, precision=hi)
                dec_out = jnp.swapaxes(out, 0, 1)
                if mode == "nohead":
                    return ((dhf, dhb), base_acc, rle_acc, acc + dec_out.sum()), None
                base = jnp.dot(dec_out, p["base_head"]["w"], precision=hi) + p["base_head"]["b"]
                rle = jnp.dot(dec_out, p["rle_head"]["w"], precision=hi) + p["rle_head"]["b"]
                if mode == "novote":
                    return ((dhf, dhb), base_acc, rle_acc,
                            acc + base.sum() + rle.sum()), None
                bp = jax.nn.softmax(base, axis=-1)
                rp = jax.nn.softmax(rle, axis=-1)
                bc = lax.dynamic_slice(base_acc, (0, start, 0), (B, W, 5))
                rc = lax.dynamic_slice(rle_acc, (0, start, 0), (B, W, 11))
                base_acc = lax.dynamic_update_slice(base_acc, bc + bp, (0, start, 0))
                rle_acc = lax.dynamic_update_slice(rle_acc, rc + rp, (0, start, 0))
                return ((dhf, dhb), base_acc, rle_acc, acc), None

            carry, _ = lax.scan(
                body, (h0, base_acc, rle_acc, jnp.float32(0)), starts)
            (_, base_acc, rle_acc, acc) = carry
            if mode == "full":
                return [jnp.argmax(base_acc, -1).sum(),
                        jnp.argmax(rle_acc, -1).sum()]
            return [acc]

        return jax.jit(program)

    results = {}
    for mode in ("full", "novote", "nohead", "nodec", "noenc"):
        results[mode] = _steady_state(
            make_variant(mode), (params, images_u8), steps)

    # cross-check vs the production program
    prod = jax.jit(lambda p, im: [
        o.sum() for o in consensus_labels(p, im.astype(jnp.float32),
                                          backend="pallas")])
    results["production"] = _steady_state(prod, (params, images_u8), steps)

    full = results["full"]
    print(f"B={B} steps={steps} windows/batch={wps}")
    print(f"{'variant':<12}{'s/step':>10}{'windows/s':>14}{'share':>9}")
    for k, v in results.items():
        print(f"{k:<12}{v:>10.4f}{wps / v:>14,.0f}{v / full:>8.1%}")
    print("\nserial increments (of full):")
    incs = [
        ("vote+argmax", full - results["novote"]),
        ("heads", results["novote"] - results["nohead"]),
        ("decoder proj+kernel", results["nohead"] - results["nodec"]),
        ("encoder kernel", results["nodec"] - results["noenc"]),
        ("encoder proj+scan", results["noenc"]),
    ]
    for name, v in incs:
        print(f"  {name:<22}{v:>9.4f}s {v / full:>7.1%}")


if __name__ == "__main__":
    main()
