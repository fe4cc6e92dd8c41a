"""Benchmark: consensus-calling throughput in pileup windows/s/chip.

Protocol: the flagship inference program (full 19-window transducer vote +
argmax over 1000x90 uint8 pileup images — exactly what `helen_tpu polish`
runs per batch) is compiled once, then driven at steady state over
device-resident uint8 batches with a pipelined scalar readback forcing
completion of every step. Device-resident inputs isolate chip throughput
from this test harness's loopback-relay transfer bandwidth (~26 MB/s, an
artifact absent on real TPU hosts where PCIe/DMA moves a 46 MB batch in ~5 ms
— the production driver overlaps those transfers with compute anyway).

Baseline: the reference polishes a human genome (~57M windows) in ~3.5h on
2x P100 ≈ 4,500 windows/s/GPU (SURVEY.md §7, docs/runtime_cost.md).

Prints ONE JSON line. The headline metric (value / vs_baseline) is the
byte-parity inference tier; the same line carries the bf16 fast tier
(--fast) and the training tier (TBPTT windows/s) so round-over-round
regressions in any tier are driver-visible (VERDICT r1 weak #7).
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_WINDOWS_PER_S = 4500.0  # reference: ~4.5K windows/s per P100
# HELEN_BENCH_* overrides serve the CI smoke (ci/run_checks.sh), which only
# checks the output contract on small shapes — TPU numbers use the defaults
BATCH = int(os.environ.get("HELEN_BENCH_BATCH", 1024))
STEPS = int(os.environ.get("HELEN_BENCH_STEPS", 10))
TRAIN_BATCH = int(os.environ.get("HELEN_BENCH_TRAIN_BATCH", 128))
TRAIN_STEPS = int(os.environ.get("HELEN_BENCH_TRAIN_STEPS", 4))
WINDOWS_PER_IMAGE = 19


def _measure_infer(jax, jnp, params, batches, backend: str,
                   steps: int = STEPS) -> float:
    """Steady-state windows/s of the consensus program on one backend."""
    from helen_tpu.models.transducer import consensus_labels

    # sum-reduce the labels so each step's completion is observable with a
    # scalar readback (full label readback would re-measure relay bandwidth)
    fn = jax.jit(
        lambda p, im: [
            o.sum()
            for o in consensus_labels(p, im.astype(jnp.float32), backend=backend)
        ]
    )
    float(fn(params, batches[0])[0])  # compile + warmup

    t0 = time.perf_counter()
    prev = fn(params, batches[0])
    for i in range(1, steps):
        cur = fn(params, batches[i % len(batches)])
        float(prev[0])
        prev = cur
    float(prev[0])
    elapsed = time.perf_counter() - t0
    return steps * BATCH * WINDOWS_PER_IMAGE / elapsed


def _measure_train(jax, jnp, backend: str) -> float:
    """Steady-state training windows/s: the full jitted TBPTT program
    (19 windows x grad + Adam step per batch), params carried step to step."""
    from helen_tpu.models.transducer import init_params
    from helen_tpu.train.train_loop import build_tbptt_fn, make_optimizer

    tx = make_optimizer(0.0)
    fn = jax.jit(build_tbptt_fn(tx, backend=backend), donate_argnums=(0, 1))
    params = init_params(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.integers(0, 40, size=(TRAIN_BATCH, 1000, 90)).astype(np.uint8))
    yb = jax.device_put(
        rng.integers(0, 5, size=(TRAIN_BATCH, 1000)).astype(np.int32))
    yr = jax.device_put(
        rng.integers(0, 11, size=(TRAIN_BATCH, 1000)).astype(np.int32))
    lr = jnp.float32(1e-4)

    params, opt_state, loss, _, _ = fn(params, opt_state, lr, images, yb, yr,
                                       TRAIN_BATCH)  # compile + warmup
    float(loss)
    t0 = time.perf_counter()
    for _ in range(TRAIN_STEPS):
        params, opt_state, loss, _, _ = fn(params, opt_state, lr, images, yb,
                                           yr, TRAIN_BATCH)
    float(loss)  # forces the whole donated chain
    elapsed = time.perf_counter() - t0
    return TRAIN_STEPS * TRAIN_BATCH * WINDOWS_PER_IMAGE / elapsed


def main() -> None:
    import jax
    import jax.numpy as jnp

    from helen_tpu.models.transducer import init_params
    from helen_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    on_tpu = jax.local_devices()[0].platform in ("tpu", "axon")
    params = jax.device_put(init_params(jax.random.PRNGKey(0)))

    rng = np.random.default_rng(0)
    batches = [
        jax.device_put(
            rng.integers(0, 40, size=(BATCH, 1000, 90)).astype(np.uint8)
        )
        for _ in range(3)
    ]

    # Every program below is a plain single-device jit, so each measurement
    # IS the per-chip number — no division by local_device_count (which
    # would under-report by N on multi-chip hosts; multi-chip scaling is
    # measured separately by tools/scaling_bench.py).

    # parity tier (headline): fused Pallas window kernel on TPU with full-
    # fp32 matmul passes — exact replay of the reference vote arithmetic
    parity = _measure_infer(jax, jnp, params, batches,
                            "pallas" if on_tpu else "xla")
    # fast tier: bf16 recurrence (--fast); labels can flip on near-tie votes.
    # Off-TPU both tiers resolve to the same xla program — alias instead of
    # compiling and timing it twice (halves the CI bench-smoke wall time).
    fast = _measure_infer(jax, jnp, params, batches,
                          "pallas_fast") if on_tpu else parity
    # training tier: fused forward+backward window kernels on TPU
    train = _measure_train(jax, jnp, "pallas_train" if on_tpu else "xla")

    print(json.dumps({
        "metric": "consensus_windows_per_s_per_chip",
        "value": round(parity, 1),
        "unit": "windows/s/chip",
        "vs_baseline": round(parity / BASELINE_WINDOWS_PER_S, 2),
        "fast_windows_per_s_per_chip": round(fast, 1),
        "fast_vs_baseline": round(fast / BASELINE_WINDOWS_PER_S, 2),
        "train_windows_per_s_per_chip": round(train, 1),
    }))


if __name__ == "__main__":
    sys.exit(main())
