"""Scaling-efficiency harness: consensus throughput vs device count.

SURVEY.md §8.2 step 5 ("1-chip -> 1-host -> N-host efficiency measurement
harness"): measures the flagship consensus program over growing subsets of
the local devices on a 1-D data mesh — batch sharded, weights replicated,
zero collectives — and reports windows/s plus scaling efficiency relative
to one device. The reference has no such harness; its multi-GPU behavior
was only ever inferred from whole-genome wall clocks (docs/runtime_cost.md).

Cross-host scaling needs no collective measurement at all (hosts are fully
independent: files/images shard per host, one prediction shard per host),
so aggregate throughput is the sum of per-host numbers from this tool, and
efficiency loss can only come from input skew — see
parallel.multihost.host_image_shard.

Usage:
  python -m helen_tpu.tools.scaling_bench [-b PER_DEVICE_BATCH] [--steps N]
      [--devices 1,2,4] [--backend pallas|pallas_fast|xla]

Prints one JSON line per device count:
  {"devices": k, "windows_per_s": W, "per_device": W/k, "efficiency": e}
"""
from __future__ import annotations

import argparse
import json
import time
from typing import List, Optional, Sequence

import numpy as np

from helen_tpu.config import WINDOW, IMAGE
from helen_tpu.obs import get_logger

log = get_logger("scaling_bench")


def measure(
    device_counts: Optional[Sequence[int]] = None,
    per_device_batch: int = 256,
    steps: int = 6,
    backend: Optional[str] = None,
) -> List[dict]:
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from helen_tpu.models.transducer import consensus_labels, init_params

    devices = jax.local_devices()
    if device_counts is None:
        device_counts = sorted({1, *[2 ** i for i in range(1, 6)
                                     if 2 ** i <= len(devices)]})
    # ascending, so the efficiency baseline is the SMALLEST measured count
    # (ideally 1); report which count the baseline used
    device_counts = sorted(k for k in device_counts if k <= len(devices))
    if backend is None:
        backend = "pallas" if devices[0].platform in ("tpu", "axon") else "xla"

    params = init_params(jax.random.PRNGKey(0))
    n_windows = WINDOW.num_windows(IMAGE.seq_length)
    rng = np.random.default_rng(0)
    results = []
    base = None
    for k in device_counts:
        mesh = Mesh(np.asarray(devices[:k]), ("data",))
        rep = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P("data"))
        p = jax.device_put(params, rep)

        def step(pp, im):
            base_l, rle_l = consensus_labels(pp, im,
                                             backend=backend)
            s_b, s_r = base_l.sum(), rle_l.sum()
            if k > 1:
                s_b = jax.lax.psum(s_b, "data")
                s_r = jax.lax.psum(s_r, "data")
            return s_b, s_r

        if k > 1:
            # shard_map, not a GSPMD-sharded jit: Mosaic kernels cannot be
            # auto-partitioned (same as infer.consensus.ConsensusStep)
            step = jax.shard_map(
                step, mesh=mesh, in_specs=(P(), P("data")),
                out_specs=(P(), P()), check_vma=False,
            )
        fn = jax.jit(step)
        B = per_device_batch * k
        batches = [
            jax.device_put(
                rng.integers(0, 40, size=(B, IMAGE.seq_length,
                                          IMAGE.feature_dim)).astype(np.uint8),
                shard,
            )
            for _ in range(2)
        ]
        float(fn(p, batches[0])[0])  # compile + warmup
        t0 = time.perf_counter()
        prev = fn(p, batches[0])
        for i in range(1, steps):
            cur = fn(p, batches[i % 2])
            float(prev[0])
            prev = cur
        float(prev[0])
        dt = time.perf_counter() - t0
        wps = steps * B * n_windows / dt
        if base is None:
            base = wps / k
            base_devices = k
        row = {
            "devices": k,
            "windows_per_s": round(wps, 1),
            "per_device": round(wps / k, 1),
            # relative to the smallest measured count (1 when included) —
            # counts are sorted ascending above
            "efficiency": round((wps / k) / base, 4),
            "baseline_devices": base_devices,
            "backend": backend,
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="consensus scaling efficiency vs local device count"
    )
    ap.add_argument("-b", "--per_device_batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--devices", default=None,
                    help="comma-separated device counts (default: 1,2,4,... "
                         "up to the local device count)")
    ap.add_argument("--backend", default=None,
                    choices=["xla", "pallas", "pallas_fast"])
    ap.add_argument("--json_out", default=None,
                    help="also write {meta, rows} to this JSON file (the CI "
                         "scaling artifact — ci/run_checks.sh)")
    args = ap.parse_args(argv)
    counts = ([int(x) for x in args.devices.split(",")]
              if args.devices else None)
    rows = measure(counts, args.per_device_batch, args.steps, args.backend)
    if args.json_out:
        import os

        import jax

        # On an oversubscribed virtual mesh (8 XLA host devices on a
        # 2-vCPU box) per-device "efficiency" just measures core sharing;
        # the sharding-overhead signal is AGGREGATE flatness: total
        # windows/s at the largest count vs the smallest.
        meta = {
            "platform": jax.local_devices()[0].platform,
            "device_kind": str(getattr(jax.local_devices()[0],
                                       "device_kind", "")),
            "local_devices": jax.local_device_count(),
            "host_cpus": os.cpu_count(),
            "per_device_batch": args.per_device_batch,
            "steps": args.steps,
            "aggregate_ratio": round(
                rows[-1]["windows_per_s"] / rows[0]["windows_per_s"], 4
            ) if len(rows) > 1 else 1.0,
        }
        with open(args.json_out, "w") as f:
            json.dump({"meta": meta, "rows": rows}, f, indent=1)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
