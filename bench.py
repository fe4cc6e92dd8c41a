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
# B=256 is the TUNED training operating point (docs/performance.md "Training
# throughput": 130K windows/s at 256 vs 125K at 128) — bench the tier where
# production runs it so regressions there are driver-visible
TRAIN_BATCH = int(os.environ.get("HELEN_BENCH_TRAIN_BATCH", 256))
TRAIN_STEPS = int(os.environ.get("HELEN_BENCH_TRAIN_STEPS", 4))
WINDOWS_PER_IMAGE = 19
# end-to-end tier: real images on disk -> call_consensus (thread loaders,
# writer pool, resumable HDF5 store) -> stitch -> FASTA. This is the path
# whose bottleneck on real TPU hosts is the HOST (store writes, stitch) —
# the compute tiers above never see it (docs/performance.md
# "Prediction-store write throughput").
E2E_IMAGES = int(os.environ.get("HELEN_BENCH_E2E_IMAGES", 3000))
E2E_BATCH = int(os.environ.get("HELEN_BENCH_E2E_BATCH", 512))
E2E_WRITERS = int(os.environ.get("HELEN_BENCH_E2E_WRITERS", 4))


def _measure_infer(jax, jnp, params, batches, backend: str,
                   steps: int = STEPS) -> float:
    """Steady-state windows/s of the consensus program on one backend."""
    from helen_tpu.models.transducer import consensus_labels

    # sum-reduce the labels so each step's completion is observable with a
    # scalar readback (full label readback would re-measure relay bandwidth)
    # uint8 batches go in UN-cast: the pallas backends stream them into the
    # window kernel as exact bf16 (2-pass projection == Precision.HIGH
    # bit-for-bit); the xla backend casts to f32 inside consensus_labels
    fn = jax.jit(
        lambda p, im: [
            o.sum() for o in consensus_labels(p, im, backend=backend)
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


def _stage_e2e_images(n_images: int) -> str:
    """Stage (once, cached under ~/.cache) a synthetic MarginPolish image set
    of ~n_images full regions across 4 contigs."""
    import shutil

    from helen_tpu.io.synthetic import random_sequence, write_image_file

    img_dir = os.path.join(
        os.path.expanduser("~/.cache/helen_tpu/bench"), f"images_{n_images}"
    )
    done = os.path.join(img_dir, ".complete")
    if os.path.exists(done):
        return img_dir
    shutil.rmtree(img_dir, ignore_errors=True)
    os.makedirs(img_dir)
    # ~1 region-image per 3100 bases at region_cols=1000/overlap 80 (the
    # homopolymer-biased synthetic sequence RLE-compresses ~3.1 bases/column;
    # calibrated empirically); 4 contigs spread stitch across the pool
    bases_per_contig = max(2000, n_images * 3100 // 4)
    for c in range(4):
        write_image_file(
            os.path.join(img_dir, f"contig{c}.h5"),
            {f"bench_ctg{c}": random_sequence(bases_per_contig, seed=100 + c)},
            region_cols=1000, overlap_cols=80, noise=0.1, with_labels=False,
        )
    with open(done, "w") as f:
        f.write("ok")
    return img_dir


def _measure_e2e(params) -> dict:
    """The production polish pipeline end to end, with the host stage split:
    images on disk -> consensus (loaders + TPU + writer-pool store) ->
    stitch -> FASTA."""
    import shutil
    import tempfile

    from helen_tpu.infer.consensus import call_consensus
    from helen_tpu.infer.polish import perform_stitch
    from helen_tpu.io.checkpoint import save_checkpoint
    from helen_tpu.io.images import MarginPolishDataset
    from helen_tpu.obs import StageTimer

    img_dir = _stage_e2e_images(E2E_IMAGES)
    from helen_tpu.config import IMAGE
    from helen_tpu.utils.filesystem import list_image_files

    n_images = len(MarginPolishDataset(list_image_files(img_dir), IMAGE))
    out_dir = tempfile.mkdtemp(prefix="helen_bench_e2e_")
    try:
        model_npz = os.path.join(out_dir, "bench_model.npz")
        save_checkpoint(model_npz, params,
                        meta={"hidden_size": 128, "gru_layers": 1})
        timer = StageTimer()
        t0 = time.perf_counter()
        call_consensus(
            image_dir=img_dir, model_path=model_npz, output_dir=out_dir,
            batch_size=E2E_BATCH, num_workers=8, num_writers=E2E_WRITERS,
            stage_timer=timer,
        )
        consensus_s = time.perf_counter() - t0
        t1 = time.perf_counter()
        perform_stitch(out_dir, out_dir, "bench",
                       threads=min(8, os.cpu_count() or 1))
        stitch_s = time.perf_counter() - t1
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    total = consensus_s + stitch_s
    return {
        "e2e_images_per_s": round(n_images / total, 1),
        "e2e_consensus_s": round(consensus_s, 2),
        "e2e_store_write_s": round(
            timer.stages.get("write", 0.0) + timer.stages.get("flush", 0.0), 2
        ),
        "e2e_stitch_s": round(stitch_s, 2),
        "e2e_images": n_images,
    }


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

    # end-to-end tier: the whole polish pipeline including the host store
    # writes and stitch — the real-TPU-host bottleneck the compute tiers
    # can't see (VERDICT r2 item 1)
    e2e = _measure_e2e(params)

    out = {
        "metric": "consensus_windows_per_s_per_chip",
        "value": round(parity, 1),
        "unit": "windows/s/chip",
        "vs_baseline": round(parity / BASELINE_WINDOWS_PER_S, 2),
        "fast_windows_per_s_per_chip": round(fast, 1),
        "fast_vs_baseline": round(fast / BASELINE_WINDOWS_PER_S, 2),
        "train_windows_per_s_per_chip": round(train, 1),
    }
    out.update(e2e)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
