"""Count TPU-backend label flips vs the fp32 CPU reference arithmetic.

The parity contract (docs/performance.md, "The fp32 parity trap on TPU") is
measured in label flips per 2x64,000 labels against a full-fp32 replay of
the reference vote arithmetic on random weights (adversarial: trained
models have far fewer near-tie votes). This tool recomputes that number for
any inference backend so kernel/numerics changes can be validated on the
live chip:

  * reference labels: consensus_labels with backend="xla" jitted ON THE
    HOST CPU (fp32 throughout — jax CPU matmuls do not round operands),
    cached under ~/.cache/helen_tpu keyed by (seed, B, L).
  * candidate labels: the requested backend on the default (TPU) device.

Prints one line per head: flip count, total labels, and max |vote delta|.

Usage:  python tools/parity_flips.py [backend [batch [seed [dtype]]]]
        backend in {pallas, pallas_fast, xla}; default pallas, B=64.
        dtype in {u8, f32} — u8 (default) is the production path (images
        stay uint8 into the kernel, exact-bf16 2-pass layer-0 projection);
        f32 exercises the generic float path (in-kernel bf16x3 layer 0).
"""
from __future__ import annotations

import os
import sys

import numpy as np


def reference_labels_cpu(B: int, L: int, seed: int):
    """fp32 CPU labels + votes for the seeded weights/images, cached."""
    cache = os.path.expanduser(
        f"~/.cache/helen_tpu/parity_ref_s{seed}_b{B}_l{L}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        return z["base"], z["rle"], z["bv"], z["rv"]

    import jax
    import jax.numpy as jnp

    from helen_tpu.models.transducer import consensus_probs, init_params

    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(seed)
    with jax.default_device(cpu):
        params = init_params(jax.random.PRNGKey(seed))
        images = rng.integers(0, 40, size=(B, L, 90)).astype(np.float32)
        bv, rv = jax.jit(
            lambda p, im: consensus_probs(p, im, backend="xla",
                                          precision=jax.lax.Precision.HIGHEST)
        )(params, images)
        base = np.asarray(jnp.argmax(bv, -1).astype(jnp.uint8))
        rle = np.asarray(jnp.argmax(rv, -1).astype(jnp.uint8))
        bv, rv = np.asarray(bv), np.asarray(rv)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    np.savez_compressed(cache, base=base, rle=rle, bv=bv, rv=rv)
    return base, rle, bv, rv


def main() -> None:
    backend = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    dtype = sys.argv[4] if len(sys.argv) > 4 else "u8"
    L = 1000

    import jax
    import jax.numpy as jnp

    from helen_tpu.models.transducer import consensus_probs, init_params
    from helen_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    ref_base, ref_rle, ref_bv, ref_rv = reference_labels_cpu(B, L, seed)

    rng = np.random.default_rng(seed)
    params = jax.device_put(init_params(jax.random.PRNGKey(seed)))
    np_dtype = np.uint8 if dtype == "u8" else np.float32
    images = jax.device_put(
        rng.integers(0, 40, size=(B, L, 90)).astype(np_dtype))
    bv, rv = jax.jit(
        lambda p, im: consensus_probs(p, im, backend=backend)
    )(params, images)
    base = np.asarray(jnp.argmax(bv, -1).astype(jnp.uint8))
    rle = np.asarray(jnp.argmax(rv, -1).astype(jnp.uint8))

    n = base.size
    bf = int((base != ref_base).sum())
    rf = int((rle != ref_rle).sum())
    bd = float(np.abs(np.asarray(bv) - ref_bv).max())
    rd = float(np.abs(np.asarray(rv) - ref_rv).max())
    dev = jax.devices()[0]
    print(f"backend={backend} device={dev.platform}:{dev.device_kind} "
          f"B={B} L={L} seed={seed} input={dtype}")
    print(f"base: {bf}/{n} flips, max vote delta {bd:.2e}")
    print(f"rle : {rf}/{n} flips, max vote delta {rd:.2e}")


if __name__ == "__main__":
    main()
