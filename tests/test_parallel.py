"""Mesh sharding tests on the virtual 8-device CPU mesh."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helen_tpu.config import MODEL
from helen_tpu.models.transducer import init_params
from helen_tpu.parallel.mesh import make_mesh, mesh_shape_for
from helen_tpu.parallel.multihost import allsum_hosts, host_file_shard, initialize
from helen_tpu.parallel.sharding import (
    make_sharded_consensus_fn,
    make_sharded_train_step,
    shard_params,
)
from helen_tpu.train.train_loop import make_optimizer


def test_mesh_shape_for():
    assert mesh_shape_for(8, 1) == (8, 1)
    assert mesh_shape_for(8, 2) == (4, 2)
    assert mesh_shape_for(8, 3) == (4, 2)  # 3 doesn't divide 8 -> fall to 2
    assert mesh_shape_for(1, 4) == (1, 1)


@pytest.mark.parametrize("mp", [1, 2])
def test_sharded_train_step_runs(mp):
    mesh = make_mesh(jax.devices(), model_parallel=mp)
    params = shard_params(mesh, init_params(jax.random.PRNGKey(0), MODEL))
    tx = make_optimizer(0.0)
    opt_state = tx.init(params)
    step = make_sharded_train_step(mesh, tx, image_len=200)
    rng = np.random.default_rng(0)
    dp = mesh.devices.shape[0]
    images = rng.integers(0, 40, size=(dp, 200, 90)).astype(np.uint8)
    yb = rng.integers(0, 5, size=(dp, 200)).astype(np.int32)
    yr = rng.integers(0, 11, size=(dp, 200)).astype(np.int32)
    params, opt_state, loss, lb, lr = step(
        params, opt_state, jnp.float32(1e-4), images, yb, yr, dp
    )
    assert np.isfinite(float(loss))


def test_sharded_train_matches_single_device():
    """dp+tp sharded step must produce the same loss and params as 1 device."""
    params0 = init_params(jax.random.PRNGKey(1), MODEL)
    tx = make_optimizer(0.0)
    rng = np.random.default_rng(3)
    images = rng.integers(0, 40, size=(8, 200, 90)).astype(np.uint8)
    yb = rng.integers(0, 5, size=(8, 200)).astype(np.int32)
    yr = rng.integers(0, 11, size=(8, 200)).astype(np.int32)

    from helen_tpu.train.train_loop import build_tbptt_fn

    fn = build_tbptt_fn(tx, image_len=200, precision=jax.lax.Precision.HIGHEST)
    single = jax.jit(fn, device=jax.devices()[0])
    p1, _, loss1, _, _ = single(params0, tx.init(params0), jnp.float32(1e-3),
                                images, yb, yr, 8)

    mesh = make_mesh(jax.devices(), model_parallel=2)
    ps = shard_params(mesh, params0)
    step = make_sharded_train_step(mesh, tx, image_len=200,
                                   precision=jax.lax.Precision.HIGHEST)
    p2, _, loss2, _, _ = step(ps, tx.init(ps), jnp.float32(1e-3),
                              images, yb, yr, 8)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p1["base_head"]["w"]), np.asarray(p2["base_head"]["w"]),
        atol=1e-5,
    )


def test_shard_map_train_step_matches_single_device_with_padding():
    """make_train_step's multi-device path (shard_map + psummed global
    denominators/gradients) must reproduce the single-device TBPTT step
    exactly — including when padding rows (valid < B) land entirely on the
    last shards, where per-shard loss means would be wrong."""
    from helen_tpu.train.train_loop import build_tbptt_fn, make_train_step

    params0 = init_params(jax.random.PRNGKey(4), MODEL)
    tx = make_optimizer(0.0)
    rng = np.random.default_rng(5)
    B, valid = 16, 11  # 5 padding rows: shards 5..7 of 8 partially/all pad
    images = rng.integers(0, 40, size=(B, 1000, 90)).astype(np.uint8)
    yb = rng.integers(0, 5, size=(B, 1000)).astype(np.int32)
    yr = rng.integers(0, 11, size=(B, 1000)).astype(np.int32)

    fn = build_tbptt_fn(tx, precision=jax.lax.Precision.HIGHEST)
    single = jax.jit(fn, device=jax.devices()[0])
    p1, _, loss1, lb1, lr1 = single(params0, tx.init(params0),
                                    jnp.float32(1e-3), images, yb, yr, valid)

    step, mult = make_train_step(tx, data_parallel=True,
                                 precision=jax.lax.Precision.HIGHEST)
    assert mult == len(jax.devices())
    p2, _, loss2, lb2, lr2 = step(params0, tx.init(params0),
                                  jnp.float32(1e-3), images, yb, yr, valid)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(float(lb1), float(lb2), rtol=1e-5)
    np.testing.assert_allclose(float(lr1), float(lr2), rtol=1e-5)
    for k in ("base_head", "rle_head"):
        np.testing.assert_allclose(
            np.asarray(p1[k]["w"]), np.asarray(p2[k]["w"]), atol=1e-5
        )


def test_sharded_consensus_matches_single_device():
    params = init_params(jax.random.PRNGKey(2), MODEL)
    rng = np.random.default_rng(1)
    images = rng.integers(0, 40, size=(8, 1000, 90)).astype(np.uint8)

    from helen_tpu.models.transducer import consensus_labels

    ref_b, ref_r = jax.jit(
        lambda p, im: consensus_labels(p, im.astype(jnp.float32)),
        device=jax.devices()[0],
    )(params, images)

    mesh = make_mesh(jax.devices(), model_parallel=2)
    fn = make_sharded_consensus_fn(mesh)
    got_b, got_r = fn(shard_params(mesh, params), images)
    assert (np.asarray(got_b) == np.asarray(ref_b)).all()
    assert (np.asarray(got_r) == np.asarray(ref_r)).all()


def test_graft_entry():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (8, 1000)
    ge.dryrun_multichip(8)


def test_multihost_helpers_single_process():
    initialize()  # no-op
    files = [f"f{i}.h5" for i in range(5)]
    assert host_file_shard(files, 0, 2) == ["f0.h5", "f2.h5", "f4.h5"]
    assert host_file_shard(files, 1, 2) == ["f1.h5", "f3.h5"]
    cm = np.ones((3, 3))
    assert (allsum_hosts(cm) == cm).all()


def test_allsum_hosts_exact_preserves_large_counts():
    """allsum_hosts carries float32 over the wire (x64 disabled), rounding
    counts above 2^24 — reachable on genome-scale eval confusion matrices.
    The limb-exact variant must keep such counts exact end to end."""
    import pytest

    from helen_tpu.parallel.multihost import (
        _combine_limbs,
        _split_limbs,
        allsum_hosts_exact,
    )

    big = np.array([0, 1, 2**24 + 1, 2**33 + 12345, 2**47 + 7], dtype=np.int64)
    # the plain float32 wire format demonstrably corrupts these values
    assert np.float32(big[2]) != big[2] or np.float32(big[3]) != big[3]
    # limb split/combine round-trips exactly, and each limb fits float32
    limbs = _split_limbs(big)
    assert limbs.shape == (3, 5) and limbs.max() < 2**24
    assert (_combine_limbs(limbs) == big).all()
    # single-process: identity, int64 out
    out = allsum_hosts_exact(big.astype(np.float64))
    assert out.dtype == np.int64 and (out == big).all()
    with pytest.raises(ValueError):
        _split_limbs(np.array([-1]))


def test_host_image_shard_contiguous_complete():
    """Every image assigned exactly once; per-host slices are contiguous
    (sequential HDF5 reads / packed slab reads) and count-balanced."""
    from helen_tpu.parallel.multihost import host_image_shard

    for n, pc in [(10, 2), (11, 3), (7, 8), (0, 2), (1000, 7)]:
        shards = [host_image_shard(n, pi, pc) for pi in range(pc)]
        flat = [i for s in shards for i in s]
        assert flat == list(range(n)), (n, pc)
        sizes = [len(s) for s in shards]
        assert max(sizes) - min(sizes) <= 1, (n, pc, sizes)
        for s in shards:
            assert s == list(range(s[0], s[-1] + 1)) if s else True


def test_scaling_bench_harness():
    """The scaling harness runs on the virtual device mesh and reports
    monotone device counts with efficiency relative to one device."""
    from helen_tpu.tools.scaling_bench import measure

    rows = measure(device_counts=[1, 2], per_device_batch=2, steps=2)
    assert [r["devices"] for r in rows] == [1, 2]
    assert rows[0]["efficiency"] == 1.0
    assert all(r["windows_per_s"] > 0 for r in rows)


def test_sharding_overhead_harness_smoke():
    """The CI sharding-overhead harness (tools/sharding_overhead) runs on
    the virtual mesh and produces finite overhead ratios — the artifact
    the >=85% scaling story gates on (docs/multihost.md)."""
    from helen_tpu.tools.sharding_overhead import measure

    rows = measure([2], per_device_batch=1, steps=1, image_len=100)
    assert len(rows) == 1 and rows[0]["devices"] == 2
    assert rows[0]["global_batch"] == 2
    for k in ("train_overhead", "consensus_overhead"):
        assert -0.95 < rows[0][k] < 20.0  # finite, sane
