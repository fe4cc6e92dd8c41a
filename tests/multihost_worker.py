"""Worker script for the 2-process multihost smoke test (see
tests/test_multihost_smoke.py). Run as:
  python tests/multihost_worker.py <process_id> <coordinator_port>
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> int:
    pid = int(sys.argv[1])
    port = int(sys.argv[2])
    workdir = sys.argv[3] if len(sys.argv) > 3 else None
    from helen_tpu.parallel import multihost

    multihost.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert jax.device_count() == 4
    # the feature-detected coordination client must resolve in a live job —
    # barrier() silently degrading to a device collective is a regression
    assert multihost.coordination_client() is not None

    # cross-host reduction (the eval confusion-matrix path)
    cm = np.full((3, 3), float(pid + 1))
    total = multihost.allsum_hosts(cm)
    assert (total == 3.0).all(), total

    # image sharding helpers are consistent and complete across hosts
    # (contiguous equal-count blocks)
    mine = multihost.host_image_shard(10)
    assert mine == (list(range(0, 5)) if pid == 0 else list(range(5, 10)))
    assert multihost.broadcast_name("predictions_test") == "predictions_test"

    # one full dp x tp sharded training step over the global mesh
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from helen_tpu.models.transducer import init_params
    from helen_tpu.parallel.mesh import make_mesh
    from helen_tpu.parallel.sharding import make_sharded_train_step, shard_params
    from helen_tpu.train.train_loop import make_optimizer

    mesh = make_mesh(model_parallel=2)
    params = shard_params(mesh, init_params(jax.random.PRNGKey(0)))
    tx = make_optimizer(0.0)
    opt = tx.init(params)
    step = make_sharded_train_step(mesh, tx, image_len=200)

    rng = np.random.default_rng(pid)  # different data per host
    imgs = rng.integers(0, 40, size=(2, 200, 90)).astype(np.uint8)
    yb = rng.integers(0, 5, size=(2, 200)).astype(np.int32)
    yr = rng.integers(0, 11, size=(2, 200)).astype(np.int32)
    to_global = lambda a: multihost_utils.host_local_array_to_global_array(
        a, mesh, P("data")
    )
    _, _, loss, _, _ = step(
        params, opt, jnp.float32(1e-4), to_global(imgs), to_global(yb),
        to_global(yr), 4,
    )
    loss_val = float(loss)
    assert np.isfinite(loss_val)
    multihost.barrier("trained")
    sharded_loss = None

    if workdir and os.path.isdir(os.path.join(workdir, "train_images")):
        # full distributed Trainer epoch (global-mesh shard_map step, wrap-
        # padded host-sliced batches, rank-0 checkpointing) must land on the
        # same params as the single-process golden run the parent test did
        import dataclasses as _dc

        from helen_tpu.config import TRAIN
        from helen_tpu.train.train_loop import Trainer
        from helen_tpu.utils.filesystem import list_image_files

        cfg = _dc.replace(TRAIN, batch_size=8, learning_rate=1e-3, seed=7)
        trainer = Trainer(
            train_files=list_image_files(os.path.join(workdir, "train_images")),
            test_files=list_image_files(os.path.join(workdir, "train_images")),
            cfg=cfg,
            model_dir=os.path.join(workdir, "train_out", "models"),
            stats_dir=os.path.join(workdir, "train_out", "stats"),
            num_workers=2,
        )
        assert trainer.n_procs == 2 and trainer.eff_local * 2 == trainer.eff_batch
        trainer.run(1)
        golden = dict(np.load(os.path.join(workdir, "golden_params.npz")))
        import jax as _jax

        flat = {}
        def _flatten(prefix, tree):
            for k, v in tree.items():
                if isinstance(v, dict):
                    _flatten(f"{prefix}{k}/", v)
                else:
                    flat[f"{prefix}{k}"] = np.asarray(v)
        _flatten("", trainer.params)
        assert set(flat) == set(golden), (set(flat) ^ set(golden))
        for k in flat:
            np.testing.assert_allclose(flat[k], golden[k], rtol=2e-4, atol=2e-5,
                                       err_msg=k)
        # trainer.run used host-sharded eval for its scheduler step; its
        # state must match the single-process golden run's scheduler
        golden_sched = dict(np.load(os.path.join(workdir, "golden_sched.npz")))
        sched = trainer.scheduler.state_dict()
        assert sched["lr"] == float(golden_sched["lr"]), sched
        assert sched["num_bad"] == int(golden_sched["num_bad"]), sched
        np.testing.assert_allclose(sched["best"], float(golden_sched["best"]),
                                   rtol=2e-4)
        multihost.barrier("trainer_parity")

        # sharded epoch eval: each host scores half the images; the summed
        # stats must equal the full-set pass exactly (same jitted program,
        # same params -> identical per-image argmaxes on either host) and
        # the loss must be identical ACROSS hosts (scheduler lockstep —
        # asserted by the parent comparing the printed digits)
        from helen_tpu.train.evaluate import evaluate

        eval_params = _jax.tree_util.tree_map(np.asarray, trainer.params)
        full = evaluate(eval_params, trainer.test_files, 8, 2)
        sharded = evaluate(eval_params, trainer.test_files, 8, 2,
                           shard_across_hosts=True)
        assert (sharded["base_confusion_matrix"]
                == full["base_confusion_matrix"]).all()
        assert (sharded["rle_confusion_matrix"]
                == full["rle_confusion_matrix"]).all()
        np.testing.assert_allclose(sharded["loss"], full["loss"], rtol=1e-5)
        sharded_loss = sharded["loss"]
        multihost.barrier("sharded_eval")

    if workdir:
        # full multi-host polish pipeline through the coordinated driver:
        # process 0 picks + broadcasts the predictions dir, every host
        # writes its image-shard predictions there, barrier, process 0
        # stitches (regions' chunks interleave across both shards)
        import glob

        from helen_tpu.infer.polish import polish
        from helen_tpu.io.fasta import read_fasta

        out_dir = os.path.join(workdir, "polish_out")
        fasta = polish(
            image_dir=os.path.join(workdir, "images"),
            model_path=os.path.join(workdir, "model.pkl"),
            output_dir=out_dir,
            batch_size=4,
            num_workers=2,
            threads=1,
            output_prefix="mh_polished",
        )
        # both hosts see one shared predictions dir holding both shards
        pred_dirs = glob.glob(os.path.join(out_dir, "predictions_*"))
        assert len(pred_dirs) == 1, pred_dirs
        shards = sorted(os.path.basename(p)
                        for p in glob.glob(os.path.join(pred_dirs[0], "*.hdf")))
        assert shards == ["helen_predictions_0.hdf", "helen_predictions_1.hdf"], shards
        names = sorted(n for n, _ in read_fasta(fasta))
        assert names == ["cA", "cB"], names
        multihost.barrier("polished")

    # everything after "OK <pid>" is compared for cross-host identity by
    # the parent test (scheduler-lockstep evidence for the sharded eval)
    extra = f" {sharded_loss:.9f}" if sharded_loss is not None else ""
    print(f"OK {pid} {loss_val:.6f}{extra}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
