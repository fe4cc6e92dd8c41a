"""Worker for the hardened multi-host tests (tests/test_multihost_hard.py).

Usage: python tests/multihost_hard_worker.py <mode> <pid> <nprocs> <port> [workdir]

Modes:
  four       — 4-process sanity: coordination client, allsum, sharded eval,
               one global-mesh dp train step (prints the loss for cross-host
               identity checks)
  timeout    — process 0 waits at a 3 s barrier; the others sleep far past
               it (process 0 must raise, not hang)
  consensus  — run image-sharded call_consensus into workdir/preds
               (the parent SIGKILLs one host mid-run)
  resume     — same job with --resume semantics, then process 0 stitches
"""
import os
import sys

N_LOCAL_DEVICES = 2

os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={N_LOCAL_DEVICES}"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> int:
    mode = sys.argv[1]
    pid = int(sys.argv[2])
    nprocs = int(sys.argv[3])
    port = int(sys.argv[4])
    workdir = sys.argv[5] if len(sys.argv) > 5 else None
    from helen_tpu.parallel import multihost

    multihost.initialize(f"127.0.0.1:{port}", num_processes=nprocs,
                         process_id=pid)
    assert jax.process_count() == nprocs
    assert jax.device_count() == nprocs * N_LOCAL_DEVICES

    if mode == "four":
        assert multihost.coordination_client() is not None
        total = multihost.allsum_hosts(np.full((2, 2), float(pid + 1)))
        assert total[0, 0] == sum(range(1, nprocs + 1)), total

        # the image-index partition is complete and disjoint across 4 hosts
        mine = multihost.host_image_shard(37)
        sizes = [len(multihost.host_image_shard(37, p, nprocs))
                 for p in range(nprocs)]
        assert sum(sizes) == 37 and max(sizes) - min(sizes) <= 1, sizes
        assert mine == multihost.host_image_shard(37, pid, nprocs)

        # one dp-sharded train step over the global 8-device mesh
        import jax.numpy as jnp
        from jax.experimental import multihost_utils
        from jax.sharding import Mesh, PartitionSpec as P

        from helen_tpu.models.transducer import init_params
        from helen_tpu.train.train_loop import build_tbptt_fn, make_optimizer

        tx = make_optimizer(0.0)
        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        fn = build_tbptt_fn(tx, image_len=150, axis_name="data")
        rep, sh = P(), P("data")
        step = jax.jit(jax.shard_map(
            fn, mesh=mesh,
            in_specs=(rep, rep, rep, sh, sh, sh, rep),
            out_specs=(rep, rep, rep, rep, rep),
            check_vma=False,
        ))
        params = init_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(pid)
        B = N_LOCAL_DEVICES  # local rows of the global batch
        to_global = lambda a: multihost_utils.host_local_array_to_global_array(
            a, mesh, P("data"))
        _, _, loss, _, _ = step(
            params, tx.init(params), jnp.float32(1e-4),
            to_global(rng.integers(0, 40, size=(B, 150, 90)).astype(np.uint8)),
            to_global(rng.integers(0, 5, size=(B, 150)).astype(np.int32)),
            to_global(rng.integers(0, 11, size=(B, 150)).astype(np.int32)),
            nprocs * B,
        )
        multihost.barrier("four-done")
        print(f"OK {pid} {float(loss):.9f}", flush=True)
        return 0

    if mode == "timeout":
        import time

        if pid == 0:
            # must raise DEADLINE_EXCEEDED (never hang, never fall back to a
            # device collective) while the peers are still busy
            try:
                multihost.barrier("never-met", timeout_s=3.0)
            except Exception as exc:
                print(f"TIMEOUT_RAISED {type(exc).__name__}", flush=True)
                return 0
            print("BARRIER_PASSED_UNEXPECTEDLY", flush=True)
            return 1
        time.sleep(120)  # parent kills us once process 0 has reported
        return 0

    if mode in ("train_golden", "train_kill", "train_resume"):
        # 2-host global-mesh DP training job (the production shard_map psum
        # path). train_golden runs one uninterrupted epoch into
        # models_golden; train_kill runs the same job into models/ and is
        # SIGKILLed by the parent mid-epoch; train_resume restarts BOTH
        # hosts from models/HELEN_latest_checkpoint.npz and finishes the
        # epoch — mid-epoch resume replays the exact data order, so the
        # epoch-1 params must be byte-equal to the golden run's.
        import dataclasses

        from helen_tpu.config import TRAIN
        from helen_tpu.train.train_loop import Trainer
        from helen_tpu.utils.filesystem import list_image_files

        cfg = dataclasses.replace(TRAIN, batch_size=4, learning_rate=1e-3,
                                  seed=0)
        sub = "models_golden" if mode == "train_golden" else "models"
        model_dir = os.path.join(workdir, sub)
        latest = os.path.join(model_dir, "HELEN_latest_checkpoint.npz")
        trainer = Trainer(
            train_files=list_image_files(os.path.join(workdir, "train")),
            test_files=list_image_files(os.path.join(workdir, "test")),
            cfg=cfg,
            model_dir=model_dir,
            stats_dir=os.path.join(workdir, f"stats_{mode}"),
            num_workers=1,
            retrain_model_path=latest if mode == "train_resume" else None,
            checkpoint_every_batches=2,
            backend="xla",
        )
        if mode == "train_resume":
            # the kill must have landed mid-epoch; a completed phase-1 job
            # would resume at epoch 1 and train different data
            assert trainer.start_epoch == 0, trainer.start_epoch
            assert trainer.start_batch >= 2, trainer.start_batch
        trainer.run(1)
        multihost.barrier(f"{mode}-done")
        print(f"TRAIN_DONE {pid}", flush=True)
        return 0

    if mode in ("consensus", "resume"):
        from helen_tpu.infer.consensus import call_consensus

        out_dir = os.path.join(workdir, "preds")
        files = call_consensus(
            image_dir=os.path.join(workdir, "images"),
            model_path=os.path.join(workdir, "model.pkl"),
            output_dir=out_dir,
            batch_size=2,
            num_workers=2,
            resume=(mode == "resume"),
        )
        if mode == "consensus":
            # the parent SIGKILLs a peer mid-run: waiting the default 24h
            # (or even the ~100s heartbeat detection) would outlive the
            # test's communicate() timeout. This host's shard is complete
            # and flushed — a dead peer at this barrier is the scenario
            # under test, not a failure; tolerate it and exit clean.
            try:
                multihost.barrier("consensus-shards-complete", timeout_s=45.0)
            except Exception as exc:
                print(f"BARRIER_DEAD_PEER_TOLERATED {type(exc).__name__}",
                      flush=True)
                return 0
            print(f"OK {pid} {files}", flush=True)
            return 0
        multihost.barrier("consensus-shards-complete")
        if pid == 0:
            from helen_tpu.infer.polish import perform_stitch

            perform_stitch(out_dir, workdir, "recovered", threads=1)
        multihost.barrier("all-done")
        print(f"OK {pid} {files}", flush=True)
        return 0

    raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    sys.exit(main())
