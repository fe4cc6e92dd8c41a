"""Training loop: truncated-BPTT multi-task training of the transducer.

Reference semantics preserved (train.py:144-250, train_distributed.py:54-276):

  * each 1000-column labeled image is processed as 19 overlapping 100-column
    windows; each window is an independent optimization step (Adam) with the
    recurrent hidden state carried forward as data (truncated BPTT — the
    reference detaches hidden, train.py:212; here each window has its own
    value_and_grad so truncation is structural);
  * loss = mean CE(base) + class-weighted CE(rle);
  * Adam(lr=1e-4, weight_decay=0 by default, torch L2 convention);
  * ReduceLROnPlateau(min) stepped on the held-out loss each epoch
    (the reference only does this in the single-process path, train.py:113;
    the distributed path silently lacks it — we schedule everywhere);
  * per-epoch: evaluation, checkpoint (never pruned), train/test CSV logs and
    a confusion-matrix text log.

TPU-native differences: the whole per-batch TBPTT loop (19 windows x
grad+Adam update) compiles to ONE XLA program (lax.scan with params in the
carry); data parallelism is a batch-sharded 1-D mesh with XLA-inserted
gradient reductions instead of process-per-GPU DDP + gloo.
"""
from __future__ import annotations

import csv
import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from helen_tpu.config import IMAGE, MODEL, TRAIN, WINDOW, TrainConfig
from helen_tpu.io.checkpoint import load_checkpoint, load_model_any, save_checkpoint
from helen_tpu.io.images import MarginPolishDataset, batched_image_iterator
from helen_tpu.obs import Throughput, get_logger
from helen_tpu.train.evaluate import evaluate
from helen_tpu.utils.filesystem import ensure_output_dir, list_image_files, timestamped_dir

log = get_logger("train")


class PlateauScheduler:
    """ReduceLROnPlateau('min') with torch defaults: factor 0.1, patience 10,
    relative threshold 1e-4 (reference train.py:113)."""

    def __init__(self, lr: float, factor: float = 0.1, patience: int = 10,
                 threshold: float = 1e-4, min_lr: float = 0.0):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.min_lr, self.lr * self.factor)
                self.num_bad = 0
                log.info("plateau: reducing lr to %g", self.lr)
        return self.lr

    def state_dict(self) -> Dict[str, float]:
        return {"lr": self.lr, "best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d: Dict[str, float]) -> None:
        self.lr = d["lr"]
        self.best = d["best"]
        self.num_bad = int(d["num_bad"])


def make_optimizer(weight_decay: float = 0.0):
    """Adam moments; the step size is applied per-call so the host-side
    plateau scheduler can change it without re-jitting."""
    import optax

    if weight_decay:
        # torch Adam convention: L2 added to the gradient before the moments
        return optax.chain(optax.add_decayed_weights(weight_decay), optax.scale_by_adam())
    return optax.scale_by_adam()


def build_tbptt_fn(tx, image_len: int = None, precision=None, backend: str = "xla",
                   axis_name: str = None):
    """The pure per-batch TBPTT function (unjitted).

    Signature: (params, opt_state, lr, images_u8, label_base, label_rle,
    valid) -> (params, opt_state, loss_sum, base_loss_sum, rle_loss_sum).
    ``valid`` is the number of real rows — batches are padded to a
    device-count multiple and padding rows are masked out of both losses, so
    the result is numerically identical to the reference's unpadded batches.
    Loss sums are summed over the windows (each a mean over valid*W
    positions), matching the reference accounting (train.py:206-208).

    ``backend``: "xla" (lax.scan recurrences) or "pallas_train" (fused
    forward+backward window kernels with a custom VJP — ~2-3x on TPU, same
    DEFAULT matmul precision; helen_tpu.ops.gru_pallas_train).

    ``axis_name``: when set, the fn is written for a shard_map body over a
    batch-sharded mesh axis of that name: row masks use GLOBAL row indices
    (shard offset from lax.axis_index), loss denominators (including the
    data-dependent weighted-CE weight sum) are psummed before dividing, and
    gradients are psummed before the per-window optimizer step — so every
    replica applies the exact global update and params stay replicated.
    Required for the Pallas backends on multi-chip hosts: Mosaic kernels
    cannot be auto-partitioned by GSPMD (jax tpu_custom_call lowering) —
    a plain sharded jit raises NotImplementedError.
    """
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    from helen_tpu.models.transducer import forward, init_hidden_for
    from helen_tpu.train.loss import (
        masked_cross_entropy_parts,
        masked_weighted_cross_entropy_parts,
    )

    W = WINDOW.window
    starts = jnp.asarray(WINDOW.starts(image_len or IMAGE.seq_length), dtype=jnp.int32)
    rle_w = jnp.asarray(TRAIN.rle_class_weights, dtype=jnp.float32)

    def window_loss(p, x, hidden, yb, yr, row_mask):
        base, rle, hidden_new = forward(p, x, hidden, precision=precision,
                                        backend=backend)
        nb, db = masked_cross_entropy_parts(base, yb, row_mask)
        nr, dr = masked_weighted_cross_entropy_parts(rle, yr, rle_w, row_mask)
        if axis_name is not None:
            # global denominators (db counts valid rows, dr is the selected
            # class-weight sum — both label-dependent, both must be global)
            db = lax.psum(db, axis_name)
            dr = lax.psum(dr, axis_name)
        lb = nb / jnp.maximum(db, 1.0)
        lr_ = nr / jnp.maximum(dr, 1e-12)
        return lb + lr_, (lb, lr_, hidden_new)

    grad_fn = jax.value_and_grad(window_loss, has_aux=True)

    def fn(params, opt_state, lr, images_u8, label_base, label_rle, valid):
        B, L, F = images_u8.shape
        images = images_u8.astype(jnp.float32)
        hidden = init_hidden_for(params, B)
        rows = jnp.arange(B)
        if axis_name is not None:
            rows = rows + lax.axis_index(axis_name) * B  # global row indices
        row_mask = (rows < valid).astype(jnp.float32)

        def body(carry, start):
            params, opt_state, hidden, tot, tot_b, tot_r = carry
            x = lax.dynamic_slice(images, (0, start, 0), (B, W, F))
            yb = lax.dynamic_slice(label_base, (0, start), (B, W))
            yr = lax.dynamic_slice(label_rle, (0, start), (B, W))
            (loss, (lb, lr_, hidden)), grads = grad_fn(
                params, x, hidden, yb, yr, row_mask
            )
            if axis_name is not None:
                # each shard's grads/losses are contributions to the global
                # mean (global denominator above): psum completes them, and
                # the optimizer step below is then replica-identical
                grads, loss, lb, lr_ = lax.psum((grads, loss, lb, lr_), axis_name)
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, hidden, tot + loss, tot_b + lb, tot_r + lr_), None

        init = (params, opt_state, hidden, jnp.float32(0), jnp.float32(0), jnp.float32(0))
        (params, opt_state, _, tot, tot_b, tot_r), _ = lax.scan(body, init, starts)
        return params, opt_state, tot, tot_b, tot_r

    return fn


def make_train_step(tx, data_parallel: bool = False, precision=None,
                    backend: str = "auto", params=None):
    """Jit the TBPTT step for all local devices (batch-sharded 1-D mesh when
    data_parallel and more than one device). Returns (step_fn, shard_multiple).

    backend "auto" picks the fused Pallas training kernels on TPU and the
    lax.scan path elsewhere; pass ``params`` so non-kernel model geometries
    (hidden_size != 128) fall back to lax.scan instead of failing."""
    import jax

    from helen_tpu.models.transducer import resolve_backend

    if backend == "auto" and precision is not None:
        # explicit precision means the caller wants specific matmul numerics;
        # the fused kernels run DEFAULT only, so honor the request via XLA
        backend = "xla"
    backend = resolve_backend(backend, "train", log, params=params)
    if backend == "pallas_train" and precision is not None:
        log.warning(
            "backend 'pallas_train' ignores precision=%s for the GRU "
            "recurrences AND their input projections (both run DEFAULT "
            "matmul precision); only the head matmuls honor it", precision)

    n_procs = jax.process_count()
    if data_parallel and (len(jax.local_devices()) > 1 or n_procs > 1):
        from jax.sharding import Mesh, PartitionSpec as P

        # shard_map, not a GSPMD-sharded jit: Mosaic kernels (the
        # pallas_train backend) cannot be auto-partitioned — jax's
        # tpu_custom_call lowering raises NotImplementedError under a
        # sharded jit. The fn body psums denominators and gradients
        # (axis_name), so params/opt_state stay replica-identical.
        # In a multi-process job the mesh spans EVERY process's devices, so
        # the psum is the global DDP gradient reduction (reference
        # train_distributed.py's role); each host feeds its slice of the
        # global batch and the step converts host-local arrays to global
        # jax.Arrays internally.
        devices = jax.devices() if n_procs > 1 else jax.local_devices()
        mesh = Mesh(np.asarray(devices), ("data",))
        fn = build_tbptt_fn(tx, precision=precision, backend=backend,
                            axis_name="data")
        rep, shard = P(), P("data")
        sfn = jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(rep, rep, rep, shard, shard, shard, rep),
            out_specs=(rep, rep, rep, rep, rep),
            check_vma=False,  # outputs are replicated via psum-ed grads
        )
        jfn = jax.jit(sfn, donate_argnums=(0, 1))
        if n_procs == 1:
            return jfn, len(devices)

        from jax.experimental import multihost_utils

        n_global = len(devices)

        def to_global(x, spec):
            # step outputs are already global jax.Arrays — convert only
            # host-local inputs (numpy batches; params on the first call)
            def conv(a):
                if (isinstance(a, jax.Array)
                        and len(a.sharding.device_set) == n_global):
                    return a
                return multihost_utils.host_local_array_to_global_array(
                    np.asarray(a), mesh, spec
                )
            return jax.tree_util.tree_map(conv, x)

        def step(params, opt_state, lr, images, yb, yr, valid):
            return jfn(
                to_global(params, rep), to_global(opt_state, rep), lr,
                to_global(images, shard), to_global(yb, shard),
                to_global(yr, shard), valid,
            )

        return step, n_global
    fn = build_tbptt_fn(tx, precision=precision, backend=backend)
    return jax.jit(fn, donate_argnums=(0, 1)), 1


@dataclass
class EpochStats:
    epoch: int
    train_loss: float
    test_loss: float
    base_accuracy: float
    rle_accuracy: float


class Trainer:
    """Trainer over all devices of the job: local chips via batch sharding;
    in a multi-process job (jax.distributed initialized, e.g. CLI
    --distributed) the step spans the GLOBAL mesh — the reference's
    train_distributed.py role, with the gloo DDP all-reduce replaced by an
    in-step psum over ICI. Each host feeds its slice of every global batch
    (DistributedSampler-style wrap-padded permutation, so all hosts run the
    same number of full batches in lockstep); rank 0 writes checkpoints and
    CSVs; epoch evaluation is sharded per host with loss/CMs
    allgather-summed identically everywhere, keeping the LR-plateau
    scheduler replica-identical at ~1/N the eval cost."""

    def __init__(
        self,
        train_files: Sequence[str],
        test_files: Sequence[str],
        cfg: TrainConfig = TRAIN,
        model_dir: str = "./model_out/models",
        stats_dir: str = "./model_out/stats",
        num_workers: int = 8,
        retrain_model_path: Optional[str] = None,
        data_parallel: bool = True,
        precision=None,
        checkpoint_every_batches: int = 200,
        backend: str = "auto",
        model_cfg=MODEL,
        pack: bool = False,
        cache_dir: Optional[str] = None,
        model_parallel: int = 1,
    ):
        import jax
        import jax.numpy as jnp

        from helen_tpu.models.transducer import (
            init_params,
            model_geometry,
            num_params,
        )

        self.cfg = cfg
        self.train_files = list(train_files)
        self.test_files = list(test_files)
        self.model_dir = ensure_output_dir(model_dir)
        self.stats_dir = ensure_output_dir(stats_dir)
        self.num_workers = num_workers
        self.precision = precision
        self.checkpoint_every_batches = max(1, checkpoint_every_batches)

        self.tx = make_optimizer(cfg.weight_decay)
        self.start_epoch = 0
        self.start_batch = 0
        self.scheduler = PlateauScheduler(
            cfg.learning_rate, cfg.plateau_factor, cfg.plateau_patience
        )
        if retrain_model_path:
            if retrain_model_path.endswith(".npz"):
                # one read serves params, meta, opt state and scheduler state
                params, meta, opt_state = load_checkpoint(
                    retrain_model_path,
                    lambda p: self.tx.init(jax.tree_util.tree_map(jnp.asarray, p)),
                )
                self.params = jax.tree_util.tree_map(jnp.asarray, params)
                self.opt_state = (
                    opt_state if opt_state is not None else self.tx.init(self.params)
                )
                if "scheduler" in meta:
                    self.scheduler.load_state_dict(meta["scheduler"])
                    log.info("restored LR scheduler state: lr=%g", self.scheduler.lr)
            else:
                params, meta = load_model_any(retrain_model_path)
                self.params = jax.tree_util.tree_map(jnp.asarray, params)
                self.opt_state = self.tx.init(self.params)
            self.start_epoch = int(meta.get("epochs", 0))
            self.start_batch = int(meta.get("batch_in_epoch", 0))
            log.info("retraining from %s (epoch %d)", retrain_model_path, self.start_epoch)
        else:
            self.params = init_params(jax.random.PRNGKey(cfg.seed), model_cfg)
            self.opt_state = self.tx.init(self.params)
        # geometry follows the actual params (a retrain checkpoint may carry
        # any reference-compatible hidden_size/gru_layers)
        self.model_cfg = model_geometry(self.params)
        log.info("model parameters: %d (hidden %d, %d gru layer(s))",
                 num_params(self.params), self.model_cfg.hidden_size,
                 self.model_cfg.gru_layers)
        self.n_procs = jax.process_count()
        self.pid = jax.process_index()
        if model_parallel > 1:
            # dp x tp over the local chips: params tensor-sharded on the
            # "model" axis (GRU gate projections on 3H, heads on 2H input),
            # batch sharded on "data"; XLA/GSPMD inserts the all-gathers and
            # the gradient reduce. For the 470K-param flagship this is a
            # scale surface (it halves per-chip weight residency and proves
            # the sharding layout), not a speed win — the docstring math in
            # parallel/sharding.py. Single-process only: a multi-host job
            # uses the shard_map DP trainer above, whose host-local batch
            # feeding and psum lockstep the GSPMD path does not replicate.
            from helen_tpu.parallel.mesh import make_mesh
            from helen_tpu.parallel.sharding import (
                make_sharded_train_step,
                shard_params,
            )

            if self.n_procs > 1:
                raise ValueError(
                    "model_parallel > 1 drives the GSPMD dp x tp step over "
                    "one process's chips; multi-host jobs use the shard_map "
                    "data-parallel trainer (drop --model_parallel)"
                )
            if backend not in ("auto", "xla"):
                log.warning(
                    "model_parallel > 1 tensor-shards w_hh through the "
                    "lax.scan recurrence (Mosaic custom calls cannot be "
                    "GSPMD-partitioned); backend %r ignored", backend)
            mesh = make_mesh(jax.local_devices(), model_parallel=model_parallel)
            if mesh.shape["model"] != model_parallel:
                log.warning("model_parallel=%d does not divide %d devices; "
                            "using %d", model_parallel,
                            len(jax.local_devices()), mesh.shape["model"])
            self.params = shard_params(mesh, self.params)
            # the optimizer state mirrors the param tree, so tx.init on the
            # sharded params yields the matching sharded layout for mu/nu;
            # leaves NOT derived from params (adam's step count) come out on
            # the default device — replicate those onto the mesh. Re-place
            # the (possibly checkpoint-loaded) state accordingly.
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh_devs = set(mesh.devices.flat)
            rep = NamedSharding(mesh, P())
            template = self.tx.init(self.params)
            self.opt_state = jax.device_put(
                self.opt_state,
                jax.tree_util.tree_map(
                    lambda t: t.sharding
                    if set(t.sharding.device_set) == mesh_devs else rep,
                    template,
                ),
            )
            self.step_fn = make_sharded_train_step(
                mesh, self.tx, precision=precision, params=self.params
            )
            self.shard_multiple = mesh.shape["data"]
            log.info("GSPMD training mesh: data=%d x model=%d",
                     mesh.shape["data"], mesh.shape["model"])
        else:
            self.step_fn, self.shard_multiple = make_train_step(
                self.tx, data_parallel, precision, backend=backend,
                params=self.params,
            )
        # eff_batch is the GLOBAL batch (cfg.batch_size rounded up to the
        # job's device count); each host feeds eff_local rows of it
        self.eff_batch = -(-cfg.batch_size // self.shard_multiple) * self.shard_multiple
        self.eff_local = self.eff_batch // self.n_procs
        self.dataset = MarginPolishDataset(self.train_files, IMAGE, with_labels=True)
        if len(self.dataset) == 0:
            raise ValueError("no labeled training images found")
        # packed training cache: group-per-image HDF5 reads are per-dataset-
        # overhead-bound and repeat EVERY epoch; one slab-readable cache
        # (built once, reused across runs via cache_dir) removes that.
        # Packed indices equal dataset indices (pack_images writes in index
        # order), so the epoch permutation — and mid-epoch resume — replay
        # byte-identical data order on either path. Multi-host: every host
        # needs the FULL set (its slices are scattered permutation rows),
        # but the content is byte-identical, so host 0 packs ONE shared
        # cache and the others wait at a barrier instead of N hosts each
        # re-reading and re-writing the whole training set. If the cache
        # dir is NOT a shared filesystem, the post-barrier freshness check
        # fails on the other hosts and each falls back to a host-local pack.
        self.packed_train = None
        if pack:
            from helen_tpu.io.packed import (
                PackedDataset,
                cache_is_fresh,
                pack_images,
            )

            cache_path = os.path.join(cache_dir or model_dir,
                                      "train_images_cache.h5")
            if self.n_procs == 1:
                if not cache_is_fresh(cache_path, self.train_files,
                                      with_labels=True):
                    log.info("building packed training cache %s", cache_path)
                    pack_images(self.train_files, cache_path, IMAGE,
                                with_labels=True, dataset=self.dataset)
            else:
                from helen_tpu.parallel.multihost import (
                    barrier,
                    broadcast_name,
                )

                # If host 0's pack raises (disk full, corrupt input) it must
                # STILL reach the barrier — otherwise hosts 1..N-1 park for
                # the 24h default timeout — and the failure must fan out
                # loudly to every host instead of each one "falling back" to
                # a local pack of the same corrupt input.
                pack_exc = None
                if self.pid == 0 and not cache_is_fresh(
                        cache_path, self.train_files, with_labels=True):
                    log.info("building shared packed training cache %s",
                             cache_path)
                    try:
                        pack_images(self.train_files, cache_path, IMAGE,
                                    with_labels=True, dataset=self.dataset)
                    except Exception as exc:  # re-raised after the barrier
                        pack_exc = exc
                barrier("train-pack-complete")
                status = broadcast_name(
                    "ok" if pack_exc is None
                    else f"pack failed: {pack_exc}"[:256])
                if pack_exc is not None:
                    raise pack_exc
                if status != "ok":
                    raise RuntimeError(
                        f"host 0 packed-cache build failed ({status}); "
                        "aborting on all hosts")
                if not cache_is_fresh(cache_path, self.train_files,
                                      with_labels=True):
                    # cache dir not shared across hosts: pack locally
                    cache_path = os.path.join(
                        cache_dir or model_dir,
                        f"train_images_cache_{self.pid}.h5")
                    log.info("shared cache not visible on host %d; building "
                             "local %s", self.pid, cache_path)
                    pack_images(self.train_files, cache_path, IMAGE,
                                with_labels=True, dataset=self.dataset)
            self.packed_train = PackedDataset(cache_path, with_labels=True)
            assert len(self.packed_train) == len(self.dataset)
        # built once: evaluate() runs every epoch and re-indexing all test
        # files per call is pure overhead
        self.test_dataset = MarginPolishDataset(self.test_files, IMAGE,
                                                with_labels=True)
        if self.pid == 0:
            log.info("training on %d images, evaluating on %d files%s",
                     len(self.dataset), len(self.test_files),
                     f" across {self.n_procs} hosts" if self.n_procs > 1 else "")

    def _epoch_indices(self, epoch: int) -> list:
        """Deterministic per-epoch shuffle (seed + epoch), so a mid-epoch
        resume can re-derive the exact data order."""
        return np.random.default_rng(self.cfg.seed + epoch).permutation(
            len(self.dataset)
        ).tolist()

    def _save_latest(self, epoch: int, batch_in_epoch: int) -> None:
        save_checkpoint(
            os.path.join(self.model_dir, "HELEN_latest_checkpoint.npz"),
            self.params,
            meta={
                "epochs": epoch,
                "batch_in_epoch": batch_in_epoch,
                "hidden_size": self.model_cfg.hidden_size,
                "gru_layers": self.model_cfg.gru_layers,
                "scheduler": self.scheduler.state_dict(),
            },
            opt_state=self.opt_state,
        )

    def _host_indices(self, indices: list) -> tuple:
        """This host's slice of the epoch: for multi-process jobs the
        permutation is wrap-padded to a multiple of the global batch
        (exactly torch DistributedSampler's duplication semantics, which
        the reference relies on, train_distributed.py:74-86) and host p
        takes rows [p*eff_local, (p+1)*eff_local) of every global batch —
        all hosts run the same count of FULL batches, keeping the psum
        collectives in lockstep. Returns (host_index_list, iter_batch)."""
        if self.n_procs == 1:
            return indices, self.eff_batch
        pad = (-len(indices)) % self.eff_batch
        # repeat the whole permutation as many times as needed (torch
        # DistributedSampler semantics): with a dataset smaller than the
        # global batch, indices[:pad] alone under-pads, giving hosts unequal
        # batch counts — a host with none would never enter the psum and the
        # collective would hang
        reps = -(-pad // max(1, len(indices)))
        indices = (indices + indices * reps)[: len(indices) + pad]
        local = []
        for b in range(0, len(indices), self.eff_batch):
            s = b + self.pid * self.eff_local
            local.extend(indices[s : s + self.eff_local])
        return local, self.eff_local

    def train_one_epoch(self, epoch: int, skip_batches: int = 0) -> float:
        import jax.numpy as jnp

        indices, iter_batch = self._host_indices(self._epoch_indices(epoch))
        total_loss = 0.0
        total_images = 0
        n_windows = WINDOW.num_windows(IMAGE.seq_length)
        tp = Throughput(unit="windows")
        tp.start()
        csv_path = os.path.join(self.stats_dir, "train_loss.csv")
        if skip_batches:
            indices = indices[skip_batches * iter_batch :]
            log.info("mid-epoch resume: skipping %d already-trained batches",
                     skip_batches)
        rank0 = self.pid == 0
        if self.packed_train is not None:
            from helen_tpu.io.packed import packed_batch_iterator, prefetch_iterator

            batch_iter = prefetch_iterator(packed_batch_iterator(
                self.packed_train, iter_batch, indices=indices
            ))
        else:
            batch_iter = batched_image_iterator(
                self.dataset, iter_batch, self.num_workers,
                indices=indices, pad_final=True,
            )
        with open(csv_path if rank0 else os.devnull, "a", newline="") as f:
            writer = csv.writer(f)
            for bi, batch in enumerate(batch_iter, start=skip_batches):
                # multi-host batches are always full (wrap padding), so the
                # global valid count is exact; single-host keeps the masked
                # tail batch
                valid = batch.valid * self.n_procs
                self.params, self.opt_state, tot, tot_b, tot_r = self.step_fn(
                    self.params, self.opt_state, jnp.float32(self.scheduler.lr),
                    batch.images, batch.labels_base.astype(np.int32),
                    batch.labels_rle.astype(np.int32), valid,
                )
                tot = float(tot)
                total_loss += tot
                total_images += valid * n_windows
                tp.add(valid * n_windows)
                avg = total_loss / max(1, total_images)
                if rank0:
                    writer.writerow([epoch + 1, bi + 1, avg])
                if (bi + 1) % self.checkpoint_every_batches == 0 and rank0:
                    self._save_latest(epoch, bi + 1)
                if bi % 20 == 0 and rank0:
                    log.info("epoch %d batch %d: avg loss %.6f | %s",
                             epoch + 1, bi + 1, avg, tp)
        tp.stop()
        return total_loss / max(1, total_images)

    def run(self, epochs: int) -> List[EpochStats]:
        import jax

        history: List[EpochStats] = []
        end_epoch = self.start_epoch + epochs
        test_csv = os.path.join(self.stats_dir, "test_loss.csv")
        cm_log = os.path.join(self.stats_dir, "confusion_matrix.txt")
        for epoch in range(self.start_epoch, end_epoch):
            t0 = time.time()
            skip = self.start_batch if epoch == self.start_epoch else 0
            train_loss = self.train_one_epoch(epoch, skip_batches=skip)
            # multi-host eval is sharded: each host scores its slice of the
            # test images and loss/CMs are allgather-summed, identically on
            # every host — so the plateau scheduler advances in lockstep
            # with ~1/N the eval work (not O(hosts)-redundant full passes).
            # Params come off the global mesh as replicated jax.Arrays; the
            # host-local eval jit needs addressable inputs, so materialize
            # the local copy.
            eval_params = (
                jax.tree_util.tree_map(np.asarray, self.params)
                if self.n_procs > 1 else self.params
            )
            stats = evaluate(
                eval_params, self.test_files, self.cfg.batch_size,
                self.num_workers, self.precision, dataset=self.test_dataset,
                shard_across_hosts=True,
            )
            self.scheduler.step(stats["loss"])
            ckpt = os.path.join(
                self.model_dir, f"HELEN_epoch_{epoch + 1}_checkpoint.npz"
            )
            if self.pid == 0:
                save_checkpoint(
                    ckpt, self.params,
                    meta={
                        "epochs": epoch + 1,
                        "hidden_size": self.model_cfg.hidden_size,
                        "gru_layers": self.model_cfg.gru_layers,
                        "scheduler": self.scheduler.state_dict(),
                    },
                    opt_state=self.opt_state,
                )
                self._save_latest(epoch + 1, 0)
                with open(test_csv, "a", newline="") as f:
                    csv.writer(f).writerow([epoch + 1, stats["loss"], stats["base_accuracy"]])
                with open(cm_log, "a") as f:
                    f.write(f"{epoch + 1}\n{stats['base_confusion_matrix'].astype(np.int64)}\n")
            log.info(
                "epoch %d done in %.1fs: train loss %.6f | test loss %.6f | "
                "base acc %.2f%% | rle acc %.2f%% | saved %s",
                epoch + 1, time.time() - t0, train_loss, stats["loss"],
                stats["base_accuracy"], stats["rle_accuracy"], ckpt,
            )
            history.append(EpochStats(
                epoch + 1, train_loss, stats["loss"],
                stats["base_accuracy"], stats["rle_accuracy"],
            ))
        return history


def train_interface(
    train_dir: str,
    test_dir: str,
    batch_size: int = 100,
    epochs: int = 10,
    num_workers: int = 16,
    output_dir: str = "./model_out/",
    retrain_model_path: Optional[str] = None,
    learning_rate: float = 1e-4,
    weight_decay: float = 0.0,
    seed: int = 42,
    backend: str = "auto",
    hidden_size: int = MODEL.hidden_size,
    gru_layers: int = MODEL.gru_layers,
    pack: bool = False,
    model_parallel: int = 1,
) -> List[EpochStats]:
    """CLI entry: timestamped model/stats dirs like the reference
    (TrainInterface.py + FileManager.py:25-48). hidden_size/gru_layers pick
    the geometry of a FRESH model (the reference parameterizes its
    TransducerGRU the same way, TransducerModel.py:43-58, but only exposes
    it as constants); retraining always follows the checkpoint's geometry."""
    import dataclasses as _dc

    cfg = _dc.replace(
        TRAIN, batch_size=batch_size, learning_rate=learning_rate,
        weight_decay=weight_decay, seed=seed,
    )
    model_cfg = _dc.replace(MODEL, hidden_size=hidden_size, gru_layers=gru_layers)
    import jax

    if jax.process_count() > 1:
        # rank 0 picks the timestamped name and broadcasts it, so a shared
        # output_dir gets ONE run directory even across a second boundary
        from helen_tpu.parallel import multihost

        run_dir = ""
        if jax.process_index() == 0:
            run_dir = timestamped_dir(output_dir, "trained_models")
        run_dir = multihost.broadcast_name(run_dir)
        os.makedirs(run_dir, exist_ok=True)
    else:
        run_dir = timestamped_dir(output_dir, "trained_models")
    trainer = Trainer(
        train_files=list_image_files(train_dir),
        test_files=list_image_files(test_dir),
        cfg=cfg,
        model_dir=os.path.join(run_dir, "models"),
        stats_dir=os.path.join(run_dir, "stats"),
        num_workers=num_workers,
        retrain_model_path=retrain_model_path,
        backend=backend,
        model_cfg=model_cfg,
        pack=pack,
        model_parallel=model_parallel,
        # cache in the STABLE output root, not the per-run timestamped dir,
        # so later runs over the same image set reuse the pack
        cache_dir=ensure_output_dir(output_dir),
    )
    return trainer.run(epochs)
