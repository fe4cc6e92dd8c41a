"""Model evaluation: windowed loss + confusion matrices.

Equivalent of the reference test module (models/test.py:39-167) and the
TestInterface (TestInterface.py:90-139): sliding-window evaluation
accumulating 5x5 base and 11x11 RLE confusion matrices (rows = truth,
columns = prediction, torchnet ConfusionMeter convention) and the average
loss normalized by images-per-window like the reference (test.py:124-125,154).

The reference's ``accuracy`` return value is never computed (stays 0 —
test.py:72,166, a documented reference bug); here accuracy is computed from
the confusion-matrix diagonals.
"""
from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import numpy as np

from helen_tpu.config import IMAGE, TRAIN, WINDOW
from helen_tpu.io.images import MarginPolishDataset, batched_image_iterator
from helen_tpu.obs import get_logger
from helen_tpu.utils.filesystem import ensure_output_dir, list_image_files

log = get_logger("eval")


@functools.lru_cache(maxsize=4)
def _jitted_eval(precision):
    """One compiled eval program per precision, shared across epochs —
    rebuilding jax.jit per evaluate() call would re-trace and re-compile
    every epoch (remote TPU compiles run 2-300+ s)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from helen_tpu.models.transducer import forward, init_hidden_for, model_geometry
    from helen_tpu.train.loss import (
        masked_cross_entropy,
        masked_weighted_cross_entropy,
    )

    W = WINDOW.window
    starts = jnp.asarray(WINDOW.starts(IMAGE.seq_length), dtype=jnp.int32)
    rle_w = jnp.asarray(TRAIN.rle_class_weights, dtype=jnp.float32)

    def fn(p, images_u8, label_base, label_rle, col_mask, valid):
        B, L, F = images_u8.shape
        geom = model_geometry(p)  # shapes only — tracer-safe
        nb, nr = geom.num_base_classes, geom.num_rle_classes
        images = images_u8.astype(jnp.float32)
        hidden = init_hidden_for(p, B)
        cm_base = jnp.zeros((nb, nb), dtype=jnp.float32)
        cm_rle = jnp.zeros((nr, nr), dtype=jnp.float32)
        # loss over real ROWS only (batches are padded to a static shape;
        # per-window means over valid rows = the reference's per-window
        # means over its unpadded batch, test.py:124-125); confusion
        # matrices additionally exclude padded COLUMNS of short images —
        # position (-1,-1,-1) rows the debug renderer also masks (the
        # reference counts them into its ConfusionMeter, inflating the
        # class-0 diagonal; a documented quality fix, not a parity break)
        row_mask = (jnp.arange(B) < valid).astype(jnp.float32)

        def body(carry, start):
            hidden, loss_sum, cm_base, cm_rle = carry
            x = lax.dynamic_slice(images, (0, start, 0), (B, W, F))
            yb = lax.dynamic_slice(label_base, (0, start), (B, W))
            yr = lax.dynamic_slice(label_rle, (0, start), (B, W))
            cmask = lax.dynamic_slice(col_mask, (0, start), (B, W))
            base, rle, hidden = forward(p, x, hidden, precision=precision)
            loss = (masked_cross_entropy(base, yb, row_mask)
                    + masked_weighted_cross_entropy(rle, yr, rle_w, row_mask))
            pb = jnp.argmax(base, axis=-1).reshape(-1)
            pr = jnp.argmax(rle, axis=-1).reshape(-1)
            w = cmask.reshape(-1)
            cm_base = cm_base.at[yb.reshape(-1), pb].add(w)
            cm_rle = cm_rle.at[yr.reshape(-1), pr].add(w)
            return (hidden, loss_sum + loss, cm_base, cm_rle), None

        (hidden, loss_sum, cm_base, cm_rle), _ = lax.scan(
            body, (hidden, jnp.float32(0.0), cm_base, cm_rle), starts
        )
        return loss_sum, cm_base, cm_rle

    return jax.jit(fn)


def make_eval_step(params, precision=None):
    """Jitted eval over one batch: returns (loss_sum, base confusion 5x5,
    rle confusion 11x11)."""
    import jax

    if precision is None:
        # metric fidelity: TPU DEFAULT fp32 dots round operands to bf16,
        # which shifts per-window argmaxes and hence confusion matrices;
        # HIGH keeps eval numbers comparable with the fp32 reference
        # (docs/performance.md, "The fp32 parity trap on TPU")
        precision = jax.lax.Precision.HIGH
    jfn = _jitted_eval(precision)

    def step(images_u8, label_base, label_rle, col_mask, valid):
        loss_sum, cm_base, cm_rle = jfn(
            params, images_u8, label_base, label_rle, col_mask, valid
        )
        return float(loss_sum), np.asarray(cm_base), np.asarray(cm_rle)

    return step


def accuracy_from_cm(cm: np.ndarray) -> float:
    denom = max(1.0, float(cm.sum()))
    return 100.0 * float(np.trace(cm)) / denom


def evaluate(
    params,
    test_files,
    batch_size: int = 100,
    num_workers: int = 8,
    precision=None,
    dataset: Optional[MarginPolishDataset] = None,
    shard_across_hosts: bool = False,
) -> Dict[str, object]:
    """Evaluate params over labeled images; returns loss, accuracies, CMs.

    Pass a prebuilt ``dataset`` to avoid re-opening and re-indexing every
    test file per call (the Trainer evaluates every epoch).

    ``shard_across_hosts=True`` (multi-process jobs): each host evaluates
    only its contiguous image-index slice and the loss/image counts and
    confusion matrices are summed across hosts — epoch eval gets ~N× faster
    than every-host-evaluates-everything. The cross-host sum is computed in
    the same order on every host (allgather then axis-0 sum), so the
    returned loss is bit-identical everywhere and the LR-plateau scheduler
    stays replica-identical without a broadcast (the reference instead
    evaluates on rank 0 only and has no scheduler in its distributed path,
    train_distributed.py:241-266)."""
    from helen_tpu.models.transducer import model_geometry

    if dataset is None:
        dataset = MarginPolishDataset(test_files, IMAGE, with_labels=True)
    if len(dataset) == 0:
        raise ValueError("no labeled images found for evaluation")
    indices = None
    multi = False
    if shard_across_hosts:
        import jax

        multi = jax.process_count() > 1
        if multi:
            from helen_tpu.parallel.multihost import host_image_shard

            indices = host_image_shard(len(dataset))
    step = make_eval_step(params, precision)
    n_windows = WINDOW.num_windows(IMAGE.seq_length)
    total_loss = 0.0
    total_images = 0
    geom = model_geometry(params)
    cm_base = np.zeros((geom.num_base_classes, geom.num_base_classes))
    cm_rle = np.zeros((geom.num_rle_classes, geom.num_rle_classes))
    # pad_final=True: ONE static batch shape (a ragged tail batch would
    # trigger a second multi-minute remote TPU compile); padded rows are
    # masked out of loss and confusion matrices inside the jitted step
    for batch in batched_image_iterator(
        dataset, batch_size, num_workers, pad_final=True, indices=indices
    ):
        B, L = batch.images.shape[:2]
        col_mask = np.zeros((B, L), dtype=np.float32)
        for i, rec in enumerate(batch.records):  # records cover real rows only
            col_mask[i] = rec.position[:, 0] >= 0
        loss_sum, cb, cr = step(batch.images, batch.labels_base,
                                batch.labels_rle, col_mask, batch.valid)
        # reference accounting: loss summed per window, normalized by
        # images-per-window counts (test.py:124-125,154)
        total_loss += loss_sum
        total_images += batch.valid * n_windows
        cm_base += cb
        cm_rle += cr
    if multi:
        from helen_tpu.parallel.multihost import allsum_hosts, allsum_hosts_exact

        # loss: float32 over the wire — rounded the SAME way on every host,
        # which is the property the LR scheduler needs. Counts (image totals
        # and confusion-matrix cells) go through the limb-exact sum: the
        # plain float32 path silently rounds cells above 2^24, reachable at
        # only ~17K images of 1000 columns per host.
        total_loss = float(allsum_hosts(
            np.asarray([total_loss], dtype=np.float64))[0])
        counts = allsum_hosts_exact(np.concatenate([
            np.asarray([total_images], dtype=np.float64),
            cm_base.ravel(), cm_rle.ravel(),
        ]))
        total_images = int(counts[0])
        nb2 = cm_base.size
        # back to float64 integer-valued arrays, matching single-host output
        cm_base = counts[1 : 1 + nb2].reshape(cm_base.shape).astype(np.float64)
        cm_rle = counts[1 + nb2 :].reshape(cm_rle.shape).astype(np.float64)
    avg_loss = total_loss / total_images if total_images else 0.0
    return {
        "loss": float(avg_loss),
        "base_accuracy": accuracy_from_cm(cm_base),
        "rle_accuracy": accuracy_from_cm(cm_rle),
        "accuracy": accuracy_from_cm(cm_base),
        "base_confusion_matrix": cm_base,
        "rle_confusion_matrix": cm_rle,
    }


def save_confusion_png(cm: np.ndarray, title: str, path: str) -> Optional[str]:
    """Confusion-matrix heatmap artifact (reference TestInterface.py:24-87)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        log.warning("matplotlib unavailable; skipping confusion PNG")
        return None
    fig, ax = plt.subplots(figsize=(6, 5))
    denom = cm.sum(axis=1, keepdims=True)
    norm = cm / np.maximum(denom, 1.0)
    im = ax.imshow(norm, cmap="viridis", vmin=0.0, vmax=1.0)
    ax.set_xlabel("predicted")
    ax.set_ylabel("truth")
    ax.set_title(title)
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            ax.text(j, i, f"{int(cm[i, j])}", ha="center", va="center",
                    color="white" if norm[i, j] < 0.5 else "black", fontsize=7)
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def test_interface(
    test_dir: str,
    model_path: str,
    batch_size: int = 100,
    num_workers: int = 8,
    output_dir: str = "./test_out/",
    debug_mismatches: bool = False,
) -> Dict[str, object]:
    """CLI entry: evaluate a model, write confusion artifacts."""
    import jax.numpy as jnp
    import jax

    from helen_tpu.io.checkpoint import load_model_any

    params, meta = load_model_any(model_path)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    files = list_image_files(test_dir)
    stats = evaluate(params, files, batch_size, num_workers)
    ensure_output_dir(output_dir)
    log.info("test loss %.6f | base acc %.3f%% | rle acc %.3f%%",
             stats["loss"], stats["base_accuracy"], stats["rle_accuracy"])
    np.set_printoptions(linewidth=200)
    with open(os.path.join(output_dir, "confusion_matrix.txt"), "w") as f:
        f.write("base confusion matrix (rows=truth)\n")
        f.write(str(stats["base_confusion_matrix"].astype(np.int64)) + "\n")
        f.write("rle confusion matrix (rows=truth)\n")
        f.write(str(stats["rle_confusion_matrix"].astype(np.int64)) + "\n")
    save_confusion_png(stats["base_confusion_matrix"], "base classes",
                       os.path.join(output_dir, "base_confusion.png"))
    save_confusion_png(stats["rle_confusion_matrix"], "RLE classes",
                       os.path.join(output_dir, "rle_confusion.png"))
    if debug_mismatches:
        from helen_tpu.eval.debug import dump_mismatches

        dump_mismatches(params, files, os.path.join(output_dir, "mismatches.txt"),
                        batch_size=batch_size, num_workers=num_workers)
    return stats
