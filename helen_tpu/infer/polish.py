"""The polish pipeline: consensus calling then stitching.

Equivalent of the reference PolishInterface.polish_genome
(PolishInterface.py:49-105): runs call_consensus into a timestamped
predictions directory inside the output dir, then stitches the predictions
into a polished FASTA, reporting per-stage elapsed time.
"""
from __future__ import annotations

import os
from typing import Optional

from helen_tpu.io.fasta import write_fasta, write_fastq
from helen_tpu.io.prediction_store import list_contigs
from helen_tpu.obs import StageTimer, get_logger
from helen_tpu.stitch import Stitcher
from helen_tpu.utils.filesystem import ensure_output_dir, list_prediction_files, timestamped_dir

log = get_logger("polish")


def perform_stitch(
    input_directory: str,
    output_dir: str,
    output_prefix: str = "HELEN_prediction",
    threads: int = 4,
    fastq: bool = False,
    executor=None,
) -> str:
    """Stitch all prediction files in a directory into one polished FASTA.

    Equivalent of reference StitchInterface.perform_stitch
    (StitchInterface.py:40-106). Returns the output path.

    ``fastq=True`` emits ``<prefix>.fq`` with per-base phred qualities
    instead (a helen_tpu extension; requires a store written with
    ``--qualities``). ``executor``: optional pre-warmed pool from
    stitch.engine.prewarm_stitch_pool (ownership passes to the Stitcher).
    """
    prediction_files = list_prediction_files(input_directory)
    if not prediction_files:
        raise FileNotFoundError(f"no prediction (*.hdf) files in {input_directory}")
    contigs = list_contigs(prediction_files)
    log.info("stitching %d contigs from %d prediction files", len(contigs), len(prediction_files))

    ensure_output_dir(output_dir)
    out_path = os.path.join(output_dir, output_prefix + (".fq" if fastq else ".fa"))
    stitcher = Stitcher(threads=threads, with_quality=fastq,
                        executor=executor)
    # one pool spans all contigs (stitch_iter): later contigs' region
    # work overlaps the in-order joins and streaming FASTA/FASTQ writes
    return _write_polished(out_path,
                           stitcher.stitch_iter(prediction_files, contigs),
                           len(contigs), fastq)


def _write_polished(out_path: str, rows, n_contigs: int, fastq: bool) -> str:
    """Shared output protocol of the classic and streamed stitch stages:
    per-contig progress logs, FASTA/FASTQ dispatch, summary line."""

    def records():
        for i, row in enumerate(rows):
            log.info("%04d/%04d: finished %s, polished length %d",
                     i + 1, n_contigs, row[0], len(row[1]))
            yield row

    n = write_fastq(out_path, records()) if fastq \
        else write_fasta(out_path, records())
    log.info("wrote %d contigs to %s", n, out_path)
    return out_path


def _finish_streamed(sink, pred_dir: str, output_dir: str,
                     output_prefix: str, fastq: bool) -> str:
    """Write the FASTA/FASTQ from a completed streaming-stitch sink: only
    the in-order contig joins remain (the region merges already ran on the
    pool, overlapped with consensus)."""
    prediction_files = list_prediction_files(pred_dir)
    out_path = os.path.join(output_dir,
                            output_prefix + (".fq" if fastq else ".fa"))
    n_contigs = len(sink.plan.contigs)
    log.info("stitching %d contigs (streamed) from %d prediction files",
             n_contigs, len(prediction_files))
    return _write_polished(out_path, sink.finish_iter(prediction_files),
                           n_contigs, fastq)


def polish(
    image_dir: str,
    model_path: str,
    output_dir: str = "./output",
    batch_size: int = 512,
    num_workers: int = 8,
    threads: int = 4,
    output_prefix: str = "HELEN_prediction",
    resume: bool = False,
    profile_dir: Optional[str] = None,
    backend: Optional[str] = None,
    pack: bool = False,
    host_shard: str = "image",
    data_parallel: bool = True,
    num_writers: int = 1,
    pipeline_depth: int = 2,
    fastq: bool = False,
    barrier_timeout_s: float = 86400.0,
    stream_stitch: bool = True,
) -> str:
    """Full polish: images -> consensus -> stitch -> polished FASTA path.

    ``fastq=True`` turns on per-column quality emission at consensus and
    writes <prefix>.fq with per-base phred qualities (helen_tpu extension).

    ``stream_stitch`` (default on) overlaps stitching with consensus: region
    merges run on the stitch pool from in-memory predictions as regions
    complete, and the post-consensus stitch stage shrinks to the in-order
    joins (stitch.streaming — byte-identical output). Automatically falls
    back to the classic store-reading stitch under ``--resume``, multi-host
    runs, ``threads <= 1``, or any mid-stream failure.

    ``barrier_timeout_s`` bounds how long a multi-host job waits at the
    shards-complete and stitch-complete barriers (default 24 h — the
    stitch-complete barrier parks every other host behind process 0's
    single-host stitch, which is genome-scale work).

    Multi-host jobs are coordinated: process 0 picks the predictions
    directory and broadcasts it (timestamps can differ across hosts), every
    host writes its consensus shard into that one directory, a barrier
    ensures all shards are complete, and only process 0 stitches (the FASTA
    path is still returned on every host).
    """
    import jax

    from helen_tpu.infer.consensus import call_consensus

    timer = StageTimer()
    output_dir = ensure_output_dir(output_dir)
    multi = jax.process_count() > 1
    pred_dir = None
    if not multi or jax.process_index() == 0:
        if resume:
            # reuse the newest predictions dir so --resume actually finds the
            # partially-written store from the interrupted run
            existing = sorted(
                d for d in os.listdir(output_dir)
                if d.startswith("predictions_")
                and os.path.isdir(os.path.join(output_dir, d))
            )
            if existing:
                pred_dir = os.path.join(output_dir, existing[-1])
                log.info("resuming into %s", pred_dir)
        if pred_dir is None:
            pred_dir = timestamped_dir(output_dir, "predictions")
    if multi:
        from helen_tpu.parallel import multihost

        name = multihost.broadcast_name(
            os.path.basename(pred_dir) if pred_dir else ""
        )
        pred_dir = os.path.join(output_dir, name)
        os.makedirs(pred_dir, exist_ok=True)
    # pre-warm the stitch pool on the stitching host BEFORE consensus: the
    # worker spawn + heavy imports (~1-3 s) overlap the TPU-bound consensus
    # stage instead of serializing into the stitch wall time
    stitch_pool = None
    if not multi or jax.process_index() == 0:
        from helen_tpu.stitch.engine import prewarm_stitch_pool

        stitch_pool = prewarm_stitch_pool(threads)

    # streaming stitch: merge regions on the pool WHILE consensus runs
    # (stitch.streaming). Requires the in-memory view to be complete —
    # single host, fresh run — and a live pool to stream into.
    sink = None
    sink_factory = None
    if (stream_stitch and not multi and not resume
            and stitch_pool is not None):
        def sink_factory(dataset, indices, _pool=stitch_pool):
            nonlocal sink
            from helen_tpu.config import STITCH
            from helen_tpu.stitch.streaming import (
                PRESCAN_IMAGE_LIMIT,
                StreamingStitcher,
                build_stream_plan,
            )

            n = len(dataset) if indices is None else len(indices)
            if (n > PRESCAN_IMAGE_LIMIT
                    and not getattr(dataset, "CHEAP_META", False)):
                # the unpacked pre-scan is ~4 serial HDF5 reads per image —
                # at this scale it would stall startup for minutes before
                # the first TPU batch; the packed cache scans for free
                log.info("streaming stitch off: %d images without --pack "
                         "(metadata pre-scan would stall startup; add "
                         "--pack to stream at this scale)", n)
                return None
            try:
                plan = build_stream_plan(dataset, indices, threads, STITCH)
            except Exception as exc:  # metadata pre-scan failed: classic path
                log.warning("stream-stitch pre-scan failed (%s); using the "
                            "classic stitch stage", exc)
                return None
            sink = StreamingStitcher(plan, STITCH, with_quality=fastq,
                                     executor=_pool)
            return sink
    try:
        with timer.stage("call_consensus"):
            call_consensus(
                image_dir=image_dir,
                model_path=model_path,
                output_dir=pred_dir,
                batch_size=batch_size,
                num_workers=num_workers,
                resume=resume,
                profile_dir=profile_dir,
                backend=backend,
                pack=pack,
                host_shard=host_shard,
                data_parallel=data_parallel,
                num_writers=num_writers,
                pipeline_depth=pipeline_depth,
                qualities=fastq,
                stream_sink_factory=sink_factory,
                # cache in the STABLE parent, not the per-run timestamped
                # predictions dir — otherwise every fresh polish re-packs the
                # whole image set and strands the old multi-GB cache
                cache_dir=output_dir,
            )
        fasta = os.path.join(output_dir,
                             output_prefix + (".fq" if fastq else ".fa"))
        if multi:
            multihost.barrier("consensus-shards-complete",
                              timeout_s=barrier_timeout_s)
        if not multi or jax.process_index() == 0:
            with timer.stage("stitch"):
                if sink is not None and sink.ready():
                    fasta = _finish_streamed(sink, pred_dir, output_dir,
                                             output_prefix, fastq)
                    stitch_pool = None  # consumed by finish_iter
                else:
                    if sink is not None:
                        # mid-stream failure: reclaim the pool and re-read
                        # the (complete) store classically
                        stitch_pool = sink.abort()
                    fasta = perform_stitch(pred_dir, output_dir,
                                           output_prefix, threads,
                                           fastq=fastq,
                                           executor=stitch_pool)
                    stitch_pool = None  # ownership passed and consumed
    finally:
        if stitch_pool is not None:  # consensus failed before stitch ran
            stitch_pool.shutdown(wait=False, cancel_futures=True)
    if multi:
        multihost.barrier("stitch-complete", timeout_s=barrier_timeout_s)
    log.info("polish complete:\n%s", timer.report())
    return fasta
