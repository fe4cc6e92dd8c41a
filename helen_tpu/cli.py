"""Command-line interface for helen_tpu.

Covers the reference's two CLIs in one tool:
  * ``helen`` (helen/helen.py:241-357): polish, call_consensus, stitch,
    download_models, torch_stat (here: ``devices``), version;
  * ``helen_train`` (helen/helen_train.py:194-269): train, test.

Run as ``python -m helen_tpu`` or via the ``helen_tpu`` console script.
"""
from __future__ import annotations

import argparse
import sys


def _add_common_consensus_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-i", "--image_dir", required=True,
                   help="directory of MarginPolish image files (*.h5)")
    p.add_argument("-m", "--model_path", required=True,
                   help="trained model (.pkl reference checkpoint or .npz native)")
    p.add_argument("-b", "--batch_size", type=int, default=512)
    p.add_argument("-w", "--num_workers", type=int, default=8,
                   help="host threads for image loading")
    p.add_argument("-o", "--output_dir", default="./output/")
    p.add_argument("--resume", action="store_true",
                   help="skip images already present in the output store")
    p.add_argument("--no_data_parallel", action="store_true",
                   help="disable sharding over local devices")
    p.add_argument("--profile_dir", default=None,
                   help="write a jax.profiler trace here")
    p.add_argument("--fast", action="store_true",
                   help="bf16 recurrence (fastest; labels can flip on "
                        "near-tie votes, so not byte-identical to reference)")
    p.add_argument("--backend", default=None,
                   choices=["xla", "pallas", "pallas_fast"],
                   help="override compute backend (default: pallas on TPU)")
    p.add_argument("--pack", action="store_true",
                   help="build/reuse a packed contiguous image cache for "
                        "slab-read streaming (recommended for large runs)")
    p.add_argument("--writers", type=int, default=1,
                   help="prediction-writer processes per host (each owns one "
                        "shard file); >1 unbinds fast hosts from libhdf5's "
                        "in-process serialization")
    p.add_argument("--host_shard", default="image", choices=["image", "file"],
                   help="multi-host work partition: contiguous image blocks "
                        "(balanced) or round-robin whole files (host-local IO)")
    p.add_argument("--pipeline_depth", type=int, default=2,
                   help="device batches in flight: host->device transfer of "
                        "batch k+1 overlaps compute of batch k and readback "
                        "of batch k-1")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="helen_tpu",
        description="TPU-native assembly polisher (HELEN-compatible pipeline)",
    )
    parser.add_argument(
        "--platform", choices=["auto", "cpu"], default="auto",
        help="force the compute platform (cpu = the reference's CPU-inference "
             "mode; auto = use the TPU when present)",
    )
    parser.add_argument(
        "--distributed", action="store_true",
        help="join a multi-host job via jax.distributed.initialize() "
             "auto-discovery (TPU pods); single-host runs don't need it",
    )
    parser.add_argument(
        "--coordinator_address", default=None,
        help="multi-host coordinator host:port (with --num_processes and "
             "--process_id; alternative to --distributed auto-discovery)",
    )
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    sub = parser.add_subparsers(dest="command")

    p = sub.add_parser("polish", help="images -> consensus -> stitch -> polished FASTA")
    _add_common_consensus_args(p)
    p.add_argument("-t", "--threads", type=int, default=4, help="stitch process count")
    p.add_argument("-p", "--output_prefix", default="HELEN_prediction")
    p.add_argument("--fastq", action="store_true",
                   help="emit <prefix>.fq with per-base phred qualities from "
                        "the vote margins (extension; reference discards them)")
    p.add_argument("--barrier_timeout", type=float, default=86400.0,
                   help="multi-host barrier timeout in seconds (hosts park "
                        "here behind process 0's stitch; default 24 h)")
    p.add_argument("--no_stream_stitch", action="store_true",
                   help="disable overlapping stitch with consensus (streaming "
                        "is byte-identical and on by default; it already "
                        "auto-disables under --resume and multi-host runs)")

    p = sub.add_parser("call_consensus", help="run model inference, write prediction HDF5")
    _add_common_consensus_args(p)
    p.add_argument("-p", "--output_prefix", default="helen_predictions")
    p.add_argument("--qualities", action="store_true",
                   help="also store per-column phred confidences (needed for "
                        "stitch --fastq)")

    p = sub.add_parser("stitch", help="stitch prediction HDF5 files into FASTA")
    p.add_argument("-i", "--input_dir", required=True,
                   help="directory containing prediction (*.hdf) files")
    p.add_argument("-o", "--output_dir", default="./output/")
    p.add_argument("-p", "--output_prefix", default="HELEN_prediction")
    p.add_argument("-t", "--threads", type=int, default=4)
    p.add_argument("--fastq", action="store_true",
                   help="emit FASTQ (requires a --qualities prediction store)")

    p = sub.add_parser("train", help="train the transducer model")
    p.add_argument("--train_image_dir", required=True)
    p.add_argument("--test_image_dir", required=True)
    p.add_argument("-b", "--batch_size", type=int, default=100)
    p.add_argument("-e", "--epoch_size", type=int, default=10, help="epochs to run")
    p.add_argument("-w", "--num_workers", type=int, default=16)
    p.add_argument("-o", "--model_out", default="./model_out/",
                   help="output dir for checkpoints and stats")
    p.add_argument("--retrain_model_path", default=None,
                   help="checkpoint to continue training from")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--decay", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--backend", default="auto",
                   choices=["auto", "xla", "pallas_train"],
                   help="recurrence backend: auto picks the fused Pallas "
                        "train kernels on TPU, lax.scan elsewhere")
    p.add_argument("--hidden_size", type=int, default=128,
                   help="GRU hidden size for a FRESH model (retraining "
                        "follows the checkpoint's geometry)")
    p.add_argument("--gru_layers", type=int, default=1,
                   help="stacked GRU layers per encoder/decoder for a "
                        "FRESH model")
    p.add_argument("--pack", action="store_true",
                   help="build/reuse a packed contiguous cache of the "
                        "training images (one slab read per batch instead of "
                        "group-per-image HDF5 reads, every epoch)")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="tensor-parallel width: shard the GRU gate "
                        "projections over a ('data','model') chip mesh via "
                        "GSPMD (single-process jobs; 1 = pure data parallel)")

    p = sub.add_parser("test", help="evaluate a model on labeled images")
    p.add_argument("--test_image_dir", required=True)
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-b", "--batch_size", type=int, default=100)
    p.add_argument("-w", "--num_workers", type=int, default=8)
    p.add_argument("-o", "--output_dir", default="./test_out/")
    p.add_argument("--debug_mismatches", action="store_true",
                   help="dump per-position mismatches with feature rendering")

    p = sub.add_parser("download_models", help="download released model checkpoints")
    p.add_argument("-o", "--output_dir", required=True)
    p.add_argument("--manifest_url", default=None)

    p = sub.add_parser(
        "convert",
        help="convert checkpoints between reference .pkl and native .npz",
    )
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", required=True,
                   help="output path; .npz or .pkl decides the format")

    p = sub.add_parser("hyperband", help="successive-halving (lr, decay) search")
    p.add_argument("--train_image_dir", required=True)
    p.add_argument("--test_image_dir", required=True)
    p.add_argument("-o", "--output_dir", default="./hyperband_out/")
    p.add_argument("-b", "--batch_size", type=int, default=32)
    p.add_argument("--max_epochs", type=int, default=9)
    p.add_argument("--eta", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)

    p = sub.add_parser("assess", help="polished-vs-truth error rate / Q "
                       "(native banded edit distance; helen_tpu extension)")
    p.add_argument("-t", "--truth", required=True)
    p.add_argument("-p", "--polished", required=True)
    p.add_argument("--max_band", type=int, default=1 << 20)
    p.add_argument("--json", action="store_true")
    p.add_argument("-b", "--bed", default=None,
                   help="masked-regions BED (truth-space): SSW-anchored "
                        "masking of both fastas before assessing")

    sub.add_parser("devices", help="show JAX devices and platform info (reference: torch_stat)")
    sub.add_parser("version", help="print version")
    return parser


def cmd_devices() -> None:
    import jax

    print(f"jax {jax.__version__}")
    print(f"default backend: {jax.default_backend()}")
    print(f"process {jax.process_index()}/{jax.process_count()}")
    for d in jax.devices():
        print(f"  {d.id}: {d.device_kind} (platform={d.platform}, "
              f"process={d.process_index})")
    print(f"local devices: {jax.local_device_count()}, total: {jax.device_count()}")


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.command is None:
        parser.print_help()
        return 1

    if args.platform == "cpu":
        # must happen before the first jax backend use; all jax imports in
        # this CLI are function-local so this is early enough
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.command in ("polish", "call_consensus", "train", "test", "hyperband"):
        from helen_tpu.utils import enable_persistent_compilation_cache

        enable_persistent_compilation_cache()
        if args.distributed or args.coordinator_address:
            from helen_tpu.parallel import multihost

            multihost.initialize(
                coordinator_address=args.coordinator_address,
                num_processes=args.num_processes,
                process_id=args.process_id,
                auto=args.distributed,
            )

    if getattr(args, "fast", False) and getattr(args, "backend", None):
        parser.error("--fast and --backend are mutually exclusive "
                     "(--fast means --backend pallas_fast)")

    if args.command == "version":
        from helen_tpu.version import __version__

        print(f"helen_tpu {__version__}")
        return 0

    if args.command == "assess":
        from helen_tpu.tools.assess_polish import main as assess_main

        return assess_main(
            ["-t", args.truth, "-p", args.polished,
             "--max_band", str(args.max_band)]
            + (["--json"] if args.json else [])
            + (["--bed", args.bed] if args.bed else [])
        )

    if args.command == "devices":
        cmd_devices()
        return 0

    if args.command == "polish":
        from helen_tpu.infer.polish import polish

        fasta = polish(
            image_dir=args.image_dir,
            model_path=args.model_path,
            output_dir=args.output_dir,
            batch_size=args.batch_size,
            num_workers=args.num_workers,
            threads=args.threads,
            output_prefix=args.output_prefix,
            resume=args.resume,
            profile_dir=args.profile_dir,
            backend="pallas_fast" if args.fast else args.backend,
            pack=args.pack,
            host_shard=args.host_shard,
            num_writers=args.writers,
            data_parallel=not args.no_data_parallel,
            pipeline_depth=args.pipeline_depth,
            fastq=args.fastq,
            barrier_timeout_s=args.barrier_timeout,
            stream_stitch=not args.no_stream_stitch,
        )
        print(fasta)
        return 0

    if args.command == "call_consensus":
        from helen_tpu.infer.consensus import call_consensus

        files = call_consensus(
            image_dir=args.image_dir,
            model_path=args.model_path,
            output_dir=args.output_dir,
            batch_size=args.batch_size,
            num_workers=args.num_workers,
            output_prefix=args.output_prefix,
            resume=args.resume,
            data_parallel=not args.no_data_parallel,
            profile_dir=args.profile_dir,
            backend="pallas_fast" if args.fast else args.backend,
            pack=args.pack,
            host_shard=args.host_shard,
            num_writers=args.writers,
            pipeline_depth=args.pipeline_depth,
            qualities=args.qualities,
        )
        for f in files:
            print(f)
        return 0

    if args.command == "stitch":
        from helen_tpu.infer.polish import perform_stitch

        fasta = perform_stitch(
            input_directory=args.input_dir,
            output_dir=args.output_dir,
            output_prefix=args.output_prefix,
            threads=args.threads,
            fastq=args.fastq,
        )
        print(fasta)
        return 0

    if args.command == "train":
        from helen_tpu.train.train_loop import train_interface

        train_interface(
            train_dir=args.train_image_dir,
            test_dir=args.test_image_dir,
            batch_size=args.batch_size,
            epochs=args.epoch_size,
            num_workers=args.num_workers,
            output_dir=args.model_out,
            retrain_model_path=args.retrain_model_path,
            learning_rate=args.lr,
            weight_decay=args.decay,
            seed=args.seed,
            backend=args.backend,
            hidden_size=args.hidden_size,
            gru_layers=args.gru_layers,
            pack=args.pack,
            model_parallel=args.model_parallel,
        )
        return 0

    if args.command == "test":
        from helen_tpu.train.evaluate import test_interface

        test_interface(
            test_dir=args.test_image_dir,
            model_path=args.model_path,
            batch_size=args.batch_size,
            num_workers=args.num_workers,
            output_dir=args.output_dir,
            debug_mismatches=args.debug_mismatches,
        )
        return 0

    if args.command == "hyperband":
        from helen_tpu.train.hyperband import hyperband_interface

        best = hyperband_interface(
            args.train_image_dir, args.test_image_dir, args.output_dir,
            args.batch_size, args.max_epochs, args.eta, seed=args.seed,
        )
        print(f"best lr={best.params['learning_rate']:.3e} "
              f"decay={best.params['weight_decay']:.3e} loss={best.loss:.6f}")
        return 0

    if args.command == "download_models":
        from helen_tpu.io.download import download_models

        download_models(args.output_dir, args.manifest_url)
        return 0

    if args.command == "convert":
        from helen_tpu.io.checkpoint import (
            export_torch_checkpoint,
            load_model_any,
            save_checkpoint,
        )

        params, meta = load_model_any(args.input)
        if args.output.endswith(".pkl"):
            export_torch_checkpoint(args.output, params, meta)
        elif args.output.endswith(".onnx"):
            # the reference's CPU path exports ONNX (predict_cpu.py:224-239);
            # export verifies itself by parsing the bytes back and running a
            # batch through the numpy evaluator against the jax model
            from helen_tpu.io.onnx_export import export_onnx

            export_onnx(params, args.output)
        else:
            save_checkpoint(args.output, params, meta=meta)
        print(args.output)
        return 0

    parser.error(f"unknown command {args.command}")
    return 2


if __name__ == "__main__":
    sys.exit(main())
