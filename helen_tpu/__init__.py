"""helen_tpu — a TPU-native assembly-polishing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of HELEN
(kishwarshafin/helen): neural polishing of long-read genome assemblies from
MarginPolish run-length-encoded pileup images.

Pipeline:  MarginPolish images (HDF5)
            -> consensus calling (bidirectional-GRU transducer, sliding-window
               softmax voting) on TPU
            -> stitching (positional merge + striped Smith-Waterman anchors, C++)
            -> polished FASTA.

Subpackages:
  config    - dataclass configuration (image geometry, model dims, stitch scoring)
  io        - MarginPolish image reader, prediction store, checkpoints, FASTA
  models    - the Transducer bi-GRU model as pure-JAX pytrees + lax.scan
  ops       - Pallas TPU kernels for the hot recurrence and voting ops
  infer     - batched consensus-calling driver
  train     - multi-task training loop (TBPTT, Adam, plateau LR)
  parallel  - jax.sharding mesh utilities, shard_map'd train/infer steps
  stitch    - consensus stitching engine backed by native SSW
  eval      - confusion-matrix evaluation and debug renderers
  obs       - timers, throughput counters, structured logging
"""
from helen_tpu.version import __version__

__all__ = ["__version__"]
