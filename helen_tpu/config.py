"""Configuration for the helen_tpu framework.

Replaces the reference's constant classes (helen/modules/python/Options.py:1-29)
and its argparse sprawl with frozen dataclasses that can be overridden
programmatically or from the CLI.

The numeric values here are part of the numerical contract with the
MarginPolish image format and the published HELEN models — changing them
changes model shapes and output bytes.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ImageConfig:
    """Geometry of MarginPolish pileup images.

    Mirrors ImageSizeOptions (reference Options.py:13-21).
    """

    #: features per pileup column: A/C/G/T x 11 run-lengths x 2 strands + 2 gap
    feature_dim: int = 90
    #: columns per image window
    seq_length: int = 1000
    #: overlap in bases between adjacent MarginPolish regions
    seq_overlap: int = 200
    #: base classes: {0: '', 1: 'A', 2: 'C', 3: 'G', 4: 'T'}
    num_base_classes: int = 5
    #: run-length classes 0..10
    num_rle_classes: int = 11


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Transducer model dimensions (reference Options.py:24-28, TransducerModel.py:43-58)."""

    hidden_size: int = 128
    gru_layers: int = 1
    bidirectional: bool = True
    input_features: int = 90
    num_base_classes: int = 5
    num_rle_classes: int = 11


@dataclasses.dataclass(frozen=True)
class WindowConfig:
    """Sliding-window transduction contract (reference Options.py:24-26).

    A 1000-column image is processed as ceil((seq_length - window)/jump)+1 = 19
    overlapping 100-column windows with stride 50; the recurrent hidden state is
    carried from each window into the next and per-column class probabilities
    are the sum of softmaxes of every window covering the column
    (reference predict_gpu.py:114-149).
    """

    window: int = 100
    jump: int = 50

    def num_windows(self, seq_length: int) -> int:
        n = 0
        for i in range(0, seq_length, self.jump):
            if i + self.window > seq_length:
                break
            n += 1
        return n

    def starts(self, seq_length: int):
        return [i for i in range(0, seq_length, self.jump)
                if i + self.window <= seq_length]


@dataclasses.dataclass(frozen=True)
class StitchConfig:
    """Stitching / SSW alignment scoring (reference Options.py:1-10)."""

    match_score: int = 4
    mismatch_penalty: int = 6
    gap_open_penalty: int = 8
    gap_extend_penalty: int = 2
    #: minimum grouped-M run in the anchor cigar (reference Stitch.py:76)
    overlap_threshold: int = 8
    base_error_rate: float = 0.0
    min_sequence_for_multithreading: int = 2
    kmer_size: int = 15


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyper-parameters.

    lr/decay defaults come from the reference TrainInterface.py:37-38; RLE class
    weights from Options.py:29.
    """

    batch_size: int = 100
    epochs: int = 10
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    rle_class_weights: tuple = (0.3, 0.5, 0.5, 0.5, 0.5, 0.8, 0.9, 1.0, 1.0, 1.0, 0.9)
    #: ReduceLROnPlateau equivalents (torch defaults: factor 0.1, patience 10)
    plateau_factor: float = 0.1
    plateau_patience: int = 10
    seed: int = 42


#: decode map for base classes (reference Options.py:3)
LABEL_DECODER = {0: "", 1: "A", 2: "C", 3: "G", 4: "T"}

IMAGE = ImageConfig()
MODEL = ModelConfig()
WINDOW = WindowConfig()
STITCH = StitchConfig()
TRAIN = TrainConfig()
