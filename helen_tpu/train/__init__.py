from helen_tpu.train.loss import cross_entropy, weighted_cross_entropy
from helen_tpu.train.train_loop import Trainer, train_interface

__all__ = ["cross_entropy", "weighted_cross_entropy", "Trainer", "train_interface"]
