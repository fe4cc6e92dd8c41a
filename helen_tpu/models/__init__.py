from helen_tpu.models.transducer import (
    consensus_probs,
    forward,
    init_hidden,
    init_params,
    num_params,
)

__all__ = [
    "consensus_probs",
    "forward",
    "init_hidden",
    "init_params",
    "num_params",
]
