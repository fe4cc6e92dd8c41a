from helen_tpu.infer.consensus import call_consensus, make_consensus_step
from helen_tpu.infer.polish import polish

__all__ = ["call_consensus", "make_consensus_step", "polish"]
