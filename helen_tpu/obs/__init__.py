"""Observability: structured logging, stage timers, throughput counters.

The reference has only ANSI-colored stderr prints and ad-hoc elapsed-time
strings (reference PolishInterface.py:33-46, predict_gpu.py:163-173). Here
observability is a first-class subsystem: a structured logger, context-manager
stage timers that aggregate into a report, throughput (windows/s) counters and
an optional jax.profiler trace hook.
"""
from helen_tpu.obs.logging import get_logger, log
from helen_tpu.obs.timing import StageTimer, Throughput, profile_trace

__all__ = ["get_logger", "log", "StageTimer", "Throughput", "profile_trace"]
