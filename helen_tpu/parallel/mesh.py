"""Device-mesh construction helpers.

The scale-out model (replacing the reference's mp.spawn + gloo process groups,
SURVEY.md §2.3/§5.8): a single process per host drives all local chips; a
``jax.sharding.Mesh`` with axes ("data", "model") spans every chip in the
job, with the data axis laid out to ride ICI within a slice and DCN across
slices (jax device order already enumerates ICI-adjacent devices first).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def mesh_shape_for(n_devices: int, model_parallel: int = 1) -> Tuple[int, int]:
    """(data, model) mesh shape: model axis bounded by n_devices."""
    model_parallel = max(1, min(model_parallel, n_devices))
    while n_devices % model_parallel != 0:
        model_parallel -= 1
    return n_devices // model_parallel, model_parallel


def make_mesh(
    devices: Optional[Sequence] = None,
    model_parallel: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
):
    """Build a 2-D ("data", "model") mesh over the given (default: all)
    devices. model_parallel=1 gives pure data parallelism."""
    import jax
    from jax.sharding import Mesh

    devices = list(devices) if devices is not None else jax.devices()
    dp, mp = mesh_shape_for(len(devices), model_parallel)
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, axis_names)
