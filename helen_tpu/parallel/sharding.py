"""Sharded train/inference steps over a ("data", "model") mesh.

Parallelism mapping for the transducer (a 470K-param bi-GRU — the reference's
own story is file-sharding + DDP over gloo, SURVEY.md §2.3; the TPU-native
equivalents):

  * **data parallel**: image batches sharded on the "data" axis; gradient
    reduction is inserted by XLA (GSPMD) because params are replicated across
    that axis — the psum rides ICI, replacing DDP/gloo all-reduce;
  * **tensor (model) parallel**: the GRU gate projections are sharded on
    their 3H output axis and the classifier heads on their 2H input axis over
    the "model" axis; XLA inserts the all-gathers/reduce-scatters for the
    recurrence. For a model this small tp>1 is for correctness/scale testing,
    not speed;
  * **pipeline / expert parallel**: structurally inapplicable — the model has
    two dependent GRU layers (no depth to cut a pipeline worth its bubbles)
    and no MoE experts. Long-sequence scaling is handled by the pipeline's
    hierarchical chunking (SURVEY.md §5.7), i.e. the genome — not the model —
    is the long axis, and it shards on "data".
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def param_partition_specs(params=None, gru_layers: int = 1):
    """PartitionSpec pytree for the transducer params over ("data", "model").

    GRU w_ih/w_hh shard the 3H gate axis; gate biases shard likewise; head
    weights shard the 2H input axis; head biases are replicated. Pass the
    params pytree (or ``gru_layers``) for stacked-GRU geometries — deeper
    layers ("l1", "l2", ... keys) shard identically to layer 0.
    """
    from jax.sharding import PartitionSpec as P

    if params is not None:
        stack = params["encoder"]
        gru_layers = 1
        while f"l{gru_layers}" in stack:
            gru_layers += 1

    dir_spec = {
        "w_ih": P(None, "model"),
        "w_hh": P(None, "model"),
        "b_ih": P("model"),
        "b_hh": P("model"),
    }
    specs = {}
    for layer in ("encoder", "decoder"):
        specs[layer] = {d: dict(dir_spec) for d in ("fwd", "bwd")}
        for k in range(1, gru_layers):
            specs[layer][f"l{k}"] = {d: dict(dir_spec) for d in ("fwd", "bwd")}
    for head in ("base_head", "rle_head"):
        specs[head] = {"w": P("model", None), "b": P()}
    return specs


def make_sharded_train_step(
    mesh,
    tx,
    image_len: Optional[int] = None,
    precision=None,
    gru_layers: int = 1,
    params=None,
) -> Callable:
    """Jit the full TBPTT training step over a ("data", "model") mesh with
    batch-sharded data and tensor-sharded params.

    Pass ``params`` (preferred) to derive the layer geometry from the pytree —
    a stacked (gru_layers>1) checkpoint otherwise hits a pytree-structure
    mismatch against the default 1-layer spec tree.

    Returns step(params, opt_state, lr, images_u8, label_base, label_rle,
    valid) with params/opt_state sharded per param_partition_specs.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from helen_tpu.train.train_loop import build_tbptt_fn

    # xla (lax.scan) backend on purpose: this path tensor-shards w_hh over
    # the "model" axis, which GSPMD can partition through a scan but not
    # through a Mosaic custom call. The fused pallas_train backend is used
    # by the pure-data-parallel trainer (train_loop.make_train_step), which
    # wraps it in shard_map instead.
    fn = build_tbptt_fn(tx, image_len=image_len, precision=precision)

    pspecs = param_partition_specs(params=params, gru_layers=gru_layers)
    param_sh = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), pspecs,
        is_leaf=lambda x: isinstance(x, P),
    )
    rep = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))

    # optimizer state mirrors the param tree inside optax structures; let jit
    # infer it from the params sharding by only constraining params + batch
    jfn = jax.jit(
        fn,
        in_shardings=(param_sh, None, rep, batch_sh, batch_sh, batch_sh, rep),
        donate_argnums=(0, 1),
    )
    return jfn


def shard_params(mesh, params):
    """Place a param pytree on the mesh per param_partition_specs."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    pspecs = param_partition_specs(params)
    shardings = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), pspecs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(params, shardings)


def make_sharded_consensus_fn(mesh, precision=None, gru_layers: int = 1,
                              params=None) -> Callable:
    """Jit the flagship inference step (full-image windowed vote) over the
    mesh: batch on "data", params tensor-sharded on "model". Pass ``params``
    (preferred) to derive layer geometry from the pytree.

    Accepts ANY batch size: a P("data") input sharding requires the batch
    to divide evenly across the data axis (GSPMD refuses uneven input
    shards), so batches that are not a multiple are zero-padded up and the
    outputs sliced back — the same pad-and-mask contract call_consensus
    uses host-side (its eff_batch round-up). One compiled program per
    PADDED batch size."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from helen_tpu.config import WINDOW
    from helen_tpu.models.transducer import consensus_labels

    pspecs = param_partition_specs(params=params, gru_layers=gru_layers)
    param_sh = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), pspecs,
        is_leaf=lambda x: isinstance(x, P),
    )
    batch_sh = NamedSharding(mesh, P("data"))

    def fn(params, images_u8):
        # uint8 stays uint8: the pallas backends stream it into the window
        # kernel as exact bf16; non-pallas backends cast inside consensus_*
        return consensus_labels(params, images_u8, WINDOW, precision=precision)

    jfn = jax.jit(
        fn,
        in_shardings=(param_sh, batch_sh),
        out_shardings=(batch_sh, batch_sh),
    )
    dp = int(mesh.shape["data"])

    def call(params, images_u8):
        b = images_u8.shape[0]
        pad = (-b) % dp
        if pad:
            images_u8 = jnp.concatenate(
                [jnp.asarray(images_u8),
                 jnp.zeros((pad,) + tuple(images_u8.shape[1:]),
                           dtype=images_u8.dtype)])
        out = jfn(params, images_u8)
        return tuple(o[:b] for o in out) if pad else out

    return call
