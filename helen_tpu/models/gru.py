"""Functional GRU layers as lax.scan recurrences.

The recurrence follows the standard (cuDNN/torch-compatible) GRU cell with
separate input and hidden biases and the reset gate applied to the *projected*
hidden state:

    r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
    z = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh  (W_in x + b_in + r * (W_hn h + b_hn))
    h' = (1 - z) * n + z * h

Gate blocks are ordered [r, z, n] along the 3H axis, matching the layout of
torch ``nn.GRU`` weights so imported reference checkpoints
(helen/modules/python/models/TransducerModel.py:43-55) are bit-compatible.

TPU mapping: the input projections ``x @ W_ih`` for *all* timesteps are
hoisted out of the scan into one large MXU matmul; only the hidden projection
``h @ W_hh`` — a (B, H) x (H, 3H) matmul — remains inside the sequential scan,
which keeps the MXU busy at large batch. The backward direction uses
``lax.scan(reverse=True)``, which stacks outputs at their original positions.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]


def gru_dir_init(rng: jax.Array, input_dim: int, hidden: int, dtype=jnp.float32) -> Params:
    """One direction's parameters, init uniform(-1/sqrt(H), 1/sqrt(H)) like torch."""
    k = 1.0 / jnp.sqrt(jnp.array(hidden, dtype=jnp.float32))
    keys = jax.random.split(rng, 4)
    u = lambda key, shape: jax.random.uniform(key, shape, dtype, -k, k)
    return {
        "w_ih": u(keys[0], (input_dim, 3 * hidden)),
        "w_hh": u(keys[1], (hidden, 3 * hidden)),
        "b_ih": u(keys[2], (3 * hidden,)),
        "b_hh": u(keys[3], (3 * hidden,)),
    }


def bigru_init(rng: jax.Array, input_dim: int, hidden: int, dtype=jnp.float32) -> Params:
    r1, r2 = jax.random.split(rng)
    return {
        "fwd": gru_dir_init(r1, input_dim, hidden, dtype),
        "bwd": gru_dir_init(r2, input_dim, hidden, dtype),
    }


def gru_scan(
    x_proj: jnp.ndarray,
    h0: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_hh: jnp.ndarray,
    reverse: bool = False,
    precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan the GRU recurrence over time.

    :param x_proj: (T, B, 3H) precomputed ``x @ W_ih + b_ih``
    :param h0: (B, H) initial hidden
    :returns: (outputs (T, B, H) in original time order, final hidden (B, H))
    """
    hidden = h0.shape[-1]

    def step(h, xp):
        hp = jnp.dot(h, w_hh, precision=precision) + b_hh
        r = jax.nn.sigmoid(xp[:, :hidden] + hp[:, :hidden])
        z = jax.nn.sigmoid(xp[:, hidden : 2 * hidden] + hp[:, hidden : 2 * hidden])
        n = jnp.tanh(xp[:, 2 * hidden :] + r * hp[:, 2 * hidden :])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h_final, outs = lax.scan(step, h0, x_proj, reverse=reverse)
    return outs, h_final


def bigru_apply(
    params: Params,
    x: jnp.ndarray,
    h0_fwd: jnp.ndarray,
    h0_bwd: jnp.ndarray,
    precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bidirectional GRU layer.

    :param x: (T, B, D) time-major input
    :returns: (output (T, B, 2H) = [fwd, bwd] concat, final fwd hidden, final bwd hidden)
    """
    f, b = params["fwd"], params["bwd"]
    xp_f = jnp.dot(x, f["w_ih"], precision=precision) + f["b_ih"]
    xp_b = jnp.dot(x, b["w_ih"], precision=precision) + b["b_ih"]
    out_f, hf = gru_scan(xp_f, h0_fwd, f["w_hh"], f["b_hh"], reverse=False, precision=precision)
    out_b, hb = gru_scan(xp_b, h0_bwd, b["w_hh"], b["b_hh"], reverse=True, precision=precision)
    return jnp.concatenate([out_f, out_b], axis=-1), hf, hb
