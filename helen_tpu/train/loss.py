"""Multi-task classification losses.

Matches torch ``nn.CrossEntropyLoss`` semantics used by the reference
(train.py:121-126): the base head uses unweighted mean cross-entropy; the RLE
head uses class-weighted cross-entropy where the mean is normalized by the
sum of the selected class weights (torch's weighted-mean convention), with
the 11 RLE class weights from Options.py:29.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy. logits (..., C), labels (...) int."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


def weighted_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, class_weights: jnp.ndarray
) -> jnp.ndarray:
    """Class-weighted CE with torch normalization: sum(w_y * ce) / sum(w_y)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = class_weights[labels]
    return -(w * ll).sum() / w.sum()


def masked_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, row_mask: jnp.ndarray
) -> jnp.ndarray:
    """Mean CE over rows where row_mask (shape (B,)) is 1 — used when a batch
    is padded to a device-count multiple; numerically identical to
    cross_entropy over the unpadded rows."""
    n, d = masked_cross_entropy_parts(logits, labels, row_mask)
    return n / jnp.maximum(d, 1.0)


def masked_weighted_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: jnp.ndarray,
    row_mask: jnp.ndarray,
) -> jnp.ndarray:
    n, d = masked_weighted_cross_entropy_parts(logits, labels, class_weights, row_mask)
    return n / jnp.maximum(d, 1e-12)


def masked_cross_entropy_parts(
    logits: jnp.ndarray, labels: jnp.ndarray, row_mask: jnp.ndarray
) -> tuple:
    """(numerator, denominator) of masked_cross_entropy, so a data-parallel
    shard can psum both parts before dividing — sum(psum num)/psum(den) is the
    exact global mean even when padding rows land unevenly across shards."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    m = row_mask[:, None]
    return -(ll * m).sum(), m.sum() * ll.shape[1]


def masked_weighted_cross_entropy_parts(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: jnp.ndarray,
    row_mask: jnp.ndarray,
) -> tuple:
    """(numerator, denominator) of masked_weighted_cross_entropy (torch's
    weighted-mean convention: denominator is the sum of selected class
    weights, which is data-dependent and must be reduced globally)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = class_weights[labels] * row_mask[:, None]
    return -(w * ll).sum(), w.sum()
