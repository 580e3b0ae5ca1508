"""Loss / accuracy metrics (reference ``accuracy`` in utils.py, R1; NLL
training objective, R7) — index-masked so padded nodes never contribute."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["masked_nll", "masked_accuracy", "accuracy"]


def masked_nll(log_probs: jax.Array, labels: jax.Array, idx: jax.Array) -> jax.Array:
    """Mean negative log-likelihood over the index set (reference
    ``F.nll_loss(output[idx_train], labels[idx_train])``)."""
    lp = log_probs[idx]
    lb = labels[idx]
    return -jnp.mean(jnp.take_along_axis(lp, lb[:, None], axis=1))


def accuracy(log_probs: jax.Array, labels: jax.Array) -> jax.Array:
    return jnp.mean((jnp.argmax(log_probs, axis=-1) == labels).astype(jnp.float32))


def masked_accuracy(log_probs: jax.Array, labels: jax.Array, idx: jax.Array) -> jax.Array:
    return accuracy(log_probs[idx], labels[idx])
