"""Sequence pooling ops."""
from __future__ import annotations

import jax.numpy as jnp


def masked_mean_pool(last_hidden_state: jnp.ndarray, attention_mask: jnp.ndarray):
    """Masked mean over the token axis (reference TextEncoderTransformer.mean_pool,
    training_pipeline.py:452-459): average only non-padding token vectors.

    last_hidden_state: [B, L, H]; attention_mask: [B, L] (1 real, 0 pad).
    Returns [B, H].
    """
    mask = attention_mask[..., None].astype(last_hidden_state.dtype)  # [B,L,1]
    summed = jnp.sum(last_hidden_state * mask, axis=1)  # [B,H]
    counts = jnp.clip(jnp.sum(mask, axis=1), 1e-6, None)  # [B,1]
    return summed / counts
