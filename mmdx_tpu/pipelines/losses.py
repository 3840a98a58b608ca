"""Training losses matching the reference's torch semantics.

- BCEWithLogitsLoss (mean) for the multi-label disease heads (reference
  training_pipeline.py:843,902,1015).
- T5 cross-entropy: mean over labels != -100 (HF T5ForConditionalGeneration's
  internal CrossEntropyLoss(ignore_index=-100), invoked at reference :600-604).
- Joint fusion loss = BCE + 1.0 * CE (reference :1053).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable mean binary cross-entropy with logits."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # max(x,0) - x*y + log(1+exp(-|x|))
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def t5_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Token-level CE, averaged over labels != -100.

    logits: [B, L, V] float; labels: [B, L] int (may contain -100).
    """
    logits = logits.astype(jnp.float32)
    valid = labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe_labels[..., None], axis=-1)[..., 0]
    nll = (logz - gold) * valid.astype(jnp.float32)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)


def fusion_loss(disease_logits, disease_targets, report_logits=None, report_labels=None,
                gen_weight: float = 1.0):
    """Joint loss = BCE(disease) + gen_weight * CE(report) (reference :1053)."""
    loss_cls = bce_with_logits(disease_logits, disease_targets)
    loss_gen = jnp.asarray(0.0, jnp.float32)
    if report_logits is not None and report_labels is not None:
        loss_gen = t5_cross_entropy(report_logits, report_labels)
    return loss_cls + gen_weight * loss_gen, {"cls": loss_cls, "gen": loss_gen}
