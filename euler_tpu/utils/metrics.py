"""Evaluation metrics (jnp, jit-friendly).

TPU-native counterpart of reference metrics
(reference: tf_euler/python/utils/metrics.py:23-98 — acc/auc/f1/mrr/mr/
hit1/3/10). All return scalars; batched variants accumulate outside jit.
"""
from __future__ import annotations

import jax.numpy as jnp


def accuracy(labels, predictions, mask=None):
    """Argmax accuracy for one-hot/soft labels."""
    hit = (jnp.argmax(labels, -1) == jnp.argmax(predictions, -1)) \
        .astype(jnp.float32)
    if mask is not None:
        m = mask.reshape(hit.shape).astype(jnp.float32)
        return jnp.sum(hit * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(hit)


def f1_score(labels, predictions, threshold=0.5, mask=None):
    """Micro-averaged multilabel F1 (reference f1: sigmoid outputs)."""
    pred = (predictions > threshold).astype(jnp.float32)
    lab = (labels > threshold).astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)
        if m.ndim < pred.ndim:
            m = m[..., None]
        pred, lab = pred * m, lab * m
    tp = jnp.sum(pred * lab)
    fp = jnp.sum(pred * (1 - lab))
    fn = jnp.sum((1 - pred) * lab)
    return 2 * tp / jnp.maximum(2 * tp + fp + fn, 1e-7)


def auc(labels, scores):
    """Rank-based AUC (Mann-Whitney U) for binary labels."""
    labels = labels.reshape(-1)
    scores = scores.reshape(-1)
    order = jnp.argsort(scores)
    ranks = jnp.empty_like(order).at[order].set(
        jnp.arange(1, order.shape[0] + 1))
    pos = labels > 0.5
    n_pos = jnp.sum(pos)
    n_neg = labels.shape[0] - n_pos
    sum_pos_ranks = jnp.sum(jnp.where(pos, ranks, 0))
    u = sum_pos_ranks - n_pos * (n_pos + 1) / 2.0
    return u / jnp.maximum(n_pos * n_neg, 1.0)


def _ranks(pos_logits, neg_logits):
    """rank of each positive among its negatives (1-based)."""
    return 1 + jnp.sum(neg_logits >= pos_logits, axis=-1)


def mrr(pos_logits, neg_logits, mask=None):
    """reference mrr (metrics.py): mean reciprocal rank of the positive."""
    r = _ranks(pos_logits, neg_logits).astype(jnp.float32)
    inv = 1.0 / r
    if mask is not None:
        m = mask.reshape(inv.shape).astype(jnp.float32)
        return jnp.sum(inv * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(inv)


def mean_rank(pos_logits, neg_logits, mask=None):
    r = _ranks(pos_logits, neg_logits).astype(jnp.float32)
    if mask is not None:
        m = mask.reshape(r.shape).astype(jnp.float32)
        return jnp.sum(r * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(r)


def hit_at_k(pos_logits, neg_logits, k, mask=None):
    h = (_ranks(pos_logits, neg_logits) <= k).astype(jnp.float32)
    if mask is not None:
        m = mask.reshape(h.shape).astype(jnp.float32)
        return jnp.sum(h * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(h)


_METRICS = {
    "acc": accuracy,
    "accuracy": accuracy,
    "f1": f1_score,
    "auc": auc,
    "mrr": mrr,
    "mr": mean_rank,
    "hit1": lambda p, n, **kw: hit_at_k(p, n, 1, **kw),
    "hit3": lambda p, n, **kw: hit_at_k(p, n, 3, **kw),
    "hit10": lambda p, n, **kw: hit_at_k(p, n, 10, **kw),
}


def get(name: str):
    """reference: tf_euler.utils.metrics.get."""
    return _METRICS[name]
