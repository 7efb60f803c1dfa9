"""Aggregation metrics + bootstrap standard errors.

The capability surface of reference gptq/zeroShot/metrics.py: mean/accuracy
aggregation with bootstrap resampling stderr (metrics.py:207-253), plus the
f1/matthews helpers used by the SuperGLUE-style tasks.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def mean(items: Sequence[float]) -> float:
    return float(np.mean(items)) if len(items) else float("nan")


def perplexity(log_likelihoods: Sequence[float], token_counts: Sequence[int]) -> float:
    return float(np.exp(-np.sum(log_likelihoods) / max(1, np.sum(token_counts))))


def matthews_corrcoef(golds: Sequence[int], preds: Sequence[int]) -> float:
    golds = np.asarray(golds)
    preds = np.asarray(preds)
    tp = np.sum((golds == 1) & (preds == 1))
    tn = np.sum((golds == 0) & (preds == 0))
    fp = np.sum((golds == 0) & (preds == 1))
    fn = np.sum((golds == 1) & (preds == 0))
    denom = np.sqrt(float((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)))
    return float((tp * tn - fp * fn) / denom) if denom else 0.0


def f1_score(golds: Sequence[int], preds: Sequence[int]) -> float:
    golds = np.asarray(golds)
    preds = np.asarray(preds)
    tp = np.sum((golds == 1) & (preds == 1))
    fp = np.sum((golds == 0) & (preds == 1))
    fn = np.sum((golds == 1) & (preds == 0))
    denom = 2 * tp + fp + fn
    return float(2 * tp / denom) if denom else 0.0


def bootstrap_stderr(items: Sequence[float], iters: int = 1000, seed: int = 1234) -> float:
    """Bootstrap-resampled standard error of the mean."""
    items = np.asarray(items, dtype=np.float64)
    if items.size < 2:
        return 0.0
    rng = np.random.default_rng(seed)
    means = np.empty(iters)
    for i in range(iters):
        means[i] = rng.choice(items, size=items.size, replace=True).mean()
    return float(means.std(ddof=1))
