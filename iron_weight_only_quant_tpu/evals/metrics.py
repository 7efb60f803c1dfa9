"""Aggregation metrics + bootstrap standard errors.

The capability surface of reference gptq/zeroShot/metrics.py: mean/accuracy
aggregation with bootstrap resampling stderr (metrics.py:207-253), the
f1/matthews helpers used by the SuperGLUE-style tasks, corpus generation
metrics (bleu/chrf/ter, metrics.py:111-154), weighted perplexity /
bits-per-byte aggregations (metrics.py:94-108), and MultiRC's
all-question-answers accuracy (metrics.py:48-82).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Sequence, Tuple

import numpy as np


def mean(items: Sequence[float]) -> float:
    return float(np.mean(items)) if len(items) else float("nan")


def median(items: Sequence[float]) -> float:
    return float(np.median(items)) if len(items) else float("nan")


def perplexity(log_likelihoods: Sequence[float], token_counts: Sequence[int]) -> float:
    return float(np.exp(-np.sum(log_likelihoods) / max(1, np.sum(token_counts))))


def weighted_mean(items: Sequence[Tuple[float, float]]) -> float:
    """items: (value, weight) pairs (reference metrics.py:98-100)."""
    a, b = zip(*items)
    return float(sum(a) / sum(b))


def weighted_perplexity(items: Sequence[Tuple[float, float]]) -> float:
    """items: (loglikelihood, token_count) pairs (reference metrics.py:103-104)."""
    return float(math.exp(-weighted_mean(items)))


def bits_per_byte(items: Sequence[Tuple[float, float]]) -> float:
    """items: (loglikelihood, byte_count) pairs (reference metrics.py:107-108)."""
    return float(-weighted_mean(items) / math.log(2))


def acc_all(items: Sequence[Tuple[int, dict]]) -> float:
    """MultiRC grouped accuracy: a question scores 1 only if every one of its
    answer candidates is labeled correctly (reference metrics.py:48-64).

    items: (pred, doc) where doc has ``idx: {paragraph, question}`` and
    ``label`` keys.
    """
    question_map: Dict[Tuple[int, int], list] = {}
    for pred, doc in items:
        key = (doc["idx"]["paragraph"], doc["idx"]["question"])
        question_map.setdefault(key, []).append(int(pred) == int(doc["label"]))
    if not question_map:
        return float("nan")
    return float(np.mean([all(v) for v in question_map.values()]))


def metric_max_over_ground_truths(metric_fn: Callable, prediction, ground_truths) -> float:
    """Best score of a prediction against any reference (metrics.py:85-91)."""
    return max(metric_fn(prediction, gt) for gt in ground_truths)


def _corpus_pairs(items: Sequence[Tuple[str, str]]):
    refs, preds = zip(*items)
    # sacrebleu wants List[List[str]] refs: one stream per reference set
    return [list(refs)], list(preds)


def bleu(items: Sequence[Tuple[str, str]]) -> float:
    """Corpus BLEU over (reference, prediction) pairs (metrics.py:111-125)."""
    import sacrebleu

    refs, preds = _corpus_pairs(items)
    return float(sacrebleu.corpus_bleu(preds, refs).score)


def chrf(items: Sequence[Tuple[str, str]]) -> float:
    """Corpus chrF over (reference, prediction) pairs (metrics.py:128-139)."""
    import sacrebleu

    refs, preds = _corpus_pairs(items)
    return float(sacrebleu.corpus_chrf(preds, refs).score)


def ter(items: Sequence[Tuple[str, str]]) -> float:
    """Corpus TER over (reference, prediction) pairs (metrics.py:142-154).
    Lower is better."""
    import sacrebleu

    refs, preds = _corpus_pairs(items)
    return float(sacrebleu.corpus_ter(preds, refs).score)


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


def bootstrap_stderr_fn(fn: Callable, items: Sequence, iters: int = 1000,
                        seed: int = 1234) -> float:
    """Bootstrap stderr of an arbitrary aggregation (reference metrics.py:
    207-233): resample the item list, re-apply ``fn``, take the std."""
    if len(items) < 2:
        return 0.0
    rng = np.random.default_rng(seed)
    idx = np.arange(len(items))
    vals = np.empty(iters)
    for i in range(iters):
        sample = [items[j] for j in rng.choice(idx, size=len(items), replace=True)]
        vals[i] = fn(sample)
    return float(vals.std(ddof=1))


def stderr_for_metric(metric: Callable, bootstrap_iters: int = 1000):
    """Return a stderr estimator for a metric aggregation, or None
    (reference metrics.py:236-253): corpus metrics (bleu/chrf/ter/f1/
    matthews/weighted aggregations) bootstrap with fewer iters; plain
    accuracy-style means use the closed form."""
    bootstrappable = {acc_all, weighted_mean, weighted_perplexity,
                      bits_per_byte, bleu, chrf, ter, median}
    if metric in bootstrappable:
        return lambda items: bootstrap_stderr_fn(
            metric, items, iters=min(bootstrap_iters, 100))
    if metric is mean:
        return lambda items: bootstrap_stderr(items, iters=bootstrap_iters)
    return None
