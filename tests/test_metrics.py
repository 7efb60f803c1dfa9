"""Aggregation-metric tests (reference gptq/zeroShot/metrics.py surface)."""

import math

import numpy as np
import pytest

from iron_weight_only_quant_tpu.evals import metrics as M
from iron_weight_only_quant_tpu.evals.zeroshot import make_table


class TestScalarAggregations:
    def test_median(self):
        assert M.median([3.0, 1.0, 2.0]) == 2.0

    def test_weighted_mean(self):
        assert M.weighted_mean([(2.0, 1.0), (6.0, 3.0)]) == pytest.approx(2.0)

    def test_weighted_perplexity(self):
        # two tokens, total ll = -2.0 -> ppl = exp(1.0)
        items = [(-1.5, 1.0), (-0.5, 1.0)]
        assert M.weighted_perplexity(items) == pytest.approx(math.e)

    def test_bits_per_byte(self):
        items = [(-math.log(2.0), 1.0)]  # 1 bit per byte
        assert M.bits_per_byte(items) == pytest.approx(1.0)

    def test_acc_all_groups_by_question(self):
        def doc(p, q, label):
            return {"idx": {"paragraph": p, "question": q}, "label": label}

        items = [
            (1, doc(0, 0, 1)), (0, doc(0, 0, 0)),  # q(0,0): both right
            (1, doc(0, 1, 1)), (1, doc(0, 1, 0)),  # q(0,1): one wrong
        ]
        assert M.acc_all(items) == pytest.approx(0.5)

    def test_metric_max_over_ground_truths(self):
        fn = lambda pred, gt: float(pred == gt)  # noqa: E731
        assert M.metric_max_over_ground_truths(fn, "a", ["b", "a"]) == 1.0


class TestCorpusMetrics:
    # (reference, prediction) pairs
    PERFECT = [("the cat sat on the mat", "the cat sat on the mat"),
               ("a quick brown fox", "a quick brown fox")]
    NOISY = [("the cat sat on the mat", "the cat sat on a mat"),
             ("a quick brown fox", "the slow brown fox")]

    def test_bleu_perfect_and_ordering(self):
        assert M.bleu(self.PERFECT) == pytest.approx(100.0)
        assert M.bleu(self.NOISY) < 100.0

    def test_chrf_ordering(self):
        assert M.chrf(self.PERFECT) == pytest.approx(100.0)
        assert M.chrf(self.NOISY) < M.chrf(self.PERFECT)

    def test_ter_zero_on_perfect(self):
        assert M.ter(self.PERFECT) == pytest.approx(0.0)
        assert M.ter(self.NOISY) > 0.0


class TestStderr:
    def test_stderr_for_metric_mean(self):
        est = M.stderr_for_metric(M.mean)
        items = list(np.random.default_rng(0).normal(size=200))
        se = est(items)
        # bootstrap SE of the mean ~ std/sqrt(n)
        assert se == pytest.approx(np.std(items) / np.sqrt(len(items)), rel=0.3)

    def test_stderr_for_metric_weighted(self):
        est = M.stderr_for_metric(M.weighted_mean)
        items = [(float(x), 1.0) for x in np.random.default_rng(1).normal(size=50)]
        assert est(items) > 0.0

    def test_unknown_metric_has_no_estimator(self):
        assert M.stderr_for_metric(sorted) is None


class TestMakeTable:
    RESULTS = {
        "piqa": {"acc": 0.5123, "acc_stderr": 0.01, "acc_norm": 0.52},
        "boolq": {"acc": 0.6},
    }

    def test_markdown(self):
        t = make_table(self.RESULTS)
        lines = t.splitlines()
        assert lines[0].startswith("|Task")
        assert any("piqa" in ln and "0.5123" in ln and "±" in ln for ln in lines)
        assert any("acc_norm" in ln for ln in lines)

    def test_latex(self):
        t = make_table(self.RESULTS, fmt="latex")
        assert t.startswith(r"\begin{tabular}")
        assert r"acc\_norm" in t and r"$\pm$" in t
