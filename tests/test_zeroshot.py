"""Zero-shot harness tests with injected docs and a tiny model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iron_weight_only_quant_tpu.evals import metrics as M
from iron_weight_only_quant_tpu.evals.lm import EvalLM
from iron_weight_only_quant_tpu.evals.zeroshot import evaluate, get_task
from iron_weight_only_quant_tpu.models import OPTConfig, opt_forward, opt_init


class ToyTokenizer:
    """Deterministic word/char hash tokenizer for offline tests."""

    def __init__(self, vocab_size=256):
        self.vocab_size = vocab_size

    def __call__(self, text):
        return [
            (hash(w) % (self.vocab_size - 2)) + 2 for w in text.split()
        ] or [1]


@pytest.fixture(scope="module")
def model():
    cfg = OPTConfig.tiny()
    params = opt_init(cfg, jax.random.PRNGKey(0))
    return cfg, params


@pytest.fixture(scope="module")
def lm(model):
    cfg, params = model
    return EvalLM(params, opt_forward, cfg, max_len=64, batch_size=4)


class TestEvalLM:
    def test_additivity(self, lm):
        """ll(ctx, c1+c2) == ll(ctx, c1) + ll(ctx+c1, c2)."""
        ctx, c1, c2 = [3, 5, 7], [11, 13], [17, 19]
        (full, _), = lm.loglikelihood([(ctx, c1 + c2)])
        (a, _), (b, _) = lm.loglikelihood([(ctx, c1), (ctx + c1, c2)])
        assert abs(full - (a + b)) < 1e-3

    def test_batching_invariance(self, lm):
        pairs = [([3, 5], [7]), ([1, 2, 3, 4, 5], [6, 7]), ([9], [8, 7, 6])]
        one_by_one = [lm.loglikelihood([p])[0] for p in pairs]
        batched = lm.loglikelihood(pairs)
        for (a, ga), (b, gb) in zip(one_by_one, batched):
            assert abs(a - b) < 1e-3
            assert ga == gb

    def test_truncation(self, model):
        cfg, params = model
        lm = EvalLM(params, opt_forward, cfg, max_len=16)
        long_ctx = list(range(2, 2 + 100))
        (ll, _), = lm.loglikelihood([(long_ctx, [5, 6])])
        assert np.isfinite(ll)


class TestTasks:
    def test_piqa_on_injected_docs(self, lm):
        docs = [
            {"goal": "boil water", "sol1": "use a kettle", "sol2": "use a freezer", "label": 0},
            {"goal": "dry clothes", "sol1": "soak them", "sol2": "hang them up", "label": 1},
        ]
        task = get_task("piqa", docs=docs)
        res = evaluate(lm, [task], ToyTokenizer())
        assert set(res["piqa"]) >= {"acc", "acc_norm", "acc_stderr"}
        assert 0.0 <= res["piqa"]["acc"] <= 1.0

    def test_multiple_tasks(self, lm):
        boolq_docs = [{"passage": "the sky is blue", "question": "is the sky blue",
                       "label": 1}]
        copa_docs = [{"premise": "The man fell.", "question": "cause",
                      "choice1": "He tripped", "choice2": "He flew", "label": 0}]
        res = evaluate(
            lm,
            [get_task("boolq", docs=boolq_docs), get_task("copa", docs=copa_docs)],
            ToyTokenizer(),
        )
        assert "boolq" in res and "copa" in res

    def test_lambada_metrics(self, lm):
        docs = [{"text": "the quick brown fox jumps"}] * 3
        res = evaluate(lm, [get_task("lambada", docs=docs)], ToyTokenizer())
        assert "ppl" in res["lambada"] and res["lambada"]["ppl"] > 0

    def test_registry_covers_reference_tasks(self):
        """All 13 tasks of the reference registry (zeroShot/tasks/__init__.py)."""
        from iron_weight_only_quant_tpu.evals.zeroshot import TASK_REGISTRY

        for name in ("piqa", "arc_easy", "arc_challenge", "boolq", "cb", "copa",
                     "rte", "wic", "wsc", "storycloze", "lambada", "multirc",
                     "record"):
            assert name in TASK_REGISTRY
        with pytest.raises(ValueError):
            get_task("nope")

    def test_multirc_and_record(self, lm):
        multirc_docs = [{"paragraph": "cats are mammals", "question": "is a cat a mammal",
                         "answer": "yes it is", "label": 1,
                         "idx": {"paragraph": 0, "question": 0}}]
        record_docs = [{"passage": "Alice met Bob in Paris.\n@highlight\nAlice won",
                        "query": "@placeholder traveled to Paris.",
                        "entities": ["Alice", "Bob"], "answers": ["Alice"]}]
        res = evaluate(
            lm,
            [get_task("multirc", docs=multirc_docs),
             get_task("record", docs=record_docs)],
            ToyTokenizer(),
        )
        assert 0.0 <= res["multirc"]["acc"] <= 1.0
        assert 0.0 <= res["record"]["f1"] <= 1.0
        assert 0.0 <= res["record"]["em"] <= 1.0

    def test_perfect_model_scores_100(self, lm, model):
        """A task whose gold continuation is the model's own greedy output."""
        cfg, params = model
        # find the greedy next token after a fixed context
        ctx = [5, 9, 13]
        logits, _ = opt_forward(params, jnp.asarray([ctx], jnp.int32), cfg)
        best = int(jnp.argmax(logits[0, -1]))
        other = (best + 1) % cfg.vocab_size

        class Probe(type(get_task("piqa", docs=[]))):
            pass

        task = get_task("piqa", docs=[{"goal": "", "sol1": "A", "sol2": "B", "label": 0}])
        # bypass text: monkeypatch encode to produce our token ids
        mapping = {"Question: \nAnswer:": ctx, " A": [best], " B": [other]}
        res = evaluate(lm, [task], lambda s: mapping.get(s, [1]))
        assert res["piqa"]["acc"] == 1.0


class TestMetrics:
    def test_bootstrap_stderr_sane(self):
        items = [0.0, 1.0] * 50
        se = M.bootstrap_stderr(items)
        assert 0.01 < se < 0.1  # ~0.05 analytic

    def test_f1_matthews(self):
        assert M.f1_score([1, 1, 0], [1, 1, 0]) == 1.0
        assert M.matthews_corrcoef([1, 0, 1, 0], [1, 0, 1, 0]) == 1.0
        assert M.matthews_corrcoef([1, 0, 1, 0], [0, 1, 0, 1]) == -1.0


class TestGreedyUntil:
    """BaseLM's third API method (models_utils.py greedy_until)."""

    def test_matches_stepwise_argmax(self, lm, model):
        cfg, params = model
        ctx = [3, 5, 7, 11]
        (gen,) = lm.greedy_until([(ctx, [])], max_gen=5)
        assert len(gen) == 5
        # reproduce by hand: argmax of the last position, step by step
        seq = list(ctx)
        for g in gen:
            logits, _ = opt_forward(params, jnp.asarray([seq], jnp.int32), cfg)
            assert int(jnp.argmax(logits[0, -1].astype(jnp.float32))) == g
            seq.append(g)

    def test_stop_sequence_trimmed(self, lm):
        (free,) = lm.greedy_until([([3, 5, 7, 11], [])], max_gen=6)
        stop = [free[2]]  # stop on the 3rd generated token
        (gen,) = lm.greedy_until([([3, 5, 7, 11], [stop])], max_gen=6)
        assert gen == free[:2]  # stop token itself trimmed

    def test_batch_of_requests(self, lm):
        outs = lm.greedy_until([([3, 5], []), ([9, 2, 4], [])], max_gen=3)
        assert len(outs) == 2 and all(len(o) == 3 for o in outs)
