"""Side-by-side parity tests: our zero-shot tasks vs the REFERENCE task
classes imported directly from /root/reference/gptq/zeroShot.

No datasets are downloaded: reference Task instances are created with
``Task.__new__`` (skipping the downloading ``__init__``) and their prompt /
request / metric methods are driven on fabricated docs.  Each test asserts
that our task produces byte-identical request strings and equal per-doc
metric dicts to the reference implementation (VERDICT round-1 items:
MultiRC acc_all + prompt, ReCoRD @highlight + squad F1/EM, CB multi-F1,
ARC numeric answerKey mapping).
"""

import random
import sys

import pytest

sys.path.insert(0, "/root/reference/gptq")

ref_superglue = pytest.importorskip("zeroShot.tasks.superglue")
ref_arc = pytest.importorskip("zeroShot.tasks.arc")
ref_metrics_mod = pytest.importorskip("zeroShot.tasks.tasks_utils")

from iron_weight_only_quant_tpu.evals import metrics as M  # noqa: E402
from iron_weight_only_quant_tpu.evals.zeroshot.tasks import (  # noqa: E402
    CB,
    ARCChallenge,
    ARCEasy,
    MultiRC,
    ReCoRD,
)


class _RecordingRF:
    """Stub for the reference RequestFactory: records (ctx, continuation)."""

    def __init__(self):
        self.calls = []

    def loglikelihood(self, ctx, continuation):
        self.calls.append((ctx, continuation))
        return (ctx, continuation), (ctx, continuation)


def _ref_task(cls, module):
    """Instantiate a reference Task without downloading its dataset, and
    swap in a recording request factory."""
    task = cls.__new__(cls)
    rf = _RecordingRF()
    module.rf = rf
    ref_metrics_mod.rf = rf  # base classes resolve rf in tasks_utils
    return task, rf


def _ref_ctx(task, doc):
    """Zero-shot context: description(empty) + doc_to_text (the reference
    evaluator path, fewshot_context with num_fewshot=0)."""
    return task.fewshot_context(doc, 0, rnd=random.Random(1234))


class TestARCParity:
    DOCS = [
        {"id": "q1", "question": "Which gas do plants absorb?",
         "choices": {"text": ["oxygen", "carbon dioxide", "helium", "neon"],
                     "label": ["A", "B", "C", "D"]},
         "answerKey": "B"},
        # numeric answerKey: the reference maps '1'-'5' -> 'A'-'E'
        {"id": "q2", "question": "What is H2O?",
         "choices": {"text": ["rock", "water", "air"],
                     "label": ["1", "2", "3"]},
         "answerKey": "2"},
    ]

    @pytest.mark.parametrize("ref_cls,our_cls", [
        (ref_arc.ARCEasy, ARCEasy), (ref_arc.ARCChallenge, ARCChallenge)])
    def test_requests_and_gold(self, ref_cls, our_cls):
        ref, rf = _ref_task(ref_cls, ref_arc)
        ours = our_cls(docs=self.DOCS)
        for doc in self.DOCS:
            pdoc = ref._process_doc(dict(doc))
            ctx = _ref_ctx(ref, pdoc)
            rf.calls.clear()
            ref.construct_requests(pdoc, ctx)
            our_reqs = ours.requests(doc)
            assert [(r.context, r.continuation) for r in our_reqs] == rf.calls
            assert ours.gold(doc) == pdoc["gold"]

    def test_process_results_match(self):
        ref, _ = _ref_task(ref_arc.ARCEasy, ref_arc)
        ours = ARCEasy(docs=self.DOCS)
        lls = [-1.0, -0.2, -3.0, -2.0]
        for doc in self.DOCS:
            pdoc = ref._process_doc(dict(doc))
            n = len(doc["choices"]["text"])
            want = ref.process_results(pdoc, lls[:n])
            got = ours.process_results(doc, [(ll, False) for ll in lls[:n]])
            assert got["acc"] == want["acc"]
            assert got["acc_norm"] == want["acc_norm"]


class TestCBParity:
    DOCS = [
        {"premise": "It was raining.", "hypothesis": "the ground is wet",
         "label": 0},
        {"premise": "He left early.", "hypothesis": "he stayed late",
         "label": 1},
        {"premise": "She hummed.", "hypothesis": "she knows the song",
         "label": 2},
    ]

    def test_requests_match(self):
        ref, rf = _ref_task(ref_superglue.CommitmentBank, ref_superglue)
        ours = CB(docs=self.DOCS)
        for doc in self.DOCS:
            ctx = _ref_ctx(ref, doc)
            rf.calls.clear()
            ref.construct_requests(doc, ctx)
            our_reqs = ours.requests(doc)
            assert [(r.context, r.continuation) for r in our_reqs] == rf.calls

    def test_metrics_match(self):
        ref, _ = _ref_task(ref_superglue.CommitmentBank, ref_superglue)
        ours = CB(docs=self.DOCS)
        ref_items, our_per_doc = [], []
        for i, doc in enumerate(self.DOCS):
            lls = [[-0.1, -2.0, -3.0], [-2.0, -0.1, -3.0],
                   [-3.0, -2.0, -0.1]][i % 3]
            want = ref.process_results(doc, lls)
            got = ours.process_results(doc, [(ll, False) for ll in lls])
            assert got["acc"] == want["acc"]
            assert got["f1"] == tuple(want["f1"])
            ref_items.append(want["f1"])
            our_per_doc.append(got)
        agg = ours.aggregate(our_per_doc)
        assert agg["f1"] == pytest.approx(
            ref_superglue.CommitmentBank.cb_multi_fi(ref_items))


class TestMultiRCParity:
    DOCS = [
        {"paragraph": "Cats are mammals. They purr.",
         "question": "Do cats purr?", "answer": "Yes, they purr.",
         "label": 1, "idx": {"paragraph": 0, "question": 0}},
        {"paragraph": "Cats are mammals. They purr.",
         "question": "Do cats purr?", "answer": "No.",
         "label": 0, "idx": {"paragraph": 0, "question": 0}},
        {"paragraph": "Dogs bark loudly.", "question": "Are dogs silent?",
         "answer": "They are loud.", "label": 1,
         "idx": {"paragraph": 1, "question": 1}},
    ]

    def test_requests_match(self):
        ref, rf = _ref_task(ref_superglue.MultiRC, ref_superglue)
        ours = MultiRC(docs=self.DOCS)
        for doc in self.DOCS:
            ctx = _ref_ctx(ref, doc)
            rf.calls.clear()
            ref.construct_requests(doc, ctx)
            our_reqs = ours.requests(doc)
            assert [(r.context, r.continuation) for r in our_reqs] == rf.calls

    def test_acc_all_aggregation_matches(self):
        ref, _ = _ref_task(ref_superglue.MultiRC, ref_superglue)
        ours = MultiRC(docs=self.DOCS)
        lls = [(-0.1, -2.0), (-0.5, -0.4), (-3.0, -1.0)]
        ref_items, our_per_doc = [], []
        for doc, (lt, lf) in zip(self.DOCS, lls):
            want = ref.process_results(doc, (lt, lf))
            got = ours.process_results(doc, [(lt, False), (lf, False)])
            pred_ref, doc_ref = want["acc"]
            pred_our, doc_our = got["acc"]
            assert bool(pred_our) == bool(pred_ref) and doc_our is doc
            ref_items.append(want["acc"])
            our_per_doc.append(got)
        agg = ours.aggregate(our_per_doc)
        assert agg["acc"] == pytest.approx(
            float(ref_metrics_mod.acc_all(ref_items)))


class TestReCoRDParity:
    RAW_DOCS = [
        {"passage": "Paris hosted the games.\n@highlight\nAlice won gold"
                    "\n@highlight\nBob took silver",
         "query": "The winner @placeholder celebrated in Paris.",
         "entities": ["Bob", "Alice", "Alice"],
         "answers": ["Alice"]},
    ]

    def test_doc_processing_and_requests_match(self):
        ref, rf = _ref_task(ref_superglue.ReCoRD, ref_superglue)
        ours = ReCoRD(docs=self.RAW_DOCS)
        for raw in self.RAW_DOCS:
            pdoc = ref._process_doc(dict(raw))
            our_docs = ours.docs()
            assert our_docs[0] == pdoc
            ctx = _ref_ctx(ref, pdoc)
            rf.calls.clear()
            ref.construct_requests(pdoc, ctx)
            our_reqs = ours.requests(our_docs[0])
            assert [(r.context, r.continuation) for r in our_reqs] == rf.calls

    def test_f1_em_match(self):
        ref, _ = _ref_task(ref_superglue.ReCoRD, ref_superglue)
        ours = ReCoRD(docs=self.RAW_DOCS)
        pdoc = ref._process_doc(dict(self.RAW_DOCS[0]))
        for lls in ([-0.1, -2.0], [-2.0, -0.1]):
            want = ref.process_results(pdoc, [(ll,) for ll in lls])
            got = ours.process_results(ours.docs()[0], [(ll, False) for ll in lls])
            assert got["f1"] == pytest.approx(want["f1"])
            assert got["em"] == pytest.approx(want["em"])


class TestSquadMetricsParity:
    CASES = [
        ("Alice", "Alice"), ("alice!", "Alice"), ("the Alice B", "alice b"),
        ("Bob", "Alice"), ("an apple pie", "apple pie!"), ("", "x"),
        ("New York City", "York City"),
    ]

    def test_vs_transformers_squad_metrics(self):
        sm = pytest.importorskip("transformers.data.metrics.squad_metrics")
        for pred, gold in self.CASES:
            assert M.squad_f1(pred, gold) == pytest.approx(
                sm.compute_f1(gold, pred))
            assert M.squad_em(pred, gold) == pytest.approx(
                sm.compute_exact(gold, pred))


class TestRollingWindowsParity:
    def test_vs_reference_rolling_windows(self):
        mu = pytest.importorskip("zeroShot.models.models_utils")
        from iron_weight_only_quant_tpu.evals.lm import EvalLM

        lm = EvalLM.__new__(EvalLM)
        lm.max_len = 8
        lm.eot_token_id = 99
        for n in (0, 1, 5, 8, 9, 16, 23):
            tokens = list(range(1, n + 1))
            want = [
                mu.make_disjoint_window(w)
                for w in mu.get_rolling_token_windows(
                    token_list=list(tokens), prefix_token=99,
                    max_seq_len=8, context_len=1)
            ]
            got = lm.rolling_windows(tokens)
            assert got == [(list(a), list(b)) for a, b in want]
