"""External lm-eval-harness adapter, exercised through a stub lm_eval module
(the real package is optional and absent in this container)."""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from iron_weight_only_quant_tpu.evals.lm import EvalLM


@pytest.fixture()
def stub_lm_eval(monkeypatch):
    """Install a minimal lm_eval.api.model.LM base class."""
    api_model = types.ModuleType("lm_eval.api.model")

    class LM:
        def __init__(self):
            pass

    api_model.LM = LM
    api = types.ModuleType("lm_eval.api")
    api.model = api_model
    pkg = types.ModuleType("lm_eval")
    pkg.api = api
    monkeypatch.setitem(sys.modules, "lm_eval", pkg)
    monkeypatch.setitem(sys.modules, "lm_eval.api", api)
    monkeypatch.setitem(sys.modules, "lm_eval.api.model", api_model)
    return pkg


class Req:
    def __init__(self, *args):
        self.args = args


VOCAB = 32


def _word_encode(s):
    return [(hash(w) % (VOCAB - 2)) + 2 for w in s.split()] or [1]


def _decode(toks):
    return " ".join(f"t{t}" for t in toks)


@pytest.fixture()
def evallm():
    # deterministic tiny "model": logits favor (token + 1) mod VOCAB
    def forward(params, tokens, cfg):
        nxt = (tokens + 1) % VOCAB
        logits = jnp.eye(VOCAB)[nxt] * 5.0
        return logits, None

    import dataclasses

    @dataclasses.dataclass(frozen=True)
    class Cfg:
        max_position_embeddings: int = 64

    return EvalLM(params=None, forward=forward, cfg=Cfg(), batch_size=2)


def test_import_error_without_lm_eval(evallm, monkeypatch):
    from iron_weight_only_quant_tpu.evals.lm_eval_adapter import make_lm_eval_model

    # other test modules may have stubbed lm_eval into sys.modules
    # (test_e2e_reference_parity needs one to import the reference's main.py);
    # scrub so this test sees a truly absent package
    for name in list(sys.modules):
        if name == "lm_eval" or name.startswith("lm_eval."):
            monkeypatch.delitem(sys.modules, name)
    with pytest.raises(ImportError, match="native harness"):
        make_lm_eval_model(evallm, _word_encode, _decode)


def test_loglikelihood_requests(stub_lm_eval, evallm):
    from iron_weight_only_quant_tpu.evals.lm_eval_adapter import make_lm_eval_model

    model = make_lm_eval_model(evallm, _word_encode, _decode)
    out = model.loglikelihood([Req("a b c", " d"), Req("x y", " z")])
    assert len(out) == 2
    for ll, greedy in out:
        assert np.isfinite(ll) and isinstance(greedy, bool)


def test_loglikelihood_rolling(stub_lm_eval, evallm):
    from iron_weight_only_quant_tpu.evals.lm_eval_adapter import make_lm_eval_model

    model = make_lm_eval_model(evallm, _word_encode, _decode)
    (ll,) = model.loglikelihood_rolling([Req("a b c d e")])
    assert np.isfinite(ll) and ll < 0

def test_generate_until_stops_and_trims(stub_lm_eval, evallm):
    from iron_weight_only_quant_tpu.evals.lm_eval_adapter import make_lm_eval_model

    model = make_lm_eval_model(evallm, _word_encode, _decode)
    # the toy model cycles tokens deterministically; just bound generation
    (text,) = model.generate_until([Req("a b", {"max_gen_toks": 4})])
    assert len(text.split()) == 4
    # legacy alias present
    assert model.greedy_until is model.generate_until or callable(model.greedy_until)
