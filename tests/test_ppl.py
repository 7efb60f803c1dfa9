"""PPL evaluator parity vs an HF-computed reference on synthetic tokens."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from iron_weight_only_quant_tpu.data import get_loaders  # noqa: E402
from iron_weight_only_quant_tpu.evals import SequentialPPLEvaluator  # noqa: E402
from iron_weight_only_quant_tpu.models.convert_hf import from_hf_model  # noqa: E402


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = transformers.OPTConfig(
        vocab_size=256, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=512,
    )
    m = transformers.OPTForCausalLM(cfg)
    m.eval()
    return m


def hf_sequential_ppl(model, tokens: np.ndarray, seqlen: int, batch: int = 4):
    """Independent reimplementation of the reference evaluator loop in torch."""
    nsamples = tokens.shape[1] // seqlen
    total_nll, total_tok = 0.0, 0
    with torch.no_grad():
        for start in range(0, nsamples, batch):
            end = min(start + batch, nsamples)
            chunk = np.concatenate(
                [tokens[:, i * seqlen : (i + 1) * seqlen] for i in range(start, end)], 0
            )
            t = torch.from_numpy(chunk)
            loss = model(t, labels=t).loss.item()
            eff = (seqlen - 1) * chunk.shape[0]
            total_nll += loss * eff
            total_tok += eff
    return math.exp(total_nll / total_tok)


class TestSequentialPPL:
    def test_matches_hf(self, hf_model):
        seqlen = 64
        _, test = get_loaders("synthetic", seqlen=seqlen, vocab_size=256)
        tokens = np.asarray(test.input_ids)

        ref_ppl = hf_sequential_ppl(hf_model, tokens, seqlen)
        cfg, params, fwd = from_hf_model(hf_model)
        ev = SequentialPPLEvaluator(params, fwd, cfg, seqlen=seqlen, vocab_size=256)
        ppl, ntok, nchunk = ev.calculate_ppl("synthetic")
        assert nchunk == 8 and ntok == 8 * (seqlen - 1)
        assert abs(ppl - ref_ppl) / ref_ppl < 1e-3, (ppl, ref_ppl)

    def test_max_chunks(self, hf_model):
        cfg, params, fwd = from_hf_model(hf_model)
        ev = SequentialPPLEvaluator(params, fwd, cfg, seqlen=64, vocab_size=256)
        ppl, ntok, nchunk = ev.calculate_ppl("synthetic", max_chunks=3)
        assert nchunk == 3 and ntok == 3 * 63

    def test_dataset_name_mapping(self, hf_model):
        cfg, params, fwd = from_hf_model(hf_model)
        ev = SequentialPPLEvaluator(params, fwd, cfg, seqlen=64, vocab_size=256)
        # "wikitext" maps to wikitext2 which needs network; synthetic doesn't
        assert ev._load_tokens("synthetic").shape[0] == 1


class TestLoaders:
    def test_synthetic_deterministic(self):
        a_train, a_test = get_loaders("synthetic", nsamples=4, seed=7, seqlen=32)
        b_train, b_test = get_loaders("synthetic", nsamples=4, seed=7, seqlen=32)
        np.testing.assert_array_equal(a_test.input_ids, b_test.input_ids)
        assert len(a_train) == 4
        np.testing.assert_array_equal(a_train[0].input_ids, b_train[0].input_ids)
        assert a_train[0].input_ids.shape == (1, 32)

    def test_unknown_dataset(self):
        with pytest.raises(ValueError):
            get_loaders("nope")
