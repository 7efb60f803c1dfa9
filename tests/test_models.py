"""Model parity tests: our pure-JAX forwards vs HF transformers (tiny models).

This is the framework analogue of the reference's implicit contract: its
quantization wraps HF models, so PPL parity requires forward parity first.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from iron_weight_only_quant_tpu.models import (  # noqa: E402
    bloom_forward,
    llama_forward,
    opt_forward,
)
from iron_weight_only_quant_tpu.models.common import KVCacheView  # noqa: E402
from iron_weight_only_quant_tpu.models.convert_hf import from_hf_model  # noqa: E402


def _logit_diff(ours, theirs):
    ours = np.asarray(ours, dtype=np.float32)
    theirs = theirs.detach().float().numpy()
    return np.max(np.abs(ours - theirs))


@pytest.fixture(scope="module")
def tokens():
    rng = np.random.default_rng(0)
    return rng.integers(0, 250, size=(2, 24)).astype(np.int64)


def _make_hf(cls, cfg):
    torch.manual_seed(0)
    model = cls(cfg)
    model.eval()
    return model


class TestLlamaParity:
    @pytest.fixture(scope="class")
    def hf_model(self):
        cfg = transformers.LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, tie_word_embeddings=False,
        )
        return _make_hf(transformers.LlamaForCausalLM, cfg)

    def test_logits_match(self, hf_model, tokens):
        cfg, params, fwd = from_hf_model(hf_model)
        with torch.no_grad():
            ref = hf_model(torch.from_numpy(tokens)).logits
        ours, _ = fwd(params, jnp.asarray(tokens), cfg)
        assert _logit_diff(ours, ref) < 2e-4

    def test_incremental_matches_full(self, hf_model, tokens):
        """Decode with KV cache must equal the full forward (last positions)."""
        cfg, params, fwd = from_hf_model(hf_model)
        toks = jnp.asarray(tokens)
        full, _ = fwd(params, toks, cfg)

        b, s = toks.shape
        t_max = 32
        caches = [
            KVCacheView(
                jnp.zeros((b, t_max, cfg.num_kv_heads, cfg.hd), jnp.float32),
                jnp.zeros((b, t_max, cfg.num_kv_heads, cfg.hd), jnp.float32),
                jnp.asarray(0, jnp.int32),
            )
            for _ in range(cfg.num_layers)
        ]
        # prefill first s-4 tokens, then decode 4 tokens one by one
        split = s - 4
        logits_pre, caches = fwd(params, toks[:, :split], cfg, caches=caches)
        np.testing.assert_allclose(
            np.asarray(logits_pre), np.asarray(full[:, :split]), atol=2e-4
        )
        for i in range(split, s):
            step, caches = fwd(params, toks[:, i : i + 1], cfg, caches=caches)
            np.testing.assert_allclose(
                np.asarray(step[:, 0]), np.asarray(full[:, i]), atol=2e-4
            )


class TestOPTParity:
    @pytest.fixture(scope="class")
    def hf_model(self):
        cfg = transformers.OPTConfig(
            vocab_size=256, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
            num_attention_heads=4, max_position_embeddings=128,
            do_layer_norm_before=True,
        )
        return _make_hf(transformers.OPTForCausalLM, cfg)

    def test_logits_match(self, hf_model, tokens):
        cfg, params, fwd = from_hf_model(hf_model)
        with torch.no_grad():
            ref = hf_model(torch.from_numpy(tokens)).logits
        ours, _ = fwd(params, jnp.asarray(tokens), cfg)
        assert _logit_diff(ours, ref) < 2e-4

    def test_post_ln_variant(self, tokens):
        cfg = transformers.OPTConfig(
            vocab_size=256, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
            num_attention_heads=4, max_position_embeddings=128,
            do_layer_norm_before=False,
        )
        hf = _make_hf(transformers.OPTForCausalLM, cfg)
        cfg_j, params, fwd = from_hf_model(hf)
        with torch.no_grad():
            ref = hf(torch.from_numpy(tokens)).logits
        ours, _ = fwd(params, jnp.asarray(tokens), cfg_j)
        assert _logit_diff(ours, ref) < 2e-4


class TestBloomParity:
    def test_logits_match(self, tokens):
        cfg = transformers.BloomConfig(
            vocab_size=256, hidden_size=64, n_layer=2, n_head=4,
        )
        hf = _make_hf(transformers.BloomForCausalLM, cfg)
        cfg_j, params, fwd = from_hf_model(hf)
        with torch.no_grad():
            ref = hf(torch.from_numpy(tokens)).logits
        ours, _ = fwd(params, jnp.asarray(tokens), cfg_j)
        assert _logit_diff(ours, ref) < 2e-4


class TestQuantizedModel:
    def test_quantized_llama_runs(self, tokens):
        """Module-surgery equivalent: quantize every linear in the pytree."""
        from iron_weight_only_quant_tpu.config import QuantSpec
        from iron_weight_only_quant_tpu.models import LlamaConfig, llama_init
        from iron_weight_only_quant_tpu.quantize.model_pass import (
            quantize_model_params,
        )

        cfg = LlamaConfig.tiny()
        params = llama_init(cfg, jax.random.PRNGKey(0))
        spec = QuantSpec(fmt="int", bits=4, group_size=32, symmetric=False)
        qparams, report = quantize_model_params(params, spec)
        assert report["n_quantized"] == 2 * 7  # 7 linears per layer
        logits_q, _ = llama_forward(qparams, jnp.asarray(tokens), cfg)
        logits_f, _ = llama_forward(params, jnp.asarray(tokens), cfg)
        # int4 fake-quant noise is bounded; logits stay correlated
        a = np.asarray(logits_q).ravel()
        b = np.asarray(logits_f).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        # tiny random models are far more noise-sensitive than trained ones
        assert corr > 0.95


class TestChatTemplate:
    """format_chat_prompt parity (reference utils.py:65-77)."""

    def test_llama_template(self):
        from iron_weight_only_quant_tpu.models.chat import (
            LLAMA_SYSTEM, format_chat_prompt)

        p = format_chat_prompt("hello", "llama-2-7b-chat")
        assert p.startswith("[INST] <<SYS>>\n")
        assert LLAMA_SYSTEM in p and p.endswith("hello [/INST]")

    def test_vicuna_for_longchat(self):
        from iron_weight_only_quant_tpu.models.chat import format_chat_prompt

        p = format_chat_prompt("hi", "longchat-13b-16k")
        assert "USER: hi ASSISTANT:" in p

    def test_passthrough(self):
        from iron_weight_only_quant_tpu.models.chat import format_chat_prompt

        assert format_chat_prompt("raw", "opt-6.7b") == "raw"


class TestFusedProjections:
    """concat_n artifact fusion: exactness of the fused qkv/gate_up path."""

    def test_fused_forward_matches_unfused(self):
        import jax
        import numpy as np
        from bench import build_quantized_llama
        from iron_weight_only_quant_tpu.config import QuantSpec
        from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward
        from iron_weight_only_quant_tpu.models.llama import fuse_llama_projections

        cfg = LlamaConfig(vocab_size=512, hidden_size=512, intermediate_size=1024,
                          num_layers=2, num_heads=4, num_kv_heads=2,
                          max_position_embeddings=64)
        spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
        params = build_quantized_llama(cfg, jax.random.PRNGKey(0), spec,
                                       jnp.float32)
        fused = fuse_llama_projections(params)
        l0 = fused["layers"][0]
        assert "qkv" in l0 and "q" not in l0
        assert "gate_up" in l0 and "gate" not in l0
        toks = jnp.asarray(np.arange(24, dtype=np.int32).reshape(2, 12))
        a, _ = llama_forward(params, toks, cfg)
        b, _ = llama_forward(fused, toks, cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)

    def test_fold_llama_norms_exact(self):
        """rmsnorm(x, gamma) @ W == rmsnorm_nogamma(x) @ (diag(gamma) W):
        folding on dense weights must preserve the forward exactly."""
        import jax
        import numpy as np
        from iron_weight_only_quant_tpu.models import (
            LlamaConfig,
            llama_forward,
            llama_init,
        )
        from iron_weight_only_quant_tpu.models.llama import fold_llama_norms

        cfg = LlamaConfig.tiny(vocab_size=128)
        params = llama_init(cfg, jax.random.PRNGKey(3))
        # non-trivial gammas so the fold actually moves weight mass
        rng = np.random.default_rng(7)
        for p in params["layers"]:
            p["input_norm"] = jnp.asarray(
                rng.uniform(0.5, 1.5, p["input_norm"].shape
                            ).astype(np.float32))
            p["post_norm"] = jnp.asarray(
                rng.uniform(0.5, 1.5, p["post_norm"].shape
                            ).astype(np.float32))
        folded = fold_llama_norms(params)
        assert folded["layers"][0]["input_norm"] is None
        toks = jnp.asarray(np.arange(16, dtype=np.int32).reshape(2, 8))
        a, _ = llama_forward(params, toks, cfg)
        b, _ = llama_forward(folded, toks, cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    def test_fold_then_quantize_scan_runs(self):
        """Folded params survive quantization + layer stacking (scan path:
        None norms pass through stacked_layer_view)."""
        import jax
        import numpy as np
        from iron_weight_only_quant_tpu.config import QuantSpec
        from iron_weight_only_quant_tpu.models import (
            LlamaConfig,
            llama_forward,
            llama_init,
        )
        from iron_weight_only_quant_tpu.models.llama import (
            fold_llama_norms,
            llama_forward_scan,
            stack_llama_layers,
        )
        from iron_weight_only_quant_tpu.quantize.model_pass import (
            quantize_model_params,
        )

        cfg = LlamaConfig.tiny(vocab_size=128)
        params = fold_llama_norms(llama_init(cfg, jax.random.PRNGKey(4)))
        spec = QuantSpec(fmt="int", bits=8, group_size=32, symmetric=False)
        qp, _ = quantize_model_params(params, spec)
        toks = jnp.asarray(np.arange(16, dtype=np.int32).reshape(2, 8))
        flat, _ = llama_forward(qp, toks, cfg)
        scanned, _ = llama_forward_scan(stack_llama_layers(qp), toks, cfg)
        np.testing.assert_allclose(np.asarray(flat), np.asarray(scanned),
                                   rtol=2e-5, atol=2e-5)

    def test_concat_n_with_padding_spans(self):
        import numpy as np
        from iron_weight_only_quant_tpu.config import QuantSpec
        from iron_weight_only_quant_tpu.quantize import quantize_tensor
        from iron_weight_only_quant_tpu.quantize.qtensor import concat_n, stored_spans
        from iron_weight_only_quant_tpu.ops.qmatmul import quantized_matmul

        spec = QuantSpec(fmt="int", bits=4, group_size=64, symmetric=False)
        rng = np.random.default_rng(0)
        k = 128
        ws = [jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
              for n in (192, 256)]  # 192 pads to 256 stored
        qts = [quantize_tensor(w, spec, pad_n_to=256) for w in ws]
        fused = concat_n(qts)
        spans = stored_spans(qts)
        x = jnp.asarray(rng.standard_normal((4, k)).astype(np.float32))
        y = quantized_matmul(x, fused)
        for qt, (a, b) in zip(qts, spans):
            ref = quantized_matmul(x, qt)
            np.testing.assert_allclose(np.asarray(y[:, a:b]), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)
