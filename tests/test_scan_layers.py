"""Scan-over-layers forward must match the unrolled forward exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iron_weight_only_quant_tpu.config import KVCacheConfig, QuantSpec
from iron_weight_only_quant_tpu.engine.kvcache import make_caches, make_stacked_caches
from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward, llama_init
from iron_weight_only_quant_tpu.models.llama import (
    llama_forward_scan,
    stack_llama_layers,
)
from iron_weight_only_quant_tpu.quantize.model_pass import quantize_model_params


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig.tiny()
    params = llama_init(cfg, jax.random.PRNGKey(0))
    return cfg, params


@pytest.fixture(scope="module")
def tokens():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.integers(0, 250, size=(2, 12)), jnp.int32)


def test_full_forward_matches(model, tokens):
    cfg, params = model
    stacked = stack_llama_layers(params)
    a, _ = llama_forward(params, tokens, cfg)
    b, _ = llama_forward_scan(stacked, tokens, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_quantized_stacked(model, tokens):
    cfg, params = model
    qp, _ = quantize_model_params(
        params, QuantSpec(fmt="int", bits=8, group_size=32, symmetric=False)
    )
    stacked = stack_llama_layers(qp)
    a, _ = llama_forward(qp, tokens, cfg)
    b, _ = llama_forward_scan(stacked, tokens, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_quantized_int4_stacked(model, tokens):
    """int4 packed artifacts through the stacked-linear seam (XLA fallback on
    CPU; the scalar-prefetch kernel path is covered in test_pallas_kernel)."""
    cfg, params = model
    qp, _ = quantize_model_params(
        params, QuantSpec(fmt="int", bits=4, group_size=32, symmetric=False)
    )
    stacked = stack_llama_layers(qp)
    a, _ = llama_forward(qp, tokens, cfg)
    b, _ = llama_forward_scan(stacked, tokens, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_cached_decode_matches(model, tokens):
    cfg, params = model
    stacked = stack_llama_layers(params)
    kv = KVCacheConfig(max_seq_len=32)

    caches_u = make_caches(cfg.num_layers, 2, cfg.num_kv_heads, cfg.hd, kv, jnp.float32)
    caches_s = make_stacked_caches(cfg.num_layers, 2, cfg.num_kv_heads, cfg.hd, kv,
                                   jnp.float32)
    a, caches_u = llama_forward(params, tokens, cfg, caches=caches_u)
    b, caches_s = llama_forward_scan(stacked, tokens, cfg, caches=caches_s)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # one decode step
    nxt = jnp.argmax(a[:, -1:], axis=-1).astype(jnp.int32)
    a2, _ = llama_forward(params, nxt, cfg, caches=caches_u)
    b2, _ = llama_forward_scan(stacked, nxt, cfg, caches=caches_s)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), atol=1e-5)


class TestOptScan:
    @pytest.fixture(scope="class")
    def opt_model(self):
        from iron_weight_only_quant_tpu.models.opt import OPTConfig, opt_init

        cfg = OPTConfig.tiny()
        return cfg, opt_init(cfg, jax.random.PRNGKey(1))

    def test_forward_matches(self, opt_model, tokens):
        from iron_weight_only_quant_tpu.models.opt import (
            opt_forward,
            opt_forward_scan,
            stack_opt_layers,
        )

        cfg, params = opt_model
        a, _ = opt_forward(params, tokens, cfg)
        b, _ = opt_forward_scan(stack_opt_layers(params), tokens, cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_quantized_cached_decode(self, opt_model, tokens):
        from iron_weight_only_quant_tpu.models.opt import (
            opt_forward,
            opt_forward_scan,
            stack_opt_layers,
        )

        cfg, params = opt_model
        qp, _ = quantize_model_params(
            params, QuantSpec(fmt="int", bits=8, group_size=32, symmetric=False)
        )
        kv = KVCacheConfig(max_seq_len=32)
        cu = make_caches(cfg.num_layers, 2, cfg.num_heads, cfg.hd, kv, jnp.float32)
        cs = make_stacked_caches(cfg.num_layers, 2, cfg.num_heads, cfg.hd, kv,
                                 jnp.float32)
        a, cu = opt_forward(qp, tokens, cfg, caches=cu)
        b, cs = opt_forward_scan(stack_opt_layers(qp), tokens, cfg, caches=cs)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        nxt = jnp.argmax(a[:, -1:], axis=-1).astype(jnp.int32)
        a2, _ = opt_forward(qp, nxt, cfg, caches=cu)
        b2, _ = opt_forward_scan(stack_opt_layers(qp), nxt, cfg, caches=cs)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), atol=1e-5)

    def test_serve_through_scan(self, opt_model):
        """OPT on the serving fast path (round-5: continuous batching over
        stacked OPT layers + stacked slot-local quantized KV), token-exact
        vs the flat-layers engine."""
        from iron_weight_only_quant_tpu.config import EngineConfig
        from iron_weight_only_quant_tpu.engine import InferenceEngine
        from iron_weight_only_quant_tpu.models.opt import (
            opt_forward,
            opt_forward_scan,
            stack_opt_layers,
        )

        cfg, params = opt_model
        qp, _ = quantize_model_params(
            params, QuantSpec(fmt="int", bits=8, group_size=32, symmetric=False)
        )
        kv = KVCacheConfig(max_seq_len=48, kv_bits=8, kv_group_size=16)
        ecfg = EngineConfig(kv=kv, max_batch_size=2)
        eng_flat = InferenceEngine(qp, cfg, opt_forward, engine_cfg=ecfg)
        eng_scan = InferenceEngine(stack_opt_layers(qp), cfg,
                                   opt_forward_scan, engine_cfg=ecfg)
        reqs = [[1, 2, 3], [7, 5], [9, 9, 9, 9]]
        a = eng_flat.serve(reqs, max_new_tokens=3, chunk=2)
        b = eng_scan.serve(reqs, max_new_tokens=3, chunk=2)
        assert a == b


def test_engine_auto_stacks_for_scan_forward():
    """Flat params + a scan forward: the engine fuses (when enabled) then
    stacks, and generates the same tokens as the flat-layers engine."""
    from iron_weight_only_quant_tpu.config import EngineConfig
    from iron_weight_only_quant_tpu.engine import InferenceEngine
    from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward, llama_init
    from iron_weight_only_quant_tpu.models.llama import llama_forward_scan

    cfg = LlamaConfig.tiny()
    params = llama_init(cfg, jax.random.PRNGKey(4))
    qp, _ = quantize_model_params(
        params, QuantSpec(fmt="int", bits=8, group_size=32, symmetric=False)
    )
    ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=48), max_batch_size=2,
                        fuse_projections=True)
    eng_scan = InferenceEngine(qp, cfg, llama_forward_scan, family="llama",
                               engine_cfg=ecfg)
    assert "layers_stacked" in eng_scan.params
    from iron_weight_only_quant_tpu.models.common import FusedLinear
    assert isinstance(eng_scan.params["layers_stacked"].get("qkv"),
                      FusedLinear)  # fused BEFORE stacking
    eng_flat = InferenceEngine(qp, cfg, llama_forward, family="llama",
                               engine_cfg=ecfg)
    prompts = [[5, 2, 8], [1, 7, 3, 9]]
    assert eng_scan.generate(prompts, max_new_tokens=4) == \
        eng_flat.generate(prompts, max_new_tokens=4)


class TestBloomScan:
    def test_forward_matches(self, tokens):
        from iron_weight_only_quant_tpu.models.bloom import (
            BloomConfig,
            bloom_forward,
            bloom_forward_scan,
            bloom_init,
            stack_bloom_layers,
        )

        cfg = BloomConfig.tiny()
        params = bloom_init(cfg, jax.random.PRNGKey(2))
        a, _ = bloom_forward(params, tokens, cfg)
        b, _ = bloom_forward_scan(stack_bloom_layers(params), tokens, cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_cached_decode_matches(self, tokens):
        from iron_weight_only_quant_tpu.models.bloom import (
            BloomConfig,
            bloom_forward,
            bloom_forward_scan,
            bloom_init,
            stack_bloom_layers,
        )

        cfg = BloomConfig.tiny()
        params = bloom_init(cfg, jax.random.PRNGKey(2))
        kv = KVCacheConfig(max_seq_len=32)
        cu = make_caches(cfg.num_layers, 2, cfg.num_heads, cfg.hd, kv, jnp.float32)
        cs = make_stacked_caches(cfg.num_layers, 2, cfg.num_heads, cfg.hd, kv,
                                 jnp.float32)
        a, _ = bloom_forward(params, tokens, cfg, caches=cu)
        b, _ = bloom_forward_scan(stack_bloom_layers(params), tokens, cfg, caches=cs)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_serve_through_scan(self):
        """BLOOM on the serving fast path (round-5; OPT's twin), token-exact
        vs the flat-layers engine."""
        from iron_weight_only_quant_tpu.config import EngineConfig
        from iron_weight_only_quant_tpu.engine import InferenceEngine
        from iron_weight_only_quant_tpu.models.bloom import (
            BloomConfig,
            bloom_forward,
            bloom_forward_scan,
            bloom_init,
        )

        cfg = BloomConfig.tiny()
        params = bloom_init(cfg, jax.random.PRNGKey(6))
        qp, _ = quantize_model_params(
            params, QuantSpec(fmt="int", bits=8, group_size=32, symmetric=False)
        )
        kv = KVCacheConfig(max_seq_len=48, kv_bits=8, kv_group_size=16)
        ecfg = EngineConfig(kv=kv, max_batch_size=2)
        eng_flat = InferenceEngine(qp, cfg, bloom_forward, engine_cfg=ecfg)
        # flat params + scan forward: the engine stacks (auto-stack path)
        eng_scan = InferenceEngine(qp, cfg, bloom_forward_scan,
                                   engine_cfg=ecfg)
        assert "layers_stacked" in eng_scan.params
        reqs = [[1, 2, 3], [7, 5], [9, 9, 9, 9]]
        a = eng_flat.serve(reqs, max_new_tokens=3, chunk=2)
        b = eng_scan.serve(reqs, max_new_tokens=3, chunk=2)
        assert a == b


def test_quantized_kv_stacked(model, tokens):
    cfg, params = model
    stacked = stack_llama_layers(params)
    kv = KVCacheConfig(max_seq_len=32, kv_bits=8, kv_group_size=16)
    caches_s = make_stacked_caches(cfg.num_layers, 2, cfg.num_kv_heads, cfg.hd, kv)
    logits, caches_s = llama_forward_scan(stacked, tokens, cfg, caches=caches_s)
    assert np.isfinite(np.asarray(logits)).all()
    assert int(caches_s.length[0]) == 12


class TestStackedSlotLocal:
    """Round-4: stacked scan caches support slot-local timelines + valid
    masks, so serve() (continuous batching) can ride the scan path."""

    def _kv(self, bits=16):
        return KVCacheConfig(max_seq_len=32, kv_bits=bits, kv_group_size=16)

    @pytest.mark.parametrize("bits", [16, 8, 4])
    def test_slot_local_valid_matches_flat(self, model, bits):
        """Layer-by-layer stacked writes with [B] lengths + valid must equal
        the flat per-layer views' writes."""
        from iron_weight_only_quant_tpu.engine.kvcache import (
            StackedCacheAt,
            update_and_fetch,
        )

        cfg, _ = model
        rng = np.random.default_rng(7)
        b, s, h, d = 2, 4, cfg.num_kv_heads, cfg.hd
        L = cfg.num_layers
        flat = make_caches(L, b, h, d, self._kv(bits), jnp.float32)
        stacked = make_stacked_caches(L, b, h, d, self._kv(bits), jnp.float32)

        lens = jnp.asarray([3, 0], jnp.int32)
        valid = jnp.asarray([2, 4], jnp.int32)
        # stamp slot-local lengths/valid the way the engine does
        from iron_weight_only_quant_tpu.engine.engine import _stamp

        flat = _stamp(flat, lens, valid, None)
        stacked = _stamp(stacked, lens, valid, None)

        outs_flat, outs_stacked = [], []
        for l in range(L):
            k_new = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
            v_new = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
            flat[l], kf, vf = update_and_fetch(flat[l], k_new, v_new)
            sc, ks, vs = update_and_fetch(StackedCacheAt(stacked, l),
                                          k_new, v_new)
            stacked = sc.caches
            outs_flat.append((kf, vf))
            outs_stacked.append((ks, vs))
        for (kf, vf), (ks, vs) in zip(outs_flat, outs_stacked):
            np.testing.assert_allclose(np.asarray(kf), np.asarray(ks),
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(vf), np.asarray(vs),
                                       atol=1e-6)
        # lengths advanced by the per-slot valid counts on every layer
        np.testing.assert_array_equal(
            np.asarray(stacked.length),
            np.tile(np.asarray(lens + valid), (L, 1)))

    def test_slot_local_no_valid_matches_flat(self, model):
        """[B] lengths without valid: every slot writes all S tokens at its
        own columns (the chunk-phase write pattern)."""
        from iron_weight_only_quant_tpu.engine.engine import _stamp
        from iron_weight_only_quant_tpu.engine.kvcache import (
            StackedCacheAt,
            update_and_fetch,
        )

        cfg, _ = model
        rng = np.random.default_rng(8)
        b, s, h, d = 2, 1, cfg.num_kv_heads, cfg.hd
        L = cfg.num_layers
        flat = make_caches(L, b, h, d, self._kv(8), jnp.float32)
        stacked = make_stacked_caches(L, b, h, d, self._kv(8), jnp.float32)
        lens = jnp.asarray([5, 2], jnp.int32)
        flat = _stamp(flat, lens, None, None)
        stacked = _stamp(stacked, lens, None, None)
        for l in range(L):
            k_new = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
            v_new = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
            flat[l], kf, vf = update_and_fetch(flat[l], k_new, v_new)
            sc, ks, vs = update_and_fetch(StackedCacheAt(stacked, l),
                                          k_new, v_new)
            stacked = sc.caches
            np.testing.assert_allclose(np.asarray(kf), np.asarray(ks),
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(vf), np.asarray(vs),
                                       atol=1e-6)


class TestServeOnScan:
    """serve() with stacked (scan-over-layers) params must match the flat
    engine token-for-token -- the 13B/70B serving configuration."""

    @pytest.mark.parametrize("kv_bits", [16, 8])
    def test_serve_scan_matches_flat(self, model, kv_bits):
        from iron_weight_only_quant_tpu.config import EngineConfig
        from iron_weight_only_quant_tpu.engine import InferenceEngine

        cfg, params = model
        stacked = stack_llama_layers(params)
        ecfg = EngineConfig(
            kv=KVCacheConfig(max_seq_len=32, kv_bits=kv_bits,
                             kv_group_size=16),
            max_batch_size=2,
        )
        eng_flat = InferenceEngine(params, cfg, llama_forward,
                                   engine_cfg=ecfg)
        eng_scan = InferenceEngine(stacked, cfg, llama_forward_scan,
                                   engine_cfg=ecfg)
        reqs = [[1, 7, 3, 9, 2], [5, 2], [8, 8, 1], [4, 4, 4, 4, 4, 4]]
        a = eng_flat.serve(reqs, max_new_tokens=5, chunk=3)
        b = eng_scan.serve(reqs, max_new_tokens=5, chunk=3)
        assert a == b

    def test_generate_scan_matches_flat(self, model):
        from iron_weight_only_quant_tpu.config import EngineConfig
        from iron_weight_only_quant_tpu.engine import InferenceEngine

        cfg, params = model
        stacked = stack_llama_layers(params)
        ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=32),
                            max_batch_size=2)
        eng_flat = InferenceEngine(params, cfg, llama_forward,
                                   engine_cfg=ecfg)
        eng_scan = InferenceEngine(stacked, cfg, llama_forward_scan,
                                   engine_cfg=ecfg)
        prompts = [[1, 7, 3], [5, 2, 8, 9]]
        assert eng_flat.generate(prompts, max_new_tokens=4) == \
            eng_scan.generate(prompts, max_new_tokens=4)

    def test_serve_scan_paged_rejected(self, model):
        from iron_weight_only_quant_tpu.config import EngineConfig
        from iron_weight_only_quant_tpu.engine import InferenceEngine

        cfg, params = model
        stacked = stack_llama_layers(params)
        ecfg = EngineConfig(
            kv=KVCacheConfig(max_seq_len=32, paged=True, page_size=8),
            max_batch_size=2,
        )
        eng = InferenceEngine(stacked, cfg, llama_forward_scan,
                              engine_cfg=ecfg)
        with pytest.raises(NotImplementedError):
            eng.generate([[1, 2, 3]], max_new_tokens=2)


def test_bench_stacked_builder_matches_stack_after_build():
    """bench.build_quantized_llama(stacked=True) quantizes straight into
    the [L, ...] stacked buffers (peak HBM = model + one layer -- the
    70B-TP8-slice build OOM'd a 16 GB chip stacking after a full
    per-layer build, round 4).  Same rng key => identical params and
    identical scan forward vs stack_llama_layers over the flat build."""
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import build_quantized_llama

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_layers=3, num_heads=4, num_kv_heads=2,
        max_position_embeddings=64,
    )
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    key = jax.random.PRNGKey(7)
    flat = build_quantized_llama(cfg, key, spec, jnp.bfloat16,
                                 quantize_lm_head=True)
    stacked_ref = stack_llama_layers(flat, consume=True)
    direct = build_quantized_llama(cfg, key, spec, jnp.bfloat16,
                                   quantize_lm_head=True, stacked=True)
    for a, b in zip(jax.tree.leaves(stacked_ref), jax.tree.leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 250, size=(2, 8)), jnp.int32)
    got, _ = llama_forward_scan(direct, toks, cfg)
    want, _ = llama_forward_scan(stacked_ref, toks, cfg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_projections_stack_and_scan(model, tokens):
    """FusedLinear artifacts stack to [L, ...] and the scan forward routes
    them through StackedFusedView -- the scan path keeps the fused
    qkv/gate_up win (round 4; previously 'stacked views take unfused
    layers').  Exact: fusion is column-exact and stacking is layout-only."""
    from iron_weight_only_quant_tpu.models.llama import fuse_llama_projections

    cfg, params = model
    qp, _ = quantize_model_params(
        params, QuantSpec(fmt="int", bits=4, group_size=32, symmetric=False)
    )
    want, _ = llama_forward_scan(stack_llama_layers(qp, consume=False),
                                 tokens, cfg)
    fused = fuse_llama_projections(qp)
    assert any("qkv" in l for l in fused["layers"]), "fusion did not apply"
    got, _ = llama_forward_scan(stack_llama_layers(fused, consume=False),
                                tokens, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
