"""Block-level shard_map TP: whole-model forward on the virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iron_weight_only_quant_tpu.config import KVCacheConfig, MeshConfig, QuantSpec
from iron_weight_only_quant_tpu.engine.kvcache import make_caches
from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward, llama_init
from iron_weight_only_quant_tpu.parallel import make_mesh
from iron_weight_only_quant_tpu.parallel.tp_block import (
    make_tp_llama_forward,
    shard_llama_params,
)


@pytest.fixture(scope="module")
def setup(cpu_devices):
    cfg = LlamaConfig.tiny()  # 4 heads, 2 kv heads, inter 128: divisible by 2
    params = llama_init(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(MeshConfig(data=1, model=2))
    spec = QuantSpec(fmt="int", bits=8, group_size=32, symmetric=False)
    qparams = shard_llama_params(params, cfg, spec, d=2)
    return cfg, params, qparams, mesh


@pytest.fixture(scope="module")
def tokens():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.integers(0, 250, size=(2, 10)), jnp.int32)


def test_full_forward_matches_reference(setup, tokens):
    """shard_map TP forward must equal the single-device quantized forward."""
    cfg, params, qparams, mesh = setup
    tp_fwd = make_tp_llama_forward(cfg, mesh)
    logits_tp, _ = tp_fwd(qparams, tokens)
    logits_ref, _ = llama_forward(qparams, tokens, cfg)
    np.testing.assert_allclose(
        np.asarray(logits_tp), np.asarray(logits_ref), rtol=2e-5, atol=2e-4
    )


def test_cached_decode_matches(setup, tokens):
    cfg, params, qparams, mesh = setup
    tp_fwd = make_tp_llama_forward(cfg, mesh)
    kv = KVCacheConfig(max_seq_len=32)
    caches = make_caches(cfg.num_layers, 2, cfg.num_kv_heads, cfg.hd, kv, jnp.float32)
    caches_ref = make_caches(cfg.num_layers, 2, cfg.num_kv_heads, cfg.hd, kv,
                             jnp.float32)

    lt, caches = tp_fwd(qparams, tokens, caches=caches)
    lr, caches_ref = llama_forward(qparams, tokens, cfg, caches=caches_ref)
    np.testing.assert_allclose(np.asarray(lt), np.asarray(lr), rtol=2e-5, atol=2e-4)

    nxt = jnp.argmax(lr[:, -1:], axis=-1).astype(jnp.int32)
    lt2, _ = tp_fwd(qparams, nxt, caches=caches)
    lr2, _ = llama_forward(qparams, nxt, cfg, caches=caches_ref)
    np.testing.assert_allclose(np.asarray(lt2), np.asarray(lr2), rtol=2e-5, atol=2e-4)


def test_row_parallel_artifacts_have_k_shards(setup):
    cfg, params, qparams, mesh = setup
    l0 = qparams["layers"][0]
    assert l0["o"]["w"].k_shards == 2
    assert l0["down"]["w"].k_shards == 2
    assert l0["q"]["w"].k_shards == 1


def test_indivisible_heads_rejected(setup):
    cfg, *_ = setup
    import dataclasses

    bad = dataclasses.replace(cfg, num_kv_heads=3)
    mesh = make_mesh(MeshConfig(data=1, model=2))
    with pytest.raises(ValueError):
        make_tp_llama_forward(bad, mesh)


def test_engine_with_tp_block(setup):
    """Engine running the shard_map forward matches the GSPMD engine."""
    from iron_weight_only_quant_tpu.config import EngineConfig
    from iron_weight_only_quant_tpu.engine import InferenceEngine

    cfg, params, qparams, mesh = setup
    ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=48),
                        mesh=MeshConfig(data=1, model=2), max_batch_size=2)
    eng_tp = InferenceEngine(qparams, cfg, llama_forward, family="llama",
                             engine_cfg=ecfg, tp_block=True)
    eng_gspmd = InferenceEngine(qparams, cfg, llama_forward, family="llama",
                                engine_cfg=ecfg)
    prompts = [[5, 2, 8], [1, 7, 3, 9]]
    assert eng_tp.generate(prompts, max_new_tokens=4) == \
        eng_gspmd.generate(prompts, max_new_tokens=4)


class TestOtherFamilies:
    def test_opt_tp_block_matches(self, cpu_devices):
        from iron_weight_only_quant_tpu.models import OPTConfig, opt_forward, opt_init
        from iron_weight_only_quant_tpu.parallel.tp_block import (
            make_tp_opt_forward,
            shard_model_params,
        )

        cfg = OPTConfig.tiny()
        params = opt_init(cfg, jax.random.PRNGKey(2))
        mesh = make_mesh(MeshConfig(data=1, model=2))
        spec = QuantSpec(fmt="int", bits=8, group_size=32, symmetric=False)
        qp = shard_model_params(params, cfg, spec, d=2, family="opt")
        rng = np.random.default_rng(1)
        toks = jnp.asarray(rng.integers(0, 250, size=(2, 9)), jnp.int32)
        tp_fwd = make_tp_opt_forward(cfg, mesh)
        a, _ = tp_fwd(qp, toks)
        b, _ = opt_forward(qp, toks, cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-4)

    def test_bloom_tp_block_matches(self, cpu_devices):
        from iron_weight_only_quant_tpu.models import (
            BloomConfig,
            bloom_forward,
            bloom_init,
        )
        from iron_weight_only_quant_tpu.parallel.tp_block import (
            make_tp_bloom_forward,
            shard_model_params,
        )

        cfg = BloomConfig.tiny()
        params = bloom_init(cfg, jax.random.PRNGKey(3))
        mesh = make_mesh(MeshConfig(data=1, model=2))
        spec = QuantSpec(fmt="int", bits=8, group_size=32, symmetric=False)
        qp = shard_model_params(params, cfg, spec, d=2, family="bloom")
        rng = np.random.default_rng(2)
        toks = jnp.asarray(rng.integers(0, 250, size=(2, 7)), jnp.int32)
        tp_fwd = make_tp_bloom_forward(cfg, mesh)
        a, _ = tp_fwd(qp, toks)
        b, _ = bloom_forward(qp, toks, cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-4)

    def test_engine_tp_block_opt(self, cpu_devices):
        from iron_weight_only_quant_tpu.config import EngineConfig
        from iron_weight_only_quant_tpu.engine import InferenceEngine
        from iron_weight_only_quant_tpu.models import OPTConfig, opt_forward, opt_init
        from iron_weight_only_quant_tpu.parallel.tp_block import shard_model_params

        cfg = OPTConfig.tiny()
        params = opt_init(cfg, jax.random.PRNGKey(5))
        spec = QuantSpec(fmt="int", bits=8, group_size=32, symmetric=False)
        qp = shard_model_params(params, cfg, spec, d=2, family="opt")
        ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=48),
                            mesh=MeshConfig(data=1, model=2), max_batch_size=2)
        e_tp = InferenceEngine(qp, cfg, opt_forward, family="opt",
                               engine_cfg=ecfg, tp_block=True)
        e_ref = InferenceEngine(qp, cfg, opt_forward, family="opt",
                                engine_cfg=ecfg)
        prompts = [[3, 9, 4], [7, 2]]
        assert e_tp.generate(prompts, max_new_tokens=3) == \
            e_ref.generate(prompts, max_new_tokens=3)


class TestPrenormAndFusionTP:
    """Round-4: the multi-chip path keeps the single-chip serving wins --
    in-kernel prenorm (folded norms) and fused qkv/gate_up projections."""

    def _folded_qparams(self, cfg, d=2):
        from iron_weight_only_quant_tpu.models.llama import fold_llama_norms

        params = llama_init(cfg, jax.random.PRNGKey(7))
        # non-trivial gammas so folding is actually exercised
        rng = np.random.default_rng(3)
        for p in params["layers"]:
            p["input_norm"] = jnp.asarray(
                rng.uniform(0.5, 1.5, cfg.hidden_size), jnp.float32)
            p["post_norm"] = jnp.asarray(
                rng.uniform(0.5, 1.5, cfg.hidden_size), jnp.float32)
        folded = fold_llama_norms(params)
        spec = QuantSpec(fmt="int", bits=8, group_size=32, symmetric=False)
        return shard_llama_params(folded, cfg, spec, d=d)

    def test_folded_params_match_single_chip(self, cpu_devices):
        """tp_block with None norms (pre_norm path) equals llama_forward on
        the same folded quantized params."""
        cfg = LlamaConfig.tiny()
        qp = self._folded_qparams(cfg)
        mesh = make_mesh(MeshConfig(data=1, model=2))
        rng = np.random.default_rng(4)
        toks = jnp.asarray(rng.integers(0, 250, size=(2, 8)), jnp.int32)
        tp_fwd = make_tp_llama_forward(cfg, mesh)
        a, _ = tp_fwd(qp, toks)
        b, _ = llama_forward(qp, toks, cfg)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-4)

    def test_fused_tp_matches_unfused(self, cpu_devices):
        from iron_weight_only_quant_tpu.parallel.tp_block import (
            fuse_projections_tp,
        )

        cfg = LlamaConfig.tiny()
        qp = self._folded_qparams(cfg)
        fused = fuse_projections_tp(qp, d=2)
        l0 = fused["layers"][0]
        assert "qkv" in l0 and "gate_up" in l0 and "q" not in l0
        mesh = make_mesh(MeshConfig(data=1, model=2))
        rng = np.random.default_rng(5)
        toks = jnp.asarray(rng.integers(0, 250, size=(2, 8)), jnp.int32)
        tp_fwd = make_tp_llama_forward(cfg, mesh)
        a, _ = tp_fwd(fused, toks)
        b, _ = tp_fwd(qp, toks)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-4)

    def test_fused_tp_cached_decode(self, cpu_devices):
        from iron_weight_only_quant_tpu.parallel.tp_block import (
            fuse_projections_tp,
        )

        cfg = LlamaConfig.tiny()
        qp = self._folded_qparams(cfg)
        fused = fuse_projections_tp(qp, d=2)
        mesh = make_mesh(MeshConfig(data=1, model=2))
        rng = np.random.default_rng(6)
        toks = jnp.asarray(rng.integers(0, 250, size=(2, 6)), jnp.int32)
        tp_fwd = make_tp_llama_forward(cfg, mesh)
        kv = KVCacheConfig(max_seq_len=32)
        ca = make_caches(cfg.num_layers, 2, cfg.num_kv_heads, cfg.hd, kv,
                         jnp.float32)
        cb = make_caches(cfg.num_layers, 2, cfg.num_kv_heads, cfg.hd, kv,
                         jnp.float32)
        la, ca = tp_fwd(fused, toks, caches=ca)
        lb, cb = tp_fwd(qp, toks, caches=cb)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-5, atol=2e-4)
        nxt = jnp.argmax(lb[:, -1:], axis=-1).astype(jnp.int32)
        la2, _ = tp_fwd(fused, nxt, caches=ca)
        lb2, _ = tp_fwd(qp, nxt, caches=cb)
        np.testing.assert_allclose(np.asarray(la2), np.asarray(lb2),
                                   rtol=2e-5, atol=2e-4)

    def test_engine_tp_block_fused_matches_gspmd(self, cpu_devices):
        """Engine(tp_block=True, fuse_projections=True) must generate the
        same tokens as the GSPMD engine on folded params."""
        from iron_weight_only_quant_tpu.config import EngineConfig
        from iron_weight_only_quant_tpu.engine import InferenceEngine

        cfg = LlamaConfig.tiny()
        qp = self._folded_qparams(cfg)
        ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=48),
                            mesh=MeshConfig(data=1, model=2),
                            max_batch_size=2, fuse_projections=True)
        eng_tp = InferenceEngine(qp, cfg, llama_forward, family="llama",
                                 engine_cfg=ecfg, tp_block=True)
        assert "qkv" in eng_tp.params["layers"][0]
        eng_ref = InferenceEngine(qp, cfg, llama_forward, family="llama",
                                  engine_cfg=ecfg)
        prompts = [[5, 2, 8], [1, 7, 3, 9]]
        assert eng_tp.generate(prompts, max_new_tokens=4) == \
            eng_ref.generate(prompts, max_new_tokens=4)
