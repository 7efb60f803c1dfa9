"""TP x scan composition: the 70B serving configuration (VERDICT r4 item 1).

``make_tp_llama_forward_stacked`` runs the scan-over-layers forward inside
one shard_map -- stacked packed weights sharded on the model axis, stacked
KV sharded on the head axis -- and must match the unsharded scan forward
token-exactly, including under continuous batching (serve).  Also covers
serve() through the FLAT tp_block path (round-4 missing item 2: the valid
field of serve prefill waves never traversed shard_map before).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iron_weight_only_quant_tpu.config import (
    EngineConfig,
    KVCacheConfig,
    MeshConfig,
    QuantSpec,
)
from iron_weight_only_quant_tpu.engine import InferenceEngine
from iron_weight_only_quant_tpu.engine.kvcache import make_stacked_caches
from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward, llama_init
from iron_weight_only_quant_tpu.models.llama import (
    fold_llama_norms,
    fuse_llama_projections,
    llama_forward_scan,
    stack_llama_layers,
)
from iron_weight_only_quant_tpu.parallel import make_mesh
from iron_weight_only_quant_tpu.parallel.tp_block import (
    make_tp_llama_forward_stacked,
    prepare_tp_stacked_llama,
    shard_llama_params,
    validate_tp_stacked,
)


def _quantized_flat(cfg, d, seed=0, folded=True, bits=8):
    params = llama_init(cfg, jax.random.PRNGKey(seed))
    if folded:
        rng = np.random.default_rng(seed + 10)
        for p in params["layers"]:
            p["input_norm"] = jnp.asarray(
                rng.uniform(0.5, 1.5, cfg.hidden_size), jnp.float32)
            p["post_norm"] = jnp.asarray(
                rng.uniform(0.5, 1.5, cfg.hidden_size), jnp.float32)
        params = fold_llama_norms(params)
    spec = QuantSpec(fmt="int", bits=bits, group_size=32, symmetric=False)
    return shard_llama_params(params, cfg, spec, d=d)


@pytest.fixture(scope="module")
def setup(cpu_devices):
    cfg = LlamaConfig.tiny()
    d = 2
    qflat = _quantized_flat(cfg, d)
    mesh = make_mesh(MeshConfig(data=1, model=d))
    # unsharded scan reference: same fused layout (single-chip fusion),
    # stacked
    ref_stacked = stack_llama_layers(fuse_llama_projections(qflat))
    tp_stacked = prepare_tp_stacked_llama(qflat, d)
    return cfg, d, qflat, mesh, ref_stacked, tp_stacked


@pytest.fixture(scope="module")
def tokens():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.integers(0, 250, size=(2, 10)), jnp.int32)


def test_prepared_layout(setup):
    cfg, d, qflat, mesh, ref_stacked, tp_stacked = setup
    st = tp_stacked["layers_stacked"]
    assert "qkv" in st and "gate_up" in st and "q" not in st
    assert st["o"]["w"].k_shards == d
    assert st["down"]["w"].k_shards == d
    assert st["qkv"].w.qweight.ndim == 3  # [L, ...] stacked
    validate_tp_stacked(tp_stacked, d)  # does not raise


def test_validate_rejects_unprepared(setup):
    cfg, d, qflat, mesh, ref_stacked, tp_stacked = setup
    unprepared = stack_llama_layers(_quantized_flat(cfg, d=1, seed=5))
    with pytest.raises(ValueError, match="k_shards"):
        validate_tp_stacked(unprepared, d)


def test_forward_matches_unsharded_scan(setup, tokens):
    cfg, d, qflat, mesh, ref_stacked, tp_stacked = setup
    tp_fwd = make_tp_llama_forward_stacked(cfg, mesh)
    a, _ = tp_fwd(tp_stacked, tokens)
    b, _ = llama_forward_scan(ref_stacked, tokens, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-4)


def test_cached_decode_matches(setup, tokens):
    cfg, d, qflat, mesh, ref_stacked, tp_stacked = setup
    tp_fwd = make_tp_llama_forward_stacked(cfg, mesh)
    kv = KVCacheConfig(max_seq_len=32)
    ca = make_stacked_caches(cfg.num_layers, 2, cfg.num_kv_heads, cfg.hd, kv,
                             jnp.float32)
    cb = make_stacked_caches(cfg.num_layers, 2, cfg.num_kv_heads, cfg.hd, kv,
                             jnp.float32)
    la, ca = tp_fwd(tp_stacked, tokens, caches=ca)
    lb, cb = llama_forward_scan(ref_stacked, tokens, cfg, caches=cb)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-5, atol=2e-4)
    nxt = jnp.argmax(lb[:, -1:], axis=-1).astype(jnp.int32)
    la2, _ = tp_fwd(tp_stacked, nxt, caches=ca)
    lb2, _ = llama_forward_scan(ref_stacked, nxt, cfg, caches=cb)
    np.testing.assert_allclose(np.asarray(la2), np.asarray(lb2),
                               rtol=2e-5, atol=2e-4)


def test_quantized_kv_cached_decode_matches(setup, tokens):
    """int8 stacked quantized KV through the TP scan forward."""
    cfg, d, qflat, mesh, ref_stacked, tp_stacked = setup
    tp_fwd = make_tp_llama_forward_stacked(cfg, mesh)
    kv = KVCacheConfig(max_seq_len=32, kv_bits=8, kv_group_size=16)
    ca = make_stacked_caches(cfg.num_layers, 2, cfg.num_kv_heads, cfg.hd, kv,
                             jnp.float32)
    cb = make_stacked_caches(cfg.num_layers, 2, cfg.num_kv_heads, cfg.hd, kv,
                             jnp.float32)
    la, ca = tp_fwd(tp_stacked, tokens, caches=ca)
    lb, cb = llama_forward_scan(ref_stacked, tokens, cfg, caches=cb)
    # quantized-KV write params are per-(token, head, group): head sharding
    # does not change them, so results match to float tolerance
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-5, atol=2e-4)


def test_engine_generate_matches_unsharded(setup):
    """Engine(tp_block) with flat params + scan forward prepares, stacks
    and generates the same tokens as the unsharded scan engine."""
    cfg, d, qflat, mesh, ref_stacked, tp_stacked = setup
    ecfg_tp = EngineConfig(kv=KVCacheConfig(max_seq_len=48),
                           mesh=MeshConfig(data=1, model=d),
                           max_batch_size=2, fuse_projections=True)
    eng_tp = InferenceEngine(qflat, cfg, llama_forward_scan, family="llama",
                             engine_cfg=ecfg_tp, tp_block=True)
    assert "layers_stacked" in eng_tp.params
    ecfg_ref = EngineConfig(kv=KVCacheConfig(max_seq_len=48), max_batch_size=2)
    eng_ref = InferenceEngine(ref_stacked, cfg, llama_forward_scan,
                              engine_cfg=ecfg_ref)
    prompts = [[5, 2, 8], [1, 7, 3, 9]]
    assert eng_tp.generate(prompts, max_new_tokens=4) == \
        eng_ref.generate(prompts, max_new_tokens=4)


def test_engine_serve_matches_unsharded(setup):
    """serve() (continuous batching: slot-local timelines, prefill waves
    with per-slot valid counts) through the TP scan forward -- the actual
    70B serving configuration, token-exact vs the unsharded scan engine."""
    cfg, d, qflat, mesh, ref_stacked, tp_stacked = setup
    ecfg_tp = EngineConfig(kv=KVCacheConfig(max_seq_len=48),
                           mesh=MeshConfig(data=1, model=d),
                           max_batch_size=2, fuse_projections=True)
    eng_tp = InferenceEngine(qflat, cfg, llama_forward_scan, family="llama",
                             engine_cfg=ecfg_tp, tp_block=True)
    ecfg_ref = EngineConfig(kv=KVCacheConfig(max_seq_len=48), max_batch_size=2)
    eng_ref = InferenceEngine(ref_stacked, cfg, llama_forward_scan,
                              engine_cfg=ecfg_ref)
    reqs = [[1, 2, 3], [7, 5], [9, 9, 9, 9], [4, 4]]
    a = eng_tp.serve(reqs, max_new_tokens=3, chunk=2)
    b = eng_ref.serve(reqs, max_new_tokens=3, chunk=2)
    assert a == b


def test_engine_serve_flat_tp_matches(setup):
    """serve() through the FLAT tp_block forward (round-4 missing item 2):
    slot-local lengths + per-slot valid counts must traverse shard_map."""
    cfg, d, qflat, mesh, ref_stacked, tp_stacked = setup
    ecfg_tp = EngineConfig(kv=KVCacheConfig(max_seq_len=48),
                           mesh=MeshConfig(data=1, model=d),
                           max_batch_size=2, fuse_projections=True)
    eng_tp = InferenceEngine(qflat, cfg, llama_forward, family="llama",
                             engine_cfg=ecfg_tp, tp_block=True)
    assert "layers" in eng_tp.params  # flat path
    ecfg_ref = EngineConfig(kv=KVCacheConfig(max_seq_len=48), max_batch_size=2)
    eng_ref = InferenceEngine(fuse_llama_projections(qflat), cfg,
                              llama_forward, engine_cfg=ecfg_ref)
    reqs = [[1, 2, 3], [7, 5], [9, 9, 9, 9], [4, 4]]
    a = eng_tp.serve(reqs, max_new_tokens=3, chunk=2)
    b = eng_ref.serve(reqs, max_new_tokens=3, chunk=2)
    assert a == b


def test_lut_minifloat_tp_stacked(cpu_devices, tokens):
    """fp4 (LUT-mode) packed artifacts through the TP scan forward:
    codebooks replicate, scales shard, outputs match the unsharded scan."""
    from iron_weight_only_quant_tpu.config import fp_spec

    cfg = LlamaConfig.tiny()
    d = 2
    params = llama_init(cfg, jax.random.PRNGKey(9))
    spec = fp_spec("fp4", 2, 1, group_size=32)
    qflat = shard_llama_params(params, cfg, spec, d=d)
    mesh = make_mesh(MeshConfig(data=1, model=d))
    tp_fwd = make_tp_llama_forward_stacked(cfg, mesh)
    tp_params = prepare_tp_stacked_llama(qflat, d)
    assert tp_params["layers_stacked"]["qkv"].w.mode == "lut"
    ref = stack_llama_layers(fuse_llama_projections(qflat))
    rng = np.random.default_rng(7)
    toks = jnp.asarray(rng.integers(0, 250, size=(2, 8)), jnp.int32)
    a, _ = tp_fwd(tp_params, toks)
    b, _ = llama_forward_scan(ref, toks, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-4)


def test_packed_int4_kv_tp_stacked(setup):
    """Nibble-packed int4 KV caches (split-D byte layout) shard on the head
    axis under the TP scan forward; serve matches the unsharded engine."""
    cfg, d, qflat, mesh, ref_stacked, tp_stacked = setup
    kv = KVCacheConfig(max_seq_len=48, kv_bits=4, kv_group_size=8)
    eng_tp = InferenceEngine(
        qflat, cfg, llama_forward_scan, family="llama",
        engine_cfg=EngineConfig(kv=kv, mesh=MeshConfig(data=1, model=d),
                                max_batch_size=2, fuse_projections=True),
        tp_block=True)
    eng_ref = InferenceEngine(ref_stacked, cfg, llama_forward_scan,
                              engine_cfg=EngineConfig(kv=kv, max_batch_size=2))
    reqs = [[1, 2, 3], [7, 5], [9, 9, 9, 9]]
    a = eng_tp.serve(reqs, max_new_tokens=3, chunk=2)
    b = eng_ref.serve(reqs, max_new_tokens=3, chunk=2)
    assert a == b


def test_gspmd_engine_stacked_params(setup):
    """param_specs/apply_sharding handle layers_stacked under the plain
    GSPMD engine (no tp_block): generation matches the unsharded scan
    engine on the virtual mesh (XLA partitions the fallback dequant)."""
    cfg, d, qflat, mesh, ref_stacked, tp_stacked = setup
    ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=48),
                        mesh=MeshConfig(data=1, model=d), max_batch_size=2)
    eng = InferenceEngine(ref_stacked, cfg, llama_forward_scan,
                          family="llama", engine_cfg=ecfg)
    ecfg_ref = EngineConfig(kv=KVCacheConfig(max_seq_len=48), max_batch_size=2)
    eng_ref = InferenceEngine(ref_stacked, cfg, llama_forward_scan,
                              engine_cfg=ecfg_ref)
    prompts = [[5, 2, 8], [1, 7, 3, 9]]
    assert eng.generate(prompts, max_new_tokens=4) == \
        eng_ref.generate(prompts, max_new_tokens=4)


def test_gqa_depth_stacked_tp(cpu_devices):
    """GQA head geometry (the 70B shape class) + deeper stack + int8 KV
    through engine serve on a model=4 mesh."""
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=5, num_heads=8, num_kv_heads=4, head_dim=16,
        max_position_embeddings=64,
    )
    d = 4
    qflat = _quantized_flat(cfg, d, seed=3, bits=4)
    kv = KVCacheConfig(max_seq_len=48, kv_bits=8, kv_group_size=16)
    eng_tp = InferenceEngine(
        qflat, cfg, llama_forward_scan, family="llama",
        engine_cfg=EngineConfig(kv=kv, mesh=MeshConfig(data=1, model=d),
                                max_batch_size=2, fuse_projections=True),
        tp_block=True)
    eng_ref = InferenceEngine(
        stack_llama_layers(fuse_llama_projections(qflat)), cfg,
        llama_forward_scan,
        engine_cfg=EngineConfig(kv=kv, max_batch_size=2))
    reqs = [[1, 2, 3], [7, 5, 6, 8], [9, 9]]
    a = eng_tp.serve(reqs, max_new_tokens=3, chunk=2)
    b = eng_ref.serve(reqs, max_new_tokens=3, chunk=2)
    assert a == b


class TestOptBloomTpScan:
    """TP x scan for OPT and BLOOM (round 5): the OPT-175B-class depth
    composition -- biased column-parallel projections shard on N, biased
    row-parallel projections add the bias once after the psum."""

    def _quantized_opt(self, d, bits=8):
        from iron_weight_only_quant_tpu.models.opt import OPTConfig, opt_init
        from iron_weight_only_quant_tpu.quantize.model_pass import (
            quantize_model_params,
        )

        cfg = OPTConfig.tiny()
        params = opt_init(cfg, jax.random.PRNGKey(11))
        qp, _ = quantize_model_params(
            params, QuantSpec(fmt="int", bits=bits, group_size=32,
                              symmetric=False))
        return cfg, qp

    def test_opt_forward_matches(self, cpu_devices):
        from iron_weight_only_quant_tpu.models.opt import (
            opt_forward_scan,
            stack_opt_layers,
        )
        from iron_weight_only_quant_tpu.parallel.tp_block import (
            make_tp_opt_forward_stacked,
            prepare_tp_stacked,
        )

        d = 2
        cfg, qp = self._quantized_opt(d)
        mesh = make_mesh(MeshConfig(data=1, model=d))
        tp_fwd = make_tp_opt_forward_stacked(cfg, mesh)
        tp_params = prepare_tp_stacked(qp, d, family="opt")
        ref = stack_opt_layers(qp)
        rng = np.random.default_rng(8)
        toks = jnp.asarray(rng.integers(0, 250, size=(2, 9)), jnp.int32)
        a, _ = tp_fwd(tp_params, toks)
        b, _ = opt_forward_scan(ref, toks, cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-4)

    def test_opt_engine_serve_matches(self, cpu_devices):
        from iron_weight_only_quant_tpu.models.opt import (
            opt_forward_scan,
            stack_opt_layers,
        )

        d = 2
        cfg, qp = self._quantized_opt(d)
        kv = KVCacheConfig(max_seq_len=48, kv_bits=8, kv_group_size=16)
        eng_tp = InferenceEngine(
            qp, cfg, opt_forward_scan, family="opt",
            engine_cfg=EngineConfig(kv=kv, mesh=MeshConfig(data=1, model=d),
                                    max_batch_size=2),
            tp_block=True)
        assert "layers_stacked" in eng_tp.params
        eng_ref = InferenceEngine(
            stack_opt_layers(qp), cfg, opt_forward_scan,
            engine_cfg=EngineConfig(kv=kv, max_batch_size=2))
        reqs = [[1, 2, 3], [7, 5], [9, 9, 9, 9]]
        a = eng_tp.serve(reqs, max_new_tokens=3, chunk=2)
        b = eng_ref.serve(reqs, max_new_tokens=3, chunk=2)
        assert a == b

    def test_bloom_engine_serve_matches(self, cpu_devices):
        from iron_weight_only_quant_tpu.models.bloom import (
            BloomConfig,
            bloom_forward_scan,
            bloom_init,
            stack_bloom_layers,
        )
        from iron_weight_only_quant_tpu.quantize.model_pass import (
            quantize_model_params,
        )

        d = 2
        cfg = BloomConfig.tiny()
        params = bloom_init(cfg, jax.random.PRNGKey(12))
        qp, _ = quantize_model_params(
            params, QuantSpec(fmt="int", bits=8, group_size=32,
                              symmetric=False))
        kv = KVCacheConfig(max_seq_len=48)
        eng_tp = InferenceEngine(
            qp, cfg, bloom_forward_scan, family="bloom",
            engine_cfg=EngineConfig(kv=kv, mesh=MeshConfig(data=1, model=d),
                                    max_batch_size=2),
            tp_block=True)
        assert "layers_stacked" in eng_tp.params
        eng_ref = InferenceEngine(
            stack_bloom_layers(qp), cfg, bloom_forward_scan,
            engine_cfg=EngineConfig(kv=kv, max_batch_size=2))
        reqs = [[1, 2, 3], [7, 5, 6], [9, 9]]
        a = eng_tp.serve(reqs, max_new_tokens=3, chunk=2)
        b = eng_ref.serve(reqs, max_new_tokens=3, chunk=2)
        assert a == b
