"""Engine tests: batched generation, continuous batching, quantized KV cache."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iron_weight_only_quant_tpu.config import (
    EngineConfig,
    KVCacheConfig,
    MeshConfig,
    QuantSpec,
    replace,
)
from iron_weight_only_quant_tpu.engine import InferenceEngine
from iron_weight_only_quant_tpu.engine.kvcache import make_caches, update_and_fetch
from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward, llama_init
from iron_weight_only_quant_tpu.quantize.model_pass import quantize_model_params


@pytest.fixture(scope="module")
def tiny_model():
    cfg = LlamaConfig.tiny()
    params = llama_init(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _engine(cfg, params, **kw):
    ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=64, **kw.pop("kv", {})),
                        max_batch_size=4)
    return InferenceEngine(params, cfg, llama_forward, engine_cfg=ecfg, **kw)


class TestGenerate:
    def test_greedy_matches_full_forward(self, tiny_model):
        cfg, params = tiny_model
        eng = _engine(cfg, params)
        prompt = [1, 7, 3, 9, 2]
        out = eng.generate([prompt], max_new_tokens=6)[0]
        # oracle: repeated full forwards
        seq = list(prompt)
        for _ in range(6):
            logits, _ = llama_forward(params, jnp.asarray([seq], jnp.int32), cfg)
            seq.append(int(jnp.argmax(logits[0, -1])))
        assert out == seq[len(prompt):]

    def test_ragged_batch_matches_single(self, tiny_model):
        """Left-padding must not change any row's output."""
        cfg, params = tiny_model
        eng = _engine(cfg, params)
        prompts = [[5, 2, 8], [1, 7, 3, 9, 2, 4, 6], [11]]
        batched = eng.generate(prompts, max_new_tokens=5)
        for p, got in zip(prompts, batched):
            single = eng.generate([p], max_new_tokens=5)[0]
            assert got == single, p

    def test_temperature_sampling_deterministic_per_seed(self, tiny_model):
        cfg, params = tiny_model
        eng = _engine(cfg, params)
        a = eng.generate([[1, 2, 3]], max_new_tokens=5, temperature=0.8, seed=7)
        b = eng.generate([[1, 2, 3]], max_new_tokens=5, temperature=0.8, seed=7)
        c = eng.generate([[1, 2, 3]], max_new_tokens=5, temperature=0.8, seed=8)
        assert a == b
        assert a != c or True  # different seeds usually differ; don't hard-require

    def test_overflow_raises(self, tiny_model):
        cfg, params = tiny_model
        eng = _engine(cfg, params)
        with pytest.raises(ValueError):
            eng.generate([[1] * 60], max_new_tokens=10)


class TestContinuousBatching:
    def test_serve_matches_generate(self, tiny_model):
        cfg, params = tiny_model
        eng = _engine(cfg, params)
        reqs = [[5, 2, 8], [1, 7, 3], [11, 4], [9, 9, 9, 9], [2, 3], [8]]
        served = eng.serve(reqs, max_new_tokens=4)
        for r, got in zip(reqs, served):
            want = eng.generate([r], max_new_tokens=4)[0]
            assert got == want, r

    def test_serve_outlives_shared_timeline(self, tiny_model):
        """Slot-local KV timelines: total served tokens may far exceed
        max_seq_len as long as each *request* fits (a shared global timeline
        would exhaust the cache here: 6 requests x ~8 tokens > 16 columns)."""
        cfg, params = tiny_model
        ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=16), max_batch_size=2)
        eng = InferenceEngine(params, cfg, llama_forward, engine_cfg=ecfg)
        reqs = [[5, 2, 8], [1, 7, 3], [11, 4], [9, 9, 9, 9], [2, 3], [8]]
        served = eng.serve(reqs, max_new_tokens=4)
        for r, got in zip(reqs, served):
            want = eng.generate([r], max_new_tokens=4)[0]
            assert got == want, r

    def test_serve_rejects_oversized_request(self, tiny_model):
        cfg, params = tiny_model
        ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=8), max_batch_size=2)
        eng = InferenceEngine(params, cfg, llama_forward, engine_cfg=ecfg)
        with pytest.raises(ValueError):
            eng.serve([[1] * 6], max_new_tokens=4)

    def test_serve_multiwave_prefill(self, tiny_model):
        """Prompts longer than prefill_chunk feed over several prefill
        waves (the bucket floor is 8 tokens) and still match generate."""
        cfg, params = tiny_model
        ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=64), max_batch_size=2,
                            prefill_chunk=1)
        eng = InferenceEngine(params, cfg, llama_forward, engine_cfg=ecfg)
        rng = np.random.default_rng(5)
        reqs = [list(map(int, rng.integers(1, 50, size=n)))
                for n in (21, 3, 17, 9)]
        served = eng.serve(reqs, max_new_tokens=4)
        for r, got in zip(reqs, served):
            want = eng.generate([r], max_new_tokens=4)[0]
            assert got == want, r


class TestPartialValidWrites:
    """Per-slot `valid` counts on cache writes (the serve-prefill mechanism):
    invalid tokens must be dropped and other slots' state left untouched."""

    @pytest.mark.parametrize("kv", [
        {},                                      # dense bf16/f32 cache
        {"kv_bits": 8, "kv_group_size": 8},      # int8 quantized
        {"kv_bits": 4, "kv_group_size": 8},      # int4 nibble-packed
        {"paged": True, "page_size": 4},         # paged dense
    ])
    def test_partial_write_matches_exact_write(self, kv):
        caches = make_caches(
            1, 2, 2, 16, KVCacheConfig(max_seq_len=16, **kv), jnp.float32
        )
        c0 = caches[0]
        lens = jnp.asarray([3, 1], jnp.int32)
        if hasattr(c0, "page_table"):
            # simple identity-ish table: slot 0 pages 1..4, slot 1 pages 5..8
            table = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
            c0 = c0.replace(page_table=table, length=lens)
        else:
            c0 = (c0._replace(length=lens) if hasattr(c0, "_replace")
                  else c0.replace(length=lens))

        rng = np.random.default_rng(2)
        new = jnp.asarray(rng.normal(size=(2, 4, 2, 16)).astype(np.float32))
        vnew = jnp.asarray(rng.normal(size=(2, 4, 2, 16)).astype(np.float32))

        # partial: slot 0 takes 4 tokens, slot 1 takes 2
        valid = jnp.asarray([4, 2], jnp.int32)
        cp = (c0._replace(valid=valid) if hasattr(c0, "_replace")
              else c0.replace(valid=valid))
        cache_p, k_all, _ = update_and_fetch(cp, new, vnew)
        np.testing.assert_array_equal(np.asarray(cache_p.length), [7, 3])

        got0 = np.asarray(k_all)[0, 3:7]
        np.testing.assert_allclose(got0, np.asarray(new)[0], atol=0.3)
        got1 = np.asarray(k_all)[1, 1:3]
        np.testing.assert_allclose(got1, np.asarray(new)[1, :2], atol=0.3)
        # slot 1's dropped tokens must not land anywhere in its timeline
        # beyond its new length: columns 3..4 still hold the initial zeros
        tail1 = np.asarray(k_all)[1, 3:5]
        np.testing.assert_allclose(tail1, 0.0, atol=0.3)


class TestQuantizedKV:
    def test_int8_kv_roundtrip(self):
        caches = make_caches(1, 2, 2, 16, KVCacheConfig(max_seq_len=8, kv_bits=8,
                                                        kv_group_size=8))
        rng = np.random.default_rng(0)
        k = jnp.asarray(rng.normal(size=(2, 3, 2, 16)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, 3, 2, 16)).astype(np.float32))
        cache, k_all, v_all = update_and_fetch(caches[0], k, v)
        err = np.abs(np.asarray(k_all[:, :3]) - np.asarray(k)).max()
        assert err < 0.02  # int8 asym error bound
        assert int(cache.length) == 3

    def test_generation_with_quantized_kv(self, tiny_model):
        cfg, params = tiny_model
        eng8 = _engine(cfg, params, kv={"kv_bits": 8, "kv_group_size": 64})
        eng16 = _engine(cfg, params)
        out8 = eng8.generate([[1, 7, 3, 9]], max_new_tokens=4)[0]
        out16 = eng16.generate([[1, 7, 3, 9]], max_new_tokens=4)[0]
        # int8 KV shouldn't derail a short greedy rollout on this model
        assert len(out8) == 4
        assert out8[0] == out16[0]

    def test_int4_kv_runs(self, tiny_model):
        cfg, params = tiny_model
        eng4 = _engine(cfg, params, kv={"kv_bits": 4, "kv_group_size": 16})
        out = eng4.generate([[1, 7, 3]], max_new_tokens=3)[0]
        assert len(out) == 3

    def test_int4_kv_nibble_packed(self):
        """int4 caches store two codes per byte (split-D nibbles) and decode
        to exactly the values an unpacked int4 round-trip would produce."""
        from iron_weight_only_quant_tpu.engine.kvcache import _decode, _encode

        caches = make_caches(1, 2, 2, 16, KVCacheConfig(max_seq_len=8, kv_bits=4,
                                                        kv_group_size=8))
        c = caches[0]
        assert c.packed and c.k_codes.dtype == jnp.uint8
        assert c.k_codes.shape == (2, 8, 2, 8)  # D=16 -> 8 bytes

        rng = np.random.default_rng(1)
        k = jnp.asarray(rng.normal(size=(2, 3, 2, 16)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, 3, 2, 16)).astype(np.float32))
        cache, k_all, _ = update_and_fetch(c, k, v)
        assert int(cache.length) == 3

        # oracle: unpacked encode/decode round-trip of the same tokens
        kc, ks, kz = _encode(k, 4, 8, packed=False)
        k_ref = _decode(kc, ks, kz, 16, jnp.float32, packed=False)
        np.testing.assert_array_equal(np.asarray(k_all[:, :3]), np.asarray(k_ref))


class TestQuantizedModelEngine:
    def test_quantized_weights_generation(self, tiny_model):
        cfg, params = tiny_model
        qp, _ = quantize_model_params(
            params, QuantSpec(fmt="int", bits=8, group_size=32, symmetric=False)
        )
        eng = _engine(cfg, qp)
        out = eng.generate([[1, 7, 3, 9]], max_new_tokens=4)[0]
        assert len(out) == 4

    def test_fused_projection_engine_matches_unfused(self, tiny_model):
        """EngineConfig.fuse_projections is an exact serving transform."""
        cfg, params = tiny_model
        qp, _ = quantize_model_params(
            params, QuantSpec(fmt="int", bits=4, group_size=32, symmetric=False)
        )
        prompts = [[1, 7, 3, 9], [5, 2]]
        base = _engine(cfg, qp).generate(prompts, max_new_tokens=5)
        ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=64), max_batch_size=4,
                            fuse_projections=True)
        eng_f = InferenceEngine(qp, cfg, llama_forward, family="llama",
                                engine_cfg=ecfg)
        fused = eng_f.generate(prompts, max_new_tokens=5)
        assert fused == base
        # the transform really fused (qkv present, q gone)
        assert "qkv" in eng_f.params["layers"][0]
        assert "q" not in eng_f.params["layers"][0]


class TestShardedEngine:
    def test_tp_dp_matches_single_device(self, tiny_model):
        """2x4 (data x model) virtual mesh must reproduce single-device output."""
        cfg, params = tiny_model
        eng1 = _engine(cfg, params)
        ecfg = EngineConfig(
            kv=KVCacheConfig(max_seq_len=64),
            mesh=MeshConfig(data=2, model=4),
            max_batch_size=4,
        )
        eng8 = InferenceEngine(params, cfg, llama_forward, family="llama",
                               engine_cfg=ecfg)
        prompts = [[5, 2, 8], [1, 7, 3, 9]]
        assert eng8.mesh is not None
        out8 = eng8.generate(prompts, max_new_tokens=5)
        out1 = eng1.generate(prompts, max_new_tokens=5)
        assert out8 == out1


class TestChunkedPrefill:
    def test_chunked_matches_unchunked(self, tiny_model):
        cfg, params = tiny_model
        prompts = [[1, 7, 3, 9, 2, 11, 4], [5, 2, 8, 8, 1]]
        eng_full = _engine(cfg, params)
        ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=64), max_batch_size=4,
                            prefill_chunk=3)
        eng_chunk = InferenceEngine(params, cfg, llama_forward, engine_cfg=ecfg)
        a = eng_full.generate(prompts, max_new_tokens=5)
        b = eng_chunk.generate(prompts, max_new_tokens=5)
        assert a == b


class TestActivationBits:
    def test_w8a8_engine_runs_close(self, tiny_model):
        cfg, params = tiny_model
        qp, _ = quantize_model_params(
            params, QuantSpec(fmt="int", bits=8, group_size=32, symmetric=False)
        )
        ecfg16 = EngineConfig(kv=KVCacheConfig(max_seq_len=64), max_batch_size=4)
        ecfg8 = EngineConfig(kv=KVCacheConfig(max_seq_len=64), max_batch_size=4,
                             activation_bits=8)
        e16 = InferenceEngine(qp, cfg, llama_forward, engine_cfg=ecfg16)
        e8 = InferenceEngine(qp, cfg, llama_forward, engine_cfg=ecfg8)
        a = e16.generate([[1, 7, 3, 9]], max_new_tokens=3)[0]
        b = e8.generate([[1, 7, 3, 9]], max_new_tokens=3)[0]
        # activation quant changes numerics but produces valid tokens; the
        # first greedy token usually agrees on this tiny model
        assert len(b) == 3


class TestChunkedServe:
    """serve(chunk=C): C device-side steps per host sync must be
    token-identical to the single-step loop (greedy)."""

    def test_chunked_matches_single_step(self, tiny_model):
        cfg, params = tiny_model
        eng = _engine(cfg, params)
        reqs = [[1, 2, 3, 4, 5], [7, 8], [9, 10, 11], [4]]
        base = eng.serve(reqs, max_new_tokens=5)
        for c in (2, 3, 8):
            eng_c = _engine(cfg, params)
            assert eng_c.serve(reqs, max_new_tokens=5, chunk=c) == base, c

    def test_chunked_paged_matches(self, tiny_model):
        cfg, params = tiny_model
        reqs = [[1, 2, 3], [7, 8], [9, 10, 11, 12]]
        dense = _engine(cfg, params).serve(reqs, max_new_tokens=4)
        eng = _engine(cfg, params, kv=dict(paged=True, page_size=4))
        assert eng.serve(reqs, max_new_tokens=4, chunk=4) == dense


class TestChunkedGenerate:
    """generate()'s chunked device-side decode must be output-identical to
    the per-token loop (same rng split sequence, post-EOS discard)."""

    def _eng(self, cfg, params, chunk):
        ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=64),
                            max_batch_size=4, decode_chunk=chunk)
        return InferenceEngine(params, cfg, llama_forward, engine_cfg=ecfg)

    def test_greedy_matches_per_token(self, tiny_model):
        cfg, params = tiny_model
        prompts = [[1, 7, 3, 9, 2], [5, 2]]
        a = self._eng(cfg, params, 1).generate(prompts, max_new_tokens=9)
        b = self._eng(cfg, params, 4).generate(prompts, max_new_tokens=9)
        assert a == b

    def test_sampling_matches_per_token(self, tiny_model):
        cfg, params = tiny_model
        prompts = [[4, 4, 1], [9]]
        a = self._eng(cfg, params, 1).generate(
            prompts, max_new_tokens=7, temperature=0.8, top_k=5, seed=3)
        b = self._eng(cfg, params, 3).generate(
            prompts, max_new_tokens=7, temperature=0.8, top_k=5, seed=3)
        assert a == b

    def test_eos_stops_rows_identically(self, tiny_model):
        cfg, params = tiny_model
        # pick an eos token that actually occurs: run greedy once, use the
        # 3rd generated token as eos for the comparison runs
        probe = self._eng(cfg, params, 1).generate([[1, 7, 3]],
                                                   max_new_tokens=6)[0]
        eos = probe[2]
        ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=64),
                            max_batch_size=4, decode_chunk=1)
        e1 = InferenceEngine(params, cfg, llama_forward, engine_cfg=ecfg,
                             eos_token=eos)
        ecfg4 = EngineConfig(kv=KVCacheConfig(max_seq_len=64),
                             max_batch_size=4, decode_chunk=4)
        e4 = InferenceEngine(params, cfg, llama_forward, engine_cfg=ecfg4,
                             eos_token=eos)
        prompts = [[1, 7, 3], [5, 2, 8]]
        assert e1.generate(prompts, max_new_tokens=6) == \
            e4.generate(prompts, max_new_tokens=6)


def test_prefill_activation_bits_plumbing(cpu_devices):
    """Per-phase activation bits: prefill_activation_bits routes to the
    prefill/wave forwards only.  On CPU the XLA fallback ignores the
    setting, so outputs must be identical -- this covers the plumbing
    (trace-time static args, serve wave split); the numerics/perf claim is
    measured on TPU (scripts/probe_a8_wave.py)."""
    import jax

    from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward, llama_init
    from iron_weight_only_quant_tpu.quantize.model_pass import quantize_model_params

    cfg = LlamaConfig.tiny()
    params = llama_init(cfg, jax.random.PRNGKey(3))
    qp, _ = quantize_model_params(
        params, QuantSpec(fmt="int", bits=8, group_size=32, symmetric=False))

    def eng(**kw):
        return InferenceEngine(
            qp, cfg, llama_forward,
            engine_cfg=EngineConfig(kv=KVCacheConfig(max_seq_len=64),
                                    max_batch_size=2, **kw))

    prompts = [[1, 7, 3, 2, 9, 4], [5, 2]]
    base_g = eng().generate(prompts, max_new_tokens=4)
    base_s = eng().serve(prompts, max_new_tokens=4, chunk=2)
    a16 = eng(prefill_activation_bits=16)
    assert a16.generate(prompts, max_new_tokens=4) == base_g
    assert a16.serve(prompts, max_new_tokens=4, chunk=2) == base_s
