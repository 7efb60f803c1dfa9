"""Paged KV cache: page-pool semantics, allocator reuse, engine parity.

The reference has no KV-cache management at all (HF default caches,
gptq/opt.py:333-349); paging is a serving-side capability this framework
adds: a shared page pool + per-slot page tables so continuous batching
reserves memory per live token, not max_seq_len per slot.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iron_weight_only_quant_tpu.config import EngineConfig, KVCacheConfig
from iron_weight_only_quant_tpu.engine import InferenceEngine
from iron_weight_only_quant_tpu.engine.kvcache import (
    PageAllocator,
    PagedKVCacheView,
    cache_max_len,
    make_caches,
    pool_pages,
    update_and_fetch,
)
from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward, llama_init


@pytest.fixture(scope="module")
def tiny_model():
    cfg = LlamaConfig.tiny()
    params = llama_init(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _engine(cfg, params, **kv):
    ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=64, **kv), max_batch_size=4)
    return InferenceEngine(params, cfg, llama_forward, engine_cfg=ecfg)


class TestPagedView:
    def _mk(self, **kv):
        kv_cfg = KVCacheConfig(max_seq_len=32, paged=True, page_size=8, **kv)
        (c,) = make_caches(1, 2, 2, 16, kv_cfg, jnp.float32)
        return c

    def test_write_read_roundtrip_dense(self, rng):
        c = self._mk()
        assert isinstance(c, PagedKVCacheView)
        assert cache_max_len(c) == 32
        ks = rng.normal(size=(3, 2, 5, 2, 16)).astype(np.float32)
        vs = rng.normal(size=(3, 2, 5, 2, 16)).astype(np.float32)
        for i in range(3):  # three appends of 5 tokens each
            c, k_all, v_all = update_and_fetch(c, jnp.asarray(ks[i]), jnp.asarray(vs[i]))
        got_k = np.asarray(k_all)[:, :15]
        want_k = np.concatenate([ks[i] for i in range(3)], axis=1)
        np.testing.assert_allclose(got_k, want_k, rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(v_all)[:, :15],
                                   np.concatenate(list(vs), axis=1))

    def test_quantized_pages_match_slab_cache(self, rng):
        """Paged int8/int4 storage reuses the slab codec: same columns, same
        groups => identical dequantized values."""
        for bits in (8, 4):
            kv_cfg = KVCacheConfig(max_seq_len=32, kv_bits=bits, kv_group_size=8)
            (slab,) = make_caches(1, 2, 2, 16, kv_cfg, jnp.float32)
            paged = self._mk(kv_bits=bits, kv_group_size=8)
            k = jnp.asarray(rng.normal(size=(2, 7, 2, 16)), jnp.float32)
            v = jnp.asarray(rng.normal(size=(2, 7, 2, 16)), jnp.float32)
            slab, k_s, v_s = update_and_fetch(slab, k, v)
            paged, k_p, v_p = update_and_fetch(paged, k, v)
            np.testing.assert_array_equal(np.asarray(k_s)[:, :7], np.asarray(k_p)[:, :7])
            np.testing.assert_array_equal(np.asarray(v_s)[:, :7], np.asarray(v_p)[:, :7])

    def test_slot_local_timelines(self, rng):
        """[B] lengths write each row at its own column."""
        c = self._mk()
        c = c.replace(length=jnp.asarray([0, 9], jnp.int32))
        k = jnp.asarray(rng.normal(size=(2, 1, 2, 16)), jnp.float32)
        c, k_all, _ = update_and_fetch(c, k, k)
        np.testing.assert_allclose(np.asarray(k_all)[0, 0], np.asarray(k)[0, 0])
        np.testing.assert_allclose(np.asarray(k_all)[1, 9], np.asarray(k)[1, 0])
        assert list(np.asarray(c.length)) == [1, 10]


class TestAllocator:
    def test_alloc_free_reuse(self):
        a = PageAllocator(4)  # pages 1..3 usable, 0 reserved
        got = [a.alloc() for _ in range(3)]
        assert sorted(got) == [1, 2, 3]
        with pytest.raises(RuntimeError):
            a.alloc()
        a.free([2])
        assert a.alloc() == 2

    def test_pool_pages_default(self):
        kv = KVCacheConfig(max_seq_len=64, paged=True, page_size=16)
        assert pool_pages(4, kv) == 1 + 4 * 4
        kv = KVCacheConfig(max_seq_len=64, paged=True, page_size=16, num_pages=9)
        assert pool_pages(4, kv) == 9


class TestPagedEngine:
    def test_generate_matches_dense(self, tiny_model):
        cfg, params = tiny_model
        dense = _engine(cfg, params)
        paged = _engine(cfg, params, paged=True, page_size=16)
        prompts = [[5, 2, 8], [1, 7, 3, 9, 2, 4, 6], [11]]
        assert paged.generate(prompts, max_new_tokens=6) == dense.generate(
            prompts, max_new_tokens=6
        )

    def test_serve_matches_dense_serve(self, tiny_model):
        cfg, params = tiny_model
        dense = _engine(cfg, params)
        paged = _engine(cfg, params, paged=True, page_size=16)
        reqs = [[5, 2, 8], [1, 7, 3], [11, 4], [9, 9, 9, 9], [2, 3], [8]]
        assert paged.serve(reqs, max_new_tokens=4) == dense.serve(
            reqs, max_new_tokens=4
        )

    def test_serve_small_pool_recycles_pages(self, tiny_model):
        """A pool far below worst case (4 slots x 4 pages) still serves the
        queue: completed requests return their pages."""
        cfg, params = tiny_model
        dense = _engine(cfg, params)
        paged = _engine(cfg, params, paged=True, page_size=16, num_pages=6)
        reqs = [[i + 1, i + 2] for i in range(8)]
        assert paged.serve(reqs, max_new_tokens=3) == dense.serve(
            reqs, max_new_tokens=3
        )

    def test_serve_paged_quantized_kv(self, tiny_model):
        cfg, params = tiny_model
        slab = _engine(cfg, params, kv_bits=8, kv_group_size=8)
        paged = _engine(cfg, params, paged=True, page_size=16, kv_bits=8,
                        kv_group_size=8)
        reqs = [[5, 2, 8], [1, 7, 3, 9], [11, 4]]
        assert paged.serve(reqs, max_new_tokens=4) == slab.serve(
            reqs, max_new_tokens=4
        )
