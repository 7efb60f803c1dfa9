"""BLOOM family in pure JAX (ALiBi attention, GELU MLP, tied head).

The reference supports BLOOM through its vendored GPTQ tree
(gptq/bloom.py, gptq/zeroShot/models/bloom.py); this is the TPU-native
equivalent.  The HF checkpoint's fused query_key_value projection is split
into separate q/k/v at conversion time (convert_hf.py) so the model code
shares the common attention path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .common import (
    KVCacheView,
    alibi_slopes,
    attend,
    causal_mask,
    layernorm,
    linear,
    stack_model_layers,
    stacked_layer_view,
)

stack_bloom_layers = stack_model_layers


@dataclass(frozen=True)
class BloomConfig:
    vocab_size: int = 250880
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    layer_norm_eps: float = 1e-5

    @property
    def hd(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def tiny(vocab_size: int = 256) -> "BloomConfig":
        return BloomConfig(vocab_size=vocab_size, hidden_size=64, num_layers=2, num_heads=4)


def bloom_init(cfg: BloomConfig, key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    h = cfg.hidden_size
    keys = iter(jax.random.split(key, 2 + cfg.num_layers * 6))

    def dense(k, kin, kout):
        return {
            "w": jax.random.normal(k, (kin, kout), dtype) * (kin**-0.5),
            "b": jnp.zeros((kout,), dtype),
        }

    def ln():
        return {"w": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)}

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "attn_norm": ln(),
            "q": dense(next(keys), h, h),
            "k": dense(next(keys), h, h),
            "v": dense(next(keys), h, h),
            "o": dense(next(keys), h, h),
            "post_norm": ln(),
            "fc1": dense(next(keys), h, 4 * h),
            "fc2": dense(next(keys), 4 * h, h),
        })
    return {
        "embed": jax.random.normal(next(keys), (cfg.vocab_size, h), dtype) * 0.02,
        "embed_norm": ln(),
        "layers": layers,
        "final_norm": ln(),
    }


def _alibi_bias(cfg: BloomConfig, t: int) -> jnp.ndarray:
    """[1, H, 1, T] bias: slope_h * key_position (row-shift invariant)."""
    slopes = alibi_slopes(cfg.num_heads)
    return (slopes[:, None, None] * jnp.arange(t, dtype=jnp.float32)[None, None, :])[None]


def _block(x, p, cfg: BloomConfig, mask, bias, cache, reduce=None):
    """One BLOOM block.  ``reduce`` (optional) is the tensor-parallel seam
    (see models.opt._row_tp): partial o/fc2 outputs are psummed over the
    model axis with biases added once, and ``cfg`` carries SHARD-LOCAL
    head counts; ``bias`` is then this shard's ALiBi head slice."""
    from .opt import _row_tp

    b, s, h = x.shape
    hd = cfg.hd
    h_out = cfg.num_heads * hd  # == h single-chip; h/d per TP shard
    residual = x
    x = layernorm(x, p["attn_norm"]["w"], p["attn_norm"]["b"], cfg.layer_norm_eps)
    q = linear(x, p["q"]).reshape(b, s, cfg.num_heads, hd)
    k = linear(x, p["k"]).reshape(b, s, cfg.num_heads, hd)
    v = linear(x, p["v"]).reshape(b, s, cfg.num_heads, hd)
    if cache is not None:
        from ..engine.kvcache import update_and_fetch

        cache, k, v = update_and_fetch(cache, k, v)
    attn = attend(q, k, v, mask, bias=bias)
    x = residual + _row_tp(attn.reshape(b, s, h_out), p["o"], reduce)

    residual = x
    x = layernorm(x, p["post_norm"]["w"], p["post_norm"]["b"], cfg.layer_norm_eps)
    x = jax.nn.gelu(linear(x, p["fc1"]).astype(jnp.float32), approximate=True).astype(
        residual.dtype
    )
    x = residual + _row_tp(x, p["fc2"], reduce)
    return x, cache


def bloom_forward(
    params: Dict[str, Any],
    tokens: jnp.ndarray,
    cfg: BloomConfig,
    caches: Optional[List[KVCacheView]] = None,
    positions: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[List[KVCacheView]]]:
    b, s = tokens.shape
    if caches is None:
        mask = causal_mask(s) if attn_mask is None else attn_mask
        t = s
    else:
        start = caches[0].length
        from ..engine.kvcache import cache_max_len

        t = cache_max_len(caches[0])
        if attn_mask is None:
            qpos = (start + jnp.arange(s)) if positions is None else positions
            mask = (jnp.arange(t)[None, :] <= qpos[:, None])[None, None]
        else:
            mask = attn_mask
    bias = _alibi_bias(cfg, t)

    x = params["embed"][tokens]
    x = layernorm(
        x, params["embed_norm"]["w"], params["embed_norm"]["b"], cfg.layer_norm_eps
    )

    new_caches = [] if caches is not None else None
    for i, p in enumerate(params["layers"]):
        cache_i = caches[i] if caches is not None else None
        x, cache_i = _block(x, p, cfg, mask, bias, cache_i)
        if new_caches is not None:
            new_caches.append(cache_i)

    x = layernorm(
        x, params["final_norm"]["w"], params["final_norm"]["b"], cfg.layer_norm_eps
    )
    logits = jnp.dot(x, params["embed"].T.astype(x.dtype))
    return logits, new_caches


# ------------------------------------------------- scan-over-layers variant

def bloom_forward_scan(
    params: Dict[str, Any],
    tokens: jnp.ndarray,
    cfg: BloomConfig,
    caches=None,  # stacked cache pytree with leading L axis, or None
    positions: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[Any]]:
    """Same semantics as :func:`bloom_forward` over :func:`stack_bloom_layers`
    params (one compiled block; packed weights indexed in place by the
    scalar-prefetch kernel)."""
    b, s = tokens.shape
    if caches is None:
        mask = causal_mask(s) if attn_mask is None else attn_mask
        t = s
    else:
        start = caches.length[0]
        t = caches.k.shape[2] if hasattr(caches, "k") else caches.k_codes.shape[2]
        if attn_mask is None:
            qpos = (start + jnp.arange(s)) if positions is None else positions
            mask = (jnp.arange(t)[None, :] <= qpos[:, None])[None, None]
        else:
            mask = attn_mask
    bias = _alibi_bias(cfg, t)

    x = params["embed"][tokens]
    x = layernorm(
        x, params["embed_norm"]["w"], params["embed_norm"]["b"], cfg.layer_norm_eps
    )

    stacked = params["layers_stacked"]
    n_layers = stacked["attn_norm"]["w"].shape[0]

    if caches is None:
        def body(x, l):
            x, _ = _block(x, stacked_layer_view(stacked, l), cfg, mask, bias, None)
            return x, None

        x, _ = jax.lax.scan(body, x, jnp.arange(n_layers))
        new_caches = None
    else:
        from ..engine.kvcache import StackedCacheAt

        # caches ride the scan CARRY (in-place per-token writes, see
        # kvcache.StackedCacheAt), not xs/ys slab slicing/re-stacking
        def body(carry, l):
            x, c = carry
            x, cat = _block(x, stacked_layer_view(stacked, l), cfg, mask,
                            bias, StackedCacheAt(c, l))
            return (x, cat.caches), None

        (x, new_caches), _ = jax.lax.scan(body, (x, caches),
                                          jnp.arange(n_layers))

    x = layernorm(
        x, params["final_norm"]["w"], params["final_norm"]["b"], cfg.layer_norm_eps
    )
    logits = jnp.dot(x, params["embed"].T.astype(x.dtype))
    return logits, new_caches
