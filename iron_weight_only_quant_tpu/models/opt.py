"""OPT family in pure JAX (pre-LN decoder, learned positions with offset 2).

Replaces the reference's HF ``OPTForCausalLM`` usage (gptq/opt.py:11-21).
Mirrors the HF quirks that matter for checkpoint parity: the positional
embedding table is indexed at ``position + 2``, the lm_head is tied to the
token embedding, and the ReLU FFN.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .common import (
    KVCacheView,
    attend,
    causal_mask,
    layernorm,
    linear,
    stack_model_layers,
    stacked_layer_view,
)

stack_opt_layers = stack_model_layers

POS_OFFSET = 2  # HF OPTLearnedPositionalEmbedding offset


@dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 768
    ffn_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 2048
    do_layer_norm_before: bool = True
    layer_norm_eps: float = 1e-5

    @property
    def hd(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def opt_125m() -> "OPTConfig":
        return OPTConfig()

    @staticmethod
    def opt_6_7b() -> "OPTConfig":
        return OPTConfig(hidden_size=4096, ffn_dim=16384, num_layers=32, num_heads=32)

    @staticmethod
    def tiny(vocab_size: int = 256) -> "OPTConfig":
        return OPTConfig(
            vocab_size=vocab_size, hidden_size=64, ffn_dim=128,
            num_layers=2, num_heads=4, max_position_embeddings=128,
        )


def opt_init(cfg: OPTConfig, key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    h, f = cfg.hidden_size, cfg.ffn_dim
    keys = iter(jax.random.split(key, 3 + cfg.num_layers * 6))

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
            "final_norm": ln(),
            "fc1": dense(next(keys), h, f),
            "fc2": dense(next(keys), f, h),
        })
    return {
        "embed": jax.random.normal(next(keys), (cfg.vocab_size, h), dtype) * 0.02,
        "embed_pos": jax.random.normal(
            next(keys), (cfg.max_position_embeddings + POS_OFFSET, h), dtype
        ) * 0.02,
        "layers": layers,
        "final_norm": ln(),
    }


def _row_tp(x, lin, reduce):
    """Row-parallel linear under a TP reduce: matmul WITHOUT the bias,
    reduce (psum over the model axis), then add the bias once -- adding it
    per shard before the psum would count it d times.  ``reduce=None`` is
    the plain single-chip path.  Accepts a param dict or a StackedLinear
    view (scan bodies)."""
    from .common import StackedLinear

    if reduce is None:
        return linear(x, lin)
    if isinstance(lin, StackedLinear):
        b = lin.p.get("b")
        bias = None if b is None else b[lin.idx]
        part = linear(x, StackedLinear({**lin.p, "b": None}, lin.idx))
    else:
        bias = lin.get("b")
        part = linear(x, {**lin, "b": None})
    out = reduce(part)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _block(x, p, cfg: OPTConfig, mask, cache, reduce=None):
    """One OPT block.  ``reduce`` (optional) is the tensor-parallel seam:
    under shard_map each shard computes partial o/fc2 outputs and
    ``reduce`` is the psum over the model axis (``cfg`` then carries
    SHARD-LOCAL head counts; biases are added once, after the reduce)."""
    b, s, h = x.shape
    hd = cfg.hd
    h_out = cfg.num_heads * hd  # == h single-chip; h/d per TP shard
    residual = x
    if cfg.do_layer_norm_before:
        x = layernorm(x, p["attn_norm"]["w"], p["attn_norm"]["b"], cfg.layer_norm_eps)
    q = linear(x, p["q"]).reshape(b, s, cfg.num_heads, hd)
    k = linear(x, p["k"]).reshape(b, s, cfg.num_heads, hd)
    v = linear(x, p["v"]).reshape(b, s, cfg.num_heads, hd)
    if cache is not None:
        from ..engine.kvcache import update_and_fetch

        cache, k, v = update_and_fetch(cache, k, v)
    attn = attend(q, k, v, mask)
    x = residual + _row_tp(attn.reshape(b, s, h_out), p["o"], reduce)
    if not cfg.do_layer_norm_before:
        x = layernorm(x, p["attn_norm"]["w"], p["attn_norm"]["b"], cfg.layer_norm_eps)

    residual = x
    if cfg.do_layer_norm_before:
        x = layernorm(x, p["final_norm"]["w"], p["final_norm"]["b"], cfg.layer_norm_eps)
    x = jax.nn.relu(linear(x, p["fc1"]))
    x = residual + _row_tp(x, p["fc2"], reduce)
    if not cfg.do_layer_norm_before:
        x = layernorm(x, p["final_norm"]["w"], p["final_norm"]["b"], cfg.layer_norm_eps)
    return x, cache


def opt_forward(
    params: Dict[str, Any],
    tokens: jnp.ndarray,
    cfg: OPTConfig,
    caches: Optional[List[KVCacheView]] = None,
    positions: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[List[KVCacheView]]]:
    b, s = tokens.shape
    if caches is None:
        if positions is None:
            positions = jnp.arange(s)
        mask = causal_mask(s) if attn_mask is None else attn_mask
    else:
        start = caches[0].length
        if positions is None:
            positions = start + jnp.arange(s)
        if attn_mask is None:
            from ..engine.kvcache import cache_max_len

            t_max = cache_max_len(caches[0])
            cols = jnp.arange(t_max)[None, :]
            qpos = positions if positions.ndim == 1 else positions[0]
            mask = (cols <= qpos[:, None])[None, None]
        else:
            mask = attn_mask

    x = params["embed"][tokens] + params["embed_pos"][positions + POS_OFFSET]

    new_caches = [] if caches is not None else None
    for i, p in enumerate(params["layers"]):
        cache_i = caches[i] if caches is not None else None
        x, cache_i = _block(x, p, cfg, mask, cache_i)
        if new_caches is not None:
            new_caches.append(cache_i)

    if cfg.do_layer_norm_before and "final_norm" in params:
        x = layernorm(
            x, params["final_norm"]["w"], params["final_norm"]["b"], cfg.layer_norm_eps
        )
    logits = jnp.dot(x, params["embed"].T.astype(x.dtype))  # tied lm_head
    return logits, new_caches


# ------------------------------------------------- scan-over-layers variant

def opt_forward_scan(
    params: Dict[str, Any],
    tokens: jnp.ndarray,
    cfg: OPTConfig,
    caches=None,  # stacked cache pytree with leading L axis, or None
    positions: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[Any]]:
    """Same semantics as :func:`opt_forward` over :func:`stack_opt_layers`
    params (one compiled block; packed weights indexed in place by the
    scalar-prefetch kernel)."""
    b, s = tokens.shape
    if caches is None:
        if positions is None:
            positions = jnp.arange(s)
        mask = causal_mask(s) if attn_mask is None else attn_mask
    else:
        start = caches.length[0]
        if positions is None:
            positions = start + jnp.arange(s)
        if attn_mask is None:
            t_max = (caches.k.shape[2] if hasattr(caches, "k")
                     else caches.k_codes.shape[2])
            cols = jnp.arange(t_max)[None, :]
            qpos = positions if positions.ndim == 1 else positions[0]
            mask = (cols <= qpos[:, None])[None, None]
        else:
            mask = attn_mask

    x = params["embed"][tokens] + params["embed_pos"][positions + POS_OFFSET]

    stacked = params["layers_stacked"]
    n_layers = stacked["attn_norm"]["w"].shape[0]

    if caches is None:
        def body(x, l):
            x, _ = _block(x, stacked_layer_view(stacked, l), cfg, mask, None)
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
                            StackedCacheAt(c, l))
            return (x, cat.caches), None

        (x, new_caches), _ = jax.lax.scan(body, (x, caches),
                                          jnp.arange(n_layers))

    if cfg.do_layer_norm_before and "final_norm" in params:
        x = layernorm(
            x, params["final_norm"]["w"], params["final_norm"]["b"], cfg.layer_norm_eps
        )
    logits = jnp.dot(x, params["embed"].T.astype(x.dtype))
    return logits, new_caches
