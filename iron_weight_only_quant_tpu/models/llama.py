"""LLaMA family in pure JAX (1/2/3-style: RMSNorm, RoPE, SwiGLU, GQA).

Replaces the reference's use of HF ``LlamaForCausalLM`` (utils.py:12-45,
gptq/llama.py).  Functional: ``params`` is a pytree whose linear weights may
be dense ``[K, N]`` arrays or packed ``QuantizedTensor``s.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .common import (
    KVCacheView,
    apply_rope,
    attend,
    causal_mask,
    linear,
    rmsnorm,
    rope_tables,
    stacked_layer_view,
)


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: Optional[int] = None
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    # RoPE position interpolation, reference utils.py:93-129 capability
    condense_ratio: float = 1.0
    tie_word_embeddings: bool = False

    @property
    def hd(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    @staticmethod
    def llama2_7b() -> "LlamaConfig":
        return LlamaConfig()

    @staticmethod
    def llama2_70b() -> "LlamaConfig":
        return LlamaConfig(
            hidden_size=8192, intermediate_size=28672, num_layers=80,
            num_heads=64, num_kv_heads=8, max_position_embeddings=4096,
        )

    @staticmethod
    def tiny(vocab_size: int = 256) -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=vocab_size, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2,
            max_position_embeddings=128,
        )


def llama_init(cfg: LlamaConfig, key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    """Random init (for tests/benchmarks; real weights come from convert_hf)."""
    h, inter, hd = cfg.hidden_size, cfg.intermediate_size, cfg.hd
    qdim, kvdim = cfg.num_heads * hd, cfg.num_kv_heads * hd
    keys = iter(jax.random.split(key, 4 + cfg.num_layers * 7))

    def dense(k, kin, kout):
        return {"w": (jax.random.normal(k, (kin, kout), dtype) * (kin**-0.5)), "b": None}

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "input_norm": jnp.ones((h,), dtype),
            "q": dense(next(keys), h, qdim),
            "k": dense(next(keys), h, kvdim),
            "v": dense(next(keys), h, kvdim),
            "o": dense(next(keys), qdim, h),
            "post_norm": jnp.ones((h,), dtype),
            "gate": dense(next(keys), h, inter),
            "up": dense(next(keys), h, inter),
            "down": dense(next(keys), inter, h),
        })
    params = {
        "embed": jax.random.normal(next(keys), (cfg.vocab_size, h), dtype) * 0.02,
        "layers": layers,
        "final_norm": jnp.ones((h,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(next(keys), h, cfg.vocab_size)
    return params


def _block(
    x: jnp.ndarray,
    p: Dict[str, Any],
    cfg: LlamaConfig,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: jnp.ndarray,
    cache: Optional[KVCacheView],
) -> Tuple[jnp.ndarray, Optional[KVCacheView]]:
    b, s, h = x.shape
    hd = cfg.hd

    attn_in = rmsnorm(x, p["input_norm"], cfg.rms_norm_eps)
    if "qkv" in p:
        # fused projection: one wide kernel call (see fuse_llama_projections)
        q, k, v = p["qkv"].apply(attn_in)
        q = q.reshape(b, s, cfg.num_heads, hd)
        k = k.reshape(b, s, cfg.num_kv_heads, hd)
        v = v.reshape(b, s, cfg.num_kv_heads, hd)
    else:
        q = linear(attn_in, p["q"]).reshape(b, s, cfg.num_heads, hd)
        k = linear(attn_in, p["k"]).reshape(b, s, cfg.num_kv_heads, hd)
        v = linear(attn_in, p["v"]).reshape(b, s, cfg.num_kv_heads, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cache is not None:
        from ..engine.kvcache import update_and_fetch

        cache, k, v = update_and_fetch(cache, k, v)
    attn = attend(q, k, v, mask)
    x = x + linear(attn.reshape(b, s, cfg.num_heads * hd), p["o"])

    mlp_in = rmsnorm(x, p["post_norm"], cfg.rms_norm_eps)
    if "gate_up" in p:
        gate, up = p["gate_up"].apply(mlp_in)
        gate = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype)
    else:
        gate = jax.nn.silu(linear(mlp_in, p["gate"]).astype(jnp.float32)).astype(x.dtype)
        up = linear(mlp_in, p["up"])
    x = x + linear(gate * up, p["down"])
    return x, cache


def llama_forward(
    params: Dict[str, Any],
    tokens: jnp.ndarray,  # [B, S] int32
    cfg: LlamaConfig,
    caches: Optional[List[KVCacheView]] = None,
    positions: Optional[jnp.ndarray] = None,  # [B, S] or [S]
    attn_mask: Optional[jnp.ndarray] = None,  # [B|1, 1, S, T] overrides default
) -> Tuple[jnp.ndarray, Optional[List[KVCacheView]]]:
    """Full or incremental forward. Returns (logits [B, S, V], caches)."""
    b, s = tokens.shape
    x = params["embed"][tokens]

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

    cos, sin = rope_tables(positions, cfg.hd, cfg.rope_theta, cfg.condense_ratio)

    new_caches = [] if caches is not None else None
    for i, p in enumerate(params["layers"]):
        cache_i = caches[i] if caches is not None else None
        x, cache_i = _block(x, p, cfg, cos, sin, mask, cache_i)
        if new_caches is not None:
            new_caches.append(cache_i)

    x = rmsnorm(x, params["final_norm"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        logits = jnp.dot(x, params["embed"].T.astype(x.dtype))
    else:
        logits = linear(x, params["lm_head"])
    return logits, new_caches


def fuse_llama_projections(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fuse q|k|v and gate|up into single wide packed artifacts per layer.

    Exact: per-group quantization is independent per output column, so the
    fused matmul computes bit-identical columns while streaming one weight
    (fewer kernel launches, wider N tiles -- measured faster on v5e decode).
    Only packed (QuantizedTensor) bias-free linears fuse; anything else is
    left as-is.  Apply before jit on flat (non-stacked) params.
    """
    from ..quantize.qtensor import QuantizedTensor, concat_n, stored_spans
    from .common import FusedLinear

    def try_fuse(p, names):
        if not all(n in p for n in names):
            return None
        ws = [p[n]["w"] for n in names]
        if not all(isinstance(w, QuantizedTensor) for w in ws):
            return None
        if any(p[n].get("b") is not None for n in names):
            return None
        try:
            fused = concat_n(ws)
        except ValueError:
            return None
        return FusedLinear(fused, None, stored_spans(ws))

    layers = []
    for p in params["layers"]:
        p = dict(p)
        qkv = try_fuse(p, ("q", "k", "v"))
        if qkv is not None:
            p["qkv"] = qkv
            del p["q"], p["k"], p["v"]
        gu = try_fuse(p, ("gate", "up"))
        if gu is not None:
            p["gate_up"] = gu
            del p["gate"], p["up"]
        layers.append(p)
    return {**params, "layers": layers}


# ------------------------------------------------- scan-over-layers variant

from .common import stack_model_layers as stack_llama_layers  # noqa: E402


def llama_forward_scan(
    params: Dict[str, Any],
    tokens: jnp.ndarray,
    cfg: LlamaConfig,
    caches=None,  # stacked cache pytree with leading L axis, or None
    positions: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[Any]]:
    """Same semantics as :func:`llama_forward` over stacked layers.

    ``caches``, when given, is a single cache view whose arrays carry a
    leading layer axis (see engine.kvcache.make_stacked_caches).
    """
    b, s = tokens.shape
    x = params["embed"][tokens]

    if caches is None:
        if positions is None:
            positions = jnp.arange(s)
        mask = causal_mask(s) if attn_mask is None else attn_mask
    else:
        start = caches.length[0]
        if positions is None:
            positions = start + jnp.arange(s)
        if attn_mask is None:
            t_max = caches.k.shape[2] if hasattr(caches, "k") else caches.k_codes.shape[2]
            cols = jnp.arange(t_max)[None, :]
            qpos = positions if positions.ndim == 1 else positions[0]
            mask = (cols <= qpos[:, None])[None, None]
        else:
            mask = attn_mask

    cos, sin = rope_tables(positions, cfg.hd, cfg.rope_theta, cfg.condense_ratio)

    stacked = params["layers_stacked"]
    n_layers = stacked["input_norm"].shape[0]

    # weights stay put in HBM: linears become StackedLinear views that the
    # fused kernel indexes via scalar prefetch; per-layer vectors (norms)
    # are dynamically indexed (cheap).  Scanning the stacked weights as
    # scan xs instead would HBM-copy every layer's weights every step.
    def layer_view(l):
        return stacked_layer_view(stacked, l)

    if caches is None:
        def body(x, l):
            x, _ = _block(x, layer_view(l), cfg, cos, sin, mask, None)
            return x, None

        x, _ = jax.lax.scan(body, x, jnp.arange(n_layers))
        new_caches = None
    else:
        from ..engine.kvcache import StackedCacheAt

        # caches ride the scan CARRY (in-place per-token writes), not xs/ys
        # (which would slice + re-stack every layer's whole cache slab per
        # step; see kvcache.StackedCacheAt)
        def body(carry, l):
            x, c = carry
            x, cat = _block(x, layer_view(l), cfg, cos, sin, mask,
                            StackedCacheAt(c, l))
            return (x, cat.caches), None

        (x, new_caches), _ = jax.lax.scan(body, (x, caches),
                                          jnp.arange(n_layers))

    x = rmsnorm(x, params["final_norm"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        logits = jnp.dot(x, params["embed"].T.astype(x.dtype))
    else:
        logits = linear(x, params["lm_head"])
    return logits, new_caches
