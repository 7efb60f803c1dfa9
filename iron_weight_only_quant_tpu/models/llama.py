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
    reduce=None,
) -> Tuple[jnp.ndarray, Optional[KVCacheView]]:
    """One transformer block.  ``reduce`` (optional) is applied to the o and
    down projection outputs before the residual add -- the tensor-parallel
    seam: under shard_map (parallel.tp_block) each shard computes a partial
    row-parallel output and ``reduce`` is the psum over the model axis.
    ``cfg`` then carries SHARD-LOCAL head counts."""
    b, s, h = x.shape
    hd = cfg.hd

    # a None norm weight means its gamma was folded into the following
    # projection's weights (fold_llama_norms): the weightless rmsnorm then
    # runs INSIDE the fused kernel (pre_norm) -- the two XLA rmsnorms
    # between kernel calls measured ~37 us/layer of decode (probe_glue.py)
    pre_attn = cfg.rms_norm_eps if p.get("input_norm") is None else None
    attn_in = x if pre_attn is not None else rmsnorm(
        x, p["input_norm"], cfg.rms_norm_eps)
    if "qkv" in p:
        # fused projection: one wide kernel call (see fuse_llama_projections)
        q, k, v = p["qkv"].apply(attn_in, pre_norm=pre_attn)
        q = q.reshape(b, s, cfg.num_heads, hd)
        k = k.reshape(b, s, cfg.num_kv_heads, hd)
        v = v.reshape(b, s, cfg.num_kv_heads, hd)
    else:
        q = linear(attn_in, p["q"], pre_norm=pre_attn).reshape(
            b, s, cfg.num_heads, hd)
        k = linear(attn_in, p["k"], pre_norm=pre_attn).reshape(
            b, s, cfg.num_kv_heads, hd)
        v = linear(attn_in, p["v"], pre_norm=pre_attn).reshape(
            b, s, cfg.num_kv_heads, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cache is not None:
        from ..engine.kvcache import update_and_fetch

        cache, k, v = update_and_fetch(cache, k, v)
    attn = attend(q, k, v, mask)
    o_out = linear(attn.reshape(b, s, cfg.num_heads * hd), p["o"])
    if reduce is not None:
        o_out = reduce(o_out)
    x = x + o_out

    pre_mlp = cfg.rms_norm_eps if p.get("post_norm") is None else None
    mlp_in = x if pre_mlp is not None else rmsnorm(
        x, p["post_norm"], cfg.rms_norm_eps)
    if "gate_up" in p:
        gate, up = p["gate_up"].apply(mlp_in, pre_norm=pre_mlp)
        gate = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype)
    else:
        gate = jax.nn.silu(
            linear(mlp_in, p["gate"], pre_norm=pre_mlp).astype(jnp.float32)
        ).astype(x.dtype)
        up = linear(mlp_in, p["up"], pre_norm=pre_mlp)
    down_out = linear(gate * up, p["down"])
    if reduce is not None:
        down_out = reduce(down_out)
    x = x + down_out
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


def fold_llama_norms(params: Dict[str, Any]) -> Dict[str, Any]:
    """Absorb each rmsnorm's gamma into the following projections' weights.

    ``rmsnorm(x, γ) @ W == rmsnorm(x, 1) @ (diag(γ) W)`` exactly, so serving
    can run the weightless norm INSIDE the fused kernel (linear(...,
    pre_norm=eps)) with zero XLA ops between kernel calls.  Folded layers
    carry ``input_norm = post_norm = None`` -- the marker _block keys on.

    Apply to DENSE weights BEFORE quantization: quantizing diag(γ)W lets the
    per-group scales absorb γ (folding after quantization would change the
    dequantized values).  A classic serving transform (γ is a per-row weight
    rescale, exactly like the reference's SmoothQuant fold direction,
    reference.py:1-85 capability).
    """
    from ..quantize.qtensor import QuantizedTensor

    def fold(lin, gamma):
        w = lin["w"]
        if isinstance(w, QuantizedTensor):
            raise ValueError(
                "fold_llama_norms must run on dense weights, before "
                "quantization"
            )
        return {**lin, "w": (w.astype(jnp.float32)
                             * gamma.astype(jnp.float32)[:, None]
                             ).astype(w.dtype)}

    layers = []
    for p in params["layers"]:
        p = dict(p)
        if p.get("input_norm") is not None:
            g = p["input_norm"]
            for key in ("q", "k", "v"):
                p[key] = fold(p[key], g)
            p["input_norm"] = None
        if p.get("post_norm") is not None:
            g = p["post_norm"]
            for key in ("gate", "up"):
                p[key] = fold(p[key], g)
            p["post_norm"] = None
        layers.append(p)
    return {**params, "layers": layers}


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

    return {**params,
            "layers": [fuse_llama_layer(p) for p in params["layers"]]}


def fuse_llama_layer(p: Dict[str, Any]) -> Dict[str, Any]:
    """Fuse one layer dict's q|k|v and gate|up (see
    :func:`fuse_llama_projections`); usable per-layer so stacked (scan)
    builders can fuse before stacking."""
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

    p = dict(p)
    qkv = try_fuse(p, ("q", "k", "v"))
    if qkv is not None:
        p["qkv"] = qkv
        del p["q"], p["k"], p["v"]
    gu = try_fuse(p, ("gate", "up"))
    if gu is not None:
        p["gate_up"] = gu
        del p["gate"], p["up"]
    return p


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
    # folded params carry input_norm=None; any stacked leaf gives the depth
    n_layers = jax.tree.leaves(stacked)[0].shape[0]

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
