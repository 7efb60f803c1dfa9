"""Block-level shard_map tensor parallelism for LLaMA (fused multi-chip path).

One shard_map spans the whole transformer stack: q/k/v/gate/up are
column-parallel (heads / FFN channels sharded on ``"model"``), attention runs
entirely within each head shard (no cross-head communication), o/down are
row-parallel with a single psum each -- the textbook megatron block, but over
*packed quantized weights* whose fused Pallas kernels execute per shard.

Requirements: num_heads, num_kv_heads and intermediate_size divisible by the
model-axis size; row-parallel artifacts packed with ``k_shards`` equal to the
axis size (prepare with :func:`shard_llama_params`).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..models.common import (
    KVCacheView,
    apply_rope,
    attend,
    causal_mask,
    linear,
    rmsnorm,
    rope_tables,
)
from ..quantize.qtensor import QuantizedTensor
from ..quantize.rtn import quantize_tensor


def shard_llama_params(
    params: Dict[str, Any], cfg, spec, d: int
) -> Dict[str, Any]:
    """Quantize a dense LLaMA pytree with TP-aware packing.

    Column-parallel linears (q/k/v/gate/up, lm_head) pack normally (their N
    sharding never splits nibble pairs); row-parallel linears (o/down) pack
    with ``k_shards=d`` so each device slice is self-contained.
    """
    row_keys = {"o", "down"}

    def qlin(key, lin):
        w = lin["w"]
        if isinstance(w, QuantizedTensor):
            return lin
        shards = d if key in row_keys else 1
        return {**lin, "w": quantize_tensor(w.astype(jnp.float32), spec,
                                            k_shards=shards)}

    layers = []
    for b in params["layers"]:
        nb = dict(b)
        for key in ("q", "k", "v", "o", "gate", "up", "down"):
            nb[key] = qlin(key, b[key])
        layers.append(nb)
    return {**params, "layers": layers}


def _qt_spec(qt: QuantizedTensor, row: bool) -> Dict[str, Any]:
    """Leaf PartitionSpecs for one quantized linear under shard_map."""
    if row:
        w = P("model", None)
        side = lambda s: P("model", None) if s is not None and s.shape[0] > 1 else P()  # noqa: E731
    else:
        w = P(None, "model")
        side = lambda s: P(None, "model") if s is not None and s.shape[1] > 1 else P()  # noqa: E731
    return QuantizedTensor(
        w, side(qt.scales),
        side(qt.zeros) if qt.zeros is not None else None,
        P() if qt.codebook is not None else None,
        qt.spec, qt.shape, qt.mode, qt.k_shards, qt.n_pad,
    )


def _linear_specs(lin, row: bool):
    w = lin["w"]
    if isinstance(w, QuantizedTensor):
        wspec = _qt_spec(w, row)
    else:
        wspec = P("model", None) if row else P(None, "model")
    b = lin.get("b")
    out = {"w": wspec}
    if b is not None:
        out["b"] = P() if row else P("model")
    else:
        out["b"] = None
    return out


def _local_view(lin, d: int, row: bool):
    """Rebuild a local QuantizedTensor with local logical shape inside the
    shard_map body (static metadata must match the local arrays)."""
    w = lin["w"]
    if not isinstance(w, QuantizedTensor):
        return lin
    k, n = w.shape
    if row:
        local = QuantizedTensor(w.qweight, w.scales, w.zeros, w.codebook,
                                w.spec, (k // d, n), w.mode, 1, w.n_pad)
    else:
        local = QuantizedTensor(w.qweight, w.scales, w.zeros, w.codebook,
                                w.spec, (k, n // d), w.mode, 1, w.n_pad)
    return {**lin, "w": local}


def make_tp_llama_forward(cfg, mesh: Mesh, axis: str = "model"):
    """Returns ``forward(params, tokens, caches=None, positions=None,
    attn_mask=None)`` running the whole model inside one shard_map.

    KV caches are head-sharded views (``[B, T, H_kv/d, D]`` per device, built
    by the engine with local head counts); replicated activations enter and
    leave each block, with one psum after attention and one after the MLP.
    """
    d = mesh.shape[axis]
    if cfg.num_heads % d or cfg.num_kv_heads % d or cfg.intermediate_size % d:
        raise ValueError(f"heads/kv_heads/intermediate must divide {axis}={d}")
    hd = cfg.hd
    h_loc = cfg.num_heads // d
    kv_loc = cfg.num_kv_heads // d

    def block_local(x, p, cos, sin, mask, cache):
        b, s, _ = x.shape
        pl_ = {k: _local_view(v, d, row=k in ("o", "down"))
               if isinstance(v, dict) and "w" in v else v for k, v in p.items()}
        attn_in = rmsnorm(x, pl_["input_norm"], cfg.rms_norm_eps)
        q = linear(attn_in, pl_["q"]).reshape(b, s, h_loc, hd)
        k = linear(attn_in, pl_["k"]).reshape(b, s, kv_loc, hd)
        v = linear(attn_in, pl_["v"]).reshape(b, s, kv_loc, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if cache is not None:
            from ..engine.kvcache import update_and_fetch

            cache, k, v = update_and_fetch(cache, k, v)
        attn = attend(q, k, v, mask)
        o_part = linear(attn.reshape(b, s, h_loc * hd), pl_["o"])
        x = x + jax.lax.psum(o_part, axis)

        mlp_in = rmsnorm(x, pl_["post_norm"], cfg.rms_norm_eps)
        gate = jax.nn.silu(linear(mlp_in, pl_["gate"]).astype(jnp.float32)).astype(
            x.dtype
        )
        up = linear(mlp_in, pl_["up"])
        down_part = linear(gate * up, pl_["down"])
        x = x + jax.lax.psum(down_part, axis)
        return x, cache

    def forward(params, tokens, caches=None, positions=None, attn_mask=None):
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
        cos, sin = rope_tables(positions, hd, cfg.rope_theta, cfg.condense_ratio)

        # param specs
        layer_specs = []
        for p in params["layers"]:
            sp = {}
            for key, v in p.items():
                if isinstance(v, dict) and "w" in v:
                    sp[key] = _linear_specs(v, row=key in ("o", "down"))
                else:
                    sp[key] = P()
            layer_specs.append(sp)
        param_specs_tree = {
            "embed": P(),
            "layers": layer_specs,
            "final_norm": P(),
        }
        if "lm_head" in params:
            param_specs_tree["lm_head"] = _linear_specs(params["lm_head"], row=False)
        cache_spec = (
            [KVCacheView(P(None, None, axis, None), P(None, None, axis, None), P())
             for _ in caches]
            if caches is not None else None
        )

        if cfg.tie_word_embeddings:
            raise NotImplementedError("tied lm head under tp_block")

        @partial(
            shard_map, mesh=mesh,
            in_specs=(param_specs_tree, P(), cache_spec, P(), P(), P()),
            out_specs=(P(None, None, axis), cache_spec),
        )
        def run(params, tokens, caches, cos, sin, mask):
            x = params["embed"][tokens]
            new_caches = [] if caches is not None else None
            for i, p in enumerate(params["layers"]):
                cache_i = caches[i] if caches is not None else None
                x, cache_i = block_local(x, p, cos, sin, mask, cache_i)
                if new_caches is not None:
                    new_caches.append(cache_i)
            x = rmsnorm(x, params["final_norm"], cfg.rms_norm_eps)
            logits_part = linear(x, _local_view(params["lm_head"], d, row=False))
            return logits_part, new_caches

        return run(params, tokens, caches, cos, sin, mask)

    return forward
