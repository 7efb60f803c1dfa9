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
    FusedLinear,
    KVCacheView,
    apply_rope,
    attend,
    causal_mask,
    linear,
    rmsnorm,
    rope_tables,
)
from ..quantize.qtensor import QuantizedTensor, concat_n
from ..quantize.rtn import quantize_tensor


def _vma_kwargs():
    """shard_map kwargs disabling varying-manual-axes checking: pallas_call
    outputs carry no vma metadata, so jax's default check_vma=True rejects
    any fused kernel inside the shard_map body on the real chip (CPU tests
    never reach the pallas path, which is why only TPU runs tripped it)."""
    import inspect

    try:
        params = inspect.signature(shard_map).parameters
    except (ValueError, TypeError):  # pragma: no cover
        return {}
    if "check_vma" in params:
        return {"check_vma": False}
    if "check_rep" in params:  # pragma: no cover - older jax
        return {"check_rep": False}
    return {}  # pragma: no cover


_SMAP_KW = _vma_kwargs()


# per family: (column-parallel keys, row-parallel keys)
_FAMILY_LINEARS = {
    "llama": (("q", "k", "v", "gate", "up"), ("o", "down")),
    "opt": (("q", "k", "v", "fc1"), ("o", "fc2")),
    "bloom": (("q", "k", "v", "fc1"), ("o", "fc2")),
}


# ------------------------------------------ TP-aware projection fusion

def _slice_cols(qt: QuantizedTensor, a: int, b: int) -> QuantizedTensor:
    """Logical column slice ``[a, b)`` of a packed artifact.

    Exact: per-group quantization is independent per output column, and the
    K-dim packing (ops/packing.py) never mixes columns.  Member N padding
    (columns >= shape[1]) is dropped by slicing logical columns only.
    """
    def side(s):
        if s is None or s.shape[-1] <= 1:
            return s
        return s[..., a:b]

    return qt.replace(
        qweight=qt.qweight[..., a:b], scales=side(qt.scales),
        zeros=side(qt.zeros), shape=(qt.shape[0], b - a), n_pad=0,
    )


def _pad_cols_zero(qt: QuantizedTensor, mult: int) -> QuantizedTensor:
    """Append zero-contribution columns so stored N is a ``mult`` multiple.

    Padding columns carry scale 0 (and zero-point 0), so they dequantize to
    exactly 0 in both affine (``(c - z) * 0``) and LUT (``book[c] * 0``)
    modes regardless of code bytes.  ``shape`` grows (the caller treats the
    padding as logical dead columns and slices member outputs by spans).
    """
    n = qt.shape[1]
    if mult <= 1 or n % mult == 0:
        return qt
    pad = mult - n % mult

    def padded(a, rows_like):
        if a is None:
            return None
        if a.shape[-1] <= 1:  # broadcast side info cannot express dead cols
            raise ValueError("cannot zero-pad per-tensor side info")
        width = ((0, 0),) * (a.ndim - 1) + ((0, pad),)
        return jnp.pad(a, width)

    return qt.replace(
        qweight=padded(qt.qweight, None),
        scales=padded(qt.scales, None),
        zeros=padded(qt.zeros, None),
        shape=(qt.shape[0], n + pad),
    )


def fuse_projections_tp(params: Dict[str, Any], d: int,
                        pad_to: int = 128) -> Dict[str, Any]:
    """Fuse q|k|v and gate|up into shard-BLOCKED wide artifacts for tp_block.

    The single-chip :func:`..models.llama.fuse_llama_projections` layout
    ``[q | k | v]`` cannot column-shard (a 1/d slice mixes members); here the
    columns are laid out ``[q_0 k_0 v_0 | q_1 k_1 v_1 | ...]`` so sharding
    the N axis over ``d`` devices gives each shard its own locally-fused
    ``[q_i | k_i | v_i]`` block.  Spans stored on the FusedLinear are
    SHARD-LOCAL (identical for every shard); each shard's block is
    zero-padded to a ``pad_to`` column multiple so the per-shard kernel gets
    full-width tiles.  Exact by column independence of per-group
    quantization (same argument as concat_n).  llama layer dicts only.
    """
    def try_fuse(p, names):
        if not all(n in p for n in names):
            return None
        ws = [p[n]["w"] for n in names]
        if not all(isinstance(w, QuantizedTensor) for w in ws):
            return None
        if any(p[n].get("b") is not None for n in names):
            return None
        if any(w.shape[1] % d for w in ws):
            return None
        shards = []
        spans = None
        for i in range(d):
            members = [
                _slice_cols(w, i * (w.shape[1] // d),
                            (i + 1) * (w.shape[1] // d))
                for w in ws
            ]
            try:
                blk = _pad_cols_zero(concat_n(members), pad_to)
            except ValueError:
                return None
            if spans is None:  # shard-local member spans (same every shard)
                off, spans = 0, []
                for m in members:
                    spans.append((off, off + m.shape[1]))
                    off += m.shape[1]
                spans = tuple(spans)
            shards.append(blk)
        return FusedLinear(concat_n(shards), None, spans)

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


def shard_model_params(
    params: Dict[str, Any], cfg, spec, d: int, family: str = "llama"
) -> Dict[str, Any]:
    """Quantize a dense pytree with TP-aware packing.

    Column-parallel linears pack normally (their N sharding never splits
    nibble pairs); row-parallel linears pack with ``k_shards=d`` so each
    device slice is self-contained.
    """
    col_keys, row_keys = _FAMILY_LINEARS[family]

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
        for key in col_keys + row_keys:
            nb[key] = qlin(key, b[key])
        layers.append(nb)
    return {**params, "layers": layers}


def shard_llama_params(params, cfg, spec, d):
    return shard_model_params(params, cfg, spec, d, "llama")


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
        qt.spec, qt.shape, qt.mode, qt.k_shards, qt.n_pad, qt.k_pad,
    )


def _linear_specs(lin, row: bool):
    if isinstance(lin, FusedLinear):
        return lin.replace(
            w=_qt_spec(lin.w, row=False),
            b=None if lin.b is None else P("model"),
        )
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


def _cache_view_spec(cache, axis: str):
    """Partition spec matching one per-layer cache view: every [B, T, H, ...]
    array shards on the head axis (the TP axis carries KV heads)."""
    hspec = P(None, None, axis, None)
    if isinstance(cache, KVCacheView):
        return KVCacheView(hspec, hspec, P())
    from ..engine.kvcache import QuantKVCacheView

    if isinstance(cache, QuantKVCacheView):
        return QuantKVCacheView(
            k_codes=hspec, k_scales=hspec, k_zeros=hspec,
            v_codes=hspec, v_scales=hspec, v_zeros=hspec, length=P(),
            bits=cache.bits, group=cache.group, packed=cache.packed,
        )
    raise NotImplementedError(
        f"tp_block does not support {type(cache).__name__} caches "
        "(paged caches serve through the GSPMD engine path)"
    )


def _cache_specs(caches, axis: str):
    if caches is None:
        return None
    return [_cache_view_spec(c, axis) for c in caches]


def _local_view(lin, d: int, row: bool):
    """Rebuild a local QuantizedTensor with local logical shape inside the
    shard_map body (static metadata must match the local arrays)."""
    if isinstance(lin, FusedLinear):
        w = lin.w
        local = QuantizedTensor(w.qweight, w.scales, w.zeros, w.codebook,
                                w.spec, (w.shape[0], w.shape[1] // d),
                                w.mode, 1, w.n_pad, w.k_pad)
        return lin.replace(w=local)
    w = lin["w"]
    if not isinstance(w, QuantizedTensor):
        return lin
    k, n = w.shape
    if row:
        if w.k_pad:
            raise NotImplementedError("row-parallel TP over a K-padded artifact")
        local = QuantizedTensor(w.qweight, w.scales, w.zeros, w.codebook,
                                w.spec, (k // d, n), w.mode, 1, w.n_pad)
    else:
        local = QuantizedTensor(w.qweight, w.scales, w.zeros, w.codebook,
                                w.spec, (k, n // d), w.mode, 1, w.n_pad,
                                w.k_pad)
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
               if isinstance(v, FusedLinear) or (isinstance(v, dict) and "w" in v)
               else v for k, v in p.items()}
        # folded params (fold_llama_norms) carry None norms: the weightless
        # rmsnorm runs INSIDE the fused kernel (pre_norm), exactly as in the
        # single-chip _block (models/llama.py:116-131) -- x is replicated at
        # the column-parallel linears inside the shard_map body, so the
        # per-shard norm equals the global one; row-parallel o/down take no
        # norm.  This recovers the ~37 us/layer the round-3 prenorm fusion
        # removed from the single-chip path (probe_glue.py).
        eps = cfg.rms_norm_eps
        pre_attn = eps if pl_.get("input_norm") is None else None
        attn_in = x if pre_attn is not None else rmsnorm(
            x, pl_["input_norm"], eps)
        if "qkv" in pl_:
            # shard-blocked fused projection (fuse_projections_tp): one wide
            # kernel call per shard, shard-local spans
            q, k, v = pl_["qkv"].apply(attn_in, pre_norm=pre_attn)
            q = q.reshape(b, s, h_loc, hd)
            k = k.reshape(b, s, kv_loc, hd)
            v = v.reshape(b, s, kv_loc, hd)
        else:
            q = linear(attn_in, pl_["q"], pre_norm=pre_attn).reshape(
                b, s, h_loc, hd)
            k = linear(attn_in, pl_["k"], pre_norm=pre_attn).reshape(
                b, s, kv_loc, hd)
            v = linear(attn_in, pl_["v"], pre_norm=pre_attn).reshape(
                b, s, kv_loc, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if cache is not None:
            from ..engine.kvcache import update_and_fetch

            cache, k, v = update_and_fetch(cache, k, v)
        attn = attend(q, k, v, mask)
        o_part = linear(attn.reshape(b, s, h_loc * hd), pl_["o"])
        x = x + jax.lax.psum(o_part, axis)

        pre_mlp = eps if pl_.get("post_norm") is None else None
        mlp_in = x if pre_mlp is not None else rmsnorm(
            x, pl_["post_norm"], eps)
        if "gate_up" in pl_:
            gate, up = pl_["gate_up"].apply(mlp_in, pre_norm=pre_mlp)
        else:
            gate = linear(mlp_in, pl_["gate"], pre_norm=pre_mlp)
            up = linear(mlp_in, pl_["up"], pre_norm=pre_mlp)
        gate = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype)
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
                if isinstance(v, FusedLinear) or (
                    isinstance(v, dict) and "w" in v
                ):
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
        cache_spec = _cache_specs(caches, axis)

        if cfg.tie_word_embeddings:
            raise NotImplementedError("tied lm head under tp_block")

        @partial(
            shard_map, mesh=mesh, **_SMAP_KW,
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


# -------------------------------------------------------- OPT / BLOOM blocks

def _rep_spec(node):
    """Replicated spec tree matching an arbitrary param subtree."""
    if isinstance(node, dict):
        return {k: _rep_spec(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_rep_spec(v) for v in node]
    if node is None:
        return None
    return P()


def _layer_specs(params, row_keys):
    out = []
    for p in params["layers"]:
        sp = {}
        for key, v in p.items():
            is_linear = isinstance(v, dict) and "w" in v and (
                isinstance(v["w"], QuantizedTensor) or getattr(v["w"], "ndim", 0) == 2
            )
            sp[key] = _linear_specs(v, row=key in row_keys) if is_linear \
                else _rep_spec(v)
        out.append(sp)
    return out


def _row_linear_psum(x, lin, d, axis):
    """Row-parallel linear: matmul per shard, psum, then bias once."""
    part = linear(x, {**_local_view(lin, d, row=True), "b": None})
    out = jax.lax.psum(part, axis)
    b = lin.get("b")
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def make_tp_opt_forward(cfg, mesh: Mesh, axis: str = "model"):
    """OPT counterpart of :func:`make_tp_llama_forward` (pre/post-LN)."""
    from ..models.common import layernorm
    from ..models.opt import POS_OFFSET

    d = mesh.shape[axis]
    if cfg.num_heads % d:
        raise ValueError(f"num_heads must divide {axis}={d}")
    hd = cfg.hd
    h_loc = cfg.num_heads // d

    def block_local(x, p, mask, cache):
        b, s, h = x.shape
        residual = x
        if cfg.do_layer_norm_before:
            x = layernorm(x, p["attn_norm"]["w"], p["attn_norm"]["b"],
                          cfg.layer_norm_eps)
        q = linear(x, _local_view(p["q"], d, row=False)).reshape(b, s, h_loc, hd)
        k = linear(x, _local_view(p["k"], d, row=False)).reshape(b, s, h_loc, hd)
        v = linear(x, _local_view(p["v"], d, row=False)).reshape(b, s, h_loc, hd)
        if cache is not None:
            from ..engine.kvcache import update_and_fetch

            cache, k, v = update_and_fetch(cache, k, v)
        attn = attend(q, k, v, mask)
        x = residual + _row_linear_psum(attn.reshape(b, s, h_loc * hd), p["o"],
                                        d, axis)
        if not cfg.do_layer_norm_before:
            x = layernorm(x, p["attn_norm"]["w"], p["attn_norm"]["b"],
                          cfg.layer_norm_eps)
        residual = x
        if cfg.do_layer_norm_before:
            x = layernorm(x, p["final_norm"]["w"], p["final_norm"]["b"],
                          cfg.layer_norm_eps)
        x = jax.nn.relu(linear(x, _local_view(p["fc1"], d, row=False)))
        x = residual + _row_linear_psum(x, p["fc2"], d, axis)
        if not cfg.do_layer_norm_before:
            x = layernorm(x, p["final_norm"]["w"], p["final_norm"]["b"],
                          cfg.layer_norm_eps)
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

        param_specs_tree = {
            "embed": P(), "embed_pos": P(),
            "layers": _layer_specs(params, row_keys={"o", "fc2"}),
        }
        if "final_norm" in params:
            param_specs_tree["final_norm"] = _rep_spec(params["final_norm"])
        cache_spec = _cache_specs(caches, axis)

        @partial(
            shard_map, mesh=mesh, **_SMAP_KW,
            in_specs=(param_specs_tree, P(), cache_spec, P(), P()),
            out_specs=(P(), cache_spec),
        )
        def run(params, tokens, caches, positions, mask):
            x = params["embed"][tokens] + params["embed_pos"][positions + POS_OFFSET]
            new_caches = [] if caches is not None else None
            for i, p in enumerate(params["layers"]):
                cache_i = caches[i] if caches is not None else None
                x, cache_i = block_local(x, p, mask, cache_i)
                if new_caches is not None:
                    new_caches.append(cache_i)
            if cfg.do_layer_norm_before and "final_norm" in params:
                x = layernorm(x, params["final_norm"]["w"],
                              params["final_norm"]["b"], cfg.layer_norm_eps)
            logits = jnp.dot(x, params["embed"].T.astype(x.dtype))
            return logits, new_caches

        return run(params, tokens, caches, positions, mask)

    return forward


def make_tp_bloom_forward(cfg, mesh: Mesh, axis: str = "model"):
    """BLOOM counterpart: ALiBi slopes sliced per head shard."""
    from ..models.common import alibi_slopes, layernorm

    d = mesh.shape[axis]
    if cfg.num_heads % d:
        raise ValueError(f"num_heads must divide {axis}={d}")
    hd = cfg.hd
    h_loc = cfg.num_heads // d
    slopes_full = alibi_slopes(cfg.num_heads)  # [H], replicated constant

    def block_local(x, p, mask, bias, cache):
        b, s, h = x.shape
        residual = x
        x = layernorm(x, p["attn_norm"]["w"], p["attn_norm"]["b"],
                      cfg.layer_norm_eps)
        q = linear(x, _local_view(p["q"], d, row=False)).reshape(b, s, h_loc, hd)
        k = linear(x, _local_view(p["k"], d, row=False)).reshape(b, s, h_loc, hd)
        v = linear(x, _local_view(p["v"], d, row=False)).reshape(b, s, h_loc, hd)
        if cache is not None:
            from ..engine.kvcache import update_and_fetch

            cache, k, v = update_and_fetch(cache, k, v)
        attn = attend(q, k, v, mask, bias=bias)
        x = residual + _row_linear_psum(attn.reshape(b, s, h_loc * hd), p["o"],
                                        d, axis)
        residual = x
        x = layernorm(x, p["post_norm"]["w"], p["post_norm"]["b"],
                      cfg.layer_norm_eps)
        x = jax.nn.gelu(linear(x, _local_view(p["fc1"], d, row=False))
                        .astype(jnp.float32), approximate=True).astype(residual.dtype)
        x = residual + _row_linear_psum(x, p["fc2"], d, axis)
        return x, cache

    def forward(params, tokens, caches=None, positions=None, attn_mask=None):
        b, s = tokens.shape
        if caches is None:
            mask = causal_mask(s) if attn_mask is None else attn_mask
            t = s
        else:
            from ..engine.kvcache import cache_max_len

            start = caches[0].length
            t = cache_max_len(caches[0])
            if attn_mask is None:
                qpos = (start + jnp.arange(s)) if positions is None else positions
                mask = (jnp.arange(t)[None, :] <= qpos[:, None])[None, None]
            else:
                mask = attn_mask

        param_specs_tree = {
            "embed": P(), "embed_norm": _rep_spec(params["embed_norm"]),
            "layers": _layer_specs(params, row_keys={"o", "fc2"}),
            "final_norm": _rep_spec(params["final_norm"]),
        }
        cache_spec = _cache_specs(caches, axis)

        @partial(
            shard_map, mesh=mesh, **_SMAP_KW,
            in_specs=(param_specs_tree, P(), cache_spec, P()),
            out_specs=(P(), cache_spec),
        )
        def run(params, tokens, caches, mask):
            from ..models.common import layernorm as ln

            # local ALiBi bias: this shard's head slice of the slope vector
            shard = jax.lax.axis_index(axis)
            slopes_loc = jax.lax.dynamic_slice(slopes_full, (shard * h_loc,),
                                               (h_loc,))
            bias = (slopes_loc[:, None, None]
                    * jnp.arange(t, dtype=jnp.float32)[None, None, :])[None]

            x = params["embed"][tokens]
            x = ln(x, params["embed_norm"]["w"], params["embed_norm"]["b"],
                   cfg.layer_norm_eps)
            new_caches = [] if caches is not None else None
            for i, p in enumerate(params["layers"]):
                cache_i = caches[i] if caches is not None else None
                x, cache_i = block_local(x, p, mask, bias, cache_i)
                if new_caches is not None:
                    new_caches.append(cache_i)
            x = ln(x, params["final_norm"]["w"], params["final_norm"]["b"],
                   cfg.layer_norm_eps)
            logits = jnp.dot(x, params["embed"].T.astype(x.dtype))
            return logits, new_caches

        return run(params, tokens, caches, mask)

    return forward
