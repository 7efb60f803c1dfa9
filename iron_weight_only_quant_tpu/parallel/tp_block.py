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


def _fuse_tp_layer(p: Dict[str, Any], d: int, pad_to: int = 128) -> Dict[str, Any]:
    """Fuse one llama layer dict's q|k|v and gate|up into shard-BLOCKED wide
    artifacts (see :func:`fuse_projections_tp` for the layout contract)."""
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
    return {**params,
            "layers": [_fuse_tp_layer(p, d, pad_to)
                       for p in params["layers"]]}


def tp_prepare_layer(p: Dict[str, Any], d: int, fuse: bool = True,
                     pad_to: int = 128,
                     family: str = "llama") -> Dict[str, Any]:
    """Per-layer TP transform: repack row-parallel artifacts to
    ``k_shards=d`` and (llama only) build shard-blocked fused projections.
    Column-parallel OPT/BLOOM projections carry biases, which the
    shard-blocked fusion rejects -- they shard unfused.

    Usable layer-by-layer so memory-bounded builders can quantize + prepare
    + stack one layer at a time (peak HBM = stacked model + one layer,
    the 70B-slice constraint in bench.build_quantized_llama)."""
    from ..quantize.qtensor import repack_k_shards

    _, row_keys = _FAMILY_LINEARS[family]
    p = dict(p)
    for key in row_keys:
        lin = p.get(key)
        if isinstance(lin, dict) and isinstance(lin.get("w"), QuantizedTensor):
            w = lin["w"]
            g = w.spec.group_size
            if w.shape[0] % d or (g > 0 and (w.shape[0] // d) % g):
                raise ValueError(
                    f"row-parallel '{key}': K={w.shape[0]} must split into "
                    f"{d} shards of whole quantization groups (g={g}); "
                    f"K/d={w.shape[0] // d}.  The real 70B shapes satisfy "
                    "this (8192/8 and 28672/8 are 128-multiples); pick a "
                    "smaller group or mesh for toy shapes"
                )
            p[key] = {**lin, "w": repack_k_shards(w, d)}
    if fuse and family == "llama":
        p = _fuse_tp_layer(p, d, pad_to)
    return p


def tp_prepare_llama_layer(p, d, fuse=True, pad_to=128):
    return tp_prepare_layer(p, d, fuse, pad_to, "llama")


def prepare_tp_stacked(params: Dict[str, Any], d: int, fuse: bool = True,
                       pad_to: int = 128,
                       family: str = "llama") -> Dict[str, Any]:
    """Flat params -> TP-prepared STACKED params for the scan path.

    The composition deep-model serving needs (llama-70B at 80 layers,
    OPT-175B-class at 96): row-parallel artifacts repacked per shard,
    column-parallel projections fused shard-blocked (llama), then
    everything stacked to ``[L, ...]`` arrays that the
    ``make_tp_*_forward_stacked`` builders shard over the model axis and
    scan with scalar-prefetch kernels per shard.  Row-parallel side info is
    padded PER K-SEGMENT to a sublane multiple (models.common.
    pad_stacked_sides), so only shard-local views (which see standard
    end-of-rows ``side_pad``) ever interpret it -- do not feed the prepared
    global artifact to single-chip consumers.
    """
    from ..models.common import stack_model_layers

    layers = [tp_prepare_layer(p, d, fuse, pad_to, family)
              for p in params["layers"]]
    flat = {**{k: v for k, v in params.items() if k != "layers"},
            "layers": layers}
    return stack_model_layers(flat, consume=True, tp_segments=True)


def prepare_tp_stacked_llama(params, d, fuse=True, pad_to=128):
    return prepare_tp_stacked(params, d, fuse, pad_to, "llama")


def validate_tp_stacked(params: Dict[str, Any], d: int,
                        family: str = "llama") -> None:
    """Check a stacked param tree is TP-prepared for a model axis of ``d``."""
    _, row_keys = _FAMILY_LINEARS[family]
    stacked = params["layers_stacked"]
    for key in row_keys:
        lin = stacked.get(key)
        if isinstance(lin, dict) and isinstance(lin.get("w"), QuantizedTensor):
            if lin["w"].k_shards != d:
                raise ValueError(
                    f"stacked tp_block params: row-parallel '{key}' packed "
                    f"with k_shards={lin['w'].k_shards}, need {d}; prepare "
                    "flat params with parallel.tp_block."
                    "prepare_tp_stacked_llama(params, d) before stacking"
                )
            if lin.get("b") is not None:
                raise NotImplementedError(
                    f"row-parallel '{key}' bias under stacked tp_block"
                )
    for key, v in stacked.items():
        if key in row_keys:
            continue
        qt = v.w if isinstance(v, FusedLinear) else (
            v.get("w") if isinstance(v, dict) else None)
        if isinstance(qt, QuantizedTensor) and qt.n_pad and d > 1:
            raise ValueError(
                f"column-parallel '{key}' carries n_pad={qt.n_pad}: stored "
                "padding sits at the END of N, so a 1/d column slice mixes "
                "logical and pad columns -- fuse projections "
                "(prepare_tp_stacked_llama(fuse=True)) or quantize with "
                "pad_n_to=1"
            )


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


def _qt_spec(qt: QuantizedTensor, row: bool,
             stacked: bool = False) -> QuantizedTensor:
    """Leaf PartitionSpecs for one quantized linear under shard_map.

    Returned as a QuantizedTensor whose array fields hold PartitionSpecs and
    whose STATIC fields copy ``qt``'s exactly (tree_map over (specs, args)
    requires identical aux data).  ``stacked`` prepends the layer axis
    (replicated) for ``[L, ...]`` artifacts.
    """
    pre = (None,) if stacked else ()
    sd = 1 if stacked else 0  # side-array axis offset
    if row:
        w = P(*pre, "model", None)
        side = lambda s: P(*pre, "model", None) \
            if s is not None and s.shape[sd] > 1 else P()  # noqa: E731
    else:
        w = P(*pre, None, "model")
        side = lambda s: P(*pre, None, "model") \
            if s is not None and s.shape[sd + 1] > 1 else P()  # noqa: E731
    return qt.replace(
        qweight=w, scales=side(qt.scales),
        zeros=side(qt.zeros) if qt.zeros is not None else None,
        codebook=P() if qt.codebook is not None else None,
    )


def _linear_specs(lin, row: bool, stacked: bool = False):
    pre = (None,) if stacked else ()
    if isinstance(lin, FusedLinear):
        return lin.replace(
            w=_qt_spec(lin.w, row=False, stacked=stacked),
            b=None if lin.b is None else P(*pre, "model"),
        )
    w = lin["w"]
    if isinstance(w, QuantizedTensor):
        wspec = _qt_spec(w, row, stacked=stacked)
    else:
        wspec = P(*pre, "model", None) if row else P(*pre, None, "model")
    b = lin.get("b")
    out = {"w": wspec}
    if b is not None:
        out["b"] = P() if row else P(*pre, "model")
    else:
        out["b"] = None
    return out


def _cache_view_spec(cache, axis: str, stacked: bool = False):
    """Partition spec matching one per-layer ([B, T, H, ...]) or stacked
    ([L, B, T, H, ...]) cache view: arrays shard on the head axis (the TP
    axis carries KV heads); lengths/valid counts are replicated.

    ``valid`` ([B] per-slot token counts, the serve prefill wave) must get a
    spec exactly when present -- tree_map over (specs, caches) fails on a
    structure mismatch, which is what kept serve() off the tp_block path
    until round 5."""
    hspec = P(None, None, None, axis, None) if stacked \
        else P(None, None, axis, None)
    vspec = P() if getattr(cache, "valid", None) is not None else None
    if isinstance(cache, KVCacheView):
        return KVCacheView(hspec, hspec, P(), vspec)
    from ..engine.kvcache import QuantKVCacheView

    if isinstance(cache, QuantKVCacheView):
        return QuantKVCacheView(
            k_codes=hspec, k_scales=hspec, k_zeros=hspec,
            v_codes=hspec, v_scales=hspec, v_zeros=hspec, length=P(),
            bits=cache.bits, group=cache.group, packed=cache.packed,
            valid=vspec,
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


# ----------------------------------------- stacked (scan-over-layers) + TP

def _local_stacked(stacked: Dict[str, Any], d: int, row_keys) -> Dict[str, Any]:
    """Shard-local metadata views of a TP-sharded stacked layer dict.

    Inside the shard_map body every array leaf is already the LOCAL block;
    packed artifacts additionally carry static ``shape`` metadata that must
    match it: column-parallel linears become ``(K, N/d)``, row-parallel
    ``(K/d, N)`` with ``k_shards=1`` (each segment's packing is
    self-contained after repack_k_shards).  ``side_pad`` keeps its value:
    per-SEGMENT padding globally IS end-of-rows padding locally.
    """
    out = {}
    for key, v in stacked.items():
        row = key in row_keys
        if isinstance(v, FusedLinear):
            w = v.w
            if isinstance(w, QuantizedTensor):
                out[key] = v.replace(
                    w=w.replace(shape=(w.shape[0], w.shape[1] // d)))
            else:
                out[key] = v
        elif isinstance(v, dict) and isinstance(v.get("w"), QuantizedTensor):
            w = v["w"]
            if row:
                if w.k_pad:
                    raise NotImplementedError(
                        "row-parallel TP over a K-padded artifact")
                lw = w.replace(shape=(w.shape[0] // d, w.shape[1]),
                               k_shards=1)
            else:
                lw = w.replace(shape=(w.shape[0], w.shape[1] // d))
            out[key] = {**v, "w": lw}
        else:
            out[key] = v
    return out


def make_tp_llama_forward_stacked(cfg, mesh: Mesh, axis: str = "model"):
    """Tensor parallelism COMPOSED with the scan path: one shard_map whose
    body is the scan-over-layers forward on shard-local stacked params.

    This is the 70B serving configuration (VERDICT r4 item 1): the stacked
    ``[L, ...]`` packed weights shard on the model axis (column-parallel on
    N via shard-blocked fused projections, row-parallel on K via per-shard
    packing), the stacked KV cache shards on the head axis, and inside each
    shard the body is literally :func:`..models.llama.llama_forward_scan`'s
    scan -- ``stacked_layer_view`` + scalar-prefetch kernels, a shard-local
    cfg (``num_heads/d``, ``num_kv_heads/d``), and one psum after attention
    and one after the MLP per layer (models.llama._block's ``reduce`` seam).
    Compile time stays depth-independent (one block body, not 80 unrolled
    shard_map copies -- the blowup the flat tp forward hits at 70B depth).

    Params: ``prepare_tp_stacked_llama`` output -- ``layers_stacked`` with
    fused qkv/gate_up (shard-blocked) and o/down repacked ``k_shards=d``;
    ``embed``/``final_norm`` replicated, ``lm_head`` flat column-parallel.
    The reference's deepest scale-out is layer-placement pipelining
    (gptq/opt.py:272-306); this path is what replaces it on a TPU pod.
    """
    import dataclasses

    d = mesh.shape[axis]
    if cfg.num_heads % d or cfg.num_kv_heads % d or cfg.intermediate_size % d:
        raise ValueError(f"heads/kv_heads/intermediate must divide {axis}={d}")
    if cfg.tie_word_embeddings:
        raise NotImplementedError("tied lm head under tp_block")
    hd = cfg.hd
    cfg_loc = dataclasses.replace(
        cfg, num_heads=cfg.num_heads // d, num_kv_heads=cfg.num_kv_heads // d,
        head_dim=hd)
    _, row_keys = _FAMILY_LINEARS["llama"]

    from ..models.llama import _block

    def forward(params, tokens, cfg_arg=None, caches=None, positions=None,
                attn_mask=None):
        # cfg_arg accepted (ignored) so the engine can call this with the
        # same signature as llama_forward_scan
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
        cos, sin = rope_tables(positions, hd, cfg.rope_theta,
                               cfg.condense_ratio)

        stacked = params["layers_stacked"]
        sp = {}
        for key, v in stacked.items():
            if isinstance(v, FusedLinear) or (
                isinstance(v, dict) and "w" in v
            ):
                sp[key] = _linear_specs(v, row=key in row_keys, stacked=True)
            elif v is None:
                sp[key] = None
            elif isinstance(v, dict):
                sp[key] = _rep_spec(v)
            else:
                sp[key] = P()
        param_specs_tree = {
            "embed": P(),
            "layers_stacked": sp,
            "final_norm": P(),
            "lm_head": _linear_specs(params["lm_head"], row=False),
        }
        cache_spec = (None if caches is None
                      else _cache_view_spec(caches, axis, stacked=True))

        n_layers = jax.tree.leaves(stacked)[0].shape[0]

        @partial(
            shard_map, mesh=mesh, **_SMAP_KW,
            in_specs=(param_specs_tree, P(), cache_spec, P(), P(), P()),
            out_specs=(P(None, None, axis), cache_spec),
        )
        def run(params, tokens, caches, cos, sin, mask):
            from ..engine.kvcache import StackedCacheAt
            from ..models.common import stacked_layer_view

            local = _local_stacked(params["layers_stacked"], d, row_keys)
            psum = lambda t: jax.lax.psum(t, axis)  # noqa: E731
            x = params["embed"][tokens]

            if caches is None:
                def body(x, l):
                    x, _ = _block(x, stacked_layer_view(local, l), cfg_loc,
                                  cos, sin, mask, None, reduce=psum)
                    return x, None

                x, _ = jax.lax.scan(body, x, jnp.arange(n_layers))
                new_caches = None
            else:
                def body(carry, l):
                    x, c = carry
                    x, cat = _block(x, stacked_layer_view(local, l), cfg_loc,
                                    cos, sin, mask, StackedCacheAt(c, l),
                                    reduce=psum)
                    return (x, cat.caches), None

                (x, new_caches), _ = jax.lax.scan(
                    body, (x, caches), jnp.arange(n_layers))

            x = rmsnorm(x, params["final_norm"], cfg.rms_norm_eps)
            logits_part = linear(
                x, _local_view(params["lm_head"], d, row=False))
            return logits_part, new_caches

        return run(params, tokens, caches, cos, sin, mask)

    return forward


def _stacked_layer_specs(stacked: Dict[str, Any], row_keys) -> Dict[str, Any]:
    """Spec tree for one layer-stacked param dict (shard_map in_specs).

    A LINEAR's stacked weight is a QuantizedTensor or a 3-D ``[L, K, N]``
    dense array; 2-D ``{"w", "b"}`` dicts are stacked NORMS (OPT/BLOOM
    layernorm params) and replicate."""
    def is_linear(v):
        if isinstance(v, FusedLinear):
            return True
        if isinstance(v, dict) and "w" in v:
            w = v["w"]
            return isinstance(w, QuantizedTensor) or getattr(w, "ndim", 0) == 3
        return False

    sp = {}
    for key, v in stacked.items():
        if is_linear(v):
            sp[key] = _linear_specs(v, row=key in row_keys, stacked=True)
        elif v is None:
            sp[key] = None
        elif isinstance(v, dict):
            sp[key] = _rep_spec(v)
        else:
            sp[key] = P()
    return sp


def make_tp_opt_forward_stacked(cfg, mesh: Mesh, axis: str = "model"):
    """TP x scan for OPT: one shard_map whose body is the scan-over-layers
    forward on shard-local stacked params (the OPT-175B-class composition;
    the reference's deepest driver is gptq/opt.py and its 96-layer scale
    model could only be served layer-placed, gptq/opt.py:272-306).

    Same contract as :func:`make_tp_llama_forward_stacked`
    (``prepare_tp_stacked(family="opt")`` params: o/fc2 repacked
    ``k_shards=d``, column-parallel q/k/v/fc1 unfused -- their biases
    shard on N; row-parallel biases are added once after the psum,
    models.opt._row_tp).  Tied lm_head: the embed is replicated, so every
    shard computes the full-vocab logits (out_specs P()), exactly like the
    flat OPT tp forward.
    """
    import dataclasses

    from ..models.opt import POS_OFFSET
    from ..models.opt import _block as opt_block

    d = mesh.shape[axis]
    if cfg.num_heads % d or cfg.ffn_dim % d:
        raise ValueError(f"num_heads/ffn_dim must divide {axis}={d}")
    # hd is DERIVED (hidden/num_heads): scale both so the per-shard head
    # dim stays the true head dim
    cfg_loc = dataclasses.replace(cfg, num_heads=cfg.num_heads // d,
                                  hidden_size=cfg.hidden_size // d)
    _, row_keys = _FAMILY_LINEARS["opt"]

    def forward(params, tokens, cfg_arg=None, caches=None, positions=None,
                attn_mask=None):
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

        stacked = params["layers_stacked"]
        param_specs_tree = {
            "embed": P(), "embed_pos": P(),
            "layers_stacked": _stacked_layer_specs(stacked, row_keys),
        }
        if "final_norm" in params:
            param_specs_tree["final_norm"] = _rep_spec(params["final_norm"])
        cache_spec = (None if caches is None
                      else _cache_view_spec(caches, axis, stacked=True))
        n_layers = jax.tree.leaves(stacked)[0].shape[0]

        @partial(
            shard_map, mesh=mesh, **_SMAP_KW,
            in_specs=(param_specs_tree, P(), cache_spec, P(), P()),
            out_specs=(P(), cache_spec),
        )
        def run(params, tokens, caches, positions, mask):
            from ..engine.kvcache import StackedCacheAt
            from ..models.common import stacked_layer_view

            local = _local_stacked(params["layers_stacked"], d, row_keys)
            psum = lambda t: jax.lax.psum(t, axis)  # noqa: E731
            x = params["embed"][tokens] + params["embed_pos"][
                positions + POS_OFFSET]

            if caches is None:
                def body(x, l):
                    x, _ = opt_block(x, stacked_layer_view(local, l),
                                     cfg_loc, mask, None, reduce=psum)
                    return x, None

                x, _ = jax.lax.scan(body, x, jnp.arange(n_layers))
                new_caches = None
            else:
                def body(carry, l):
                    x, c = carry
                    x, cat = opt_block(x, stacked_layer_view(local, l),
                                       cfg_loc, mask, StackedCacheAt(c, l),
                                       reduce=psum)
                    return (x, cat.caches), None

                (x, new_caches), _ = jax.lax.scan(
                    body, (x, caches), jnp.arange(n_layers))

            from ..models.common import layernorm

            if cfg.do_layer_norm_before and "final_norm" in params:
                x = layernorm(x, params["final_norm"]["w"],
                              params["final_norm"]["b"], cfg.layer_norm_eps)
            logits = jnp.dot(x, params["embed"].T.astype(x.dtype))
            return logits, new_caches

        return run(params, tokens, caches, positions, mask)

    return forward


def make_tp_bloom_forward_stacked(cfg, mesh: Mesh, axis: str = "model"):
    """TP x scan for BLOOM: ALiBi slopes sliced per head shard inside the
    shard_map body; otherwise the OPT-stacked contract
    (``prepare_tp_stacked(family="bloom")``)."""
    import dataclasses

    from ..models.bloom import _block as bloom_block
    from ..models.common import alibi_slopes, layernorm

    d = mesh.shape[axis]
    # BLOOM's FFN is 4*hidden: divisibility follows from hidden % d
    if cfg.num_heads % d or cfg.hidden_size % d:
        raise ValueError(f"num_heads/hidden_size must divide {axis}={d}")
    h_loc = cfg.num_heads // d
    cfg_loc = dataclasses.replace(cfg, num_heads=h_loc,
                                  hidden_size=cfg.hidden_size // d)
    slopes_full = alibi_slopes(cfg.num_heads)
    _, row_keys = _FAMILY_LINEARS["bloom"]

    def forward(params, tokens, cfg_arg=None, caches=None, positions=None,
                attn_mask=None):
        b, s = tokens.shape
        if caches is None:
            mask = causal_mask(s) if attn_mask is None else attn_mask
            t = s
        else:
            start = caches.length[0]
            t = (caches.k.shape[2] if hasattr(caches, "k")
                 else caches.k_codes.shape[2])
            if attn_mask is None:
                qpos = (start + jnp.arange(s)) if positions is None \
                    else (positions if positions.ndim == 1 else positions[0])
                mask = (jnp.arange(t)[None, :] <= qpos[:, None])[None, None]
            else:
                mask = attn_mask

        stacked = params["layers_stacked"]
        param_specs_tree = {
            "embed": P(), "embed_norm": _rep_spec(params["embed_norm"]),
            "layers_stacked": _stacked_layer_specs(stacked, row_keys),
            "final_norm": _rep_spec(params["final_norm"]),
        }
        cache_spec = (None if caches is None
                      else _cache_view_spec(caches, axis, stacked=True))
        n_layers = jax.tree.leaves(stacked)[0].shape[0]

        @partial(
            shard_map, mesh=mesh, **_SMAP_KW,
            in_specs=(param_specs_tree, P(), cache_spec, P()),
            out_specs=(P(), cache_spec),
        )
        def run(params, tokens, caches, mask):
            from ..engine.kvcache import StackedCacheAt
            from ..models.common import stacked_layer_view

            local = _local_stacked(params["layers_stacked"], d, row_keys)
            psum = lambda tt: jax.lax.psum(tt, axis)  # noqa: E731
            shard = jax.lax.axis_index(axis)
            slopes_loc = jax.lax.dynamic_slice(slopes_full, (shard * h_loc,),
                                               (h_loc,))
            bias = (slopes_loc[:, None, None]
                    * jnp.arange(t, dtype=jnp.float32)[None, None, :])[None]

            x = params["embed"][tokens]
            x = layernorm(x, params["embed_norm"]["w"],
                          params["embed_norm"]["b"], cfg.layer_norm_eps)

            if caches is None:
                def body(x, l):
                    x, _ = bloom_block(x, stacked_layer_view(local, l),
                                       cfg_loc, mask, bias, None,
                                       reduce=psum)
                    return x, None

                x, _ = jax.lax.scan(body, x, jnp.arange(n_layers))
                new_caches = None
            else:
                def body(carry, l):
                    x, c = carry
                    x, cat = bloom_block(x, stacked_layer_view(local, l),
                                         cfg_loc, mask, bias,
                                         StackedCacheAt(c, l), reduce=psum)
                    return (x, cat.caches), None

                (x, new_caches), _ = jax.lax.scan(
                    body, (x, caches), jnp.arange(n_layers))

            x = layernorm(x, params["final_norm"]["w"],
                          params["final_norm"]["b"], cfg.layer_norm_eps)
            logits = jnp.dot(x, params["embed"].T.astype(x.dtype))
            return logits, new_caches

        return run(params, tokens, caches, mask)

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
