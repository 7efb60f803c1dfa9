"""Shared model building blocks (pure JAX, jit-friendly, static shapes)."""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.qmatmul import quantized_matmul
from ..quantize.qtensor import QuantizedTensor


_LINEAR_RECORDER = None  # set by recording_linears(); calibration-time hook


class recording_linears:
    """Context manager: invoke ``cb(name, x)`` for every named linear call.

    The functional analogue of the reference's forward hooks during GPTQ
    calibration (gptq_utils.py:153-160).  Only linear params dicts carrying a
    ``"name"`` key are recorded (see quantize.model_pass.annotate_linears).
    """

    def __init__(self, cb):
        self.cb = cb

    def __enter__(self):
        global _LINEAR_RECORDER
        self._prev = _LINEAR_RECORDER
        _LINEAR_RECORDER = self.cb
        return self

    def __exit__(self, *exc):
        global _LINEAR_RECORDER
        _LINEAR_RECORDER = self._prev
        return False


class StackedLinear:
    """Lazy view of one layer's linear inside a layer-stacked param pytree.

    Constructed *inside* traced scan bodies (never crosses a jit boundary):
    holds the whole stacked param dict plus a traced layer index, so
    :func:`linear` can route quantized weights to the scalar-prefetch fused
    kernel without ever materializing the layer's weights in HBM.
    """

    __slots__ = ("p", "idx")

    def __init__(self, p: Dict[str, Any], idx):
        self.p = p
        self.idx = idx


def stack_model_layers(params: Dict[str, Any],
                       consume: bool = False,
                       tp_segments: bool = False) -> Dict[str, Any]:
    """Stack the per-layer param list into one pytree with leading L axis.

    Enables the scan-over-layers forwards: one compiled block body instead of
    ``num_layers`` unrolled copies -- compile time and HLO size become
    depth-independent (essential for 70B-class, 80-layer models).  Packed
    ``QuantizedTensor`` leaves stack to ``[L, ...]`` arrays that the
    scalar-prefetch fused kernel indexes in place (no per-step weight copy).

    ``consume=True`` DESTRUCTIVELY pops each projection out of the caller's
    layer dicts as it is stacked, so the per-layer buffers free leaf-by-leaf
    instead of coexisting with the full stacked copy -- without it, peak
    HBM is 2x the model (the 13B-shape scan bench OOM'd a 16 GB chip).

    ``tp_segments=True`` (tp_block.prepare_tp_stacked_llama only) pads
    k_shards>1 row-parallel side info PER K-SEGMENT; such artifacts are
    only valid through shard-local views -- see pad_stacked_sides.
    """
    pad_sides = partial(pad_stacked_sides, tp_segments=tp_segments)
    layers = params["layers"]
    if not consume:
        layers = [dict(l) for l in layers]
    n_layers = len(layers)
    stacked = {}
    for key in list(layers[0].keys()):
        vals = [l.pop(key) for l in layers]
        # fill a preallocated [L, ...] buffer layer-by-layer with donation
        # instead of jnp.stack (bounds the transient to one extra kind;
        # building STRAIGHT into stacked buffers -- bench.py
        # build_quantized_llama(stacked=True) -- is what actually bounds
        # peak HBM to model + one layer for 70B-slice-scale builds)
        bufs = jax.tree.map(
            lambda x: jnp.zeros((n_layers,) + x.shape, x.dtype), vals[0])
        for i in range(n_layers):
            bufs = _stack_fill(bufs, vals[i], jnp.asarray(i, jnp.int32))
            vals[i] = None  # free this layer's leaves as we go
        stacked[key] = pad_sides(bufs)
        del vals, bufs
    out = {k: v for k, v in params.items() if k != "layers"}
    if consume:
        params.pop("layers", None)
    out["layers_stacked"] = stacked
    return out


@partial(jax.jit, donate_argnums=0)
def _stack_fill(bufs, leaves, i):
    return jax.tree.map(
        lambda b, x: jax.lax.dynamic_update_index_in_dim(b, x, i, 0),
        bufs, leaves)


def pad_stacked_sides(v, tp_segments: bool = False):
    """Pre-pad a stacked linear's grouped side-info rows to a sublane
    multiple ONCE at stack time: the stacked kernels need per-layer side
    blocks with row counts divisible by 8, and padding per-call made XLA
    copy the whole [L, rows, N] side arrays every layer of every step (the
    round-3 scan-gap finding, ~100 us/layer at 7B depth).  4/8-bit packed
    storage only (the formats whose stacked kernels read these directly);
    LUT artifacts without zeros pad scales alone (the stacked call
    substitutes a dummy zeros ref, has_z=False)."""
    if isinstance(v, FusedLinear):
        return v.replace(
            w=pad_stacked_sides({"w": v.w}, tp_segments)["w"])
    if not (isinstance(v, dict) and isinstance(v.get("w"), QuantizedTensor)):
        return v
    qt = v["w"]
    from ..ops.qmatmul import packed_bits

    rows = qt.scales.shape[1]
    if (qt.qweight.ndim != 3 or packed_bits(qt) not in (4, 8)
            or qt.side_pad or rows <= 1):
        return v
    # k_shards > 1 + tp_segments (tp_block.prepare_tp_stacked_llama):
    # pad each of the k_shards contiguous row SEGMENTS to an 8-multiple, so
    # a shard_map K-slice hands every shard a self-contained side block
    # whose rows are sublane-aligned.  side_pad then means the PER-SEGMENT
    # pad; only the shard-local views (k_shards=1 after localization) ever
    # interpret it, and for them it is the standard end-of-rows meaning.
    # WITHOUT tp_segments, k_shards>1 artifacts are left unpadded: end-of-
    # rows padding would misalign segment boundaries for a later TP slice,
    # and segment padding would break unsharded consumers (dequantize_weight
    # reads side_pad as end-of-rows) -- correctness over the pad win.
    shards = qt.k_shards
    if shards > 1 and not tp_segments:
        return v
    if rows % shards:
        return v
    rows_per = rows // shards
    pad = (-rows_per) % 8
    if pad == 0:
        return v
    if qt.zeros is not None and qt.zeros.shape[1] != rows:
        # broadcast ([L, 1, 1]) zero-points (symmetric affine) cannot
        # pre-pad: the stacked kernel would still per-call materialize
        # the broadcast to [L, rows, N].  The lift is a const-z kernel
        # variant (symmetric z is the compile-time constant
        # 2^(bits-1), already 0 for the shifted int8 byte layout).
        return v

    def pr(a):
        if a is None:
            return None
        if shards == 1:
            return jnp.pad(a, ((0, 0), (0, pad), (0, 0)))
        l, _, n = a.shape
        seg = a.reshape(l, shards, rows_per, n)
        seg = jnp.pad(seg, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return seg.reshape(l, shards * (rows_per + pad), n)

    return {**v, "w": qt.replace(
        scales=pr(qt.scales), zeros=pr(qt.zeros), side_pad=pad)}


@struct.dataclass
class FusedLinear:
    """Several projections sharing one input, packed as ONE artifact.

    Built by ``concat_n`` over the member weights; ``spans`` are the static
    (start, end) column ranges of each member's logical output inside the
    fused (padding-inclusive) output width.
    """

    w: Any
    b: Optional[jnp.ndarray]
    spans: Tuple[Tuple[int, int], ...] = struct.field(pytree_node=False)

    def apply(self, x: jnp.ndarray,
              pre_norm: Optional[float] = None) -> Tuple[jnp.ndarray, ...]:
        y = linear(x, {"w": self.w, "b": self.b}, pre_norm=pre_norm)
        return tuple(y[..., a:b] for a, b in self.spans)


class StackedFusedView:
    """Lazy per-layer view of a layer-stacked :class:`FusedLinear` (scan
    bodies): the fused artifact's [L, ...] arrays stay put in HBM, apply()
    routes through the scalar-prefetch stacked kernel and slices the member
    spans -- the scan path keeps the fused-projection win (7 -> 4 kernel
    launches/layer, ~20 us/layer at 7B decode; round 4, previously 'scan
    mode skips fusion')."""

    __slots__ = ("fl", "idx")

    def __init__(self, fl: "FusedLinear", idx):
        self.fl = fl
        self.idx = idx

    def apply(self, x: jnp.ndarray,
              pre_norm: Optional[float] = None) -> Tuple[jnp.ndarray, ...]:
        from ..ops.qmatmul import quantized_matmul_stacked

        b = self.fl.b
        if b is not None:
            b = b[self.idx]
        y = quantized_matmul_stacked(x, self.fl.w, self.idx, bias=b,
                                     pre_norm=pre_norm)
        return tuple(y[..., a:e] for a, e in self.fl.spans)


def _is_stacked_linear(v: Any) -> bool:
    if not (isinstance(v, dict) and "w" in v):
        return False
    w = v["w"]
    if isinstance(w, QuantizedTensor):
        return True
    return getattr(w, "ndim", 0) == 3  # dense stacked [L, K, N]


def stacked_layer_view(stacked: Dict[str, Any], l) -> Dict[str, Any]:
    """One layer's param view inside a stacked pytree, for scan bodies.

    Linears become lazy :class:`StackedLinear` views (weights stay put in
    HBM; the fused kernel selects the layer via scalar prefetch); everything
    else (norm vectors, nested {"w","b"} norm dicts) is dynamically indexed,
    which is cheap for vectors.
    """
    lp = {}
    for name, v in stacked.items():
        if v is None:  # e.g. folded norm weights (fold_llama_norms)
            lp[name] = None
        elif isinstance(v, FusedLinear):
            lp[name] = StackedFusedView(v, l)
        elif _is_stacked_linear(v):
            lp[name] = StackedLinear(v, l)
        elif isinstance(v, dict):
            lp[name] = jax.tree.map(lambda a: a[l], v)
        else:
            lp[name] = v[l]
    return lp


def linear(x: jnp.ndarray, p: Any,
           pre_norm: Optional[float] = None) -> jnp.ndarray:
    """Apply a linear layer whose weight is dense ``[K, N]`` or quantized.

    This is the single seam where quantization enters the model -- the
    functional counterpart of the reference's module surgery that swaps
    ``nn.Linear`` for ``QuantLinear`` (quant_wrapper.py:52-80).  Accepts a
    plain param dict or a :class:`StackedLinear` view (scan-over-layers).

    ``pre_norm`` (the rms eps) applies a weightless rmsnorm to x first --
    fused into the Pallas kernel on TPU (probe_glue.py measured the XLA
    rmsnorms between kernel calls at ~37 us/layer of decode); the norm
    gamma must already be folded into the weights (fold_llama_norms).
    """
    def norm(x):
        if pre_norm is None:
            return x
        xf = x.astype(jnp.float32)
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(ms + pre_norm)).astype(x.dtype)

    if isinstance(p, StackedLinear):
        from ..ops.qmatmul import quantized_matmul_stacked

        w, b = p.p["w"], p.p.get("b")
        if b is not None:
            b = b[p.idx]
        if isinstance(w, QuantizedTensor):
            return quantized_matmul_stacked(x, w, p.idx, bias=b,
                                            pre_norm=pre_norm)
        y = jnp.dot(norm(x), w[p.idx].astype(x.dtype),
                    preferred_element_type=x.dtype)
        if b is not None:
            y = y + b.astype(x.dtype)
        return y
    if _LINEAR_RECORDER is not None and "name" in p:
        _LINEAR_RECORDER(p["name"], norm(x) if pre_norm is not None else x)
    w, b = p["w"], p.get("b")
    if isinstance(w, QuantizedTensor):
        return quantized_matmul(x, w, bias=b, pre_norm=pre_norm)
    y = jnp.dot(norm(x), w.astype(x.dtype), preferred_element_type=x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def rmsnorm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(dt)


def layernorm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float
) -> jnp.ndarray:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dt)


# ------------------------------------------------------------------ RoPE

def rope_tables(
    positions: jnp.ndarray,
    head_dim: int,
    theta: float = 10000.0,
    condense_ratio: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables ``[..., head_dim]`` (HF half-rotation convention).

    ``condense_ratio > 1`` reproduces RoPE position interpolation
    (the capability of reference utils.py:93-129 CondenseRotaryEmbedding):
    positions are divided by the ratio before the frequency product.
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    t = positions.astype(jnp.float32) / condense_ratio
    freqs = jnp.einsum("...s,d->...sd", t, inv_freq)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, S, H, D]; cos/sin: [B, S, D] or [S, D]."""
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin).astype(
        x.dtype
    )


# ------------------------------------------------------------- attention

class KVCacheView(NamedTuple):
    """Per-layer cache slab: k/v ``[B, T_max, H_kv, D]`` + current length.

    ``valid`` (optional, ``[B]`` int32, slot-local timelines only) marks how
    many of the next write's S tokens are real per slot: writes beyond a
    slot's count are dropped and its length advances by the count, not by S.
    The engine's serve prefill uses this to feed right-padded prompt chunks
    through one [B, S] program without corrupting non-prefilling slots.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    length: jnp.ndarray  # scalar int32 or [B] int32 (slot-local)
    valid: Optional[jnp.ndarray] = None  # [B] int32, next-write token counts


def attend(
    q: jnp.ndarray,  # [B, S, Hq, D]
    k: jnp.ndarray,  # [B, T, Hkv, D]
    v: jnp.ndarray,  # [B, T, Hkv, D]
    mask: jnp.ndarray,  # [B, 1, S, T] or [1, 1, S, T] boolean (True = keep)
    *,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,  # e.g. ALiBi [1|B, Hq, S|1, T]
) -> jnp.ndarray:
    """Softmax attention with GQA head expansion, fp32 accumulation.

    Stays XLA on purpose: a fused Pallas decode-attention kernel (per-head
    unrolled M=1 dots, grid over B) measured ~19 us/layer SLOWER than this
    chain on the v5e (probe_glue.py xla_attn A/B, round 3) -- XLA's batched
    einsum over [B, H] beats Mosaic's small-matmul unroll at decode shapes,
    so the kernel was deleted rather than shipped dark."""
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    if scale is None:
        scale = d**-0.5
    if hq != hkv:
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    # NOTE (round 4, scripts/probe_chunk_gap*.py, probe_attn_*.py): with
    # per-slot [B,1] rope positions AND a [B,1,1,T] mask together (the
    # continuous-batching serve step), this XLA attention runs ~31 us/layer
    # slower than with either input unbatched -- either alone is FREE.  The
    # compiled program shows a layout flip on scores (T leaves the lane
    # dim), a reduce-window softmax rewrite, and full-cache-buffer write
    # fusions; but fixing each in isolation (squeezed 3-D einsum, additive
    # f32 mask, barrier-pinned 2-D softmax, scatter/noop writes) measured
    # WALL-NEUTRAL while shuffling which symptom appears -- the cost is an
    # XLA memory-space/scheduling interaction, not any single op.  The
    # serve engine accepts the documented +16%/step rather than carry a
    # formulation that only moves the symptom (three variants measured).
    scores = jnp.einsum(
        "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        scores = scores + bias
    scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhst,bthd->bshd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def causal_mask(s: int, t: Optional[int] = None, offset: int = 0) -> jnp.ndarray:
    """Boolean mask [1, 1, S, T]; query i attends to keys <= i + offset."""
    t = t if t is not None else s
    rows = jnp.arange(s)[:, None]
    cols = jnp.arange(t)[None, :]
    return (cols <= rows + offset)[None, None]


def alibi_slopes(n_heads: int) -> jnp.ndarray:
    """Standard ALiBi head slopes (BLOOM attention)."""
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        slopes = pow2_slopes(n_heads)
    else:
        closest = 2 ** math.floor(math.log2(n_heads))
        slopes = pow2_slopes(closest)
        extra = pow2_slopes(2 * closest)
        slopes += extra[0::2][: n_heads - closest]
    return jnp.asarray(slopes, dtype=jnp.float32)


def update_kv_cache(
    cache: KVCacheView, k_new: jnp.ndarray, v_new: jnp.ndarray
) -> KVCacheView:
    """Write S new tokens at position ``cache.length`` (static S, dynamic start).

    ``length`` may be a scalar (one shared timeline) or ``[B]`` (slot-local
    timelines, continuous batching): the vector case scatters each row at its
    own start column.
    """
    start = cache.length
    s = k_new.shape[1]
    if cache.valid is not None:
        # per-slot partial write: token i of slot b lands at column
        # start[b]+i when i < valid[b], else is dropped (index t_max is out
        # of range -> mode="drop").  Length advances by the per-slot count.
        if getattr(start, "ndim", 0) != 1:
            raise ValueError("KVCacheView.valid requires [B] slot-local lengths")
        t_max = cache.k.shape[1]
        t = start[:, None] + jnp.arange(s)[None, :]  # [B, S]
        t = jnp.where(jnp.arange(s)[None, :] < cache.valid[:, None], t, t_max)
        b_idx = jnp.arange(cache.k.shape[0])[:, None]

        def upd(buf, val):
            return buf.at[b_idx, t].set(val.astype(buf.dtype), mode="drop")

        return KVCacheView(
            upd(cache.k, k_new), upd(cache.v, v_new), start + cache.valid
        )
    if getattr(start, "ndim", 0) == 1:
        def upd(buf, val):
            return jax.vmap(
                lambda b, v, st: jax.lax.dynamic_update_slice(
                    b, v.astype(b.dtype), (st, 0, 0)
                )
            )(buf, val, start)
        k = upd(cache.k, k_new)
        v = upd(cache.v, v_new)
    else:
        k = jax.lax.dynamic_update_slice(
            cache.k, k_new.astype(cache.k.dtype), (0, start, 0, 0)
        )
        v = jax.lax.dynamic_update_slice(
            cache.v, v_new.astype(cache.v.dtype), (0, start, 0, 0)
        )
    return KVCacheView(k, v, cache.length + s)
