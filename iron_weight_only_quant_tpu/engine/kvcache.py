"""KV caches: dense bf16/f32 and real quantized int8/int4 storage.

The reference *declares* KV quantization (``kv_bit``/``kv_group_size``
injected into the HF config, utils.py:31-33) but never consumes it; here it
is implemented for real: new K/V tokens are encoded to integer codes with
per-(token, head, group) affine params on write and dequantized on read.
The quantization scheme is the C1 ``pseudo_quantize_tensor`` semantics
(asymmetric min/max over groups of the head dim).

int8 halves KV memory vs bf16; int4 codes are nibble-packed two-per-byte
(split-D layout: byte ``d`` holds codes ``d`` and ``d + D/2``), quartering
cache memory and read bandwidth vs bf16.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
from flax import struct

from ..config import KVCacheConfig
from ..formats.int_codec import decode_int, encode_int
from ..models.common import KVCacheView

# slot-local decode write formulation (A/B probe knob, scripts/
# probe_chunk_gap2.py): "vmap" (vmapped dynamic_update_slice) or "scatter"
# (one batched scatter per buffer -- measured IDENTICAL to vmap on v5e).
# The env var accepts ONLY these two correct modes; the semantics-breaking
# timing-isolation modes ("noop": skip the write, "scalar": write every
# slot at slot 0's column) are reachable only by monkeypatching
# _KV_WRITE_MODE from a probe script (scripts/probe_chunk_gap3.py) --
# an inherited env var must never silently corrupt generations.
import os as _os

_KV_WRITE_MODE = _os.environ.get("IWOQ_KV_WRITE", "vmap")
if _KV_WRITE_MODE not in ("vmap", "scatter"):
    import warnings

    warnings.warn(
        f"IWOQ_KV_WRITE={_KV_WRITE_MODE!r} is not a valid mode "
        "(vmap|scatter); using vmap.  The broken probe modes are "
        "monkeypatch-only (scripts/probe_chunk_gap3.py).",
        stacklevel=1,
    )
    _KV_WRITE_MODE = "vmap"
_KV_WRITE_SCATTER = _KV_WRITE_MODE == "scatter"


@struct.dataclass
class QuantKVCacheView:
    """Quantized per-layer cache: codes + per-group affine params.

    Shapes: codes ``[B, T, H, D]`` int8, or ``[B, T, H, D/2]`` uint8 when
    ``packed`` (two 4-bit codes per byte, split-D halves in lo/hi nibbles);
    scales/zeros ``[B, T, H, D/g]`` f32.  ``bits``/``group``/``packed`` are
    static (jit-time) metadata.
    """

    k_codes: jnp.ndarray
    k_scales: jnp.ndarray
    k_zeros: jnp.ndarray
    v_codes: jnp.ndarray
    v_scales: jnp.ndarray
    v_zeros: jnp.ndarray
    length: jnp.ndarray
    bits: int = struct.field(pytree_node=False)
    group: int = struct.field(pytree_node=False)
    packed: bool = struct.field(pytree_node=False, default=False)
    # [B] int32 per-slot real-token counts for the next write (serve prefill;
    # see models.common.KVCacheView.valid)
    valid: Optional[jnp.ndarray] = None


@struct.dataclass
class PagedKVCacheView:
    """Paged per-layer cache: a shared pool of fixed-size pages + a per-slot
    page table (vLLM-style paging, laid out TPU-first: the read path is one
    static-shape gather ``pool[table]`` so it jits into a single dynamic-
    gather, and writes are one batched scatter at (page, offset) — no
    per-token host interaction).

    Pools are ``[P, page, H, D]`` (compute dtype, or int8/uint8 codes with
    scale/zero pools ``[P, page, H, D/g]`` when quantized; ``scales is None``
    means dense).  ``page_table`` is ``[B, MP]`` int32 page ids; entry 0 is
    the reserved garbage page (idle slots and unallocated columns point
    there; attention masks those columns out).  ``length`` is always ``[B]``
    (slot-local timelines).
    """

    k_pages: jnp.ndarray
    v_pages: jnp.ndarray
    k_scales: Optional[jnp.ndarray]
    k_zeros: Optional[jnp.ndarray]
    v_scales: Optional[jnp.ndarray]
    v_zeros: Optional[jnp.ndarray]
    page_table: jnp.ndarray
    length: jnp.ndarray
    page_size: int = struct.field(pytree_node=False)
    bits: int = struct.field(pytree_node=False, default=16)
    group: int = struct.field(pytree_node=False, default=128)
    packed: bool = struct.field(pytree_node=False, default=False)
    # [B] int32 per-slot real-token counts for the next write (serve prefill;
    # invalid tokens are redirected to the reserved garbage page 0)
    valid: Optional[jnp.ndarray] = None


CacheView = Union[KVCacheView, QuantKVCacheView, PagedKVCacheView]


class PageAllocator:
    """Host-side free list over the page pool (page 0 is reserved garbage).

    The device never allocates: the engine's serve loop calls ``alloc`` as a
    slot's length crosses a page boundary and pushes the updated table in
    with the next step's inputs (a [B, MP] int32 array — a few hundred
    bytes), mirroring how vLLM's scheduler owns the block table.
    """

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        self._free = list(range(num_pages - 1, 0, -1))  # pop() yields 1,2,...

    @property
    def free_count(self) -> int:
        return len(self._free)

    def alloc(self) -> int:
        if not self._free:
            raise RuntimeError(
                "KV page pool exhausted; raise KVCacheConfig.num_pages "
                "(need >= slots * ceil((prompt+max_new)/page_size) to "
                "guarantee admission-order progress)"
            )
        return self._free.pop()

    def free(self, pages) -> None:
        self._free.extend(pages)


def _pack_nibbles(codes: jnp.ndarray) -> jnp.ndarray:
    """[..., D] codes in [0, 15] -> [..., D/2] uint8, split-D lo/hi halves."""
    d = codes.shape[-1]
    lo = codes[..., : d // 2]
    hi = codes[..., d // 2 :]
    return (lo + hi * 16).astype(jnp.uint8)


def _unpack_nibbles(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., D/2] uint8 -> [..., D] int32 codes in [0, 15]."""
    p = packed.astype(jnp.int32)
    return jnp.concatenate([p & 0xF, p >> 4], axis=-1)


def _encode(x: jnp.ndarray, bits: int, group: int, packed: bool = False):
    """[B, S, H, D] -> codes i8 (or packed u8), scales/zeros [B, S, H, D/g]."""
    b, s, h, d = x.shape
    g = min(group, d)
    rows = x.astype(jnp.float32).reshape(-1, g)
    codes, scales, zeros = encode_int(rows, bits, symmetric=False)
    if packed:
        codes = _pack_nibbles(codes.reshape(b, s, h, d))
        return (
            codes,
            scales.reshape(b, s, h, d // g),
            zeros.reshape(b, s, h, d // g),
        )
    # asym codes span [0, 2^bits - 1]; shift by -2^(bits-1) to fit int8
    # (the (code - zero) difference is invariant to a common shift)
    off = 1 << (bits - 1)
    return (
        (codes - off).astype(jnp.int8).reshape(b, s, h, d),
        scales.reshape(b, s, h, d // g),
        (zeros - off).reshape(b, s, h, d // g),
    )


def _decode(codes, scales, zeros, d: int, dtype, packed: bool = False):
    b, s, h, _ = codes.shape
    if packed:
        codes = _unpack_nibbles(codes)
    g = d // scales.shape[-1]
    vals = decode_int(
        codes.astype(jnp.int32).reshape(-1, g).astype(jnp.float32),
        scales.reshape(-1, 1),
        zeros.reshape(-1, 1),
        symmetric=False,
    )
    return vals.reshape(b, s, h, d).astype(dtype)


def make_caches(
    n_layers: int,
    batch: int,
    n_kv_heads: int,
    head_dim: int,
    kv_cfg: KVCacheConfig,
    dtype=jnp.bfloat16,
) -> List[CacheView]:
    t = kv_cfg.max_seq_len
    if kv_cfg.paged:
        return _make_paged_caches(
            n_layers, batch, n_kv_heads, head_dim, kv_cfg, dtype
        )
    if kv_cfg.kv_bits >= 16:
        return [
            KVCacheView(
                jnp.zeros((batch, t, n_kv_heads, head_dim), dtype),
                jnp.zeros((batch, t, n_kv_heads, head_dim), dtype),
                jnp.asarray(0, jnp.int32),
            )
            for _ in range(n_layers)
        ]
    g = min(kv_cfg.kv_group_size, head_dim)
    ng = head_dim // g
    packed = kv_cfg.kv_bits == 4 and head_dim % 2 == 0
    d_store = head_dim // 2 if packed else head_dim
    code_dtype = jnp.uint8 if packed else jnp.int8
    return [
        QuantKVCacheView(
            jnp.zeros((batch, t, n_kv_heads, d_store), code_dtype),
            jnp.ones((batch, t, n_kv_heads, ng), jnp.float32),
            jnp.zeros((batch, t, n_kv_heads, ng), jnp.float32),
            jnp.zeros((batch, t, n_kv_heads, d_store), code_dtype),
            jnp.ones((batch, t, n_kv_heads, ng), jnp.float32),
            jnp.zeros((batch, t, n_kv_heads, ng), jnp.float32),
            jnp.asarray(0, jnp.int32),
            kv_cfg.kv_bits,
            g,
            packed,
        )
        for _ in range(n_layers)
    ]


def pages_per_seq(kv_cfg: KVCacheConfig) -> int:
    return -(-kv_cfg.max_seq_len // kv_cfg.page_size)


def pool_pages(batch: int, kv_cfg: KVCacheConfig) -> int:
    """Pool size in pages: configured, or worst case + 1 garbage page."""
    return kv_cfg.num_pages or (1 + batch * pages_per_seq(kv_cfg))


def _make_paged_caches(n_layers, batch, n_kv_heads, head_dim, kv_cfg, dtype):
    mp = pages_per_seq(kv_cfg)
    p = pool_pages(batch, kv_cfg)
    page = kv_cfg.page_size
    quant = kv_cfg.kv_bits < 16
    g = min(kv_cfg.kv_group_size, head_dim) if quant else kv_cfg.kv_group_size
    packed = quant and kv_cfg.kv_bits == 4 and head_dim % 2 == 0
    d_store = head_dim // 2 if packed else head_dim
    code_dtype = (jnp.uint8 if packed else jnp.int8) if quant else dtype
    # default table: contiguous static allocation (slot b owns pages
    # 1 + b*mp .. 1 + (b+1)*mp - 1, when they exist).  generate() works out
    # of the box with this; serve() overwrites the table from its allocator.
    table = 1 + jnp.arange(batch)[:, None] * mp + jnp.arange(mp)[None, :]
    table = jnp.where(table < p, table, 0).astype(jnp.int32)

    def mk_scale():
        if not quant:
            return None, None
        return (
            jnp.ones((p, page, n_kv_heads, head_dim // g), jnp.float32),
            jnp.zeros((p, page, n_kv_heads, head_dim // g), jnp.float32),
        )

    out = []
    for _ in range(n_layers):
        ks, kz = mk_scale()
        vs, vz = mk_scale()
        out.append(
            PagedKVCacheView(
                jnp.zeros((p, page, n_kv_heads, d_store), code_dtype),
                jnp.zeros((p, page, n_kv_heads, d_store), code_dtype),
                ks, kz, vs, vz,
                table,
                jnp.zeros((batch,), jnp.int32),
                page,
                kv_cfg.kv_bits if quant else 16,
                g,
                packed,
            )
        )
    return out


def _paged_update_and_fetch(cache: PagedKVCacheView, k_new, v_new):
    b, s, h, d = k_new.shape
    page = cache.page_size
    mp = cache.page_table.shape[1]
    quant = cache.bits < 16

    # (page id, offset) for each of the S new tokens of each slot
    t = cache.length[:, None] + jnp.arange(s)[None, :]  # [B, S]
    slot_page = jnp.clip(t // page, 0, mp - 1)
    pidx = jnp.take_along_axis(cache.page_table, slot_page, axis=1)  # [B, S]
    poff = t % page
    adv = s
    if cache.valid is not None:  # per-slot partial write (serve prefill)
        invalid = jnp.arange(s)[None, :] >= cache.valid[:, None]
        pidx = jnp.where(invalid, 0, pidx)  # garbage page
        poff = jnp.where(invalid, 0, poff)
        adv = cache.valid

    if quant:
        kc, ks, kz = _encode(k_new, cache.bits, cache.group, cache.packed)
        vc, vs, vz = _encode(v_new, cache.bits, cache.group, cache.packed)
        cache = cache.replace(
            k_pages=cache.k_pages.at[pidx, poff].set(kc.astype(cache.k_pages.dtype)),
            v_pages=cache.v_pages.at[pidx, poff].set(vc.astype(cache.v_pages.dtype)),
            k_scales=cache.k_scales.at[pidx, poff].set(ks),
            k_zeros=cache.k_zeros.at[pidx, poff].set(kz),
            v_scales=cache.v_scales.at[pidx, poff].set(vs),
            v_zeros=cache.v_zeros.at[pidx, poff].set(vz),
            length=cache.length + adv,
            valid=None,
        )
    else:
        cache = cache.replace(
            k_pages=cache.k_pages.at[pidx, poff].set(k_new.astype(cache.k_pages.dtype)),
            v_pages=cache.v_pages.at[pidx, poff].set(v_new.astype(cache.v_pages.dtype)),
            length=cache.length + adv,
            valid=None,
        )

    # one static-shape gather materializes the slot-ordered timeline
    # [B, MP*page, H, D]; unallocated columns read the garbage page and are
    # masked out by the attention mask built from `length`.
    def view(pool):
        g = pool[cache.page_table]  # [B, MP, page, H, d_store]
        return g.reshape(b, mp * page, h, g.shape[-1])

    if quant:
        k_all = _decode(view(cache.k_pages), view(cache.k_scales),
                        view(cache.k_zeros), d, k_new.dtype, cache.packed)
        v_all = _decode(view(cache.v_pages), view(cache.v_scales),
                        view(cache.v_zeros), d, v_new.dtype, cache.packed)
    else:
        k_all = view(cache.k_pages).astype(k_new.dtype)
        v_all = view(cache.v_pages).astype(v_new.dtype)
    return cache, k_all, v_all


class StackedCacheAt:
    """Layer-``l`` handle into a stacked cache pytree (scan-over-layers).

    Wraps the WHOLE stacked cache plus a traced layer index so the scan body
    can thread the cache through the scan *carry* and ``update_and_fetch``
    writes just the new tokens in place (``lax.scan`` aliases carry buffers).
    Threading the cache through scan xs/ys instead costs a full layer-slab
    slice on the way in AND a full slab re-stack on the way out every step —
    at 2048-context 7B shapes that is ~1 GB of HBM copies per decode step.
    Like models.common.StackedLinear, this never crosses a jit boundary.
    """

    __slots__ = ("caches", "idx")

    def __init__(self, caches, idx):
        self.caches = caches
        self.idx = idx


def _stacked_update_and_fetch(caches, l, k_new: jnp.ndarray, v_new: jnp.ndarray):
    """In-place layer-``l`` append on a stacked ([L, ...]) cache pytree.

    Timelines: ``length`` is ``[L]`` (one shared scalar per layer -- the
    generate/bench path) or ``[L, B]`` (slot-local, continuous batching);
    ``valid`` (``[B]``, shared across layers) marks per-slot real-token
    counts for the next write (serve prefill waves).  Unlike the flat
    per-layer views -- which consume ``valid`` on write -- the stacked view
    KEEPS it: every layer of the scan must see the same mask, and the
    engine clears it between the wave and the chunk phase.
    """
    start = caches.length[l]
    valid = getattr(caches, "valid", None)
    s = k_new.shape[1]
    d = k_new.shape[-1]
    slot_local = getattr(start, "ndim", 0) == 1
    if valid is not None and not slot_local:
        raise ValueError("stacked caches: valid requires [L, B] lengths")

    if slot_local:
        # per-slot scatter at each slot's own column (mirrors the flat
        # QuantKVCacheView path at update_and_fetch); out-of-range targets
        # (beyond a slot's valid count, or past t_max) are dropped
        b = k_new.shape[0]
        t_max = (caches.k if isinstance(caches, KVCacheView)
                 else caches.k_codes).shape[2]
        t = start[:, None] + jnp.arange(s)[None, :]  # [B, S]
        if valid is not None:
            t = jnp.where(jnp.arange(s)[None, :] < valid[:, None], t, t_max)
        b_idx = jnp.arange(b)[:, None]
        adv = valid if valid is not None else s

        def upd(buf, val):
            return buf.at[l, b_idx, t].set(val.astype(buf.dtype), mode="drop")
    else:
        adv = s

        def upd(buf, val):
            return jax.lax.dynamic_update_slice(
                buf, val[None].astype(buf.dtype), (l, 0, start, 0, 0)
            )

    def at(buf):
        # dynamic layer-slab read; XLA fuses the gather into the attention
        # consumers instead of materializing a copy
        return jax.lax.dynamic_index_in_dim(buf, l, 0, keepdims=False)

    new_len = caches.length.at[l].add(adv)

    if isinstance(caches, KVCacheView):
        k = upd(caches.k, k_new)
        v = upd(caches.v, v_new)
        new = KVCacheView(k, v, new_len, valid)
        return new, at(k).astype(k_new.dtype), at(v).astype(v_new.dtype)

    if isinstance(caches, QuantKVCacheView):
        kc, ks, kz = _encode(k_new, caches.bits, caches.group, caches.packed)
        vc, vs, vz = _encode(v_new, caches.bits, caches.group, caches.packed)
        new = QuantKVCacheView(
            upd(caches.k_codes, kc), upd(caches.k_scales, ks),
            upd(caches.k_zeros, kz),
            upd(caches.v_codes, vc), upd(caches.v_scales, vs),
            upd(caches.v_zeros, vz),
            new_len, caches.bits, caches.group, caches.packed,
            valid=valid,
        )
        k_all = _decode(at(new.k_codes), at(new.k_scales), at(new.k_zeros),
                        d, k_new.dtype, new.packed)
        v_all = _decode(at(new.v_codes), at(new.v_scales), at(new.v_zeros),
                        d, v_new.dtype, new.packed)
        return new, k_all, v_all

    raise NotImplementedError(
        f"stacked scan caches not supported for {type(caches).__name__}"
    )


def update_and_fetch(cache: CacheView, k_new: jnp.ndarray, v_new: jnp.ndarray):
    """Append S new tokens; return (cache', k_all, v_all) in compute dtype."""
    if isinstance(cache, StackedCacheAt):
        new, k_all, v_all = _stacked_update_and_fetch(
            cache.caches, cache.idx, k_new, v_new
        )
        return StackedCacheAt(new, cache.idx), k_all, v_all
    if isinstance(cache, PagedKVCacheView):
        return _paged_update_and_fetch(cache, k_new, v_new)
    if isinstance(cache, KVCacheView):
        from ..models.common import update_kv_cache

        cache = update_kv_cache(cache, k_new, v_new)
        return cache, cache.k, cache.v

    start = cache.length
    d = k_new.shape[-1]
    s = k_new.shape[1]
    kc, ks, kz = _encode(k_new, cache.bits, cache.group, cache.packed)
    vc, vs, vz = _encode(v_new, cache.bits, cache.group, cache.packed)

    adv = s
    if cache.valid is not None:  # per-slot partial write (serve prefill)
        if getattr(start, "ndim", 0) != 1:
            raise ValueError("QuantKVCacheView.valid requires [B] lengths")
        t_max = cache.k_codes.shape[1]
        t = start[:, None] + jnp.arange(s)[None, :]  # [B, S]
        t = jnp.where(jnp.arange(s)[None, :] < cache.valid[:, None], t, t_max)
        b_idx = jnp.arange(cache.k_codes.shape[0])[:, None]

        def upd(buf, val):
            return buf.at[b_idx, t].set(val.astype(buf.dtype), mode="drop")

        adv = cache.valid
    elif getattr(start, "ndim", 0) == 1:  # slot-local timelines ([B] starts)
        if _KV_WRITE_MODE == "noop":  # timing isolation only (monkeypatch)
            def upd(buf, val):
                return buf
        elif _KV_WRITE_MODE == "scalar":  # timing isolation only (monkeypatch)
            def upd(buf, val):
                return jax.lax.dynamic_update_slice(
                    buf, val.astype(buf.dtype),
                    (0, start[0]) + (0,) * (buf.ndim - 2)
                )
        elif _KV_WRITE_SCATTER:
            # one batched scatter per buffer (same form as the valid
            # branch) instead of a vmapped dynamic_update_slice.
            # Boundary semantics differ from the vmap default at capacity
            # edges: mode="drop" discards out-of-range rows where
            # dynamic_update_slice would CLAMP the start to t_max - s;
            # clamp t here to match, so an A/B comparison writes identical
            # cache contents even on slot overflow
            t_max_b = cache.k_codes.shape[1]
            t = jnp.minimum(start, t_max_b - s)[:, None] + jnp.arange(s)
            b_idx = jnp.arange(cache.k_codes.shape[0])[:, None]

            def upd(buf, val):
                return buf.at[b_idx, t].set(val.astype(buf.dtype),
                                            mode="drop")
        else:
            def upd(buf, val):
                return jax.vmap(
                    lambda b, v, st: jax.lax.dynamic_update_slice(
                        b, v.astype(b.dtype), (st, 0, 0)
                    )
                )(buf, val, start)
    else:
        def upd(buf, val):
            return jax.lax.dynamic_update_slice(
                buf, val.astype(buf.dtype), (0, start, 0, 0)
            )

    cache = QuantKVCacheView(
        upd(cache.k_codes, kc), upd(cache.k_scales, ks), upd(cache.k_zeros, kz),
        upd(cache.v_codes, vc), upd(cache.v_scales, vs), upd(cache.v_zeros, vz),
        cache.length + adv, cache.bits, cache.group, cache.packed,
    )
    k_all = _decode(cache.k_codes, cache.k_scales, cache.k_zeros, d, k_new.dtype,
                    cache.packed)
    v_all = _decode(cache.v_codes, cache.v_scales, cache.v_zeros, d, v_new.dtype,
                    cache.packed)
    return cache, k_all, v_all


def make_stacked_caches(
    n_layers: int,
    batch: int,
    n_kv_heads: int,
    head_dim: int,
    kv_cfg: KVCacheConfig,
    dtype=jnp.bfloat16,
):
    """One cache view with a leading layer axis, for scan-over-layers models."""
    per_layer = make_caches(n_layers, batch, n_kv_heads, head_dim, kv_cfg, dtype)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)


def cache_length(cache: CacheView) -> jnp.ndarray:
    return cache.length


def cache_max_len(cache: CacheView) -> int:
    """T_max of a per-layer ([B, T, ...]) or stacked ([L, B, T, ...]) view."""
    if isinstance(cache, KVCacheView):
        return cache.k.shape[1 if cache.k.ndim == 4 else 2]
    if isinstance(cache, PagedKVCacheView):
        return cache.page_table.shape[1] * cache.page_size
    return cache.k_codes.shape[1 if cache.k_codes.ndim == 4 else 2]
