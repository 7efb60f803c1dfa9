"""Fused dequant-matmul Pallas TPU kernel.

The TPU-native counterpart of the reference's one native component, the
3-bit CUDA mat-vec (gptq/quant_cuda.cpp + quant_cuda_kernel.cu, SURVEY.md
C13/C14): packed sub-byte weights stay in HBM, tiles are DMA'd to VMEM,
nibbles are unpacked and dequantized on the VPU, and the MXU consumes the
dequantized tile immediately -- weights never materialize in HBM at full
precision.  For bandwidth-bound decode this is the entire speedup: an int4
weight stream is 1/4 the bytes of bf16.

Layout contract (see ops/packing.py):
  * int4 qweight ``[K/2, N]`` uint8 -- low nibble = K-half 0, high = K-half 1.
    The kernel therefore computes ``x[:, :K/2] @ W_lo + x[:, K/2:] @ W_hi``
    with two MXU contractions per tile and *no lane interleaving* (the TPU
    analogue of the CUDA kernel's in-register bit shuffling).
  * int8 qweight ``[K, N]`` uint8, single contraction.
  * scales/zeros normalized by the wrapper to ``[K/G_eff, N]`` f32 and passed
    as full-K-rows blocks (N-tiled); the kernel slices the group rows for
    the current K-tile dynamically (Mosaic requires >=8 or full sublane
    blocks, so per-tile scale blocks are not expressible as BlockSpecs).

Grid: ``(M/TM, N/TN, K_packed/TK)``, K innermost ("arbitrary" semantics) with
a float32 VMEM accumulator; dequant runs in the same program as the dot, so
Mosaic overlaps the next tile's DMA with compute (automatic double buffering
for blocked pallas_call operands).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...quantize.qtensor import QuantizedTensor


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_tn(n: int) -> Optional[int]:
    """Feasibility check only — real selection happens in _plan_tiles."""
    for tn in (2048, 1024, 512, 256, 128):
        if n % tn == 0:
            return tn
    return None


_TILE_BYTES_CAP = int(os.environ.get(
    "IWOQ_TILE_BYTES_CAP", str(3 * 2**20)
))  # measured knee: >3MB tiles starve the pipeline; env is a probe knob
# preferred largest K-tile (packed rows); 0 = no preference window (take
# the largest VMEM-feasible divisor).  Round-3 shipped 2048 because the
# 13B kp=6912 whole-K plan e2e-measured badly -- but that window also
# carried the per-call side-pad copy bug, and the clean stacked-rotation
# sweep (scripts/probe_13b_tiles.py, round 4) shows whole-K wins EVERY
# 13B shape: down 571->653 GB/s, gate/up 529->610, qkvo 564->581.  The 7B
# plans are unchanged either way (no mid-range divisors).  Env knob kept
# for sweeps.
_TPK_CAP = int(os.environ.get("IWOQ_TPK_CAP", "0"))

# Small-K-tile shapes (tpk=128: 11008-K down-proj -> 43 odd packed tiles)
# stream measurably faster through the scalar-prefetch grid-spec pipeline
# than the plain grid (30.2 vs 40.8us on 11008x4096 W4 m=8, interleaved
# minima, scripts/probe_prefetch_grid.py); larger-tile shapes do not.  The
# flat entry point re-routes those shapes through the stacked kernel with a
# leading L=1 axis (a free reshape).  Env override for A/B benching.
_PREFETCH_FLAT = os.environ.get("IWOQ_PREFETCH_FLAT", "auto")  # auto|never|always


def _flat_via_prefetch(tpk: int) -> bool:
    if _PREFETCH_FLAT == "never":
        return False
    if _PREFETCH_FLAT == "always":
        return True
    return tpk < 256


# probe-only plan overrides (scripts/probe_narrow_n.py monkeypatches these
# around a fresh trace); production selection stays in _plan_tiles
_FORCE_TN: Optional[int] = None
_FORCE_TPK: Optional[int] = None

# below this packed-weight size a shape is latency-bound and the planner
# deepens the grid to >=8 steps (see _plan_tiles `small` branch)
_SMALL_WEIGHT_BYTES = 4 * 2**20


def _plan_tiles(n: int, kp: int, k: int, rows: int, tm: int, slabs: int,
                abits: Optional[int] = None):
    """Joint (tn, tpk) selection, tuned on the v5e (scripts/probe_tiles.py).

    Measured across LLaMA-7B decode shapes, the HBM stream is maximized by
    the *largest* weight tile that still leaves a >=4-deep grid for Mosaic's
    double buffering, capped at ~3MB (beyond that the two in-flight buffers
    exceed the VMEM the scheduler will pipeline and the stream collapses —
    4096x4096 m=8: tn=1024 -> 578 GB/s vs tn=512 -> 438 and tn=2048 -> 517;
    11008x4096: tn=512 (2.75MB tiles) -> 615 GB/s vs tn=1024 -> 540).
    """
    if _FORCE_TN is not None or _FORCE_TPK is not None:
        forced = _plan_forced(n, kp, k, rows, tm, slabs)
        if forced is not None:
            return forced
    small = kp * n < _SMALL_WEIGHT_BYTES
    best = None
    for tn in (2048, 1024, 512, 256, 128):
        if n % tn != 0:
            continue
        tpk, rs, g_target = _plan_k(kp, rows, k, tn, tm, slabs)
        if small:
            # tiny-weight shapes (e.g. the TP=8 kv projection 8192x256,
            # ~1 MB packed) are latency-bound: a 1-2 step grid never
            # overlaps DMA with compute.  Deepening to >=8 steps measured
            # +11% (334.5 -> 372.8 GB/s, scripts/probe_narrow_n2.py
            # INTERLEAVED windows); on >=4 MB shapes the same deepening
            # is noise-to-negative, so it is gated on total packed bytes.
            g = k // rows if rows > 1 else None
            base = 128
            if g is not None and g > 128:
                base = g if g % 128 == 0 else 128 * g
            while ((n // tn) * (kp // tpk) < 8 and tpk > base
                   and tpk % 2 == 0 and (tpk // 2) % base == 0
                   and kp % (tpk // 2) == 0 and tpk * tn // 2 >= 2**17):
                tpk //= 2
            rs = max(1, tpk // g) if g is not None else 1
            g_target = tpk // rs
        tile_bytes = tpk * tn
        steps = (n // tn) * (kp // tpk)
        est = _vmem_est(tn, tpk, tm, rows, slabs)
        cap = _VMEM_PLAN_CAP
        if abits in (8, 16):
            # int8-activation kernels write f32 outputs: add the delta
            est += tm * tn * 2
        if abits == 16:
            # the 4-plane a16 kernel carries extra Mosaic int8 copies: the
            # a16 wave plan that estimated 13.25 MB allocated 17.54 MB of
            # scoped vmem -- demand a much larger margin (a8 never tripped
            # the scoped limit across four rounds; keep its plans intact)
            cap = 10 * 2**20
        feasible = (tile_bytes <= _TILE_BYTES_CAP and steps >= 4
                    and est <= cap)
        score = (1 if feasible else 0, tile_bytes if feasible else 0, tn)
        if best is None or score > best[0]:
            best = (score, tn, tpk, rs, g_target)
    if best is None:
        return None
    return best[1:]


# the scoped-vmem ceiling the kernel's working set must fit (the v5e scoped
# limit is 16 MB; headroom for Mosaic's own scratch).  The old budget only
# counted qw + x rows and let a 16 GB-K prefill WAVE (tm=256) plan blow the
# scoped limit: OPT-6.7B fc2 (K=16384) under _serve_combo allocated 16.59 MB
# (qw 2 MB x2 buffers + x slabs 2 MB + f32 side blocks 2 MB x2 + acc/out).
# The cap is calibrated against the measured boundary: the 7B down-proj
# wave plan (est 13.2 MB) runs, the OPT fc2 wave plan (est 14.25 MB) OOMs.
_VMEM_PLAN_CAP = 13 * 2**20 + 2**19


def _vmem_est(tn: int, tpk: int, tm: int, rows: int, slabs: int) -> int:
    """Rough working-set estimate for one grid step, double-buffered where
    the index map varies: packed qw tile, x slab blocks, full-row f32 side
    blocks (N-tiled -> rebuffered on j), f32 accumulator, output tile."""
    qw = tpk * tn * 2
    xb = slabs * tm * tpk * 2 * 2
    sides = 2 * (rows + 8) * tn * 4 * 2
    acc = tm * tn * 4
    out = tm * tn * 2 * 2
    return qw + xb + sides + acc + out


def _plan_forced(n: int, kp: int, k: int, rows: int, tm: int, slabs: int):
    tn = _FORCE_TN
    if tn is None or n % tn:
        return None
    tpk = _FORCE_TPK
    g = k // rows if rows > 1 else None
    base = 128
    if g is not None and g > 128:
        base = g if g % 128 == 0 else 128 * g
    if tpk is None or kp % tpk or tpk % base:
        tpk, rs, g_target = _plan_k(kp, rows, k, tn, tm, slabs)
        return tn, tpk, rs, g_target
    rs = max(1, tpk // g) if g is not None else 1
    return tn, tpk, rs, tpk // rs


def _pick_tm(m: int) -> int:
    for tm in (16, 32, 64, 128):
        if m <= tm:
            return tm
    return 256


def _group_accum(acc, x, codes, load_sz, rs: int, g: int, dtype,
                 mult: float = 1.0, zshift: float = 0.0,
                 apply_z: bool = True, load_x=None):
    """Accumulate one K-slab's contribution with scales in the epilogue.

    The dequant product is refactored so the MXU consumes *raw stored codes*
    and all affine correction happens per group on the [TM, TN] output tile:

        sum_k x[m,k] (q[k,n] - z[g,n]) s[g,n]
          = sum_groups (x_g @ v_g) * s * mult - (sum_k x_g[m,k]) s (z - zshift)

    where the stored value v relates to the logical code q by
    ``v = q/mult - zshift/mult`` (packing.py bit twists: the int4 high nibble
    is stored so that its int8 view reads ``16 q - 128`` -> mult=1/16,
    zshift=8).  Per weight element only a mask + cast remain on the VPU; the
    per-element subtract/multiply of naive dequant made the kernel VPU-bound.

    ``load_sz(r)`` loads the (scale, zero) rows for group-row ``r`` of this
    K-slab (kept as a callback so stacked [L, rows, N] side-info refs can be
    indexed the same way as flat [rows, N] ones).

    ``apply_z=False`` skips the affine zero-point correction entirely -- used
    by slabs that carry only PART of each code's bits (the 3-bit kernel's
    MSB plane: the full code is lo + 4*hi, and the single z correction is
    owned by the lo pass).
    """
    int_path = jnp.issubdtype(jnp.dtype(dtype), jnp.integer)
    for r in range(rs):
        qg = codes[r * g : (r + 1) * g, :].astype(dtype)
        xg = x[:, r * g : (r + 1) * g] if load_x is None else load_x(r)
        if int_path:
            # W4A8 / W8A8: int8 x int8 MXU contraction at 2x bf16 rate
            part = jnp.dot(xg, qg, preferred_element_type=jnp.int32).astype(
                jnp.float32
            )
        else:
            part = jnp.dot(xg, qg, preferred_element_type=jnp.float32)
        s, z = load_sz(r)
        s = s.astype(jnp.float32)
        if not apply_z:
            acc = acc + part * (s * mult)
            continue
        if int_path:
            xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True).astype(
                jnp.float32
            )
        else:
            xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        z = z.astype(jnp.float32)
        acc = acc + part * (s * mult) - xsum * (s * (z - zshift))
    return acc


def _group_accum_a16(acc, xa, xb, codes, load_sz, rs: int, g: int,
                     mult: float = 1.0, zshift: float = 0.0,
                     apply_z: bool = True):
    """A16 accumulation: activations as 16-bit fixed point split into two
    int8 planes (``x ~= s_x * (256*xa + xb)``, see ``_prep_x``).

    The weight codes feed the int8 MXU RAW -- zero per-element decode work
    on the weight stream (the i8->bf16 converts of the bf16 path are the
    kernel's VPU bottleneck: cutting them measured +30% at 7B decode shapes,
    scripts/probe_w4_inner.py).  Two int8 contractions per group replace one
    bf16 contraction; the MXU is idle at decode batch sizes, the VPU is not.
    Each int32 partial converts to f32 *before* the 256 recombination --
    dot magnitudes fit int32 (127*128*g_max), the recombined value may not.
    """
    int_sum = lambda m: jnp.sum(m.astype(jnp.int32), axis=1, keepdims=True)
    for r in range(rs):
        qg = codes[r * g : (r + 1) * g, :]
        xag = xa[:, r * g : (r + 1) * g]
        xbg = xb[:, r * g : (r + 1) * g]
        pa = jnp.dot(xag, qg, preferred_element_type=jnp.int32).astype(
            jnp.float32
        )
        pb = jnp.dot(xbg, qg, preferred_element_type=jnp.int32).astype(
            jnp.float32
        )
        part = pa * 256.0 + pb
        s, z = load_sz(r)
        s = s.astype(jnp.float32)
        if not apply_z:
            acc = acc + part * (s * mult)
            continue
        xsum = (int_sum(xag) * 256 + int_sum(xbg)).astype(jnp.float32)
        acc = acc + part * (s * mult) - xsum * (s * (z.astype(jnp.float32) - zshift))
    return acc


def _flat_sz(s_ref, z_ref, srow):
    return lambda r: (s_ref[pl.ds(srow + r, 1), :], z_ref[pl.ds(srow + r, 1), :])


def _int4_body(x_lo_ref, x_hi_ref, qw_ref, sz_lo, sz_hi, o_ref, acc_ref,
               out_dtype, rs):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # one 8-bit-lane mask op per nibble; the stored MSB-flipped high nibble
    # makes i8(qw & 0xF0) == 16*hi - 128 exactly (no shifts, no widening)
    qw = qw_ref[:]
    qw_i8 = jax.lax.bitcast_convert_type(qw, jnp.int8)
    lo = (qw & 0xF).astype(jnp.int8)
    hi = qw_i8 & jnp.int8(-16)
    g = qw.shape[0] // rs
    dtype = x_lo_ref.dtype

    acc = acc_ref[:]
    acc = _group_accum(acc, x_lo_ref[:], lo, sz_lo, rs, g, dtype)
    acc = _group_accum(acc, x_hi_ref[:], hi, sz_hi, rs, g, dtype,
                       mult=1.0 / 16.0, zshift=8.0)
    acc_ref[:] = acc

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _emit():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _int4_kernel(x_lo_ref, x_hi_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref,
                 *, rs: int, nk: int, out_dtype):
    kk = pl.program_id(2)
    _int4_body(x_lo_ref, x_hi_ref, qw_ref,
               _flat_sz(s_ref, z_ref, kk * rs),
               _flat_sz(s_ref, z_ref, (nk + kk) * rs),
               o_ref, acc_ref, out_dtype, rs)


def _int4_kernel_prenorm(x_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref, r_scr,
                         *, rs: int, nk: int, tpk: int, kp: int, eps: float,
                         klog: int, out_dtype):
    """Fused rmsnorm (gamma folded into the weights) + int4 dequant-matmul.

    The XLA rmsnorm ops between Pallas calls measured ~18 us EACH at decode
    (scripts/probe_glue.py -- launch/fusion overhead, not compute: x is
    [8, 4096]).  Here x arrives UN-normalized as one full-K block (tiny:
    tm x K bf16 <= 128 KB VMEM, revisited not re-DMA'd), the row scaler
    r = rsqrt(mean(x^2) + eps) is computed once on the VPU, the MXU
    consumes raw x, and r scales the output tile in the epilogue --
    y = r * (x @ W') is exact because the whole contraction is linear in x.
    The norm weight (gamma) must already be folded into the quantized
    weights (quantize-time transform; see models.llama.fold_llama_norms).
    """
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        xf = x_ref[:].astype(jnp.float32)
        # divide by the LOGICAL K (zero-padded k_pad columns must not
        # dilute the mean)
        ms = jnp.sum(xf * xf, axis=1, keepdims=True) / klog
        r_scr[:, :1] = jax.lax.rsqrt(ms + eps)

    qw = qw_ref[:]
    qw_i8 = jax.lax.bitcast_convert_type(qw, jnp.int8)
    lo = (qw & 0xF).astype(jnp.int8)
    hi = qw_i8 & jnp.int8(-16)
    g = tpk // rs
    dtype = x_ref.dtype

    def load_lo(r):
        return x_ref[:, pl.ds(kk * tpk + r * g, g)]

    def load_hi(r):
        return x_ref[:, pl.ds(kp + kk * tpk + r * g, g)]

    acc = acc_ref[:]
    acc = _group_accum(acc, None, lo, _flat_sz(s_ref, z_ref, kk * rs),
                       rs, g, dtype, load_x=load_lo)
    acc = _group_accum(acc, None, hi, _flat_sz(s_ref, z_ref, (nk + kk) * rs),
                       rs, g, dtype, mult=1.0 / 16.0, zshift=8.0,
                       load_x=load_hi)
    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _emit():
        o_ref[:] = (acc_ref[:] * r_scr[:, :1]).astype(out_dtype)


def _int8_kernel_prenorm(x_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref, r_scr,
                         *, rs: int, tpk: int, eps: float, klog: int, out_dtype):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        xf = x_ref[:].astype(jnp.float32)
        # divide by the LOGICAL K (zero-padded k_pad columns must not
        # dilute the mean)
        ms = jnp.sum(xf * xf, axis=1, keepdims=True) / klog
        r_scr[:, :1] = jax.lax.rsqrt(ms + eps)

    codes = jax.lax.bitcast_convert_type(qw_ref[:], jnp.int8)
    g = tpk // rs

    def load_x(r):
        return x_ref[:, pl.ds(kk * tpk + r * g, g)]

    acc_ref[:] = _group_accum(acc_ref[:], None, codes,
                              _flat_sz(s_ref, z_ref, kk * rs), rs, g,
                              x_ref.dtype, load_x=load_x)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _emit():
        o_ref[:] = (acc_ref[:] * r_scr[:, :1]).astype(out_dtype)


def _int4_kernel_prenorm_pfx(l_ref, *args, **kw):
    del l_ref
    _int4_kernel_prenorm(*args, **kw)


def _int8_kernel_prenorm_pfx(l_ref, *args, **kw):
    del l_ref
    _int8_kernel_prenorm(*args, **kw)


def _int4_kernel_a16(xa_lo, xa_hi, xb_lo, xb_hi, qw_ref, s_ref, z_ref,
                     o_ref, acc_ref, *, rs: int, nk: int, out_dtype):
    """Fused int4 dequant-matmul with A16 split-int8 activations.

    xa_* / xb_* are the hi/lo int8 planes of the fixed-point activations,
    each sliced per packed-K half like the bf16 kernel's x_lo/x_hi."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qw = qw_ref[:]
    qw_i8 = jax.lax.bitcast_convert_type(qw, jnp.int8)
    lo = (qw & 0xF).astype(jnp.int8)
    hi = qw_i8 & jnp.int8(-16)
    g = qw.shape[0] // rs

    acc = acc_ref[:]
    acc = _group_accum_a16(acc, xa_lo[:], xb_lo[:], lo,
                           _flat_sz(s_ref, z_ref, kk * rs), rs, g)
    acc = _group_accum_a16(acc, xa_hi[:], xb_hi[:], hi,
                           _flat_sz(s_ref, z_ref, (nk + kk) * rs), rs, g,
                           mult=1.0 / 16.0, zshift=8.0)
    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _emit():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _int8_kernel_a16(xa_ref, xb_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref,
                     *, rs: int, out_dtype):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes = jax.lax.bitcast_convert_type(qw_ref[:], jnp.int8)
    g = qw_ref.shape[0] // rs
    acc_ref[:] = _group_accum_a16(acc_ref[:], xa_ref[:], xb_ref[:], codes,
                                  _flat_sz(s_ref, z_ref, kk * rs), rs, g)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _emit():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _int3_kernel(*refs, rsa: int, rsb: int, nk: int, out_dtype):
    """Fused 3-bit (s21-packed) dequant-matmul.

    The TPU counterpart of the reference's one native kernel, the 3-bit CUDA
    mat-vec (quant_cuda_kernel.cu:88-165).  refs layout:
      x_a0..x_a3 (4 x-slabs for the 2-bit quads), x_b0..x_b7 (8 x-slabs for
      the MSB plane), qa_ref [tpa, tn], qb_ref [tpb, tn], s_ref, z_ref,
      o_ref, acc_ref.

    Decode algebra (see packing.py s21): code q = f + 4*h with the low
    2-bit field f in A (field j value ``f<<2j``, top field stored flipped so
    ``i8(byte & 0xC0) = 64f - 128``) and MSB h in B (bit i value ``h<<i``,
    bit 7 reading as ``-128h`` through the i8 bitcast).  Every mask result
    feeds the MXU raw; all power-of-two descales and the +2 flip shift fold
    into the per-group epilogue (mult/zshift), and the zero-point correction
    is owned by the A pass (each k appears in exactly one A field).
    """
    xs_a = refs[0:4]
    xs_b = refs[4:12]
    qa_ref, qb_ref, s_ref, z_ref, o_ref, acc_ref = refs[12:18]
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = qa_ref[:]
    a_i8 = jax.lax.bitcast_convert_type(a, jnp.int8)
    b = qb_ref[:]
    b_i8 = jax.lax.bitcast_convert_type(b, jnp.int8)
    ga = a.shape[0] // rsa
    gb = b.shape[0] // rsb
    dtype = xs_a[0].dtype
    acc = acc_ref[:]

    # A: low 2 bits; fields 0-2 unsigned-masked, field 3 via the flip trick
    a_fields = [
        ((a & 0x03).astype(jnp.int8), 1.0, 0.0),
        ((a & 0x0C).astype(jnp.int8), 1.0 / 4.0, 0.0),
        ((a & 0x30).astype(jnp.int8), 1.0 / 16.0, 0.0),
        (a_i8 & jnp.int8(-64), 1.0 / 64.0, 2.0),
    ]
    for j, (codes, mult, zshift) in enumerate(a_fields):
        acc = _group_accum(acc, xs_a[j][:], codes,
                           _flat_sz(s_ref, z_ref, (j * nk + kk) * rsa),
                           rsa, ga, dtype, mult=mult, zshift=zshift)

    # B: MSB plane, logical weight 4; bit 7 reads negative through i8
    for i in range(8):
        if i < 7:
            codes = (b & (1 << i)).astype(jnp.int8)
            mult = 4.0 / (1 << i)
        else:
            codes = b_i8 & jnp.int8(-128)
            mult = -4.0 / 128.0
        acc = _group_accum(acc, xs_b[i][:], codes,
                           _flat_sz(s_ref, z_ref, (i * nk + kk) * rsb),
                           rsb, gb, dtype, mult=mult, apply_z=False)

    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _emit():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _int3_kernel_a16(*refs, rsa: int, rsb: int, nk: int, out_dtype):
    """A16 variant of the s21 3-bit kernel: the 12 masked code arrays are
    already narrow integers, so they feed the int8 MXU raw against the
    split-plane activations.  refs layout: xa_a0..3, xb_a0..3 (hi/lo planes
    for the four 2-bit fields), xa_b0..7, xb_b0..7 (planes for the MSB
    bits), qa, qb, s, z, o, acc; same mult/zshift folding as the bf16
    kernel (``_group_accum_a16`` owns the 256-recombination)."""
    xa_a = refs[0:4]
    xb_a = refs[4:8]
    xa_b = refs[8:16]
    xb_b = refs[16:24]
    qa_ref, qb_ref, s_ref, z_ref, o_ref, acc_ref = refs[24:30]
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = qa_ref[:]
    a_i8 = jax.lax.bitcast_convert_type(a, jnp.int8)
    b = qb_ref[:]
    b_i8 = jax.lax.bitcast_convert_type(b, jnp.int8)
    ga = a.shape[0] // rsa
    gb = b.shape[0] // rsb
    acc = acc_ref[:]

    a_fields = [
        ((a & 0x03).astype(jnp.int8), 1.0, 0.0),
        ((a & 0x0C).astype(jnp.int8), 1.0 / 4.0, 0.0),
        ((a & 0x30).astype(jnp.int8), 1.0 / 16.0, 0.0),
        (a_i8 & jnp.int8(-64), 1.0 / 64.0, 2.0),
    ]
    for j, (codes, mult, zshift) in enumerate(a_fields):
        acc = _group_accum_a16(acc, xa_a[j][:], xb_a[j][:], codes,
                               _flat_sz(s_ref, z_ref, (j * nk + kk) * rsa),
                               rsa, ga, mult=mult, zshift=zshift)

    for i in range(8):
        if i < 7:
            codes = (b & (1 << i)).astype(jnp.int8)
            mult = 4.0 / (1 << i)
        else:
            codes = b_i8 & jnp.int8(-128)
            mult = -4.0 / 128.0
        acc = _group_accum_a16(acc, xa_b[i][:], xb_b[i][:], codes,
                               _flat_sz(s_ref, z_ref, (i * nk + kk) * rsb),
                               rsb, gb, mult=mult, apply_z=False)

    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _emit():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _int3_kernel_a16_pfx(l_ref, *args, **kw):
    del l_ref
    _int3_kernel_a16(*args, **kw)


def _plan_tiles6(n: int, k: int, rows: int, tm: int):
    """(tn, tpb, rs, g_target) for the nq42 fp6 LUT kernel.

    Per grid step the kernel streams two nibble tiles + one quad tile, each
    [tpb, tn] (6 bits/code, vs 8 for the old byte-per-code fp6 storage).
    Same tile policy as _plan_tiles3; tpb tiles the quad array (K/4 rows).
    Layer stacking needs no extra alignment: every block is tpb-sized, so
    the per-layer stride (3*nk blocks) is always integral.
    """
    qb = k // 4
    g = k // rows if rows > 1 else None
    best = None
    for tn in (2048, 1024, 512, 256, 128):
        if n % tn != 0:
            continue
        tpb = 0
        cand = 128
        while cand <= qb:
            if qb % cand == 0 and 3 * cand * tn <= _TILE_BYTES_CAP:
                if g is None or (g <= cand and cand % g == 0) or \
                        (g > cand and g % cand == 0):
                    tpb = cand
            cand += 128
        if not tpb:
            continue
        steps = (n // tn) * (qb // tpb)
        score = (1 if steps >= 4 else 0, 3 * tpb * tn, tn)
        if best is None or score > best[0]:
            best = (score, tn, tpb)
    if best is None:
        return None
    _, tn, tpb = best
    g_target = tpb if g is None else min(g, tpb)
    return tn, tpb, tpb // g_target, g_target


def _layout6_supported(qt: QuantizedTensor, rows: int) -> bool:
    k, n = qt.shape
    k = k + qt.k_pad
    n = n + qt.n_pad
    if k % 4 or (k // 4) % 128:
        return False
    if rows > 1:
        g = k // rows
        # quarter-slab boundaries (multiples of K/4) must be group-aligned
        if g < 32 or g > k // 4 or (k // 4) % g:
            return False
    return _plan_tiles6(n, k, rows, 16) is not None


def _minifloat_decode(codes_i32, exp_bits: int, mant_bits: int, dtype):
    """Exact minifloat decode by f32 bit assembly (formats/minifloat.py
    code_to_float semantics, incl. subnormals).

    The in-kernel realization of the reference's ``deq2`` shared-memory LUT
    (quant_cuda_kernel.cu:185-192): instead of a 16-entry table gather (no
    cheap VMEM gather on the VPU), the float is CONSTRUCTED — sign/exp/mant
    fields shift into IEEE f32 bit positions (32-bit vector shifts are
    native), subnormals take a one-select int->float path.
    """
    bias = (1 << (exp_bits - 1)) - 1
    sign = (codes_i32 >> (exp_bits + mant_bits)) & 1
    expf = (codes_i32 >> mant_bits) & ((1 << exp_bits) - 1)
    mant = codes_i32 & ((1 << mant_bits) - 1)
    normal_bits = (sign << 31) | ((expf - bias + 127) << 23) | (
        mant << (23 - mant_bits)
    )
    normal = jax.lax.bitcast_convert_type(normal_bits, jnp.float32)
    sub = mant.astype(jnp.float32) * (2.0 ** (1 - bias - mant_bits))
    sub = jnp.where(sign == 1, -sub, sub)
    return jnp.where(expf == 0, sub, normal).astype(dtype)


def _lut_a16_mult(fmt) -> Optional[float]:
    """Scale 2**-t of the exact int8 grid for a minifloat format, or None.

    With ``t = mant_bits + bias - 1`` every exact minifloat value (normal
    AND subnormal) satisfies ``value * 2**t == +-(mant_full <<
    (max(exp_field, 1) - 1))`` -- an integer grid.  It fits int8 iff the
    largest code's integer, ``(2**(mant_bits+1) - 1) << (max_exp_field -
    1)``, is <= 127: true for fp4 E2M1 (12) / E1M2 (7) and fp6 E2M3 (60).
    Wide-exponent formats (fp6 E3M2 -> 448, fp8 E4M3 -> 245760) exceed any
    16-bit fixed point -- the dynamic range is the obstruction, not the
    implementation -- and stay on the bf16 LUT path (a16_supported)."""
    top = ((1 << (fmt.mant_bits + 1)) - 1) << max(fmt.max_exp_field - 1, 0)
    if top > 127:
        return None
    return 2.0 ** -(fmt.mant_bits + fmt.bias - 1)


def _minifloat_decode_int(codes_i32, exp_bits: int, mant_bits: int):
    """Integer-grid minifloat decode for the A16 path: the FIGLUT-style
    pre-alignment (SURVEY C7; reference quant_linear.py:19-81 intent) done
    in-register.  Returns int8 values ``round(code_to_float(code) * 2**t)``
    (exact, no rounding, per :func:`_lut_a16_mult`) so the codes feed the
    int8 MXU raw against the split-plane activations."""
    sign = (codes_i32 >> (exp_bits + mant_bits)) & 1
    expf = (codes_i32 >> mant_bits) & ((1 << exp_bits) - 1)
    mant = codes_i32 & ((1 << mant_bits) - 1)
    leading = jnp.where(expf == 0, 0, 1)
    mant_full = (leading << mant_bits) | mant
    ival = mant_full << (jnp.maximum(expf, 1) - 1)
    return jnp.where(sign == 1, -ival, ival).astype(jnp.int8)


def _lut_accum_a16(acc, xa, xb, ivals, load_sz, rs: int, g: int,
                   has_z: bool, mult: float):
    """A16 LUT accumulation: ``w = (ivals * mult) * s (+ z)`` with the
    activations as split int8 planes (``x ~= s_x * (256*xa + xb)``, see
    ``_prep_x``); two int8 MXU contractions per group replace the bf16
    one, exactly as in :func:`_group_accum_a16`."""
    int_sum = lambda m_: jnp.sum(m_.astype(jnp.int32), axis=1, keepdims=True)
    for r in range(rs):
        vg = ivals[r * g : (r + 1) * g, :]
        xag = xa[:, r * g : (r + 1) * g]
        xbg = xb[:, r * g : (r + 1) * g]
        pa = jnp.dot(xag, vg, preferred_element_type=jnp.int32).astype(
            jnp.float32
        )
        pb = jnp.dot(xbg, vg, preferred_element_type=jnp.int32).astype(
            jnp.float32
        )
        part = pa * 256.0 + pb
        s, z = load_sz(r)
        acc = acc + part * (s.astype(jnp.float32) * mult)
        if has_z:
            xsum = (int_sum(xag) * 256 + int_sum(xbg)).astype(jnp.float32)
            acc = acc + xsum * z.astype(jnp.float32)
    return acc


def _lut_accum(acc, x, vals, load_sz, rs: int, g: int, has_z: bool):
    """LUT-mode accumulation: w = vals * s (+ z), so
    ``x @ w = (x @ vals) * s + xsum * z`` per group."""
    for r in range(rs):
        vg = vals[r * g : (r + 1) * g, :]
        xg = x[:, r * g : (r + 1) * g]
        part = jnp.dot(xg, vg, preferred_element_type=jnp.float32)
        s, z = load_sz(r)
        acc = acc + part * s.astype(jnp.float32)
        if has_z:
            xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            acc = acc + xsum * z.astype(jnp.float32)
    return acc


def _lut4_kernel(x_lo_ref, x_hi_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref,
                 *, rs: int, nk: int, out_dtype, exp_bits: int,
                 mant_bits: int, has_z: bool):
    """Fused minifloat (4-bit codes) dequant-matmul: nibble codes -> exact
    float values in-register -> MXU."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qw = qw_ref[:]
    qw_i8 = jax.lax.bitcast_convert_type(qw, jnp.int8)
    # plain unsigned codes: lo nibble direct; hi nibble via the stored
    # MSB-flip (i8(qw & 0xF0) == 16*hi - 128  =>  hi = (v + 128) >> 4)
    lo = (qw & 0xF).astype(jnp.int32)
    hi = ((qw_i8 & jnp.int8(-16)).astype(jnp.int32) + 128) >> 4
    dtype = x_lo_ref.dtype
    g = qw.shape[0] // rs

    acc = acc_ref[:]
    acc = _lut_accum(acc, x_lo_ref[:], _minifloat_decode(lo, exp_bits, mant_bits, dtype),
                     _flat_sz(s_ref, z_ref, kk * rs), rs, g, has_z)
    acc = _lut_accum(acc, x_hi_ref[:], _minifloat_decode(hi, exp_bits, mant_bits, dtype),
                     _flat_sz(s_ref, z_ref, (nk + kk) * rs), rs, g, has_z)
    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _emit():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _lut4_kernel_a16(xa_lo, xa_hi, xb_lo, xb_hi, qw_ref, s_ref, z_ref,
                     o_ref, acc_ref, *, rs: int, nk: int, out_dtype,
                     exp_bits: int, mant_bits: int, has_z: bool,
                     mult: float):
    """Fused minifloat (4-bit codes) dequant-matmul with A16 split-int8
    activations: codes decode to the exact int8 grid (``_minifloat_decode_
    int``) and feed the int8 MXU raw -- FIGLUT-I realized for LUT formats
    (VERDICT r3 weak #6)."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qw = qw_ref[:]
    qw_i8 = jax.lax.bitcast_convert_type(qw, jnp.int8)
    lo = (qw & 0xF).astype(jnp.int32)
    hi = ((qw_i8 & jnp.int8(-16)).astype(jnp.int32) + 128) >> 4
    g = qw.shape[0] // rs

    acc = acc_ref[:]
    acc = _lut_accum_a16(acc, xa_lo[:], xb_lo[:],
                         _minifloat_decode_int(lo, exp_bits, mant_bits),
                         _flat_sz(s_ref, z_ref, kk * rs), rs, g, has_z, mult)
    acc = _lut_accum_a16(acc, xa_hi[:], xb_hi[:],
                         _minifloat_decode_int(hi, exp_bits, mant_bits),
                         _flat_sz(s_ref, z_ref, (nk + kk) * rs), rs, g,
                         has_z, mult)
    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _emit():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _lut4_kernel_a16_pfx(l_ref, *args, **kw):
    del l_ref
    _lut4_kernel_a16(*args, **kw)


def _lut8_kernel(x_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref,
                 *, rs: int, out_dtype, exp_bits: int, mant_bits: int,
                 has_z: bool):
    """Fused minifloat (byte codes: fp6/fp8) dequant-matmul."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # byte layout stores code - 128; undo in i32
    codes = jax.lax.bitcast_convert_type(qw_ref[:], jnp.int8).astype(
        jnp.int32
    ) + 128
    g = qw_ref.shape[0] // rs
    vals = _minifloat_decode(codes, exp_bits, mant_bits, x_ref.dtype)
    acc_ref[:] = _lut_accum(acc_ref[:], x_ref[:], vals,
                            _flat_sz(s_ref, z_ref, kk * rs), rs, g, has_z)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _emit():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _lut6_kernel(x0_ref, x1_ref, x2_ref, x3_ref, qa0_ref, qa1_ref, qb_ref,
                 s_ref, z_ref, o_ref, acc_ref, *, rs: int, nk: int,
                 out_dtype, exp_bits: int, mant_bits: int, has_z: bool):
    """Fused fp6 (nq42 sub-byte) dequant-matmul: 6-bit codes assembled from
    the nibble tile (low 4 bits, int4-style MSB-flip pairing) and the quad
    tile (high 2 bits, widened to i32 before the shift -- the v5e VPU has no
    8-bit shifts, but i8->i32 converts and 32-bit shifts are native), then
    exact minifloat decode -> MXU.  Streams 6 bits/code vs the old
    byte-per-code fp6 storage's 8 (VERDICT r2 item 8).

    Quarter j of the K range takes its x slab x{j}_ref, its low nibbles from
    qa0 (j=0,2) or qa1 (j=1,3) at the nibble position j//2, and its high
    2 bits from quad field j.
    """
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a0, a1 = qa0_ref[:], qa1_ref[:]
    b_i32 = jax.lax.bitcast_convert_type(qb_ref[:], jnp.int8).astype(jnp.int32)
    g = qb_ref.shape[0] // rs
    xs = (x0_ref, x1_ref, x2_ref, x3_ref)
    dtype = x0_ref.dtype

    def lo_nib(a):
        return (a & 0xF).astype(jnp.int32)

    def hi_nib(a):
        ai8 = jax.lax.bitcast_convert_type(a, jnp.int8)
        # stored flipped: i8(byte & 0xF0) == 16*nib - 128
        return ((ai8 & jnp.int8(-16)).astype(jnp.int32) + 128) >> 4

    lows = (lo_nib(a0), lo_nib(a1), hi_nib(a0), hi_nib(a1))
    acc = acc_ref[:]
    for j in range(4):
        # (x - 256) >> s has the same low bits as x >> s for s <= 6, so the
        # sign extension of the i8 view never corrupts the 2-bit field
        hi = (b_i32 >> (2 * j)) & 3
        vals = _minifloat_decode(lows[j] | (hi << 4), exp_bits, mant_bits,
                                 dtype)
        acc = _lut_accum(acc, xs[j][:], vals,
                         _flat_sz(s_ref, z_ref, (j * nk + kk) * rs),
                         rs, g, has_z)
    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _emit():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _lut6_kernel_pfx(l_ref, *args, **kw):
    del l_ref
    _lut6_kernel(*args, **kw)


def _lut6_kernel_a16(xa0, xa1, xa2, xa3, xb0, xb1, xb2, xb3,
                     qa0_ref, qa1_ref, qb_ref, s_ref, z_ref, o_ref, acc_ref,
                     *, rs: int, nk: int, out_dtype, exp_bits: int,
                     mant_bits: int, has_z: bool, mult: float):
    """A16 variant of the nq42 fp6 kernel (fp6 E2M3 only -- the one fp6
    split whose value grid fits int8, see ``_lut_a16_mult``): same code
    assembly as :func:`_lut6_kernel`, integer-grid decode, int8 MXU."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a0, a1 = qa0_ref[:], qa1_ref[:]
    b_i32 = jax.lax.bitcast_convert_type(qb_ref[:], jnp.int8).astype(jnp.int32)
    g = qb_ref.shape[0] // rs
    xas = (xa0, xa1, xa2, xa3)
    xbs = (xb0, xb1, xb2, xb3)

    def lo_nib(a):
        return (a & 0xF).astype(jnp.int32)

    def hi_nib(a):
        ai8 = jax.lax.bitcast_convert_type(a, jnp.int8)
        return ((ai8 & jnp.int8(-16)).astype(jnp.int32) + 128) >> 4

    lows = (lo_nib(a0), lo_nib(a1), hi_nib(a0), hi_nib(a1))
    acc = acc_ref[:]
    for j in range(4):
        hi = (b_i32 >> (2 * j)) & 3
        ivals = _minifloat_decode_int(lows[j] | (hi << 4), exp_bits,
                                      mant_bits)
        acc = _lut_accum_a16(acc, xas[j][:], xbs[j][:], ivals,
                             _flat_sz(s_ref, z_ref, (j * nk + kk) * rs),
                             rs, g, has_z, mult)
    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _emit():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _lut6_kernel_a16_pfx(l_ref, *args, **kw):
    del l_ref
    _lut6_kernel_a16(*args, **kw)


def _call_lut6(x2, qt, m_pad, tm, n, k, rows, out_dtype, interpret,
               layer_idx=None):
    """pallas_call plumbing for the nq42 fp6 kernel: the packed array is
    passed three times (two nibble-row views + the quad-row view) and x four
    times (one slab per K quarter); index maps select the slices, so HBM
    still streams each byte exactly once.  ``layer_idx`` switches to the
    layer-stacked scalar-prefetch variant."""
    stacked = layer_idx is not None
    a16 = isinstance(x2, tuple)
    tn, tpb, rs, g_target = _plan_tiles6(n, k, rows, tm)
    qb = k // 4
    nk = qb // tpb
    axis = 1 if stacked else 0
    scales = _normalize_side(qt.scales, k, n, g_target, axis=axis)
    has_z = qt.zeros is not None
    zeros = _normalize_side(qt.zeros if has_z else qt.scales, k, n, g_target,
                            axis=axis)
    srows = scales.shape[axis]
    fmt = qt.spec.float_format

    grid = (m_pad // tm, n // tn, nk)
    common = _common_params(tm, tn, m_pad, n, k, 3 * qb, srows, out_dtype,
                            interpret, index_prefix=1 if stacked else 0)
    if a16:
        kernel = functools.partial(
            _lut6_kernel_a16_pfx if stacked else _lut6_kernel_a16,
            rs=rs, nk=nk, out_dtype=out_dtype,
            exp_bits=fmt.exp_bits, mant_bits=fmt.mant_bits, has_z=has_z,
            mult=_lut_a16_mult(fmt))
    else:
        kernel = functools.partial(
            _lut6_kernel_pfx if stacked else _lut6_kernel,
            rs=rs, nk=nk, out_dtype=out_dtype,
            exp_bits=fmt.exp_bits, mant_bits=fmt.mant_bits, has_z=has_z)

    def x_operands():
        if not a16:
            return [x2] * 4
        xa, xb = x2
        return [xa] * 4 + [xb] * 4

    def x_specs(x_spec):
        specs = [x_spec(j) for j in range(4)]
        return specs + specs if a16 else specs

    if not stacked:
        side_spec = pl.BlockSpec((srows, tn), lambda i, j, kk: (0, j))

        def x_spec(j):
            return pl.BlockSpec((tm, tpb),
                                lambda i, _j, kk, s=j * nk: (i, s + kk))

        a0_spec = pl.BlockSpec((tpb, tn), lambda i, j, kk: (kk, j))
        a1_spec = pl.BlockSpec((tpb, tn), lambda i, j, kk, s=nk: (s + kk, j))
        b_spec = pl.BlockSpec((tpb, tn),
                              lambda i, j, kk, s=2 * nk: (s + kk, j))
        in_specs = (x_specs(x_spec)
                    + [a0_spec, a1_spec, b_spec, side_spec, side_spec])
        operands = x_operands() + [qt.qweight] * 3 + [scales, zeros]
        return pl.pallas_call(kernel, grid=grid, in_specs=in_specs,
                              **common)(*operands)

    # stacked: flatten [L, 3K/4, N] -> 2-D; every block is tpb-sized so the
    # per-layer stride is 3*nk blocks, always integral
    qw2 = qt.qweight.reshape(-1, qt.qweight.shape[-1])
    srows_p = _ceil_to(srows, 8)
    if srows_p != srows:
        pad = ((0, 0), (0, srows_p - srows), (0, 0))
        scales = jnp.pad(scales, pad)
        zeros = jnp.pad(zeros, pad)
    scales2 = scales.reshape(-1, scales.shape[-1])
    zeros2 = zeros.reshape(-1, zeros.shape[-1])
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    side_spec = pl.BlockSpec((srows_p, tn), lambda i, j, kk, l: (l[0], j))

    def x_spec(j):
        return pl.BlockSpec((tm, tpb),
                            lambda i, _j, kk, l, s=j * nk: (i, s + kk))

    a0_spec = pl.BlockSpec(
        (tpb, tn), lambda i, j, kk, l, s=3 * nk: (l[0] * s + kk, j))
    a1_spec = pl.BlockSpec(
        (tpb, tn), lambda i, j, kk, l, s=3 * nk: (l[0] * s + nk + kk, j))
    b_spec = pl.BlockSpec(
        (tpb, tn), lambda i, j, kk, l, s=3 * nk: (l[0] * s + 2 * nk + kk, j))
    in_specs = (x_specs(x_spec)
                + [a0_spec, a1_spec, b_spec, side_spec, side_spec])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=common.pop("out_specs"),
        scratch_shapes=common.pop("scratch_shapes"),
    )
    common.pop("cost_estimate", None)
    operands = x_operands() + [qw2] * 3 + [scales2, zeros2]
    return pl.pallas_call(kernel, grid_spec=grid_spec, **common)(
        lidx, *operands)


def _int8_body(x_ref, qw_ref, sz, o_ref, acc_ref, out_dtype, rs):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # byte codes are stored as two's-complement (code - 128) with shifted
    # zero-points, so a bare bitcast is the whole unpack
    codes = jax.lax.bitcast_convert_type(qw_ref[:], jnp.int8)
    g = qw_ref.shape[0] // rs
    acc_ref[:] = _group_accum(acc_ref[:], x_ref[:], codes, sz, rs, g,
                              x_ref.dtype)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _emit():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _int8_kernel(x_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref,
                 *, rs: int, out_dtype):
    kk = pl.program_id(2)
    _int8_body(x_ref, qw_ref, _flat_sz(s_ref, z_ref, kk * rs), o_ref,
               acc_ref, out_dtype, rs)


def _plan_tiles3(n: int, k: int, rows: int, tm: int, stacked: bool = False):
    """(tn, tpb, rsa, rsb, g_target) for the s21 3-bit kernel.

    tpb tiles the MSB plane (K/8 rows); the 2-bit array tile is 2*tpb.  Same
    policy as _plan_tiles: largest tile under the VMEM knee with a >=4-deep
    grid.  Returns None when no feasible plan exists (caller falls back).

    ``stacked``: the layer-stacked variant flattens [L, 3K/8, N] to 2-D and
    folds the layer offset into BlockSpec row indices; the A view's layer
    stride in (2*tpb)-row block units is 3*nk/2, so nk = (K/8)/tpb must be
    EVEN for every layer to start block-aligned.
    """
    qb = k // 8
    g = k // rows if rows > 1 else None
    best = None
    for tn in (2048, 1024, 512, 256, 128):
        if n % tn != 0:
            continue
        # largest 128-multiple tpb dividing qb, group-aligned, under the cap
        tpb = 0
        cand = 128
        while cand <= qb:
            if qb % cand == 0 and 3 * cand * tn <= _TILE_BYTES_CAP:
                if (g is None or (g <= cand and cand % g == 0)
                        or (g > cand and g % cand == 0)) and (
                        not stacked or (qb // cand) % 2 == 0):
                    tpb = cand
            cand += 128
        if not tpb:
            continue
        steps = (n // tn) * (qb // tpb)
        feasible = steps >= 4
        score = (1 if feasible else 0, 3 * tpb * tn, tn)
        if best is None or score > best[0]:
            best = (score, tn, tpb)
    if best is None:
        return None
    _, tn, tpb = best
    g_target = tpb if g is None else min(g, tpb)
    return tn, tpb, (2 * tpb) // g_target, tpb // g_target, g_target


def _layout3_supported(qt: QuantizedTensor, rows: int,
                       stacked: bool = False) -> bool:
    k, n = qt.shape
    k = k + qt.k_pad
    n = n + qt.n_pad
    if k % 8 or (k // 8) % 128:
        return False
    if rows > 1:
        g = k // rows
        # slab boundaries (multiples of K/8) must be group-aligned
        if g < 32 or g > k // 8 or (k // 8) % g:
            return False
    return _plan_tiles3(n, k, rows, 16, stacked=stacked) is not None


def _storage_layout_bits(qt: QuantizedTensor) -> int:
    """Packed storage width (codes/byte layout), distinct from logical bits:
    lut-mode fp6 packs 6 bits/code via the nq42 (nibble+quad) split."""
    if qt.mode == "lut":
        from ..qmatmul import packed_bits

        return packed_bits(qt)
    return qt.spec.storage_bits


def _layout_supported(qt: QuantizedTensor, rows: int) -> bool:
    if qt.mode == "affine":
        if qt.spec.fmt not in ("int", "bfp"):
            return False
    elif qt.mode == "lut":
        # exact minifloat decodes by bit assembly in-kernel; the approximate
        # (aligned) codebooks are not bit-constructible -> XLA path
        if qt.spec.fmt != "fp" or qt.spec.approximate:
            return False
    else:
        return False
    if qt.k_shards > 1:
        return False  # global view of a row-sharded artifact: XLA path
    # Mosaic cannot lower the single-group-row dynamic side-info loads for
    # 16-bit dtypes (16-bit sublanes pack 2 logical rows per physical one;
    # "cannot statically prove index is a multiple of 8", measured on v5e):
    # 16-bit side artifacts take the XLA path.  NOTES.md has the packed
    # bf16-pair-in-int32 design that would lift this.
    if qt.scales.dtype.itemsize != 4:
        return False
    if qt.zeros is not None and qt.zeros.dtype.itemsize != 4:
        return False
    bits = _storage_layout_bits(qt)
    if bits == 3:
        return _layout3_supported(qt, rows, stacked=qt.qweight.ndim == 3)
    if bits == 6:
        return _layout6_supported(qt, rows)
    if bits not in (4, 8):
        return False
    k, n = qt.shape
    k = k + qt.k_pad
    n = n + qt.n_pad
    if _pick_tn(n) is None:
        return False
    kp = k // 2 if bits == 4 else k
    if kp % 128 != 0:
        return False
    if rows > 1:
        g = k // rows
        if g < 32:
            return False
        if g <= kp:
            if kp % g != 0:
                return False
        elif g % kp != 0:
            return False
    return True


def kernel_supported(qt: QuantizedTensor) -> bool:
    return qt.qweight.ndim == 2 and _layout_supported(qt, qt.scales.shape[0])


def a16_supported(qt: QuantizedTensor) -> bool:
    """Whether the split-int8-plane A16 activation path exists for this
    artifact's format.  Affine kernels (int4/int8/3-bit) always qualify;
    LUT minifloats qualify when their exact value grid fits int8 after the
    FIGLUT-style ``2**t`` pre-alignment (fp4 E2M1/E1M2, fp6 E2M3 -- see
    :func:`_lut_a16_mult`).  Wide-exponent LUT formats (fp6 E3M2, fp8)
    exceed ANY 16-bit fixed-point grid -- a dynamic-range obstruction, not
    a missing kernel -- and degrade to full-precision activations with a
    warning."""
    if qt.mode == "lut":
        if _storage_layout_bits(qt) not in (4, 6):
            return False
        return _lut_a16_mult(qt.spec.float_format) is not None
    return True


def kernel_supported_stacked(qt: QuantizedTensor) -> bool:
    """Supported-check for a layer-stacked artifact ([L, ...] arrays)."""
    return qt.qweight.ndim == 3 and _layout_supported(
        qt, qt.scales.shape[1] - qt.side_pad)


def _normalize_side(side: jnp.ndarray, k: int, n: int, g_target: int,
                    axis: int = 0) -> jnp.ndarray:
    """scales/zeros of any stored granularity -> [K/g_target, N].

    Storage dtype is preserved (16-bit side info halves its HBM stream --
    the kernel upcasts to f32 in the epilogue); ``axis=1`` handles
    layer-stacked side info ``[L, rows, N]``.
    """
    rows = k // g_target
    if side.shape[axis] == rows and side.shape[-1] == n:
        return side
    if side.shape[axis] == 1:
        tgt = list(side.shape)
        tgt[axis] = rows
        tgt[-1] = n
        return jnp.broadcast_to(side, tuple(tgt))
    g_have = k // side.shape[axis]
    if g_have % g_target == 0:
        return jnp.repeat(side, g_have // g_target, axis=axis)
    raise ValueError(f"incompatible group layout {side.shape} for K={k}")


def _plan_k(kp: int, rows: int, k: int, tn: int, tm: int, slabs: int):
    """Choose packed-K tile size and per-tile scale-row count.

    Large K-tiles matter far more than anything inside the kernel: at
    tpk=128 even a plain bf16 pallas matmul runs at ~270 GB/s on v5e while
    tpk>=512 approaches roofline (NOTES.md).  So: take the *largest* tpk
    that (a) divides the packed K extent, (b) is a multiple of both the
    group span and the 128-lane x-block alignment, and (c) keeps the
    double-buffered working set within VMEM.  Groups smaller than the tile
    are handled by slicing ``rs`` group rows per tile.
    """
    g = k // rows if rows > 1 else None
    base = 128
    if g is not None and g > 128:
        base = g if g % 128 == 0 else 128 * g  # g not 128-aligned: lcm-ish
    # bytes per packed-K row in VMEM: qw tile + x slab tiles (bf16), double
    # buffered; leave room for acc/scales/output
    per_row = tn + slabs * tm * 2
    budget_rows = (10 * 1024 * 1024) // (2 * per_row)
    # prefer tpk in [256, 2048], the e2e-validated sweet spot: 13B-shape
    # kp=6912 otherwise planned tpk=6912/tn=256 tiles (rs=54, narrow
    # strided DMA; the scan bench read 3.3x the weight-stream floor).  But
    # only when such a divisor EXISTS: 7B-shape kp=5504 = 128*43 offers
    # nothing between 128 and 5504, and forcing 128 regressed the 7B
    # headline 186 -> 235 us/layer -- keep the uncapped pick there.
    limit = min(kp, budget_rows)
    cap = min(limit, max(base, _TPK_CAP)) if _TPK_CAP else limit
    tpk = tpk_capped = base
    cand = base
    while cand <= limit:
        if kp % cand == 0:
            tpk = cand
            if cand <= cap:
                tpk_capped = cand
        cand += base
    if _TPK_CAP and tpk_capped >= 256:
        tpk = tpk_capped
    rs = max(1, tpk // g) if g is not None else 1
    g_target = tpk // rs
    return tpk, rs, g_target


def _prep_x(x: jnp.ndarray, k: int, activation_bits: Optional[int]):
    """Flatten x to [M, K], optionally row-quantize, pad M to a tile.

    ``activation_bits=8``: absmax int8 rows (W4A8/W8A8, ~2^-7 row-relative
    activation error).  ``activation_bits=16``: 16-bit fixed-point rows split
    into two int8 planes (``x ~= s_x * (256*hi + lo)``, ~2^-15 row-relative
    error -- below bf16's own 2^-8 significand at the row max, so serving
    quality is unchanged), the TPU realization of the reference's FIGLUT-I
    per-row exponent-aligned fixed-point intent (quant_linear.py:19-81,
    MANTISSA_BITS=12; here 16).  Both return int8 operands so weight codes
    feed the MXU raw.  16 returns ``x2`` as an (xa, xb) tuple.
    """
    x2 = x.reshape(-1, k)
    m = x2.shape[0]

    out_scale = None
    if activation_bits == 8:
        sx = jnp.clip(jnp.max(jnp.abs(x2.astype(jnp.float32)), axis=1,
                              keepdims=True), 1e-8, None) / 127.0
        x2 = jnp.clip(jnp.round(x2.astype(jnp.float32) / sx), -127, 127).astype(
            jnp.int8
        )
        out_scale = sx
    elif activation_bits == 16:
        # 32512 = 127*256: keeps hi in [-127, 127] after round-half-up split
        xf = x2.astype(jnp.float32)
        sx = jnp.clip(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                      1e-8, None) / 32512.0
        xi = jnp.round(xf / sx).astype(jnp.int32)
        hi = (xi + 128) >> 8
        lo = xi - (hi << 8)  # in [-128, 127]
        x2 = (hi.astype(jnp.int8), lo.astype(jnp.int8))
        out_scale = sx
    elif activation_bits is not None:
        raise NotImplementedError("activation_bits must be None, 8, or 16")

    tm = _pick_tm(m)
    if activation_bits in (8, 16):
        tm = max(tm, 32)  # int8 min sublane tile
    m_pad = _ceil_to(m, tm)
    if m_pad != m:
        if activation_bits == 16:
            x2 = tuple(jnp.pad(p, ((0, m_pad - m), (0, 0))) for p in x2)
        else:
            x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    out_dtype = jnp.float32 if activation_bits in (8, 16) else x.dtype
    return x2, m, m_pad, tm, out_dtype, out_scale


def _pad_x_k(x2, k_pad: int):
    """Zero-pad the activation K columns to the artifact's stored K."""
    pad = lambda a: jnp.pad(a, ((0, 0), (0, k_pad)))
    return tuple(pad(p) for p in x2) if isinstance(x2, tuple) else pad(x2)


def _finish(out, x, qt, m, m_pad, out_scale):
    n_logical = qt.shape[1]
    if m_pad != m:
        out = out[:m]
    if qt.n_pad:
        out = out[:, :n_logical]
    if out_scale is not None:
        out = (out * out_scale).astype(x.dtype)
    return out.reshape(x.shape[:-1] + (n_logical,))


def _common_params(tm, tn, m_pad, n, k, kp, srows, out_dtype, interpret,
                   index_prefix: int = 0):
    """Shared pallas_call kwargs.  ``index_prefix=1`` for scalar-prefetch
    variants whose index maps take the layer ref as a trailing arg."""
    if index_prefix:
        out_spec = pl.BlockSpec((tm, tn), lambda i, j, kk, l: (i, j))
    else:
        out_spec = pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j))
    return dict(
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=kp * n + m_pad * k * 2 + m_pad * n * 2 + srows * n * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )


def _int3_kernel_pfx(l_ref, *args, **kw):
    del l_ref  # consumed by the index maps only
    _int3_kernel(*args, **kw)


def _call_int3(x2, qt, m_pad, tm, n, k, rows, out_dtype, interpret,
               layer_idx=None):
    """pallas_call plumbing for the s21 3-bit kernel: the packed array is
    passed twice (A-rows view + B-rows view) and x twelve times (one slab
    per 2-bit field and per MSB bit) -- index maps select the slices, so
    HBM still streams each byte exactly once.

    ``layer_idx`` switches to the layer-stacked (scalar-prefetch) variant:
    qweight [L, 3K/8, N] flattens to 2-D and the layer offset folds into the
    weight/side row indices (same scheme as the int4/int8 stacked kernels;
    70B/80-layer scan serving keeps the fused 3-bit win, VERDICT r2 item 4).
    """
    stacked = layer_idx is not None
    a16 = isinstance(x2, tuple)
    tn, tpb, rsa, rsb, g_target = _plan_tiles3(n, k, rows, tm,
                                               stacked=stacked)
    tpa = 2 * tpb
    qb = k // 8
    nk = qb // tpb
    axis = 1 if stacked else 0
    scales = _normalize_side(qt.scales, k, n, g_target, axis=axis)
    zeros = _normalize_side(qt.zeros, k, n, g_target, axis=axis)
    srows = scales.shape[axis]

    grid = (m_pad // tm, n // tn, nk)
    common = _common_params(tm, tn, m_pad, n, k, 3 * qb, srows, out_dtype,
                            interpret, index_prefix=1 if stacked else 0)
    if a16:
        kernel = functools.partial(
            _int3_kernel_a16_pfx if stacked else _int3_kernel_a16,
            rsa=rsa, rsb=rsb, nk=nk, out_dtype=out_dtype)
    else:
        kernel = functools.partial(
            _int3_kernel_pfx if stacked else _int3_kernel,
            rsa=rsa, rsb=rsb, nk=nk, out_dtype=out_dtype)

    def x_operands():
        # bf16: one x per slab; a16: hi/lo planes per slab (kernel layout
        # xa_a0..3, xb_a0..3, xa_b0..7, xb_b0..7)
        if not a16:
            return [x2] * 12
        xa, xb = x2
        return [xa] * 4 + [xb] * 4 + [xa] * 8 + [xb] * 8

    def x_specs(a_spec, b_spec):
        a_specs = [a_spec(j) for j in range(4)]
        b_specs = [b_spec(i) for i in range(8)]
        if not a16:
            return a_specs + b_specs
        return a_specs + a_specs + b_specs + b_specs

    if not stacked:
        side_spec = pl.BlockSpec((srows, tn), lambda i, j, kk: (0, j))

        def a_spec(j):
            # x block row (in tpa units) for 2-bit field j: j*(K/4)/tpa + kk
            return pl.BlockSpec((tm, tpa),
                                lambda i, _j, kk, s=j * nk: (i, s + kk))

        def b_spec(i_slab):
            return pl.BlockSpec((tm, tpb),
                                lambda i, _j, kk, s=i_slab * nk: (i, s + kk))

        wa_spec = pl.BlockSpec((tpa, tn), lambda i, j, kk: (kk, j))
        wb_spec = pl.BlockSpec((tpb, tn),
                               lambda i, j, kk, s=(k // 4) // tpb: (s + kk, j))
        in_specs = (x_specs(a_spec, b_spec)
                    + [wa_spec, wb_spec, side_spec, side_spec])
        operands = x_operands() + [qt.qweight, qt.qweight, scales, zeros]
        return pl.pallas_call(kernel, grid=grid, in_specs=in_specs,
                              **common)(*operands)

    # ---- stacked: flatten [L, 3K/8, N] -> [L*3K/8, N]; layer l's A rows
    # start at block l*(3*nk/2) (tpa units, nk even by plan), its B rows at
    # block l*3*nk + 2*nk (tpb units).  Side rows pad to a sublane multiple
    # per layer, exactly like the int4/int8 stacked path.
    qw2 = qt.qweight.reshape(-1, qt.qweight.shape[-1])
    srows_p = _ceil_to(srows, 8)
    if srows_p != srows:
        pad = ((0, 0), (0, srows_p - srows), (0, 0))
        scales = jnp.pad(scales, pad)
        zeros = jnp.pad(zeros, pad)
    scales2 = scales.reshape(-1, scales.shape[-1])
    zeros2 = zeros.reshape(-1, zeros.shape[-1])
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    side_spec = pl.BlockSpec((srows_p, tn), lambda i, j, kk, l: (l[0], j))

    def a_spec(j):
        return pl.BlockSpec((tm, tpa),
                            lambda i, _j, kk, l, s=j * nk: (i, s + kk))

    def b_spec(i_slab):
        return pl.BlockSpec((tm, tpb),
                            lambda i, _j, kk, l, s=i_slab * nk: (i, s + kk))

    wa_spec = pl.BlockSpec(
        (tpa, tn), lambda i, j, kk, l, s=(3 * nk) // 2: (l[0] * s + kk, j))
    wb_spec = pl.BlockSpec(
        (tpb, tn), lambda i, j, kk, l, s=3 * nk: (l[0] * s + 2 * nk + kk, j))
    in_specs = (x_specs(a_spec, b_spec)
                + [wa_spec, wb_spec, side_spec, side_spec])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=common.pop("out_specs"),
        scratch_shapes=common.pop("scratch_shapes"),
    )
    # CostEstimate on a PrefetchScalarGridSpec kills DMA overlap (NOTES.md)
    common.pop("cost_estimate", None)
    operands = x_operands() + [qw2, qw2, scales2, zeros2]
    return pl.pallas_call(kernel, grid_spec=grid_spec, **common)(
        lidx, *operands)


def prenorm_supported(qt: QuantizedTensor) -> bool:
    """Whether the in-kernel rmsnorm (pre_norm) path exists for this
    artifact (affine int4/int8 kernels, flat or stacked)."""
    return qt.mode == "affine" and _storage_layout_bits(qt) in (4, 8)


def _rms_nogamma(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Fallback rmsnorm WITHOUT a weight (gamma already folded into the
    quantized weights) for paths with no in-kernel pre-norm."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps)).astype(x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "activation_bits",
                                    "pre_norm"))
def fused_quantized_matmul(
    x: jnp.ndarray, qt: QuantizedTensor, interpret: bool = False,
    activation_bits: Optional[int] = None,
    pre_norm: Optional[float] = None,
) -> jnp.ndarray:
    """``y = x @ dequant(qt)``; x: [..., K].

    ``activation_bits=8`` enables the W4A8/W8A8 path: activations are
    dynamically quantized per row (absmax int8) and the MXU runs int8 x int8
    contractions at twice the bf16 rate; the per-row scale is applied to the
    output.  Changes numerics (~0.3% activation quant error) -- opt-in.

    ``pre_norm`` (the rms eps) fuses a weightless rmsnorm into the kernel:
    x arrives un-normalized, ``r = rsqrt(mean(x^2)+eps)`` is computed on the
    VPU and scales the output tile in the epilogue.  The norm gamma must be
    folded into the weights (fold_llama_norms).  The two XLA rmsnorms
    between kernel calls measured ~37 us/layer of decode (probe_glue.py).
    """
    bits = _storage_layout_bits(qt)
    lut = qt.mode == "lut"
    if pre_norm is not None and (activation_bits is not None
                                 or not prenorm_supported(qt)):
        # unsupported combination: normalize in XLA and continue plain
        x = _rms_nogamma(x, pre_norm)
        pre_norm = None
    if activation_bits == 16 and not a16_supported(qt):
        # the split-plane path exists for the int4/int8 kernels only; a16 is
        # an engine-wide serving default, so degrade to full-precision
        # activations rather than crash on other formats.  Surfaced (not
        # silent): one trace-time warning per program.
        import warnings

        warnings.warn(
            f"activation_bits=16 is unsupported for "
            f"{'lut' if lut else 'affine'}/{bits}-bit artifacts; running this "
            "matmul with full-precision activations",
            stacklevel=2,
        )
        activation_bits = None
    if lut and activation_bits == 8:
        raise NotImplementedError("int8 activations with LUT artifacts")
    k, n_logical = qt.shape
    n = n_logical + qt.n_pad  # stored width

    # small-K-tile shapes run faster through the scalar-prefetch pipeline:
    # re-route via the stacked kernel with a leading L=1 axis (free reshape)
    if (not lut and qt.mode == "affine" and qt.qweight.ndim == 2
            and qt.spec.storage_bits in (4, 8) and qt.zeros is not None):
        ks = k + qt.k_pad
        kp0 = ks // 2 if qt.spec.storage_bits == 4 else ks
        m0 = 1
        for d in x.shape[:-1]:
            m0 *= d
        tm0 = max(_pick_tm(m0), 32) if activation_bits in (8, 16) else _pick_tm(m0)
        plan0 = _plan_tiles(n, kp0, ks, qt.scales.shape[0], tm0,
                            slabs=2 if qt.spec.storage_bits == 4 else 1,
                            abits=activation_bits)
        if plan0 is not None and _flat_via_prefetch(plan0[1]):
            qt1 = jax.tree.map(lambda a: a[None], qt)
            return fused_quantized_matmul_stacked.__wrapped__(
                x, qt1, jnp.asarray(0, jnp.int32), interpret, activation_bits,
                pre_norm,
            )

    x2, m, m_pad, tm, out_dtype, out_scale = _prep_x(x, k, activation_bits)
    if qt.k_pad:
        # stored K is padded (whole zero groups); zero-pad x to match so the
        # padded rows contribute exactly 0 (pad AFTER activation quant so
        # row absmax scales see only real columns)
        x2 = _pad_x_k(x2, qt.k_pad)
        k = k + qt.k_pad

    rows = qt.scales.shape[0]
    if bits == 3:
        out = _call_int3(x2, qt, m_pad, tm, n, k, rows, out_dtype, interpret)
        return _finish(out, x, qt, m, m_pad, out_scale)
    if bits == 6:
        out = _call_lut6(x2, qt, m_pad, tm, n, k, rows, out_dtype, interpret)
        return _finish(out, x, qt, m, m_pad, out_scale)
    kp = k // 2 if bits == 4 else k
    tn, tpk, rs, g_target = _plan_tiles(n, kp, k, rows, tm,
                                        slabs=2 if bits == 4 else 1,
                                        abits=activation_bits)
    nk = kp // tpk
    scales = _normalize_side(qt.scales, k, n, g_target)
    has_z = qt.zeros is not None
    zeros = _normalize_side(qt.zeros if has_z else qt.scales, k, n, g_target)
    srows = scales.shape[0]

    grid = (m_pad // tm, n // tn, nk)
    common = _common_params(tm, tn, m_pad, n, k, kp, srows, out_dtype, interpret)
    side_spec = pl.BlockSpec((srows, tn), lambda i, j, kk: (0, j))

    side_ops = [scales, zeros]
    side_specs = [side_spec, side_spec]

    if lut:
        fmt = qt.spec.float_format
        if bits == 4:
            lo_spec = pl.BlockSpec((tm, tpk), lambda i, j, kk: (i, kk))
            hi_spec = pl.BlockSpec((tm, tpk),
                                   lambda i, j, kk, _nk=nk: (i, _nk + kk))
            w_spec = pl.BlockSpec((tpk, tn), lambda i, j, kk: (kk, j))
            if activation_bits == 16:
                xa, xb = x2
                kernel = functools.partial(
                    _lut4_kernel_a16, rs=rs, nk=nk, out_dtype=out_dtype,
                    exp_bits=fmt.exp_bits, mant_bits=fmt.mant_bits,
                    has_z=has_z, mult=_lut_a16_mult(fmt))
                out = pl.pallas_call(
                    kernel,
                    grid=grid,
                    in_specs=[lo_spec, hi_spec, lo_spec, hi_spec, w_spec,
                              *side_specs],
                    **common,
                )(xa, xa, xb, xb, qt.qweight, *side_ops)
                return _finish(out, x, qt, m, m_pad, out_scale)
            kernel = functools.partial(
                _lut4_kernel, rs=rs, nk=nk, out_dtype=out_dtype,
                exp_bits=fmt.exp_bits, mant_bits=fmt.mant_bits, has_z=has_z)
            out = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[lo_spec, hi_spec, w_spec, *side_specs],
                **common,
            )(x2, x2, qt.qweight, *side_ops)
        else:
            kernel = functools.partial(
                _lut8_kernel, rs=rs, out_dtype=out_dtype,
                exp_bits=fmt.exp_bits, mant_bits=fmt.mant_bits, has_z=has_z)
            out = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((tm, tpk), lambda i, j, kk: (i, kk)),
                    pl.BlockSpec((tpk, tn), lambda i, j, kk: (kk, j)),
                    *side_specs,
                ],
                **common,
            )(x2, qt.qweight, *side_ops)
        return _finish(out, x, qt, m, m_pad, out_scale)

    xspec_lo = pl.BlockSpec((tm, tpk), lambda i, j, kk: (i, kk))
    xspec_hi = pl.BlockSpec((tm, tpk), lambda i, j, kk, _nk=nk: (i, _nk + kk))
    wspec = pl.BlockSpec((tpk, tn), lambda i, j, kk: (kk, j))
    if pre_norm is not None:
        # in-kernel rmsnorm: ONE full-K x block (tm x K bf16, <=128 KB VMEM,
        # constant index -> fetched once), slabs sliced in-kernel; r scales
        # the output tile in the epilogue
        x_full = pl.BlockSpec((tm, k), lambda i, j, kk: (i, 0))
        common["scratch_shapes"] = (common["scratch_shapes"]
                                    + [pltpu.VMEM((tm, 128), jnp.float32)])
        if bits == 4:
            kernel = functools.partial(
                _int4_kernel_prenorm, rs=rs, nk=nk, tpk=tpk, kp=kp,
                eps=pre_norm, klog=qt.shape[0], out_dtype=out_dtype)
        else:
            kernel = functools.partial(
                _int8_kernel_prenorm, rs=rs, tpk=tpk,
                eps=pre_norm, klog=qt.shape[0], out_dtype=out_dtype)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[x_full, wspec, *side_specs],
            **common,
        )(x2, qt.qweight, *side_ops)
        return _finish(out, x, qt, m, m_pad, out_scale)
    if bits == 4:
        if activation_bits == 16:
            xa, xb = x2
            kernel = functools.partial(_int4_kernel_a16, rs=rs, nk=nk,
                                       out_dtype=out_dtype)
            out = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[xspec_lo, xspec_hi, xspec_lo, xspec_hi, wspec,
                          *side_specs],
                **common,
            )(xa, xa, xb, xb, qt.qweight, *side_ops)
        else:
            kernel = functools.partial(_int4_kernel, rs=rs, nk=nk,
                                       out_dtype=out_dtype)
            out = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[xspec_lo, xspec_hi, wspec, *side_specs],
                **common,
            )(x2, x2, qt.qweight, *side_ops)
    else:
        if activation_bits == 16:
            xa, xb = x2
            kernel = functools.partial(_int8_kernel_a16, rs=rs,
                                       out_dtype=out_dtype)
            out = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[xspec_lo, xspec_lo, wspec, *side_specs],
                **common,
            )(xa, xb, qt.qweight, *side_ops)
        else:
            kernel = functools.partial(_int8_kernel, rs=rs,
                                       out_dtype=out_dtype)
            out = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[xspec_lo, wspec, *side_specs],
                **common,
            )(x2, qt.qweight, *side_ops)

    return _finish(out, x, qt, m, m_pad, out_scale)


# --------------------------------------------- layer-stacked (scan) variant

def _int4_kernel_pfx(l_ref, *args, **kw):
    del l_ref  # consumed by the index maps only
    _int4_kernel(*args, **kw)


def _int8_kernel_pfx(l_ref, *args, **kw):
    del l_ref
    _int8_kernel(*args, **kw)


def _int4_kernel_a16_pfx(l_ref, *args, **kw):
    del l_ref
    _int4_kernel_a16(*args, **kw)


def _int8_kernel_a16_pfx(l_ref, *args, **kw):
    del l_ref
    _int8_kernel_a16(*args, **kw)


def _lut4_kernel_pfx(l_ref, *args, **kw):
    del l_ref
    _lut4_kernel(*args, **kw)


def _lut8_kernel_pfx(l_ref, *args, **kw):
    del l_ref
    _lut8_kernel(*args, **kw)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "activation_bits",
                                    "pre_norm"))
def fused_quantized_matmul_stacked(
    x: jnp.ndarray, qt: QuantizedTensor, layer_idx: jnp.ndarray,
    interpret: bool = False, activation_bits: Optional[int] = None,
    pre_norm: Optional[float] = None,
) -> jnp.ndarray:
    """``y = x @ dequant(qt[layer_idx])`` for a layer-stacked artifact.

    ``qt``'s arrays carry a leading layer axis ([L, K/2, N] packed weights).
    The layer index is a *scalar-prefetch* argument: the kernel's BlockSpec
    index maps read it to DMA only the selected layer's tiles out of HBM.
    This is what makes ``lax.scan`` over layers run at unrolled-decode speed:
    no HBM->HBM copy of the layer's weights ever happens (NOTES.md measured
    that copy roughly doubling decode latency), while compile time stays
    depth-independent.  TPU-native replacement for the reference's per-layer
    module dispatch (gptq/quant.py:186-200 runs one CUDA kernel per layer
    module; here one kernel serves all layers of a weight-stationary scan).

    Layout note: the stacked arrays are flattened to 2-D ([L*K/2, N]) and the
    layer offset is folded into the *row* index map -- 3-D blocks with a
    leading singleton layer dim measured ~35% slower DMA streams on v5e.
    """
    bits = _storage_layout_bits(qt)
    lut = qt.mode == "lut"
    if pre_norm is not None and (activation_bits is not None
                                 or not prenorm_supported(qt)):
        x = _rms_nogamma(x, pre_norm)
        pre_norm = None
    if activation_bits == 16 and not a16_supported(qt):
        import warnings

        warnings.warn(
            f"activation_bits=16 is unsupported for "
            f"{'lut' if lut else 'affine'}/{bits}-bit artifacts; running this "
            "matmul with full-precision activations",
            stacklevel=2,
        )
        activation_bits = None
    if lut and activation_bits == 8:
        raise NotImplementedError("int8 activations with LUT artifacts")
    k, n_logical = qt.shape
    n = n_logical + qt.n_pad
    x2, m, m_pad, tm, out_dtype, out_scale = _prep_x(x, k, activation_bits)
    if qt.k_pad:
        x2 = _pad_x_k(x2, qt.k_pad)
        k = k + qt.k_pad

    sp = qt.side_pad
    rows = qt.scales.shape[1] - sp
    if bits == 3:
        out = _call_int3(x2, qt, m_pad, tm, n, k, rows, out_dtype, interpret,
                         layer_idx=layer_idx)
        return _finish(out, x, qt, m, m_pad, out_scale)
    if bits == 6:
        out = _call_lut6(x2, qt, m_pad, tm, n, k, rows, out_dtype, interpret,
                         layer_idx=layer_idx)
        return _finish(out, x, qt, m, m_pad, out_scale)
    kp = k // 2 if bits == 4 else k
    tn, tpk, rs, g_target = _plan_tiles(n, kp, k, rows, tm,
                                        slabs=2 if bits == 4 else 1,
                                        abits=activation_bits)
    nk = kp // tpk
    has_z = qt.zeros is not None

    # layers fold into rows: block row l*nk + kk of the flattened array is
    # exactly tile kk of layer l (kp % tpk == 0 keeps layers tile-aligned).
    # Side-info rows must be a sublane multiple per layer (Mosaic requires
    # block dims divisible by 8 unless equal to the full extent); the kernel
    # only ever indexes the first ``srows`` rows of each layer's block.
    # Stack-time padded artifacts (qt.side_pad, stack_model_layers) take the
    # ZERO-COPY path -- padding here, per call, made XLA copy the whole
    # [L, rows, N] side arrays every layer of every decode step (the 7B
    # scan ran at 356 us/layer vs 223 without the pad; round-3 NOTES).
    qw2 = qt.qweight.reshape(-1, qt.qweight.shape[-1])
    if sp and k // g_target == rows:
        srows, srows_p = rows, rows + sp
        scales2 = qt.scales.reshape(-1, qt.scales.shape[-1])
        # no-zeros (LUT symmetric) artifacts ride a dummy zeros ref; the
        # has_z=False kernels never read it
        zeros2 = (qt.zeros.reshape(-1, qt.zeros.shape[-1]) if has_z
                  else scales2)
    else:
        scales = _normalize_side(qt.scales[:, :rows] if sp else qt.scales,
                                 k, n, g_target, axis=1)
        zsrc = qt.zeros if has_z else qt.scales
        zeros = _normalize_side(zsrc[:, :rows] if sp else zsrc,
                                k, n, g_target, axis=1)
        srows = scales.shape[1]
        srows_p = _ceil_to(srows, 8)
        if srows_p != srows:
            pad = ((0, 0), (0, srows_p - srows), (0, 0))
            scales = jnp.pad(scales, pad)
            zeros = jnp.pad(zeros, pad)
        scales2 = scales.reshape(-1, scales.shape[-1])
        zeros2 = zeros.reshape(-1, zeros.shape[-1])

    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    grid = (m_pad // tm, n // tn, nk)
    common = _common_params(tm, tn, m_pad, n, k, kp, srows, out_dtype,
                            interpret, index_prefix=1)
    side_spec = pl.BlockSpec((srows_p, tn), lambda i, j, kk, l: (l[0], j))

    xspec_lo = pl.BlockSpec((tm, tpk), lambda i, j, kk, l: (i, kk))
    xspec_hi = pl.BlockSpec((tm, tpk),
                            lambda i, j, kk, l, _nk=nk: (i, _nk + kk))
    wspec = pl.BlockSpec((tpk, tn),
                         lambda i, j, kk, l, _nk=nk: (l[0] * _nk + kk, j))
    if pre_norm is not None:
        x_full = pl.BlockSpec((tm, k), lambda i, j, kk, l: (i, 0))
        common["scratch_shapes"] = (common["scratch_shapes"]
                                    + [pltpu.VMEM((tm, 128), jnp.float32)])
        if bits == 4:
            kernel = functools.partial(
                _int4_kernel_prenorm_pfx, rs=rs, nk=nk, tpk=tpk, kp=kp,
                eps=pre_norm, klog=qt.shape[0], out_dtype=out_dtype)
        else:
            kernel = functools.partial(
                _int8_kernel_prenorm_pfx, rs=rs, tpk=tpk,
                eps=pre_norm, klog=qt.shape[0], out_dtype=out_dtype)
        in_specs = [x_full, wspec, side_spec, side_spec]
        operands = (x2, qw2, scales2, zeros2)
    elif lut:
        fmt = qt.spec.float_format
        if bits == 4:
            if activation_bits == 16:
                xa, xb = x2
                kernel = functools.partial(
                    _lut4_kernel_a16_pfx, rs=rs, nk=nk, out_dtype=out_dtype,
                    exp_bits=fmt.exp_bits, mant_bits=fmt.mant_bits,
                    has_z=has_z, mult=_lut_a16_mult(fmt))
                in_specs = [xspec_lo, xspec_hi, xspec_lo, xspec_hi, wspec,
                            side_spec, side_spec]
                operands = (xa, xa, xb, xb, qw2, scales2, zeros2)
            else:
                kernel = functools.partial(
                    _lut4_kernel_pfx, rs=rs, nk=nk, out_dtype=out_dtype,
                    exp_bits=fmt.exp_bits, mant_bits=fmt.mant_bits,
                    has_z=has_z)
                in_specs = [xspec_lo, xspec_hi, wspec, side_spec, side_spec]
                operands = (x2, x2, qw2, scales2, zeros2)
        else:
            kernel = functools.partial(
                _lut8_kernel_pfx, rs=rs, out_dtype=out_dtype,
                exp_bits=fmt.exp_bits, mant_bits=fmt.mant_bits, has_z=has_z)
            in_specs = [xspec_lo, wspec, side_spec, side_spec]
            operands = (x2, qw2, scales2, zeros2)
    elif bits == 4:
        if activation_bits == 16:
            xa, xb = x2
            kernel = functools.partial(_int4_kernel_a16_pfx, rs=rs, nk=nk,
                                       out_dtype=out_dtype)
            in_specs = [xspec_lo, xspec_hi, xspec_lo, xspec_hi, wspec,
                        side_spec, side_spec]
            operands = (xa, xa, xb, xb, qw2, scales2, zeros2)
        else:
            kernel = functools.partial(_int4_kernel_pfx, rs=rs, nk=nk,
                                       out_dtype=out_dtype)
            in_specs = [xspec_lo, xspec_hi, wspec, side_spec, side_spec]
            operands = (x2, x2, qw2, scales2, zeros2)
    else:
        if activation_bits == 16:
            xa, xb = x2
            kernel = functools.partial(_int8_kernel_a16_pfx, rs=rs,
                                       out_dtype=out_dtype)
            in_specs = [xspec_lo, xspec_lo, wspec, side_spec, side_spec]
            operands = (xa, xb, qw2, scales2, zeros2)
        else:
            kernel = functools.partial(_int8_kernel_pfx, rs=rs,
                                       out_dtype=out_dtype)
            in_specs = [xspec_lo, wspec, side_spec, side_spec]
            operands = (x2, qw2, scales2, zeros2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=common.pop("out_specs"),
        scratch_shapes=common.pop("scratch_shapes"),
    )
    # measured on v5e: a CostEstimate on the scalar-prefetch grid spec drops
    # the HBM stream from ~500 to ~340 GB/s (scheduler stops overlapping the
    # weight DMA); omit it here -- the flat kernel is unaffected
    common.pop("cost_estimate", None)
    out = pl.pallas_call(kernel, grid_spec=grid_spec, **common)(lidx, *operands)
    return _finish(out, x, qt, m, m_pad, out_scale)
