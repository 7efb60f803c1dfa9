#!/usr/bin/env python3
"""W4 kernel inner-loop ablations at decode shapes (m=8).

The fused W4 kernel streams ~585 GB/s at 7B decode shapes vs ~755 GB/s for
the dense bf16 matmul -- with double buffering that ratio means the per-tile
VPU work (nibble masks + i8->bf16 converts) exceeds the tile's DMA time by
~30%.  These variants attack the convert cost:

  base   : current kernel (2 masks/byte + 2 i8->bf16 astype per slab)
  f32    : codes convert i8->f32, dots in f32 (MXU 4x slower but idle at m=8;
           tests whether Mosaic's i8->bf16 is pricier than i8->f32)
  magic  : bf16 magic-bias decode -- (qw & 0xF) | 0x4300 viewed as bf16 is
           128 + code exactly (code fits the 7-bit mantissa); the +128 folds
           into the existing zero-point epilogue (zshift), so the per-element
           work is widen+or instead of an arithmetic int->float convert
  w4a8   : existing activation_bits=8 path (int8 MXU consumes raw codes; no
           converts at all) -- upper bound on what killing converts buys

Run alone on the shared chip:  timeout 1800 python scripts/probe_w4_inner.py
"""

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from iron_weight_only_quant_tpu.config import QuantSpec
from iron_weight_only_quant_tpu.ops.pallas import dequant_matmul as dq
from iron_weight_only_quant_tpu.quantize import quantize_tensor
from tpu_smoke import timeit


def _accum_variant(acc, x, codes, load_sz, rs, g, mode,
                   mult=1.0, zshift=0.0):
    for r in range(rs):
        qg = codes[r * g : (r + 1) * g, :]
        xg = x[:, r * g : (r + 1) * g]
        if mode == "f32":
            part = jnp.dot(xg.astype(jnp.float32), qg.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        else:
            part = jnp.dot(xg, qg.astype(x.dtype),
                           preferred_element_type=jnp.float32)
        s, z = load_sz(r)
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + part * (s * mult) - xsum * (s * (z - zshift))
    return acc


def _magic_accum(acc, x, vals_bf16, load_sz, rs, g, mult, zshift):
    for r in range(rs):
        qg = vals_bf16[r * g : (r + 1) * g, :]
        xg = x[:, r * g : (r + 1) * g]
        part = jnp.dot(xg, qg, preferred_element_type=jnp.float32)
        s, z = load_sz(r)
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + part * (s * mult) - xsum * (s * (z - zshift))
    return acc


def _kernel_variant(x_lo_ref, x_hi_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref,
                    *, rs, nk, out_dtype, mode):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qw = qw_ref[:]
    g = qw.shape[0] // rs
    acc = acc_ref[:]
    if mode == "magic":
        # lo: (qw & 0xF) | 0x4300 in u16 lanes -> bf16(128 + lo) exactly
        # (code fits the 7-bit mantissa; the +128 folds into zshift).
        # hi keeps the i8 mask+astype path: extracting the logical hi nibble
        # needs an 8-bit right shift the v5e VPU lacks.
        lo16 = (qw & 0xF).astype(jnp.uint16) | jnp.uint16(0x4300)
        lo_b = jax.lax.bitcast_convert_type(lo16, jnp.bfloat16)
        qw_i8 = jax.lax.bitcast_convert_type(qw, jnp.int8)
        hi = qw_i8 & jnp.int8(-16)
        acc = _magic_accum(acc, x_lo_ref[:], lo_b,
                           dq._flat_sz(s_ref, z_ref, kk * rs), rs, g,
                           1.0, -128.0)
        acc = _accum_variant(acc, x_hi_ref[:], hi,
                             dq._flat_sz(s_ref, z_ref, (nk + kk) * rs), rs, g,
                             "bf16", mult=1.0 / 16.0, zshift=8.0)
    else:
        qw_i8 = jax.lax.bitcast_convert_type(qw, jnp.int8)
        lo = (qw & 0xF).astype(jnp.int8)
        hi = qw_i8 & jnp.int8(-16)
        acc = _accum_variant(acc, x_lo_ref[:], lo,
                             dq._flat_sz(s_ref, z_ref, kk * rs), rs, g, mode)
        acc = _accum_variant(acc, x_hi_ref[:], hi,
                             dq._flat_sz(s_ref, z_ref, (nk + kk) * rs), rs, g,
                             mode, mult=1.0 / 16.0, zshift=8.0)
    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _emit():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def run_variant(x, qt, mode):
    k, n_logical = qt.shape
    n = n_logical + qt.n_pad
    x2, m, m_pad, tm, out_dtype, _ = dq._prep_x(x, k, None)
    rows = qt.scales.shape[0]
    kp = k // 2
    tn, tpk, rs, g_target = dq._plan_tiles(n, kp, k, rows, tm, slabs=2)
    nk = kp // tpk
    scales = dq._normalize_side(qt.scales, k, n, g_target)
    zeros = dq._normalize_side(qt.zeros, k, n, g_target)
    srows = scales.shape[0]
    grid = (m_pad // tm, n // tn, nk)
    common = dq._common_params(tm, tn, m_pad, n, k, kp, srows, out_dtype,
                               False)
    side_spec = pl.BlockSpec((srows, tn), lambda i, j, kk: (0, j))
    kernel = functools.partial(_kernel_variant, rs=rs, nk=nk,
                               out_dtype=out_dtype, mode=mode)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tpk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((tm, tpk), lambda i, j, kk, _nk=nk: (i, _nk + kk)),
            pl.BlockSpec((tpk, tn), lambda i, j, kk: (kk, j)),
            side_spec,
            side_spec,
        ],
        **common,
    )(x2, x2, qt.qweight, scales, zeros)
    return dq._finish(out, x, qt, m, m_pad, None)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    m = 8

    for (k, n) in ((4096, 4096), (4096, 11264), (11008, 4096)):
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        qt = quantize_tensor(w, QuantSpec(fmt="int", bits=4, group_size=128,
                                          symmetric=False))
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32),
                        jnp.bfloat16)
        nbytes = k * n / 2 + qt.scales.size * 8 + m * k * 2 + m * n * 2
        ref = np.asarray(dq.fused_quantized_matmul(x, qt), np.float32)

        # the chip is SHARED: contention only ever adds time, so interleave
        # the variants over several rounds and keep each variant's MINIMUM
        variants = [
            ("base", lambda xx, q=qt: dq.fused_quantized_matmul(xx, q), True),
            ("f32", functools.partial(
                lambda xx, md: run_variant(xx, qt, md), md="f32"), True),
            ("magic", functools.partial(
                lambda xx, md: run_variant(xx, qt, md), md="magic"), True),
            ("w4a8", lambda xx, q=qt: dq.fused_quantized_matmul(
                xx, q, activation_bits=8), False),
            ("a16", lambda xx, q=qt: dq.fused_quantized_matmul(
                xx, q, activation_bits=16), True),
        ]
        best = {tag: float("inf") for tag, _, _ in variants}
        errs = {}
        for tag, fn, check in variants:
            errs[tag] = (np.abs(np.asarray(fn(x), np.float32) - ref).max()
                         / (np.abs(ref).max() + 1e-9)) if check else float("nan")
        for _ in range(4):
            for tag, fn, _ in variants:
                best[tag] = min(best[tag], timeit(fn, x))
        for tag, _, _ in variants:
            t = best[tag]
            print(f"{k}x{n} {tag:8s}: {t*1e6:7.1f}us {nbytes/t/1e9:6.1f} GB/s"
                  f"  maxrel={errs[tag]:.2e}", flush=True)


if __name__ == "__main__":
    main()
