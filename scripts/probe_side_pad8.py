#!/usr/bin/env python3
"""Is the flat kernel's 11008-K deficit the unaligned side-row block?

At K=11008/g128 the flat kernel's side arrays have 86 rows -> a (86, tn)
block, not a multiple of 8 sublanes; the stacked kernel pads to 88 and wins
by 25% on this shape (probe_prefetch_grid).  Here flat runs against flat
with side rows padded to a multiple of 8 (kernel semantics unchanged: rows
beyond srows are never read).

Run alone:  timeout 1200 python scripts/probe_side_pad8.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from iron_weight_only_quant_tpu.config import QuantSpec
from iron_weight_only_quant_tpu.ops.pallas import dequant_matmul as dq
from iron_weight_only_quant_tpu.quantize import quantize_tensor
from tpu_smoke import timeit

_orig_norm = dq._normalize_side


def _norm_pad8(side, k, n, g_target, axis=0):
    out = _orig_norm(side, k, n, g_target, axis=axis)
    rows = out.shape[0]
    pad = (-rows) % 8
    if pad:
        out = jnp.pad(out, ((0, pad), (0, 0)))
    return out


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    m = 8
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    raw = dq.fused_quantized_matmul.__wrapped__

    for (k, n) in ((11008, 4096), (4096, 4096), (4096, 11264)):
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        qt = quantize_tensor(w, spec)
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32),
                        jnp.bfloat16)
        nbytes = k * n / 2 + qt.scales.size * 8 + m * k * 2 + m * n * 2

        f_a = jax.jit(lambda xx, q=qt: raw(xx, q))
        f_b = jax.jit(lambda xx, q=qt: raw(xx, q))
        y_a = np.asarray(f_a(x), np.float32)
        dq._normalize_side = _norm_pad8
        try:
            y_b = np.asarray(f_b(x), np.float32)
        finally:
            dq._normalize_side = _orig_norm
        np.testing.assert_array_equal(y_a, y_b)

        variants = [("base", f_a), ("pad8", f_b)]
        best = {tag: float("inf") for tag, _ in variants}
        for _ in range(5):
            for tag, fn in variants:
                best[tag] = min(best[tag], timeit(fn, x))
        msg = "  ".join(
            f"{tag}: {best[tag]*1e6:6.1f}us {nbytes/best[tag]/1e9:5.1f} GB/s"
            for tag, _ in variants)
        print(f"{k}x{n}  {msg}", flush=True)


if __name__ == "__main__":
    main()
