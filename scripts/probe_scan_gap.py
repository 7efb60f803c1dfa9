#!/usr/bin/env python3
"""Where does scan-over-layers decode lose vs unrolled? (interleaved minima)

A: flat fused kernel per call at 7B decode shapes (baseline)
B: stacked scalar-prefetch kernel, same shapes, L=4 layers
C: B + CostEstimate re-enabled (round-1 measured a 500->340 GB/s cliff WITH
   one; re-check under the interleaved-minima methodology)
D: stacked-cache glue: dynamic layer-slab read + per-token write at traced l
   (the non-kernel part of the scan body's attention path)

Run alone on the shared chip:  timeout 1800 python scripts/probe_scan_gap.py
"""

import functools
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


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    m, L = 8, 4

    for (k, n) in ((4096, 4096), (4096, 11264), (11008, 4096)):
        spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
        qts = [quantize_tensor(
            jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02),
            spec) for _ in range(L)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32),
                        jnp.bfloat16)
        nbytes = k * n / 2 + qts[0].scales.size * 8 + m * k * 2 + m * n * 2

        lidx = jnp.asarray(1, jnp.int32)

        variants = [
            ("flat", lambda xx, q=qts[1]: dq.fused_quantized_matmul(xx, q)),
            ("stacked", lambda xx, s=stacked: dq.fused_quantized_matmul_stacked(
                xx, s, lidx)),
        ]
        best = {tag: float("inf") for tag, _ in variants}
        for _ in range(4):
            for tag, fn in variants:
                best[tag] = min(best[tag], timeit(fn, x))
        for tag, _ in variants:
            t = best[tag]
            print(f"{k}x{n} {tag:8s}: {t*1e6:7.1f}us {nbytes/t/1e9:6.1f} GB/s",
                  flush=True)

    # D: stacked-cache glue in isolation -- per-token write + slab read at a
    # traced layer index, shaped like the 7B bench (B=8, T=64, H=32, D=128)
    B, T, H, D = 8, 64, 32, 128
    kbuf = jnp.zeros((L, B, T, H, D), jnp.bfloat16)
    k_new = jnp.ones((B, 1, H, D), jnp.bfloat16)

    def glue(kb, l, start):
        kb = jax.lax.dynamic_update_slice(
            kb, k_new[None], (l, 0, start, 0, 0))
        slab = jax.lax.dynamic_index_in_dim(kb, l, 0, keepdims=False)
        return jnp.sum(slab.astype(jnp.float32))

    t = timeit(lambda s, kb: glue(kb, lidx, jnp.asarray(3, jnp.int32)) + s[0, 0],
               jnp.zeros((8, 128), jnp.float32), kbuf, fold="sum")
    slab_bytes = B * T * H * D * 2
    print(f"cache glue (write+read {slab_bytes/1e6:.0f}MB slab): {t*1e6:.1f}us",
          flush=True)


if __name__ == "__main__":
    main()
