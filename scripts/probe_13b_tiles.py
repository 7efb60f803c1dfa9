#!/usr/bin/env python3
"""13B-shape kernel tile-plan sweep (round-4 VERDICT item 2).

The 13B scan bench misses the >=0.80 roofline bar (0.725 in BENCH_r03);
NOTES names the down-proj kp=6912 tile plan as the suspect.  This probe
measures the stacked-rotation HBM stream of each 13B projection shape under
a sweep of IWOQ_TPK_CAP values (the planner's preferred-largest-K-tile
knob), interleaving all caps per shape in the same timing windows
(shared-chip methodology).

Run on the real chip: timeout 1800 python scripts/probe_13b_tiles.py
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from bench import _slope_timeit  # noqa: E402
from iron_weight_only_quant_tpu.config import QuantSpec  # noqa: E402
from iron_weight_only_quant_tpu.ops.pallas import dequant_matmul as dm  # noqa: E402
from iron_weight_only_quant_tpu.quantize import quantize_tensor  # noqa: E402

SHAPES = ((13824, 5120), (5120, 13824), (5120, 5120))
CAPS = (2048, 0, 1024, 512)  # 2048 = current default; 0 = uncapped
FLOOR = 384 * 2**20
ROUNDS = 3


def build_stacked(k, n, spec, rng):
    def mk():
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        return quantize_tensor(w, spec, pad_n_to=512)

    qt0 = mk()
    qb = (qt0.qweight.size + qt0.scales.size * 4
          + (qt0.zeros.size * 4 if qt0.zeros is not None else 0))
    r = max(2, -(-FLOOR // qb))
    qts = [qt0] + [mk() for _ in range(r - 1)]
    st = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
    rows = st.scales.shape[1]
    if rows > 1 and rows % 8:
        pad = 8 - rows % 8
        pr = lambda a: None if a is None else jnp.pad(  # noqa: E731
            a, ((0, 0), (0, pad), (0, 0)))
        st = st.replace(scales=pr(st.scales), zeros=pr(st.zeros),
                        side_pad=pad)
    return st, r, qb


def main():
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    rng = np.random.default_rng(0)
    m = 8
    for k, n in SHAPES:
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32),
                        jnp.bfloat16)
        st, r, qb = build_stacked(k, n, spec, rng)
        qbytes = qb + x.size * 2 + m * n * 2

        def f_q(xx, ops, i, _r=r):
            return dm.fused_quantized_matmul_stacked(xx, ops, i % _r)

        best = {c: float("inf") for c in CAPS}
        plans = {}
        for _ in range(ROUNDS):
            for cap in CAPS:
                dm._TPK_CAP = cap
                jax.clear_caches()
                kp = (k + 511) // 512 * 512 if False else k // 2
                rows = st.scales.shape[1] - st.side_pad
                plans[cap] = dm._plan_tiles(st.shape[1] + st.n_pad, kp, k,
                                            rows, 8, slabs=2)
                t = _slope_timeit(f_q, x, st)
                if t:
                    best[cap] = min(best[cap], t)
        for cap in CAPS:
            t = best[cap]
            print(json.dumps({
                "shape": f"{k}x{n}", "tpk_cap": cap,
                "plan(tn,tpk,rs,g)": plans[cap],
                "us": round(t * 1e6, 1) if np.isfinite(t) else None,
                "gbps": round(qbytes / t / 1e9, 1) if np.isfinite(t) else None,
            }))
        del st


if __name__ == "__main__":
    main()
