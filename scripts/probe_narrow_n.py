#!/usr/bin/env python3
"""Probe: kernel tile plans for narrow-N / shallow-grid shapes (round 5).

Round-4 finding: shapes whose current plan yields a 4-6 step grid miss the
>=0.80 roofline bar (8192x2048 -> 0.753, 4096x4096 -> 0.745) -- exactly the
shapes TP>=4 multiplies (per-shard N shrinks).  Hypothesis: Mosaic's
double-buffered pipeline never reaches steady state on a 4-step grid; deeper
grids of smaller tiles should stream better on these shapes, while the
already-good shapes (whole-K 8-step plans) must not regress.

Method: kernel_roofline-style stacked-rotation slope timing (HBM-resident,
one compiled program per variant), sweeping (tn, tpk) via the module force
knobs.  Prints GB/s per (shape, plan).

Run alone on the TPU (one chip, one process): timeout 1800 python
scripts/probe_narrow_n.py
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import _slope_timeit  # noqa: E402
from iron_weight_only_quant_tpu.config import QuantSpec  # noqa: E402
from iron_weight_only_quant_tpu.ops.pallas import dequant_matmul as dm  # noqa: E402
from iron_weight_only_quant_tpu.quantize import quantize_tensor  # noqa: E402

SPEC = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
FLOOR = 384 * 2**20  # stacked buffer >= 3x VMEM so nothing pins

# (K, N): weak r4 shapes + TP=8 per-shard 70B shapes + 7B fused controls
SHAPES = [
    (8192, 2048),   # r4 weak: 70B fused kv (unsharded), 0.753
    (4096, 4096),   # r4 weak: 7B qo-ish square, 0.745
    (8192, 1280),   # TP=8 shard: fused qkv (1024 q + 128 k + 128 v)
    (8192, 7168),   # TP=8 shard: fused gate_up (3584 + 3584)
    (1024, 8192),   # TP=8 shard: o row-parallel (K/8)
    (3584, 8192),   # TP=8 shard: down row-parallel (28672/8)
    (8192, 1024),   # TP=8 shard: naked q
    (8192, 256),    # VERDICT-named: extreme narrow N
    (4096, 6144),   # 7B fused qkv control (must not regress)
    (5504, 4096),   # half-K down control (odd-K class)
]


def plans_for(k, n):
    """Candidate (tn, tpk) pairs: the current plan + grid-deepening ones.

    Ordered current-first then descending tile size; tn=128 excluded
    (narrow lanes measured ~275 GB/s across the board, round-1 NOTES)."""
    kp = k // 2
    cur = dm._plan_tiles(n, kp, k, k // 128, 16, slabs=2)
    cands = {}
    if cur:
        cands[(cur[0], cur[1])] = "current"
    for tn in (2048, 1024, 512, 256):
        if n % tn:
            continue
        for tpk in (kp, 4096, 2048, 1024, 512, 256):
            if tpk > kp or kp % tpk or tpk % 128:
                continue
            steps = (n // tn) * (kp // tpk)
            tile = tn * tpk
            if tile > 4 * 2**20 or tile < 2**18 or steps < 2 or steps > 64:
                continue
            cands.setdefault((tn, tpk), f"s{steps}")
    out = sorted(cands.items(),
                 key=lambda kv: (kv[1] != "current", -kv[0][0] * kv[0][1]))
    return [(tn, tpk, tag) for (tn, tpk), tag in out[:9]]


def measure(k, n, tn, tpk):
    rng = np.random.default_rng(0)
    m = 8
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32), jnp.bfloat16)

    def make_qt():
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        return quantize_tensor(w, SPEC, pad_n_to=512)

    qt0 = make_qt()
    qb = (qt0.qweight.size + qt0.scales.size * 4
          + (qt0.zeros.size * 4 if qt0.zeros is not None else 0))
    n_q = max(2, -(-FLOOR // qb))
    qts = [qt0] + [make_qt() for _ in range(n_q - 1)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
    del qts, qt0
    rows = stacked.scales.shape[1]
    if rows > 1 and rows % 8:
        pad = 8 - rows % 8
        pr = lambda a: None if a is None else jnp.pad(  # noqa: E731
            a, ((0, 0), (0, pad), (0, 0)))
        stacked = stacked.replace(scales=pr(stacked.scales),
                                  zeros=pr(stacked.zeros), side_pad=pad)

    dm._FORCE_TN, dm._FORCE_TPK = tn, tpk
    try:
        def f(xx, ops, i, _r=n_q):
            return dm.fused_quantized_matmul_stacked(xx, ops, i % _r)

        t = _slope_timeit(f, x, stacked)
    finally:
        dm._FORCE_TN = dm._FORCE_TPK = None
    del stacked
    if t is None:
        return None
    bytes_per = qb + x.size * 2 + m * n * 2
    return bytes_per / t / 1e9


def main():
    shapes = SHAPES
    if len(sys.argv) > 1:
        idx = [int(a) for a in sys.argv[1:]]
        shapes = [SHAPES[i] for i in idx]
    for k, n in shapes:
        print(f"== {k}x{n} ==", flush=True)
        best = None
        for tn, tpk, tag in plans_for(k, n):
            kp = k // 2
            steps = (n // tn) * (kp // tpk)
            gbps = measure(k, n, tn, tpk)
            cur = " <- current" if tag == "current" else ""
            print(f"  tn={tn:5d} tpk={tpk:5d} tile={tn*tpk/2**20:.2f}MB "
                  f"steps={steps:3d}: "
                  f"{'unresolved' if gbps is None else f'{gbps:7.1f} GB/s'}"
                  f"{cur}", flush=True)
            if gbps and (best is None or gbps > best[0]):
                best = (gbps, tn, tpk, steps)
        if best:
            print(f"  BEST: {best[0]:.1f} GB/s at tn={best[1]} tpk={best[2]} "
                  f"steps={best[3]} ({best[0] / 819.0:.3f} of HBM spec)",
                  flush=True)


if __name__ == "__main__":
    main()
