#!/usr/bin/env python3
"""Confirm round-5 narrow-N tile winners under INTERLEAVED windows.

probe_narrow_n.py measured each (tn, tpk) plan in its own window on the
shared chip; drift can fake a winner.  Here every plan of a shape gets its
lo/hi loops compiled up front and then all plans sample the same rounds,
keeping per-plan minima (the NOTES.md shared-chip methodology).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iron_weight_only_quant_tpu.config import QuantSpec  # noqa: E402
from iron_weight_only_quant_tpu.ops.pallas import dequant_matmul as dm  # noqa: E402
from iron_weight_only_quant_tpu.quantize import quantize_tensor  # noqa: E402

SPEC = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
FLOOR = 384 * 2**20

# shape -> plans to confirm (current first)
CASES = {
    (8192, 2048): [(512, 4096), (256, 4096), (2048, 2048)],
    (4096, 4096): [(1024, 2048), (2048, 2048), (256, 2048), (512, 1024)],
    (8192, 256): [(256, 4096), (256, 1024), (256, 512)],
    (8192, 1280): [(256, 4096), (256, 2048), (256, 1024)],
    (8192, 7168): [(1024, 2048), (512, 4096), (256, 4096)],
    (1024, 8192): [(2048, 512), (1024, 512), (2048, 256)],
    (3584, 8192): [(1024, 1792), (512, 1792), (2048, 896)],
    (8192, 1024): [(256, 4096), (512, 4096), (1024, 2048)],
    (4096, 6144): [(2048, 1024), (512, 2048), (256, 2048), (1024, 2048)],
    (4096, 22528): [(2048, 1024), (512, 2048), (256, 2048)],
}

ITERS = (400, 1600)


def build_stacked(k, n, pad_n_to=512):
    rng = np.random.default_rng(0)

    def make_qt():
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        return quantize_tensor(w, SPEC, pad_n_to=pad_n_to)

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
    return stacked, n_q, qb


def main():
    shapes = list(CASES)
    if len(sys.argv) > 1:
        shapes = [shapes[int(a)] for a in sys.argv[1:]]
    m = 8
    for (k, n) in shapes:
        plans = CASES[(k, n)]
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(m, k)).astype(np.float32),
            jnp.bfloat16)
        stacked, n_q, qb = build_stacked(k, n)
        bytes_per = qb + x.size * 2 + m * n * 2

        runners = {}
        for (tn, tpk) in plans:
            dm._FORCE_TN, dm._FORCE_TPK = tn, tpk
            try:
                loops = []
                for it in ITERS:
                    @jax.jit
                    def loop(xx, ops, _it=it, _r=n_q, _tag=(tn, tpk, it)):
                        def body(i, xc):
                            y = dm.fused_quantized_matmul_stacked(
                                xx, ops, i % _r)
                            return (xc + y.reshape(-1)[0].astype(jnp.float32)
                                    ).astype(xc.dtype)

                        return jax.lax.fori_loop(0, _it, body, xx)

                    float(jnp.sum(loop(x, stacked).astype(jnp.float32)))
                    loops.append(loop)
                runners[(tn, tpk)] = loops
            finally:
                dm._FORCE_TN = dm._FORCE_TPK = None

        best = {p: [float("inf"), float("inf")] for p in runners}
        for _ in range(5):
            for p, loops in runners.items():
                for j, loop in enumerate(loops):
                    t0 = time.perf_counter()
                    float(jnp.sum(loop(x, stacked).astype(jnp.float32)))
                    best[p][j] = min(best[p][j], time.perf_counter() - t0)
        print(f"== {k}x{n} (n_q={n_q}) ==", flush=True)
        for p, (lo, hi) in best.items():
            slope = (hi - lo) / (ITERS[1] - ITERS[0])
            gbps = bytes_per / slope / 1e9 if slope > 0 else float("nan")
            kp = k // 2
            steps = (n // p[0]) * (kp // p[1])
            print(f"  tn={p[0]:5d} tpk={p[1]:5d} steps={steps:3d}: "
                  f"{gbps:7.1f} GB/s ({slope * 1e6:6.1f} us)", flush=True)
        del stacked, runners


if __name__ == "__main__":
    main()
