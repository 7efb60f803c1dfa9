"""A16 (split-int8 activations) vs bf16 activations for the round-4 kernel
families: s21 3-bit, LUT fp4 E2M1, nq42 LUT fp6 E2M3 (+ int4 reference).

Same stacked-rotation HBM-residency methodology as bench.kernel_roofline
(one compiled program, layer_idx = i % R, buffers >= 384 MB so nothing
VMEM-pins).  The question: does feeding the int8 MXU raw (two int8 dots
per group vs one bf16 dot, skipping the i8->bf16 converts) pay for these
families at decode shapes, as it did +30% for int4 (probe_w4_inner.py)?

Run:  timeout 1800 python scripts/probe_a16_formats.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _slope_timeit
from iron_weight_only_quant_tpu.config import QuantSpec, fp_spec
from iron_weight_only_quant_tpu.ops.pallas.dequant_matmul import (
    fused_quantized_matmul_stacked,
)
from iron_weight_only_quant_tpu.quantize import quantize_tensor

FLOOR = 384 * 2**20
M = 8


def bench_spec(tag, spec, k, n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, k)).astype(np.float32), jnp.bfloat16)

    def make_qt():
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        return quantize_tensor(w, spec, pad_n_to=512)

    qt0 = make_qt()
    qb_one = (qt0.qweight.size + qt0.scales.size * 4
              + (qt0.zeros.size * 4 if qt0.zeros is not None else 0))
    n_q = max(2, -(-FLOOR // qb_one))
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
    qbytes = qb_one + x.size * 2 + M * n * 2

    for abits, label in ((None, "bf16"), (16, "a16")):
        def f(xx, ops, i, _r=n_q, _ab=abits):
            return fused_quantized_matmul_stacked(xx, ops, i % _r,
                                                  activation_bits=_ab)

        t = float("inf")
        for _ in range(4):
            tt = _slope_timeit(f, x, stacked)
            t = min(t, tt if tt else float("inf"))
        if np.isfinite(t):
            print(f"  {tag:10s} {label:5s}: {t*1e6:7.1f} us  "
                  f"{qbytes/t/1e9:6.1f} GB/s", flush=True)
        else:
            print(f"  {tag:10s} {label:5s}: unresolvable slope", flush=True)
    del stacked


def main():
    k, n = 4096, 4096
    print(f"shape {k}x{n}, m={M} (stacked rotation, floor {FLOOR>>20} MB)")
    bench_spec("int4", QuantSpec(fmt="int", bits=4, group_size=128,
                                 symmetric=False), k, n)
    bench_spec("int3", QuantSpec(fmt="int", bits=3, group_size=128,
                                 symmetric=False), k, n)
    bench_spec("fp4-e2m1", fp_spec("fp4", 2, 1, group_size=128), k, n)
    bench_spec("fp6-e2m3", fp_spec("fp6", 2, 3, group_size=128), k, n)


if __name__ == "__main__":
    main()
