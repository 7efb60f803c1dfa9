#!/usr/bin/env python3
"""Real-TPU kernel correctness + micro-benchmark.

The TPU analogue of reference gptq/test_kernel.py: correctness of the fused
packed kernel vs the XLA dequant path, then latency/bandwidth on LLaMA-7B
layer shapes.  Reports fraction of HBM roofline (v5e ~819 GB/s).

Run alone (single shared TPU chip -- do not run concurrently with other TPU
work):  timeout 600 python scripts/tpu_smoke.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from iron_weight_only_quant_tpu.config import QuantSpec
from iron_weight_only_quant_tpu.ops.pallas.dequant_matmul import (
    fused_quantized_matmul,
    kernel_supported,
)
from iron_weight_only_quant_tpu.ops.qmatmul import dequantize_weight
from iron_weight_only_quant_tpu.quantize import quantize_tensor

HBM_GBPS = 819.0  # v5e


ITERS_LO, ITERS_HI = 100, 400


def timeit(fn, x, *rest, fold="first"):
    """Slope-based per-op timing robust to this environment's quirks.

    Through the axon tunnel (a) ``block_until_ready`` does not actually wait
    -- only a host value fetch does -- and (b) each program invocation
    carries ~25 ms fixed dispatch+fetch overhead.  So: run the op chained in
    a jitted fori_loop (the output feeds the next input, defeating loop
    hoisting), at two loop lengths, and report the slope
    ``(t_hi - t_lo) / (ITERS_HI - ITERS_LO)``.

    ``fold="first"`` feeds only out[0] back into the chain -- fine for
    pallas_call ops (opaque to XLA), but a PURE-XLA op under test gets
    dead-code-eliminated down to the one live column.  Use ``fold="sum"``
    for XLA ops: the full-output reduce keeps every element live (the extra
    reduce is noise next to a weight-streaming matmul).
    """

    def make(iters):
        @jax.jit
        def loop(x, *rest):
            def body(i, xc):
                y = fn(xc, *rest)
                # fold output back into an input of the right shape/dtype
                lane = (jnp.sum(y.astype(jnp.float32)) if fold == "sum"
                        else y.reshape(-1)[0].astype(jnp.float32))
                return (x + lane).astype(x.dtype)

            return jax.lax.fori_loop(0, iters, body, x)

        return loop

    def run(loop):
        out = loop(x, *rest)
        float(jnp.sum(out.astype(jnp.float32)))  # warm/compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(x, *rest)
            float(jnp.sum(out.astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo = run(make(ITERS_LO))
    t_hi = run(make(ITERS_HI))
    return max((t_hi - t_lo) / (ITERS_HI - ITERS_LO), 1e-9)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    # ---------------- correctness on real hardware
    k, n = 1024, 512
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.05)
    for spec in (
        QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False),
        QuantSpec(fmt="int", bits=4, group_size=128, symmetric=True),
        QuantSpec(fmt="int", bits=8, group_size=128, symmetric=False),
        QuantSpec(fmt="int", bits=4, group_size=-2, symmetric=True),
    ):
        qt = quantize_tensor(w, spec)
        assert kernel_supported(qt)
        for m in (1, 8, 64):
            x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32), jnp.bfloat16)
            y = np.asarray(fused_quantized_matmul(x, qt), np.float32)
            y_ref = np.asarray(
                jnp.dot(x, dequantize_weight(qt, jnp.bfloat16),
                        preferred_element_type=jnp.float32), np.float32
            )
            denom = np.abs(y_ref).max() + 1e-6
            err = np.abs(y - y_ref).max() / denom
            status = "ok" if err < 2e-2 else "FAIL"
            print(f"correctness {spec.fmt}{spec.storage_bits} g{spec.group_size} "
                  f"m={m}: rel-err {err:.2e} {status}")
            if err >= 2e-2:
                sys.exit(1)

    # ---------------- a16 (split-int8 activation) correctness, round 4:
    # covers the newly supported families (3-bit, LUT fp4/fp6-e2m3) on
    # real hardware next to int4
    from iron_weight_only_quant_tpu.config import fp_spec
    from iron_weight_only_quant_tpu.ops.pallas.dequant_matmul import (
        a16_supported,
    )

    for tag, spec in (
        ("int4", QuantSpec(fmt="int", bits=4, group_size=128,
                           symmetric=False)),
        ("int3", QuantSpec(fmt="int", bits=3, group_size=128,
                           symmetric=False)),
        ("fp4-e2m1", fp_spec("fp4", 2, 1, group_size=128)),
        ("fp6-e2m3", fp_spec("fp6", 2, 3, group_size=128)),
    ):
        qt = quantize_tensor(w, spec)
        assert kernel_supported(qt) and a16_supported(qt), tag
        for m in (1, 8):
            x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32),
                            jnp.bfloat16)
            y = np.asarray(fused_quantized_matmul(x, qt,
                                                  activation_bits=16),
                           np.float32)
            y_ref = np.asarray(
                jnp.dot(x, dequantize_weight(qt, jnp.bfloat16),
                        preferred_element_type=jnp.float32), np.float32
            )
            err = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-6)
            status = "ok" if err < 2e-2 else "FAIL"
            print(f"a16 correctness {tag:9s} m={m}: rel-err {err:.2e} "
                  f"{status}")
            if err >= 2e-2:
                sys.exit(1)

    # ---------------- micro-benchmark, LLaMA-7B shapes
    print("\nshape            m  | bf16-XLA    int4-fused  int8-fused | speedup  int4 GB/s (roofline%)")
    for (k, n) in ((4096, 4096), (4096, 11008), (11008, 4096)):
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        qt4 = quantize_tensor(w, QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False))
        qt8 = quantize_tensor(w, QuantSpec(fmt="int", bits=8, group_size=128, symmetric=False))
        wd = jnp.asarray(w, jnp.bfloat16)
        dense = jax.jit(lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype))
        for m in (1, 16):
            x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32), jnp.bfloat16)
            t_bf16 = timeit(dense, x, wd)
            t_int4 = timeit(fused_quantized_matmul, x, qt4)
            t_int8 = timeit(fused_quantized_matmul, x, qt8)
            bytes4 = k * n / 2 + qt4.scales.size * 4 * 2 + m * k * 2 + m * n * 2
            gbps = bytes4 / t_int4 / 1e9
            print(f"{k}x{n:<6} {m:>3} | {t_bf16*1e6:8.1f}us {t_int4*1e6:8.1f}us "
                  f"{t_int8*1e6:8.1f}us | {t_bf16/t_int4:5.2f}x  {gbps:6.1f} ({100*gbps/HBM_GBPS:.0f}%)")


if __name__ == "__main__":
    main()
