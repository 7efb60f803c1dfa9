#!/usr/bin/env python3
"""E2E tile-plan / fusion A/B at real decode (L=4, 7B widths).

Solo-kernel microbenches are VMEM-tainted on the v5e: a loop-invariant
weight (8-32 MB) gets pinned in VMEM across the timing fori_loop and
streams at >1.3 TB/s -- far over the 819 GB/s HBM spec (probe_tiles2).
The only honest arbiter for tile plans is the end-to-end decode step,
where 4 layers x 107 MB of distinct weights cannot pin.

Hypothesis: the ~38 us/layer e2e gap vs the dense stream is per-call
pipeline RAMP -- the 4096x4096 projections run 4-step grids of 2 MB tiles
(first tile DMA ~2.6 us cannot overlap, x7 calls/layer), so deeper grids
(tn=512 -> 8 steps) and fused qkv/gate_up (fewer calls, wider N) should
win even though their steady-state microbench looked neutral-or-worse.

Run alone on the shared chip:  timeout 1800 python scripts/probe_e2e_tiles.py
"""

import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())

    from bench import build_quantized_llama, decode_time_per_step
    from iron_weight_only_quant_tpu.config import QuantSpec
    from iron_weight_only_quant_tpu.models import LlamaConfig
    from iron_weight_only_quant_tpu.models.llama import fuse_llama_projections
    from iron_weight_only_quant_tpu.ops.pallas import dequant_matmul as dq

    cfg = dataclasses.replace(LlamaConfig.llama2_7b(), num_layers=4)
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    batch = 8

    base = build_quantized_llama(cfg, jax.random.PRNGKey(0), spec, jnp.bfloat16)
    fused = dict(base)
    fused["layers"] = [dict(l) for l in base["layers"]]
    fused = fuse_llama_projections(fused)

    orig = dq._plan_tiles

    def forcer(table):
        """table: {(kp, n): (tn, tpk)} overrides; everything else planner."""
        def patched(n_, kp, k_, rows, tm, slabs):
            if (kp, n_) in table:
                tn_f, tpk_f = table[(kp, n_)]
                g = k_ // rows if rows > 1 else None
                rs = max(1, tpk_f // g) if g is not None else 1
                return tn_f, tpk_f, rs, tpk_f // rs
            return orig(n_, kp, k_, rows, tm, slabs)
        return patched

    sq = (2048, 4096)  # the q/k/v/o projections (kp=2048, n=4096)
    variants = [
        ("planner", base, None),
        ("sq tn512", base, {sq: (512, 2048)}),
        ("sq tn1024 tpk1024", base, {sq: (1024, 1024)}),
        ("sq tn512 tpk1024", base, {sq: (512, 1024)}),
        ("fused qkv/gateup", fused, None),
        ("fused + tn512", fused, {(2048, 12288): (512, 2048),
                                  (2048, 22528): (512, 2048)}),
    ]

    t = {name: float("inf") for name, _, _ in variants}
    for rnd in range(3):
        for name, params, table in variants:
            dq._plan_tiles = orig if table is None else forcer(table)
            try:
                t[name] = min(t[name], decode_time_per_step(cfg, params, batch))
            finally:
                dq._plan_tiles = orig
        print(f"-- round {rnd}")
        for name, _, _ in variants:
            print(f"  {name:20s}: {t[name]*1e3:6.3f} ms/step "
                  f"({(t[name]-5e-6)/cfg.num_layers*1e6:5.1f} us/layer)",
                  flush=True)


if __name__ == "__main__":
    main()
