#!/usr/bin/env python3
"""Full-depth (L=32, 7B) fused-vs-unfused decode A/B, interleaved minima.

The L=4 probe (probe_e2e_tiles.py) showed fused qkv/gate_up -20 us/layer,
but full-bench runs land 7.1-7.19 ms/step fused vs a historical 6.90
unfused -- all in windows of unknown contention, measured sequentially.
This probe interleaves the two FULL-DEPTH configs so the comparison is
contention-fair, and reports per-variant minima over rounds.

Run alone on the shared chip: timeout 1800 python scripts/probe_fuse_fulldepth.py
"""

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

    cfg = LlamaConfig.llama2_7b()
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    batch = 8

    base = build_quantized_llama(cfg, jax.random.PRNGKey(0), spec, jnp.bfloat16)
    fused = fuse_llama_projections(base)

    t = {"unfused": float("inf"), "fused": float("inf")}
    for rnd in range(4):
        t["unfused"] = min(t["unfused"],
                           decode_time_per_step(cfg, base, batch))
        t["fused"] = min(t["fused"], decode_time_per_step(cfg, fused, batch))
        print(f"-- round {rnd}: "
              + "  ".join(f"{k} {v*1e3:.3f} ms/step ({batch/v:.0f} tok/s)"
                          for k, v in t.items()), flush=True)
    d = (t["fused"] - t["unfused"]) * 1e6
    print(f"fused - unfused: {d:+.0f} us/step ({d/cfg.num_layers:+.1f} us/layer)")


if __name__ == "__main__":
    main()
