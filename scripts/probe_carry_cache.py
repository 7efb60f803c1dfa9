#!/usr/bin/env python3
"""Does the scan-carry stacked KV cache alias in place?

Times L=8 7B-shape scan decode at max_len {64, 512, 1024}.  If per-step
time grows ~linearly with max_len, the carried stacked cache (or its
layer-slab gather) is being materialized per layer instead of aliased /
fused; if flat, the carry is in place and the scan gap is elsewhere.

Run alone:  timeout 1800 python scripts/probe_carry_cache.py
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
    from iron_weight_only_quant_tpu.models.llama import stack_llama_layers

    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    key = jax.random.PRNGKey(0)
    cfg = dataclasses.replace(LlamaConfig.llama2_7b(), num_layers=8)
    params = stack_llama_layers(build_quantized_llama(cfg, key, spec,
                                                      jnp.bfloat16))
    for max_len in (64, 512, 1024):
        t = decode_time_per_step(cfg, params, 8, t_lo=6, t_hi=14,
                                 max_len=max_len, scan_layers=True)
        print(f"scan L=8 max_len={max_len:5d}: {t*1e3:6.2f} ms/step",
              flush=True)
    # unrolled twin at the same lengths for the attention-cost control
    params_flat = build_quantized_llama(cfg, key, spec, jnp.bfloat16)
    for max_len in (64, 1024):
        t = decode_time_per_step(cfg, params_flat, 8, t_lo=6, t_hi=14,
                                 max_len=max_len)
        print(f"unrl L=8 max_len={max_len:5d}: {t*1e3:6.2f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
