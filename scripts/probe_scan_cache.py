#!/usr/bin/env python3
"""Is scan-decode's per-layer overhead proportional to KV-cache size?

Times the 7B scan decode step at max_len 16 vs 64 vs 256 (L=8 depth twin,
slope between two step counts).  If per-layer time grows with max_len, the
scan body is copying cache slabs (XLA failing to alias the carried stacked
cache); if flat, the overhead is fixed scan-body glue.

Run alone:  timeout 2400 python scripts/probe_scan_cache.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from bench import build_quantized_llama, decode_time_per_step  # noqa: E402

from iron_weight_only_quant_tpu.config import QuantSpec
from iron_weight_only_quant_tpu.models import LlamaConfig


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())
    import dataclasses

    from iron_weight_only_quant_tpu.models.llama import stack_llama_layers

    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    key = jax.random.PRNGKey(0)
    for use_spec, nl, max_lens in (
        (True, 8, (64,)), (True, 16, (64,)), (True, 24, (64,)),
        (True, 32, (64,)),
        (False, 16, (64,)), (False, 32, (64,)),
    ):
        cfg = dataclasses.replace(LlamaConfig.llama2_7b(), num_layers=nl)
        params = stack_llama_layers(build_quantized_llama(
            cfg, key, spec if use_spec else None, jnp.bfloat16))
        for max_len in max_lens:
            best = float("inf")
            for _ in range(3):
                t = decode_time_per_step(cfg, params, 8, t_lo=6, t_hi=14,
                                         max_len=max_len, scan_layers=True)
                best = min(best, t)
            print(f"{'W4' if use_spec else 'bf16'} L={nl:2d} "
                  f"max_len={max_len:4d}: {best*1e3:6.2f} ms/step "
                  f"({best/cfg.num_layers*1e6:6.1f} us/layer incl. fixed)",
                  flush=True)
        del params


if __name__ == "__main__":
    main()
