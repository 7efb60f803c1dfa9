#!/usr/bin/env python3
"""End-to-end 7B decode: scan-over-layers (carry caches) vs unrolled.

Measures the current scan-vs-unrolled per-step gap after the scan-carry
KV change (NOTES.md round-3 item 3).  Interleaved-minima slope timing.

Run alone on the shared chip:  timeout 1800 python scripts/probe_scan_e2e.py
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
    from iron_weight_only_quant_tpu.models.llama import stack_llama_layers

    cfg = LlamaConfig.llama2_7b()
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    key = jax.random.PRNGKey(0)
    batch = 8

    params = build_quantized_llama(cfg, key, spec, jnp.bfloat16)
    t_unrolled = decode_time_per_step(cfg, params, batch)
    print(f"unrolled: {t_unrolled*1e3:.2f} ms/step "
          f"({batch/t_unrolled:.0f} tok/s)")

    stacked = stack_llama_layers(params)
    del params
    t_scan = decode_time_per_step(cfg, stacked, batch, scan_layers=True)
    print(f"scan:     {t_scan*1e3:.2f} ms/step ({batch/t_scan:.0f} tok/s)")
    print(f"gap: {(t_scan-t_unrolled)*1e3:.2f} ms/step "
          f"({(t_scan-t_unrolled)/cfg.num_layers*1e6:.1f} us/layer, "
          f"ratio {t_scan/t_unrolled:.3f})")


if __name__ == "__main__":
    main()
