#!/usr/bin/env python3
"""Per-phase activation bits on the serve WAVE: a8/a16 vs bf16 (round 5).

The combo wave is the large-m prefill matmul (m = slots x bucket, up to
512 rows) where the int8-MXU activation paths win (W4A8 measured 1.44x at
m=256 on 4096x4096, NOTES round 1) while m=8 decode loses -- hence
EngineConfig.prefill_activation_bits applies them to prefill phases only.
This probe measures end-to-end serve throughput for wave bits in
{None, 16, 8} on the 7B model, same requests, interleaved best-of rounds.

a16 (split-int8 fixed point) is quality-neutral by construction; a8 is the
~0.3%-activation-error mode.  Run alone on the TPU:
timeout 2400 python scripts/probe_a8_wave.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import random  # noqa: E402

from bench import build_quantized_llama  # noqa: E402
from iron_weight_only_quant_tpu.config import (  # noqa: E402
    EngineConfig,
    KVCacheConfig,
    QuantSpec,
)
from iron_weight_only_quant_tpu.engine import InferenceEngine  # noqa: E402
from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward  # noqa: E402
from iron_weight_only_quant_tpu.models.llama import fuse_llama_projections  # noqa: E402

NSLOTS = 8
MAX_NEW = 32


def main():
    cfg = LlamaConfig.llama2_7b()
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    t0 = time.perf_counter()
    params = fuse_llama_projections(build_quantized_llama(
        cfg, jax.random.PRNGKey(0), spec, jnp.bfloat16,
        quantize_lm_head=True, prenorm=True))
    jax.block_until_ready(params["embed"])
    print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)

    rng = random.Random(3)
    reqs = [[rng.randint(1, cfg.vocab_size - 1)
             for _ in range(rng.randint(16, 64))] for _ in range(2 * NSLOTS)]
    t_need = max(len(r) for r in reqs) + MAX_NEW

    engines = {}
    for bits in (None, 16, 8):
        ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=t_need),
                            max_batch_size=NSLOTS,
                            prefill_activation_bits=bits)
        eng = InferenceEngine(params, cfg, llama_forward, engine_cfg=ecfg,
                              dtype=jnp.bfloat16)
        eng.serve(reqs, max_new_tokens=MAX_NEW, chunk=16)  # compile
        engines[bits] = eng
        print(f"compiled wave_abits={bits}", flush=True)

    best = {b: float("inf") for b in engines}
    outs = {}
    for _ in range(6):
        for b, eng in engines.items():
            t1 = time.perf_counter()
            outs[b] = eng.serve(reqs, max_new_tokens=MAX_NEW, chunk=16)
            best[b] = min(best[b], time.perf_counter() - t1)
    n_gen = {b: sum(len(r) for r in o) for b, o in outs.items()}
    base = n_gen[None] / best[None]
    for b in (None, 16, 8):
        rate = n_gen[b] / best[b]
        same = outs[b] == outs[None]
        print(f"wave_abits={str(b):>4s}: {rate:7.1f} gen-tok/s "
              f"({best[b]*1e3:.0f} ms wall, {rate/base:.3f}x, "
              f"tokens_match_baseline={same})", flush=True)


if __name__ == "__main__":
    main()
