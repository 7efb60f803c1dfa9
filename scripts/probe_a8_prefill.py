#!/usr/bin/env python3
"""Long-prompt PREFILL with int8-MXU activations: where does a8/a16 win?

The serve-wave probe (probe_a8_wave.py) measured a8/a16 NEGATIVE end to
end (waves are m<=512 with mixed valid tokens).  Chunked prefill of long
prompts is the truly compute-bound case: B=8 x S=512 chunk = m=4096 rows
per matmul, MXU-bound at bf16 -- the int8 path doubles the MXU rate.
Measures one jitted 512-token prefill program wall per abits setting,
interleaved minima.  Run alone on the TPU.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_quantized_llama  # noqa: E402
from iron_weight_only_quant_tpu.config import KVCacheConfig, QuantSpec  # noqa: E402
from iron_weight_only_quant_tpu.engine.kvcache import make_caches  # noqa: E402
from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward  # noqa: E402
from iron_weight_only_quant_tpu.models.llama import fuse_llama_projections  # noqa: E402
from iron_weight_only_quant_tpu.ops.qmatmul import activation_quant  # noqa: E402

B, S = 8, 512


def main():
    cfg = LlamaConfig.llama2_7b()
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    t0 = time.perf_counter()
    params = fuse_llama_projections(build_quantized_llama(
        cfg, jax.random.PRNGKey(0), spec, jnp.bfloat16,
        quantize_lm_head=True, prenorm=True))
    jax.block_until_ready(params["embed"])
    print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)

    toks = jnp.ones((B, S), jnp.int32)

    def make(bits):
        @jax.jit
        def run(params, toks):
            caches = make_caches(cfg.num_layers, B, cfg.num_kv_heads, cfg.hd,
                                 KVCacheConfig(max_seq_len=S), jnp.bfloat16)
            with activation_quant(bits):
                logits, _ = llama_forward(params, toks, cfg, caches=caches)
            return jnp.sum(logits[:, -1].astype(jnp.float32))

        fn = lambda: float(run(params, toks))  # noqa: E731
        fn()
        print(f"compiled abits={bits}", flush=True)
        return fn

    runners = {b: make(b) for b in (None, 16, 8)}
    best = {b: float("inf") for b in runners}
    for _ in range(10):
        for b, fn in runners.items():
            t1 = time.perf_counter()
            fn()
            best[b] = min(best[b], time.perf_counter() - t1)
    base = best[None]
    for b in (None, 16, 8):
        toks_s = B * S / best[b]
        print(f"abits={str(b):>4s}: {best[b]*1e3:7.1f} ms "
              f"({toks_s:8.0f} prefill tok/s, {base/best[b]:.3f}x)",
              flush=True)


if __name__ == "__main__":
    main()
