"""Why does _serve_chunk decode at ~8.3 ms/step when static decode runs
6.07?  (probe_serve_split.py round-4 finding: pure-decode chunks cost
158 ms per 16 steps incl. one ~25 ms sync.)

Slope-timed variants (c=16 vs c=48, per-step = slope), interleaved minima
per NOTES.md methodology:
  serve128 : _serve_chunk as serve runs it (t_max=128, [B] lens, sampling)
  serve64  : same program at t_max=64 caches       -> t_max share of gap
  static128: bench static runner at max_len=128    -> serve-machinery share
  static64 : bench static runner at max_len=64     (the headline config)

Run:  timeout 1800 python scripts/probe_chunk_gap.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_quantized_llama, decode_runner_pair
from iron_weight_only_quant_tpu.config import (EngineConfig, KVCacheConfig,
                                               QuantSpec)
from iron_weight_only_quant_tpu.engine import InferenceEngine
from iron_weight_only_quant_tpu.engine.engine import _serve_chunk
from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward
from iron_weight_only_quant_tpu.models.llama import fuse_llama_projections

NS = 8
C_LO, C_HI = 16, 48


def make_serve_runner(cfg, params, t_max, c):
    ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=t_max),
                       max_batch_size=NS)
    eng = InferenceEngine(params, cfg, llama_forward, engine_cfg=ecfg,
                          dtype=jnp.bfloat16)
    caches0 = eng._fresh_caches(NS)
    rng = jax.random.PRNGKey(0)
    meta = np.concatenate([
        np.full(NS, 7), np.zeros(NS * c), np.zeros(NS), np.full(NS, 32),
    ]).astype(np.int32)
    meta = jnp.asarray(meta)
    state = {"caches": caches0}

    def run():
        sampled, caches = _serve_chunk(
            params, meta, None, state["caches"], rng, llama_forward, cfg,
            0.0, 0, t_max, c, None)
        state["caches"] = caches  # donated
        return float(jnp.sum(sampled))

    run()  # compile
    return run


def main():
    cfg = LlamaConfig.llama2_7b()
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    t0 = time.perf_counter()
    params = fuse_llama_projections(build_quantized_llama(
        cfg, jax.random.PRNGKey(0), spec, jnp.bfloat16,
        quantize_lm_head=True, prenorm=True))
    jax.block_until_ready(jax.tree.leaves(params["layers"][0]))
    print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)

    pairs = {}
    for t_max, tag in ((128, "serve128"), (64, "serve64")):
        pairs[tag] = (make_serve_runner(cfg, params, t_max, C_LO),
                      make_serve_runner(cfg, params, t_max, C_HI))
        print(f"compiled {tag}", flush=True)
    for max_len, tag in ((128, "static128"), (64, "static64")):
        pairs[tag] = decode_runner_pair(cfg, params, NS, t_lo=C_LO,
                                        t_hi=C_HI, max_len=max_len)
        print(f"compiled {tag}", flush=True)

    ts = {name: [float("inf"), float("inf")] for name in pairs}
    for reps in (5, 5, 8):
        for _ in range(reps):
            for name, (lo, hi) in pairs.items():
                for i, fn in enumerate((lo, hi)):
                    t1 = time.perf_counter()
                    fn()
                    ts[name][i] = min(ts[name][i],
                                      time.perf_counter() - t1)
        for name, (tl, th) in sorted(ts.items()):
            step_ms = (th - tl) / (C_HI - C_LO) * 1e3
            print(f"  {name}: lo {tl*1e3:.1f} ms  hi {th*1e3:.1f} ms  "
                  f"-> {step_ms:.3f} ms/step", flush=True)
        print()


if __name__ == "__main__":
    main()
