"""Isolate the slot-local KV WRITE cost inside _serve_chunk.

probe_chunk_gap2.py showed scatter == vmap (7.67 vs 7.69 ms/step), so the
formulation is not the cost.  This probes semantics-breaking isolation
modes (timing only): "noop" skips the 6 per-layer cache writes entirely,
"scalar" writes every slot at slot 0's column (batch-uniform
dynamic_update_slice -- the static path's write shape).

  serve_vmap - serve_noop   = total write cost
  serve_vmap - serve_scalar = the per-slot-offset premium specifically

Run:  timeout 1800 python scripts/probe_chunk_gap3.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp

from bench import build_quantized_llama, decode_runner_pair
from iron_weight_only_quant_tpu.config import QuantSpec
from iron_weight_only_quant_tpu.engine import kvcache
from iron_weight_only_quant_tpu.models import LlamaConfig
from iron_weight_only_quant_tpu.models.llama import fuse_llama_projections
from probe_chunk_gap import NS, make_serve_runner

T_MAX = 128


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
    steps = {}
    for mode, (c_lo, c_hi) in (("vmap", (16, 48)), ("noop", (15, 47)),
                               ("scalar", (14, 46))):
        kvcache._KV_WRITE_MODE = mode
        kvcache._KV_WRITE_SCATTER = False
        tag = f"serve_{mode}"
        pairs[tag] = (make_serve_runner(cfg, params, T_MAX, c_lo),
                      make_serve_runner(cfg, params, T_MAX, c_hi))
        steps[tag] = (c_lo, c_hi)
        print(f"compiled {tag}", flush=True)
    kvcache._KV_WRITE_MODE = "vmap"
    pairs["static128"] = decode_runner_pair(cfg, params, NS, t_lo=16,
                                            t_hi=48, max_len=T_MAX)
    steps["static128"] = (16, 48)
    print("compiled static128", flush=True)

    ts = {name: [float("inf"), float("inf")] for name in pairs}
    for reps in (5, 5, 8):
        for _ in range(reps):
            for name, (lo, hi) in pairs.items():
                for i, fn in enumerate((lo, hi)):
                    t1 = time.perf_counter()
                    fn()
                    ts[name][i] = min(ts[name][i], time.perf_counter() - t1)
        for name, (tl, th) in sorted(ts.items()):
            c_lo, c_hi = steps[name]
            step_ms = (th - tl) / (c_hi - c_lo) * 1e3
            print(f"  {name}: lo {tl*1e3:.1f} ms  hi {th*1e3:.1f} ms  "
                  f"-> {step_ms:.3f} ms/step", flush=True)
        print()


if __name__ == "__main__":
    main()
