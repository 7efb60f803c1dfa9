"""A/B the slot-local KV write formulation inside _serve_chunk.

probe_chunk_gap.py measured serve-machinery overhead of ~1.0 ms/step vs
static decode at equal t_max=128; the 6 per-layer vmapped
dynamic_update_slice cache writes are the prime suspect.  This probes the
batched-scatter alternative (kvcache._KV_WRITE_SCATTER).

Distinct chunk lengths per variant keep both formulations' jitted
programs alive simultaneously (the flag is a trace-time Python global):
vmap uses c=16/48, scatter c=15/47.  Per-step = slope.

Run:  timeout 1800 python scripts/probe_chunk_gap2.py
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
    kvcache._KV_WRITE_SCATTER = False
    pairs["serve_vmap"] = (make_serve_runner(cfg, params, T_MAX, 16),
                           make_serve_runner(cfg, params, T_MAX, 48))
    steps["serve_vmap"] = (16, 48)
    print("compiled serve_vmap", flush=True)
    kvcache._KV_WRITE_SCATTER = True
    pairs["serve_scat"] = (make_serve_runner(cfg, params, T_MAX, 15),
                           make_serve_runner(cfg, params, T_MAX, 47))
    steps["serve_scat"] = (15, 47)
    print("compiled serve_scat", flush=True)
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
