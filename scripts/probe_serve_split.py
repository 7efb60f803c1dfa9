"""Where does serve() wall time go?  Splits the serve bench's wall into
combo-wave calls vs pure-decode chunk calls (engine stats t_combos_s /
t_chunks_s) on the real chip, 7B W4 g128 fused+prenorm params.

Context: BENCH_r03/r04 serve at ~640 generated-tok/s vs 1319 static decode
(util_gen 0.97): the gap is wave compute + syncs, but the split was never
measured.  Run:  timeout 900 python scripts/probe_serve_split.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_quantized_llama, serve_throughput
from iron_weight_only_quant_tpu.config import QuantSpec
from iron_weight_only_quant_tpu.models import LlamaConfig

from iron_weight_only_quant_tpu.models.llama import fuse_llama_projections


def main():
    cfg = LlamaConfig.llama2_7b()
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    params = build_quantized_llama(cfg, key, spec, jnp.bfloat16,
                                   quantize_lm_head=True, prenorm=True)
    params = fuse_llama_projections(params)
    jax.block_until_ready(jax.tree.leaves(params["layers"][0]))
    print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)

    for chunk in (16, 32):
        stats = serve_throughput(cfg, params, 8, chunk=chunk, max_new=32)
        print(f"chunk={chunk}:")
        for k in sorted(stats):
            print(f"  {k}: {stats[k]}")
        print(flush=True)


if __name__ == "__main__":
    main()
