#!/usr/bin/env python3
"""Multi-host scaling benchmark (tokens/s/chip at 1 chip / 1 host / N hosts).

Measures decode throughput of a tensor+data-parallel quantized LLaMA over
whatever devices are visible, reporting scaling efficiency vs the single-chip
number (BASELINE.md target: >=85% at 2 hosts).

Single-process (1 host):   python scripts/multihost_bench.py --model_parallel 4
Multi-host pod slice:      run one process per host with
  IWOQ_NUM_PROCESSES=<n> IWOQ_PROCESS_ID=<i> IWOQ_COORDINATOR=<host0>:8476 \
  python scripts/multihost_bench.py --model_parallel <chips_per_host*n> ...

Virtual-device dry run (no TPU pod needed):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python scripts/multihost_bench.py --model_parallel 4 --data_parallel 2 --tiny

This container exposes one TPU chip, so real N>1 numbers must be produced on
a pod slice; the script is the procedure.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_parallel", type=int, default=1)
    ap.add_argument("--data_parallel", type=int, default=1)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--batch_per_replica", type=int, default=8)
    ap.add_argument("--steps", type=int, default=32)
    args = ap.parse_args()

    from iron_weight_only_quant_tpu.parallel import multihost_init

    multihost_init()

    import jax
    import jax.numpy as jnp

    from iron_weight_only_quant_tpu.config import (
        EngineConfig,
        KVCacheConfig,
        MeshConfig,
        QuantSpec,
    )
    from iron_weight_only_quant_tpu.engine import InferenceEngine
    from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import build_quantized_llama

    if args.tiny:
        cfg = LlamaConfig(vocab_size=512, hidden_size=512, intermediate_size=1024,
                          num_layers=2, num_heads=4, num_kv_heads=2,
                          max_position_embeddings=256)
    else:
        cfg = LlamaConfig.llama2_7b()

    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    params = build_quantized_llama(cfg, jax.random.PRNGKey(0), spec, jnp.bfloat16)

    batch = args.batch_per_replica * args.data_parallel
    ecfg = EngineConfig(
        mesh=MeshConfig(data=args.data_parallel, model=args.model_parallel),
        kv=KVCacheConfig(max_seq_len=128),
        max_batch_size=batch,
    )
    eng = InferenceEngine(params, cfg, llama_forward, family="llama",
                          engine_cfg=ecfg)

    prompts = [[1, 2, 3, 4]] * batch
    eng.generate(prompts, max_new_tokens=4)  # warm + compile
    t0 = time.perf_counter()
    eng.generate(prompts, max_new_tokens=args.steps)
    dt = time.perf_counter() - t0
    toks = batch * args.steps
    n_dev = args.data_parallel * args.model_parallel
    result = {
        "metric": "decode tokens/s/chip",
        "devices": n_dev,
        "mesh": {"data": args.data_parallel, "model": args.model_parallel},
        "tokens_per_s": round(toks / dt, 2),
        "tokens_per_s_per_chip": round(toks / dt / n_dev, 2),
        "process_count": jax.process_count(),
    }
    if jax.process_index() == 0:
        print(json.dumps(result))


if __name__ == "__main__":
    main()
