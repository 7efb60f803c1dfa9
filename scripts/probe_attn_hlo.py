"""Diff compiled-HLO op mixes for the base vs blens serve step (L=4).

Companion to probe_attn_micro.py: counts op kinds in the compiled module
(copies, transposes, fusions, scatters...) to locate where XLA's schedule
diverges when BOTH rope positions and the attention mask are batched.

Run:  timeout 900 python scripts/probe_attn_hlo.py
"""

import collections
import re
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_quantized_llama
from iron_weight_only_quant_tpu.config import QuantSpec
from iron_weight_only_quant_tpu.models import LlamaConfig
from iron_weight_only_quant_tpu.models.llama import fuse_llama_projections
from probe_attn_micro import L, NS, chunk_variant, make_runner  # noqa: F401
from iron_weight_only_quant_tpu.config import EngineConfig, KVCacheConfig
from iron_weight_only_quant_tpu.engine import InferenceEngine
from iron_weight_only_quant_tpu.models import llama_forward


def op_counts(hlo_text):
    counts = collections.Counter()
    for line in hlo_text.splitlines():
        m = re.search(r"=\s+\S+\s+(\w[\w-]*)\(", line)
        if m:
            counts[m.group(1)] += 1
    return counts


def main():
    import dataclasses
    cfg = dataclasses.replace(LlamaConfig.llama2_7b(), num_layers=L)
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    params = fuse_llama_projections(build_quantized_llama(
        cfg, jax.random.PRNGKey(0), spec, jnp.bfloat16,
        quantize_lm_head=True, prenorm=True))
    jax.block_until_ready(jax.tree.leaves(params["layers"][0]))

    ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=128), max_batch_size=NS)
    eng = InferenceEngine(params, cfg, llama_forward, engine_cfg=ecfg,
                          dtype=jnp.bfloat16)
    lens0 = jnp.asarray(np.full(NS, 32), jnp.int32)

    texts = {}
    for variant in ("base", "blens"):
        caches = eng._fresh_caches(NS)
        lowered = chunk_variant.lower(params, lens0, caches, cfg, variant, 8)
        compiled = lowered.compile()
        texts[variant] = compiled.as_text()
        print(f"{variant}: HLO {len(texts[variant])/1e6:.1f} MB", flush=True)
        ca = compiled.cost_analysis()
        if ca:
            keys = ("flops", "bytes accessed", "transcendentals")
            print("  cost:", {k: ca.get(k) for k in keys}, flush=True)

    ca_ops = {v: op_counts(t) for v, t in texts.items()}
    all_ops = sorted(set(ca_ops["base"]) | set(ca_ops["blens"]))
    print(f"\n{'op':28s} {'base':>8s} {'blens':>8s}")
    for op in all_ops:
        a, b = ca_ops["base"].get(op, 0), ca_ops["blens"].get(op, 0)
        if a != b:
            print(f"{op:28s} {a:8d} {b:8d}")
    with open("/tmp/hlo_base.txt", "w") as f:
        f.write(texts["base"])
    with open("/tmp/hlo_blens.txt", "w") as f:
        f.write(texts["blens"])
    print("\nfull HLO at /tmp/hlo_base.txt /tmp/hlo_blens.txt")


if __name__ == "__main__":
    main()
