#!/usr/bin/env python3
"""Resolve the packed-sides contradiction (VERDICT r2 item 6).

Single-kernel microbenches said (bf16 s|z)-in-int32 side info wins +14-21%
on large-tpk shapes; the e2e headline said 7.62 vs 6.90 ms -- consistently
slower.  Both cannot be load-bearing.  This probe applies packed sides
PER-PROJECTION inside the e2e depth slope (L=4, interleaved minima) to
isolate which projection loses:

  base        f32 side arrays everywhere
  all         packed sides on every projection (tpk>=256 kernel gating)
  qkv         packed on the fused qkv only (kp=2048, tpk=2048 plan)
  gate_up     packed on the fused gate_up only
  o           packed on the o projection only
  down        packed on down only (kp=5504 -> tpk=128: gated OFF, sanity)

Decision rule (VERDICT): ship per-shape defaults if any variant wins e2e;
otherwise delete the packed-sides kernel variants and artifact field.

Run alone on the shared chip:  timeout 2400 python scripts/probe_packed_sides.py
"""

import dataclasses
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
    from iron_weight_only_quant_tpu.models.llama import fuse_llama_projections
    from iron_weight_only_quant_tpu.quantize.qtensor import QuantizedTensor
    from iron_weight_only_quant_tpu.quantize.rtn import with_packed_sides

    cfg = dataclasses.replace(LlamaConfig.llama2_7b(), num_layers=4)
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    batch = 8
    base = build_quantized_llama(cfg, jax.random.PRNGKey(0), spec, jnp.bfloat16)

    def packed_on(keys):
        layers = []
        for blk in base["layers"]:
            nb = dict(blk)
            for key in keys:
                lin = nb[key]
                if isinstance(lin.get("w"), QuantizedTensor):
                    nb[key] = {**lin, "w": with_packed_sides(lin["w"])}
            layers.append(nb)
        return fuse_llama_projections({**base, "layers": layers})

    variants = {
        "base": packed_on(()),
        "all": packed_on(("q", "k", "v", "o", "gate", "up", "down")),
        "qkv": packed_on(("q", "k", "v")),
        "gate_up": packed_on(("gate", "up")),
        "o": packed_on(("o",)),
        "down": packed_on(("down",)),
    }

    t = {name: float("inf") for name in variants}
    for rnd in range(4):
        for name, params in variants.items():
            t[name] = min(t[name], decode_time_per_step(cfg, params, batch))
        print(f"-- round {rnd}")
        for name in variants:
            d = (t[name] - t["base"]) / cfg.num_layers * 1e6
            print(f"  {name:8s}: {t[name]*1e3:6.3f} ms/step  "
                  f"delta={d:+6.1f} us/layer", flush=True)


if __name__ == "__main__":
    main()
