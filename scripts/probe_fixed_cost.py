#!/usr/bin/env python3
"""Decompose the per-decode-step FIXED cost (NOTES.md: ~714 us on the 7B).

The depth-slope says each step pays ~0.7 ms that is not per-layer weight
streaming.  The bf16 lm_head (4096x32000, 262 MB) explains ~350 us at the
measured dense rate; this probe isolates the rest by interleaving decode
variants on a shallow (L=4) 7B-width model:

  full   : standard step (dense bf16 head, argmax sampling)
  qhead  : int4-g128 packed lm_head (the --qhead serving mode)
  tiny   : 4096x512 dense head (head bytes ~0 -> everything-but-head fixed)

plus standalone slope timings of the argmax and final-norm ops.

Run alone on the shared chip:  timeout 1800 python scripts/probe_fixed_cost.py
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

    from bench import build_quantized_llama, decode_time_per_step, _slope_timeit
    from iron_weight_only_quant_tpu.config import QuantSpec
    from iron_weight_only_quant_tpu.models import LlamaConfig
    from iron_weight_only_quant_tpu.quantize import quantize_tensor

    cfg = dataclasses.replace(LlamaConfig.llama2_7b(), num_layers=4)
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    key = jax.random.PRNGKey(0)
    batch = 8

    base = build_quantized_llama(cfg, key, spec, jnp.bfloat16)
    qhead = dict(base)
    qhead["lm_head"] = {
        "w": jax.jit(lambda w: quantize_tensor(w, spec, pad_n_to=512))(
            base["lm_head"]["w"].astype(jnp.float32)),
        "b": None,
    }
    tiny = dict(base)
    tiny["lm_head"] = {"w": base["lm_head"]["w"][:, :512], "b": None}

    variants = {"full": base, "qhead": qhead, "tiny": tiny}
    t = {k: float("inf") for k in variants}
    for rnd in range(3):
        for name, p in variants.items():
            t[name] = min(t[name], decode_time_per_step(cfg, p, batch))
        print({k: f"{v*1e3:.3f} ms" for k, v in t.items()})

    print(f"\nfull - tiny (head stream+argmax delta): "
          f"{(t['full']-t['tiny'])*1e6:.0f} us")
    print(f"full - qhead: {(t['full']-t['qhead'])*1e6:.0f} us")
    print(f"tiny residual fixed (vs 4*per-layer): run bench slope for "
          f"per-layer; tiny step = {t['tiny']*1e3:.3f} ms")

    # standalone ops at step shapes
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 1, 32000), jnp.bfloat16)
    t_argmax = _slope_timeit(
        lambda v: jnp.argmax(v, axis=-1).astype(jnp.bfloat16)[:, :, None] + v[:, :, :1], x)
    print(f"argmax[8,1,32000]: {t_argmax*1e6:.1f} us")
    h = jax.random.normal(jax.random.PRNGKey(2), (batch, 1, 4096), jnp.bfloat16)
    g = jnp.ones((4096,), jnp.bfloat16)

    def rms(v):
        var = jnp.mean(jnp.square(v.astype(jnp.float32)), axis=-1, keepdims=True)
        return (v * jax.lax.rsqrt(var + 1e-5).astype(v.dtype)) * g

    print(f"rmsnorm[8,1,4096]: {_slope_timeit(rms, h)*1e6:.1f} us")
    emb = jax.random.normal(jax.random.PRNGKey(3), (32000, 4096), jnp.bfloat16)
    tok = jnp.ones((batch, 1), jnp.int32)

    def lookup(v):
        return emb[v[:, 0]][:, None, :].sum(-1, keepdims=True).astype(v.dtype) + v

    print(f"embed lookup[8,1]: {_slope_timeit(lookup, tok)*1e6:.1f} us")


if __name__ == "__main__":
    main()
