"""Fast repro harness for the [B]-positions x [B]-mask serve slowdown.

probe_chunk_gap4 (round 4): batched rope positions alone and batched
attention mask alone are free, but BOTH together cost ~1.0 ms/step at 7B
depth (31 us/layer).  This reproduces at L=4 so reformulations iterate in
seconds:

  base   : scalar positions + [1,1,1,T] mask     (static twin)
  blens  : [B,1] positions + [B,1,1,T] mask      (serve semantics, where-mask)
  vbias  : blens but mask as additive f32 bias   (add instead of select)
  vrope  : blens but cos/sin precomputed for the whole chunk outside the
           scan and delivered per-step via scan xs

Run:  timeout 1200 python scripts/probe_attn_micro.py
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_quantized_llama
from iron_weight_only_quant_tpu.config import (EngineConfig, KVCacheConfig,
                                               QuantSpec)
from iron_weight_only_quant_tpu.engine import InferenceEngine
from iron_weight_only_quant_tpu.engine.engine import _stamp
from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward
from iron_weight_only_quant_tpu.models.common import rope_tables
from iron_weight_only_quant_tpu.models.llama import fuse_llama_projections

NS = 8
T_MAX = 128
L = 4


@partial(jax.jit, static_argnames=("cfg", "variant", "c"),
         donate_argnames=("caches",))
def chunk_variant(params, lens0, caches, cfg, variant, c):
    caches = _stamp(caches, lens0 if variant != "base" else lens0[0],
                    None, None)
    cols = jnp.arange(T_MAX)
    tok0 = jnp.full((NS, 1), 7, jnp.int32)

    if variant == "vrope":
        # all c steps' positions are lens0 + t: precompute [C, B, 1] tables
        pos_all = lens0[None, :] + jnp.arange(c)[:, None]  # [C, B]
        cos_all, sin_all = rope_tables(
            jnp.minimum(pos_all, T_MAX - 1)[:, :, None], cfg.hd,
            cfg.rope_theta, cfg.condense_ratio)  # [C, B, 1, hd]
    else:
        cos_all = sin_all = jnp.zeros((c,), jnp.float32)

    def step(carry, inp):
        tok, caches, lens = carry
        cos_t, sin_t = inp
        lens_c = jnp.minimum(lens, T_MAX - 1)
        if variant == "base":
            logits, caches = llama_forward(params, tok, cfg, caches=caches)
        else:
            positions = lens_c[:, None]
            mask = cols[None, None, None, :] <= lens_c[:, None, None, None]
            if variant == "vbias":
                mask = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
            if variant == "vrope":
                from iron_weight_only_quant_tpu.models.llama import (
                    _llama_forward_tables)
                logits, caches = _llama_forward_tables(
                    params, tok, cfg, cos_t, sin_t, mask, caches)
            else:
                logits, caches = llama_forward(params, tok, cfg,
                                               caches=caches,
                                               positions=positions,
                                               attn_mask=mask)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return (nxt[:, None], caches, lens + 1), nxt

    (_, caches, _), sampled = jax.lax.scan(
        step, (tok0, caches, lens0), (cos_all, sin_all))
    return sampled, caches


def make_runner(cfg, params, variant, c):
    ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=T_MAX),
                        max_batch_size=NS)
    eng = InferenceEngine(params, cfg, llama_forward, engine_cfg=ecfg,
                          dtype=jnp.bfloat16)
    state = {"caches": eng._fresh_caches(NS)}
    lens0 = jnp.asarray(np.full(NS, 32), jnp.int32)

    def run():
        sampled, caches = chunk_variant(params, lens0, state["caches"], cfg,
                                        variant, c)
        state["caches"] = caches
        return float(jnp.sum(sampled))

    run()
    return run


def main():
    cfg = LlamaConfig.llama2_7b()
    cfg = cfg.replace(num_layers=L) if hasattr(cfg, "replace") else None
    if cfg is None:
        import dataclasses
        cfg = dataclasses.replace(LlamaConfig.llama2_7b(), num_layers=L)
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    t0 = time.perf_counter()
    params = fuse_llama_projections(build_quantized_llama(
        cfg, jax.random.PRNGKey(0), spec, jnp.bfloat16,
        quantize_lm_head=True, prenorm=True))
    jax.block_until_ready(jax.tree.leaves(params["layers"][0]))
    print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)

    variants = [("base", (64, 192)), ("blens", (63, 191)),
                ("vbias", (62, 190))]
    pairs, steps = {}, {}
    for variant, (c_lo, c_hi) in variants:
        pairs[variant] = (make_runner(cfg, params, variant, c_lo),
                         make_runner(cfg, params, variant, c_hi))
        steps[variant] = (c_lo, c_hi)
        print(f"compiled {variant}", flush=True)

    ts = {name: [float("inf"), float("inf")] for name in pairs}
    for reps in (5, 5, 8):
        for _ in range(reps):
            for name, (lo, hi) in pairs.items():
                for i, fn in enumerate((lo, hi)):
                    t1 = time.perf_counter()
                    fn()
                    ts[name][i] = min(ts[name][i], time.perf_counter() - t1)
        for name, (tl, th) in ts.items():
            c_lo, c_hi = steps[name]
            us = (th - tl) / (c_hi - c_lo) * 1e6
            print(f"  {name}: lo {tl*1e3:.1f} hi {th*1e3:.1f} ms "
                  f"-> {us:.1f} us/step ({us/L:.1f} us/layer)", flush=True)
        print()


if __name__ == "__main__":
    main()
