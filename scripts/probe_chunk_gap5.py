"""Round-5 attack on the ~1 ms/step serve-vs-static gap: CARRIED mask.

probe_chunk_gap4 isolated the trigger: per-slot [B,1] rope positions AND a
per-slot [B,1,1,T] mask in the same step ("blens").  Every r4 reformulation
recomputed the mask from `lens` each step; here the boolean validity mask
RIDES THE SCAN CARRY as a [B, T] buffer updated by a one-column scatter per
step (scatter writes measured free, probe_chunk_gap3), severing the
lens -> mask dataflow XLA fuses badly.  Variants, all interleaved:

  base    : static twin (scalar timeline, no per-slot anything)
  blens   : the current _serve_chunk formulation (per-step lens -> mask)
  carried : per-slot positions + CARRIED scatter-updated mask

Run alone on the TPU:  timeout 2400 python scripts/probe_chunk_gap5.py
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_quantized_llama
from iron_weight_only_quant_tpu.config import (EngineConfig, KVCacheConfig,
                                               QuantSpec)
from iron_weight_only_quant_tpu.engine import InferenceEngine
from iron_weight_only_quant_tpu.engine.engine import _stamp, sample_tokens
from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward
from iron_weight_only_quant_tpu.models.llama import fuse_llama_projections

NS = 8
T_MAX = 128


@partial(jax.jit, static_argnames=("cfg", "variant", "c"),
         donate_argnames=("caches",))
def chunk_variant(params, lens0, caches, rng, cfg, variant, c):
    blens = variant != "base"
    caches = _stamp(caches, lens0 if blens else lens0[0], None, None)
    cols = jnp.arange(T_MAX)
    tok0 = jnp.full((NS, 1), 7, jnp.int32)

    if variant == "carried":
        mask0 = cols[None, :] <= lens0[:, None]  # [B, T] bool, built ONCE
        b_idx = jnp.arange(NS)

        def step(carry, _):
            tok, caches, lens, mask, rng = carry
            lens_c = jnp.minimum(lens, T_MAX - 1)
            positions = lens_c[:, None]
            rng, sub = jax.random.split(rng)
            logits, caches = llama_forward(
                params, tok, cfg, caches=caches, positions=positions,
                attn_mask=mask[:, None, None, :])
            nxt = sample_tokens(logits[:, -1], sub, 0.0, 0)
            # advance validity by scatter, not by recomputation from lens
            mask = mask.at[b_idx, jnp.minimum(lens_c + 1, T_MAX - 1)].set(True)
            return (nxt[:, None], caches, lens + 1, mask, rng), nxt

        (_, caches, _, _, _), sampled = jax.lax.scan(
            step, (tok0, caches, lens0, mask0, rng), None, length=c)
        return jnp.swapaxes(sampled, 0, 1), caches

    def step(carry, _):
        tok, caches, lens, rng = carry
        lens_c = jnp.minimum(lens, T_MAX - 1)
        rng, sub = jax.random.split(rng)
        if variant == "blens":
            positions = lens_c[:, None]
            mask = cols[None, None, None, :] <= lens_c[:, None, None, None]
            logits, caches = llama_forward(params, tok, cfg, caches=caches,
                                           positions=positions,
                                           attn_mask=mask)
        else:
            logits, caches = llama_forward(params, tok, cfg, caches=caches)
        nxt = sample_tokens(logits[:, -1], sub, 0.0, 0)
        return (nxt[:, None], caches, lens + 1, rng), nxt

    (_, caches, _, _), sampled = jax.lax.scan(
        step, (tok0, caches, lens0, rng), None, length=c)
    return jnp.swapaxes(sampled, 0, 1), caches


def make_runner(cfg, params, variant, c):
    ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=T_MAX),
                        max_batch_size=NS)
    eng = InferenceEngine(params, cfg, llama_forward, engine_cfg=ecfg,
                          dtype=jnp.bfloat16)
    state = {"caches": eng._fresh_caches(NS)}
    rng = jax.random.PRNGKey(0)
    lens0 = jnp.asarray(np.zeros(NS), jnp.int32)

    def run():
        sampled, caches = chunk_variant(params, lens0, state["caches"], rng,
                                        cfg, variant, c)
        state["caches"] = caches
        return float(jnp.sum(sampled))

    run()
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

    pairs, steps = {}, {}
    for variant, (c_lo, c_hi) in (("base", (16, 48)), ("blens", (15, 47)),
                                  ("carried", (14, 46))):
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
            step_ms = (th - tl) / (c_hi - c_lo) * 1e3
            print(f"  {name}: lo {tl*1e3:.1f} ms  hi {th*1e3:.1f} ms  "
                  f"-> {step_ms:.3f} ms/step", flush=True)
        print()


if __name__ == "__main__":
    main()
