"""Binary-search the ~1.0 ms/step serve-vs-static gap (probe_chunk_gap,
round 4).  probe_chunk_gap3 cleared the KV writes (noop == vmap), so the
cost is elsewhere in the serve step.  Four inline chunk variants, each
adding one ingredient; per-step from c=16/48-style slopes with distinct c
per variant (trace-time flags):

  base   : scan{ forward(tok, scalar caches); argmax }  -- static twin
  sample : base + per-step rng split + sample_tokens
  feed   : sample + meta unpack + feed-select machinery
  blens  : feed + [B] slot-local lens (positions/mask/writes) == _serve_chunk

Run:  timeout 1800 python scripts/probe_chunk_gap4.py
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
from iron_weight_only_quant_tpu.engine.engine import _stamp, sample_tokens
from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward
from iron_weight_only_quant_tpu.models.llama import fuse_llama_projections

NS = 8
T_MAX = 128


@partial(jax.jit, static_argnames=("cfg", "variant", "c"),
         donate_argnames=("caches",))
def chunk_variant(params, meta, caches, rng, cfg, variant, c):
    ns = meta.shape[0] // (c + 3)
    tok0 = meta[:ns][:, None]
    feed_next = meta[ns : ns + ns * c].reshape(ns, c)
    feed_len = meta[ns + ns * c : 2 * ns + ns * c]
    lens0 = meta[2 * ns + ns * c :]
    blens = variant == "blens"
    caches = _stamp(caches, lens0 if blens else lens0[0], None, None)
    cols = jnp.arange(T_MAX)

    def step(carry, inp):
        tok, caches, lens, rng = carry
        i, feed_col = inp
        lens_c = jnp.minimum(lens, T_MAX - 1)
        if variant in ("blens", "bpos", "bmask"):
            # bpos: [B,1] positions, batch-free mask; bmask: the reverse
            if variant == "bmask":
                positions = lens_c[:1]
            else:
                positions = lens_c[:, None]
            if variant == "bpos":
                mask = cols[None, None, None, :] <= lens_c[0]
            else:
                mask = cols[None, None, None, :] <= lens_c[:, None, None,
                                                           None]
            logits, caches = llama_forward(params, tok, cfg, caches=caches,
                                           positions=positions,
                                           attn_mask=mask)
        else:
            logits, caches = llama_forward(params, tok, cfg, caches=caches)
        if variant == "base":
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            tok_next = nxt[:, None]
        else:
            rng, sub = jax.random.split(rng)
            nxt = sample_tokens(logits[:, -1], sub, 0.0, 0)
            if variant == "sample":
                tok_next = nxt[:, None]
            else:
                tok_next = jnp.where((i + 1) < feed_len, feed_col, nxt)[:, None]
        return (tok_next, caches, lens + 1, rng), nxt

    (_, caches, _, _), sampled = jax.lax.scan(
        step, (tok0, caches, lens0, rng),
        (jnp.arange(c), jnp.swapaxes(feed_next, 0, 1)),
    )
    return jnp.swapaxes(sampled, 0, 1), caches


def make_runner(cfg, params, variant, c):
    ecfg = EngineConfig(kv=KVCacheConfig(max_seq_len=T_MAX),
                        max_batch_size=NS)
    eng = InferenceEngine(params, cfg, llama_forward, engine_cfg=ecfg,
                          dtype=jnp.bfloat16)
    state = {"caches": eng._fresh_caches(NS)}
    rng = jax.random.PRNGKey(0)
    meta = jnp.asarray(np.concatenate([
        np.full(NS, 7), np.zeros(NS * c), np.zeros(NS), np.full(NS, 32),
    ]).astype(np.int32))

    def run():
        sampled, caches = chunk_variant(params, meta, state["caches"], rng,
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
    for variant, (c_lo, c_hi) in (("base", (16, 48)), ("bpos", (15, 47)),
                                  ("bmask", (14, 46)), ("blens", (13, 45))):
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
