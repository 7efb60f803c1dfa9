#!/usr/bin/env python3
"""Decompose the per-layer decode residue: weights stream ~160 us/layer at
the dense rate, the e2e slope says ~210 us/layer (BENCH_r02) -- where do the
~50 us of attention/norm/rope/cache glue go?

Method: one 8-layer 7B-shape W4 model, decode-step slope timing (jitted
prefill + decode scan, bench.py methodology), ablating one block component
per variant.  All variants interleave per round and keep minima (shared
chip: contention only adds time).  The cost of a component is
(t_full - t_variant) / L.

Run alone on the shared chip:  timeout 2400 python scripts/probe_glue.py
"""

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def make_forward(variant: str, cfg):
    """llama_forward clone with one block component ablated."""
    from iron_weight_only_quant_tpu.engine.kvcache import (
        cache_max_len,
        update_and_fetch,
    )
    from iron_weight_only_quant_tpu.models.common import (
        apply_rope,
        attend,
        linear,
        rmsnorm,
        rope_tables,
    )

    def block(x, p, cos, sin, mask, cache):
        b, s, h = x.shape
        hd = cfg.hd

        if variant == "prenorm":
            # in-kernel weightless rmsnorm (gamma==1 in this probe's random
            # init, so exact); measures the implemented pre_norm path
            q, k, v = p["qkv"].apply(x, pre_norm=cfg.rms_norm_eps)
            q = q.reshape(b, s, cfg.num_heads, hd)
            k = k.reshape(b, s, cfg.num_kv_heads, hd)
            v = v.reshape(b, s, cfg.num_kv_heads, hd)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            cache, k, v = update_and_fetch(cache, k, v)
            attn = attend(q, k, v, mask)
            x = x + linear(attn.reshape(b, s, cfg.num_heads * hd), p["o"])
            gate, up = p["gate_up"].apply(x, pre_norm=cfg.rms_norm_eps)
            gate = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype)
            x = x + linear(gate * up, p["down"])
            return x, cache

        if variant == "xla_attn":
            # force the plain XLA attention chain (attend() now dispatches
            # to the fused Pallas decode-attention kernel on TPU; this
            # variant is the A/B control)
            attn_in = rmsnorm(x, p["input_norm"], cfg.rms_norm_eps)
            q, k, v = p["qkv"].apply(attn_in)
            q = q.reshape(b, s, cfg.num_heads, hd)
            k = k.reshape(b, s, cfg.num_kv_heads, hd)
            v = v.reshape(b, s, cfg.num_kv_heads, hd)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            cache, k, v = update_and_fetch(cache, k, v)
            scores = jnp.einsum("bshd,bthd->bhst", q, k.astype(q.dtype),
                                preferred_element_type=jnp.float32) * hd**-0.5
            scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("bhst,bthd->bshd", probs.astype(v.dtype),
                              v.astype(q.dtype),
                              preferred_element_type=jnp.float32
                              ).astype(q.dtype)
            x = x + linear(attn.reshape(b, s, cfg.num_heads * hd), p["o"])
            mlp_in = rmsnorm(x, p["post_norm"], cfg.rms_norm_eps)
            gate, up = p["gate_up"].apply(mlp_in)
            gate = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype)
            x = x + linear(gate * up, p["down"])
            return x, cache

        if variant == "prenorm_fused_attn":
            # the full shipped fast path: in-kernel rmsnorm + fused decode
            # attention (attend() dispatch)
            q, k, v = p["qkv"].apply(x, pre_norm=cfg.rms_norm_eps)
            q = q.reshape(b, s, cfg.num_heads, hd)
            k = k.reshape(b, s, cfg.num_kv_heads, hd)
            v = v.reshape(b, s, cfg.num_kv_heads, hd)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            cache, k, v = update_and_fetch(cache, k, v)
            attn = attend(q, k, v, mask)
            x = x + linear(attn.reshape(b, s, cfg.num_heads * hd), p["o"])
            gate, up = p["gate_up"].apply(x, pre_norm=cfg.rms_norm_eps)
            gate = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype)
            x = x + linear(gate * up, p["down"])
            return x, cache

        if variant == "bhtd_cache":
            # cache stored [B, H, T, D]: the attention einsums consume it
            # with NO per-step transposition of the whole cache slab
            attn_in = rmsnorm(x, p["input_norm"], cfg.rms_norm_eps)
            q, k, v = p["qkv"].apply(attn_in)
            q = q.reshape(b, s, cfg.num_heads, hd)
            k = k.reshape(b, s, cfg.num_kv_heads, hd)
            v = v.reshape(b, s, cfg.num_kv_heads, hd)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            start = cache.length
            kc = jax.lax.dynamic_update_slice(
                cache.k, k.transpose(0, 2, 1, 3).astype(cache.k.dtype),
                (0, 0, start, 0))
            vc = jax.lax.dynamic_update_slice(
                cache.v, v.transpose(0, 2, 1, 3).astype(cache.v.dtype),
                (0, 0, start, 0))
            cache = cache._replace(k=kc, v=vc, length=cache.length + s)
            scores = jnp.einsum("bshd,bhtd->bhst", q,
                                kc.astype(q.dtype),
                                preferred_element_type=jnp.float32) * hd**-0.5
            scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("bhst,bhtd->bshd", probs.astype(vc.dtype),
                              vc, preferred_element_type=jnp.float32
                              ).astype(q.dtype)
            x = x + linear(attn.reshape(b, s, cfg.num_heads * hd), p["o"])
            mlp_in = rmsnorm(x, p["post_norm"], cfg.rms_norm_eps)
            gate, up = p["gate_up"].apply(mlp_in)
            gate = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype)
            x = x + linear(gate * up, p["down"])
            return x, cache

        attn_in = x if variant == "no_norms" else rmsnorm(
            x, p["input_norm"], cfg.rms_norm_eps)
        if "qkv" in p:
            q, k, v = p["qkv"].apply(attn_in)
            q = q.reshape(b, s, cfg.num_heads, hd)
            k = k.reshape(b, s, cfg.num_kv_heads, hd)
            v = v.reshape(b, s, cfg.num_kv_heads, hd)
        else:
            q = linear(attn_in, p["q"]).reshape(b, s, cfg.num_heads, hd)
            k = linear(attn_in, p["k"]).reshape(b, s, cfg.num_kv_heads, hd)
            v = linear(attn_in, p["v"]).reshape(b, s, cfg.num_kv_heads, hd)
        if variant != "no_rope":
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)

        if variant == "no_cache":
            # attend over just the fresh tokens; cache untouched
            attn = attend(q, k, v, jnp.ones((1, 1, s, s), bool))
        elif variant == "no_attend":
            cache, k, v = update_and_fetch(cache, k, v)
            attn = jnp.broadcast_to(v[:, :s], q.shape)  # skip the attention math
        elif variant == "matmuls_only":
            attn = jnp.broadcast_to(v[:, :s], q.shape)
        else:
            cache, k, v = update_and_fetch(cache, k, v)
            attn = attend(q, k, v, mask)
        x = x + linear(attn.reshape(b, s, cfg.num_heads * hd), p["o"])

        mlp_in = x if variant in ("no_norms", "matmuls_only") else rmsnorm(
            x, p["post_norm"], cfg.rms_norm_eps)
        if "gate_up" in p:
            gate, up = p["gate_up"].apply(mlp_in)
        else:
            gate = linear(mlp_in, p["gate"])
            up = linear(mlp_in, p["up"])
        gate = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype)
        x = x + linear(gate * up, p["down"])
        return x, cache

    def fwd(params, tokens, _cfg, caches=None, positions=None, attn_mask=None):
        b, s = tokens.shape
        x = params["embed"][tokens]
        start = caches[0].length
        if positions is None:
            positions = start + jnp.arange(s)
        t_max = (caches[0].k.shape[2] if variant == "bhtd_cache"
                 else cache_max_len(caches[0]))
        cols = jnp.arange(t_max)[None, :]
        qpos = positions if positions.ndim == 1 else positions[0]
        mask = (cols <= qpos[:, None])[None, None]
        cos, sin = rope_tables(positions, cfg.hd, cfg.rope_theta)
        new_caches = []
        for i, p in enumerate(params["layers"]):
            x, c = block(x, p, cos, sin, mask, caches[i])
            new_caches.append(c)
        x = rmsnorm(x, params["final_norm"], cfg.rms_norm_eps)
        logits = linear(x, params["lm_head"])
        return logits, new_caches

    return fwd


def time_variant(cfg, params, fwd, batch, t_lo=12, t_hi=36, max_len=64,
                 cache_tx=None):
    from iron_weight_only_quant_tpu.config import KVCacheConfig
    from iron_weight_only_quant_tpu.engine.kvcache import make_caches

    def make_runner(steps):
        @jax.jit
        def run(params, prompt):
            caches = make_caches(cfg.num_layers, batch, cfg.num_kv_heads,
                                 cfg.hd, KVCacheConfig(max_seq_len=max_len),
                                 jnp.bfloat16)
            if cache_tx is not None:
                caches = [cache_tx(c) for c in caches]
            logits, caches = fwd(params, prompt, cfg, caches=caches)
            tok0 = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)

            def step(carry, _):
                tok, caches = carry
                logits, caches = fwd(params, tok, cfg, caches=caches)
                nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                return (nxt, caches), nxt[:, 0]

            (tok, caches), toks = jax.lax.scan(step, (tok0, caches), None,
                                               length=steps)
            return toks

        return run

    def run_once(runner):
        prompt = jnp.ones((batch, 8), jnp.int32)
        return float(jnp.sum(runner(params, prompt)))

    lo, hi = make_runner(t_lo), make_runner(t_hi)
    run_once(lo)
    run_once(hi)

    def timed(r):
        t0 = time.perf_counter()
        run_once(r)
        return time.perf_counter() - t0

    return lo, hi, timed


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())

    from bench import build_quantized_llama
    from iron_weight_only_quant_tpu.config import QuantSpec
    from iron_weight_only_quant_tpu.models import LlamaConfig
    from iron_weight_only_quant_tpu.models.llama import fuse_llama_projections

    L = 8
    cfg = dataclasses.replace(LlamaConfig.llama2_7b(), num_layers=L)
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    batch = 8
    # explicit norm weights (gamma=1): most variants apply rmsnorm in XLA;
    # the "prenorm" variant ignores them (exact, gamma==1)
    params = fuse_llama_projections(
        build_quantized_llama(cfg, jax.random.PRNGKey(0), spec, jnp.bfloat16,
                              prenorm=False))

    import os

    all_variants = ["full", "no_attend", "no_cache", "no_rope", "no_norms",
                    "matmuls_only", "prenorm", "bhtd_cache", "xla_attn",
                    "prenorm_fused_attn"]
    sel = os.environ.get("GLUE_VARIANTS")
    variants = sel.split(",") if sel else all_variants

    def bhtd_tx(c):
        return c._replace(k=jnp.swapaxes(c.k, 1, 2),
                          v=jnp.swapaxes(c.v, 1, 2))

    runners = {}
    for v in variants:
        runners[v] = time_variant(
            cfg, params, make_forward(v, cfg), batch,
            cache_tx=bhtd_tx if v == "bhtd_cache" else None)
        print(f"compiled {v}", flush=True)

    t_lo = {v: float("inf") for v in variants}
    t_hi = {v: float("inf") for v in variants}
    for rnd in range(4):
        for v in variants:
            lo, hi, timed = runners[v]
            for _ in range(4):
                t_lo[v] = min(t_lo[v], timed(lo))
                t_hi[v] = min(t_hi[v], timed(hi))
        print(f"-- round {rnd}")
        base = (t_hi["full"] - t_lo["full"]) / 24
        for v in variants:
            slope = (t_hi[v] - t_lo[v]) / 24  # per decode step
            per_layer = slope / L
            delta = (base - slope) / L
            print(f"  {v:14s}: {slope*1e3:6.3f} ms/step "
                  f"{per_layer*1e6:6.1f} us/layer  saved={delta*1e6:5.1f} us/layer",
                  flush=True)


if __name__ == "__main__":
    main()
