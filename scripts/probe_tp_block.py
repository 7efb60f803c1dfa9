#!/usr/bin/env python3
"""shard_map (tp_block) decode overhead at mesh model=1 vs the plain engine.

Round-4 VERDICT item 1 measurement: with prenorm + fused projections now
plumbed through tp_block, the per-layer decode cost of the multi-chip path
at d=1 should sit within ~10% of the single-chip engine's (BENCH_r03:
186 us/layer).  Only one real chip exists here, so d=1 bounds the pure
shard_map/program-structure overhead; the psum cost at d>1 rides ICI we
cannot measure in this container.

Method: depth slope (L=16 vs L=4) per variant, all four runners interleaved
in the same timing windows (shared-chip methodology, NOTES.md).
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from bench import build_quantized_llama, interleaved_decode_slopes  # noqa: E402
from iron_weight_only_quant_tpu.config import KVCacheConfig, QuantSpec  # noqa: E402
from iron_weight_only_quant_tpu.engine.kvcache import make_caches  # noqa: E402
from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward  # noqa: E402
from iron_weight_only_quant_tpu.models.llama import fuse_llama_projections  # noqa: E402
from iron_weight_only_quant_tpu.parallel.tp_block import (  # noqa: E402
    fuse_projections_tp,
    make_tp_llama_forward,
)

BATCH = 8
T_LO, T_HI = 12, 36


def make_runner(cfg, params, fwd, steps, max_len=64):
    @jax.jit
    def run(params, prompt):
        caches = make_caches(cfg.num_layers, BATCH, cfg.num_kv_heads, cfg.hd,
                             KVCacheConfig(max_seq_len=max_len), jnp.bfloat16)
        logits, caches = fwd(params, prompt, caches)
        tok0 = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)

        def step(carry, _):
            tok, caches = carry
            logits, caches = fwd(params, tok, caches)
            nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            return (nxt, caches), nxt[:, 0]

        (_, _), toks = jax.lax.scan(step, (tok0, caches), None, length=steps)
        return toks

    def once():
        return float(jnp.sum(run(params, jnp.ones((BATCH, 8), jnp.int32))))

    once()  # compile
    return once


def main():
    import dataclasses

    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    base = LlamaConfig.llama2_7b()
    mesh = Mesh(np.array(jax.devices()[:1]), ("model",))

    pairs = {}
    for L in (16, 4):
        cfg = dataclasses.replace(base, num_layers=L)
        qp = build_quantized_llama(cfg, jax.random.PRNGKey(0), spec,
                                   jnp.bfloat16)
        plain_p = fuse_llama_projections(qp)
        tp_p = fuse_projections_tp(qp, 1)
        del qp

        def plain_fwd(params, toks, caches, _cfg=cfg):
            return llama_forward(params, toks, _cfg, caches=caches)

        tpf = make_tp_llama_forward(cfg, mesh)

        def tp_fwd(params, toks, caches, _tpf=tpf):
            return _tpf(params, toks, caches=caches)

        def tpu_fwd(params, toks, caches, _tpf=tpf):
            return _tpf(params, toks, caches=caches)

        pairs[f"plain{L}"] = (make_runner(cfg, plain_p, plain_fwd, T_LO),
                              make_runner(cfg, plain_p, plain_fwd, T_HI))
        pairs[f"tpb{L}"] = (make_runner(cfg, tp_p, tp_fwd, T_LO),
                            make_runner(cfg, tp_p, tp_fwd, T_HI))
        # unfused tp_block (prenorm still in-kernel): locates whether the
        # d=1 overhead is fusion-layout or shard_map-structural
        base_p = build_quantized_llama(cfg, jax.random.PRNGKey(0), spec,
                                       jnp.bfloat16)
        pairs[f"tpbu{L}"] = (make_runner(cfg, base_p, tpu_fwd, T_LO),
                             make_runner(cfg, base_p, tpu_fwd, T_HI))

    slopes = interleaved_decode_slopes(pairs, T_LO, T_HI)
    pl_plain = (slopes["plain16"] - slopes["plain4"]) / 12
    pl_tpb = (slopes["tpb16"] - slopes["tpb4"]) / 12
    pl_tpbu = (slopes["tpbu16"] - slopes["tpbu4"]) / 12
    print(f"step slopes (ms): " +
          ", ".join(f"{k}={v * 1e3:.3f}" for k, v in slopes.items()))
    print(f"per-layer: plain {pl_plain * 1e6:.1f} us, tp_block(d=1) "
          f"{pl_tpb * 1e6:.1f} us ({(pl_tpb / pl_plain - 1) * 100:+.1f}%), "
          f"tp_block-unfused {pl_tpbu * 1e6:.1f} us "
          f"({(pl_tpbu / pl_plain - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
