#!/usr/bin/env python3
"""GPipe PP scoring overhead at 1 stage vs the plain forward (round 5).

PP's scope is batch scoring/prefill (parallel/pp.py); until now it was
validated for parity on the virtual mesh but never TIMED.  One real chip
cannot show multi-stage scaling, but a 1-stage mesh bounds the pure
schedule overhead (stage scan + ppermute + vocab-parallel head plumbing)
against the plain unrolled forward on the same 7B W4 model -- the same
d=1 methodology as probe_tp_block.py.

Interleaved full-sequence scoring walls (B=4, S=512), per-token slope from
two sequence lengths to cancel fixed dispatch.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from bench import build_quantized_llama  # noqa: E402
from iron_weight_only_quant_tpu.config import QuantSpec  # noqa: E402
from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward  # noqa: E402
from iron_weight_only_quant_tpu.parallel.pp import (  # noqa: E402
    make_pp_llama_forward,
    stage_stack_llama_layers,
)

B = 4
S_LO, S_HI = 256, 512


def main():
    cfg = LlamaConfig.llama2_7b()
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    t0 = time.perf_counter()
    # ONE stacked build serves both paths (a flat + stacked + staged trio
    # would hold the model three times on the shared 16 GB chip): the PP
    # "stages" tree at n_stages=1 is the stacked tree with a leading 1 axis
    # (a free reshape)
    stacked = build_quantized_llama(cfg, jax.random.PRNGKey(0), spec,
                                    jnp.bfloat16, quantize_lm_head=False,
                                    stacked=True)
    jax.block_until_ready(stacked["embed"])
    print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)

    mesh = Mesh(np.array(jax.devices()[:1]), ("stage",))
    staged = {**{k: v for k, v in stacked.items() if k != "layers_stacked"},
              "stages": jax.tree.map(lambda a: a[None],
                                     stacked["layers_stacked"])}
    pp_fwd = make_pp_llama_forward(cfg, mesh, n_microbatches=2)

    # comparator: the scan forward (PP's body is also a layer scan; the
    # 32-layer unrolled full-sequence program exceeds the remote-compile
    # tunnel's payload limits)
    from iron_weight_only_quant_tpu.models.llama import llama_forward_scan

    @jax.jit
    def plain(sp, toks):
        logits, _ = llama_forward_scan(sp, toks, cfg)
        return jnp.sum(logits[:, -1].astype(jnp.float32))

    pp_jit = jax.jit(lambda sp, toks: jnp.sum(
        pp_fwd(sp, toks)[:, -1].astype(jnp.float32)))

    runners = {}
    for s in (S_LO, S_HI):
        toks = jnp.ones((B, s), jnp.int32)
        runners[("plain", s)] = (lambda t=toks: float(plain(stacked, t)))
        runners[("pp1", s)] = (lambda t=toks: float(pp_jit(staged, t)))
    for key, fn in runners.items():
        fn()
        print(f"compiled {key}", flush=True)

    best = {k: float("inf") for k in runners}
    for _ in range(12):
        for k, fn in runners.items():
            t1 = time.perf_counter()
            fn()
            best[k] = min(best[k], time.perf_counter() - t1)
    res = {}
    for name in ("plain", "pp1"):
        lo, hi = best[(name, S_LO)], best[(name, S_HI)]
        res[name] = (hi - lo) / (S_HI - S_LO)
        print(f"{name}: S={S_LO} {lo*1e3:.1f} ms  S={S_HI} {hi*1e3:.1f} ms "
              f"-> {res[name]*1e6:.1f} us/token-col", flush=True)
    print(f"pp 1-stage scoring overhead: "
          f"{(res['pp1'] / res['plain'] - 1) * 100:.1f}% per token-col",
          flush=True)


if __name__ == "__main__":
    main()
