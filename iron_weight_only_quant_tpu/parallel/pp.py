"""Pipeline parallelism: GPipe micro-batching over a ``"stage"`` mesh axis.

The reference has *layer placement only* -- accelerate's ``device_map``
spreads whole layers across GPUs and activations hop devices inside the
forward (main.py:331-345), and gptq/opt.py:272-306 hand-rolls the same for
OPT-175B.  There is no schedule and no overlap: one GPU computes at a time.

This module is the TPU-native upgrade: a real GPipe schedule inside one
``shard_map`` over a ``stage`` mesh axis.  Layer parameters are stacked
``[n_stages, L/n_stages, ...]`` and sharded on the leading axis, so each
device holds only its stage's weights; micro-batches stream through the
stages with ``ppermute`` hops over ICI/DCN, and every stage computes on a
different micro-batch each tick (the pipeline is full once ``tick >=
n_stages-1``).  Bubble fraction is the usual ``(S-1)/(M+S-1)``.

Scope: the batch-scoring forward (PPL evaluation, prefill, calibration) --
the compute-bound path where PP pays off.  Incremental decode stays on the
tensor-parallel engine (decode is bandwidth-bound; a PP bubble per token
would serialize it).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..models.common import (
    causal_mask,
    linear,
    rmsnorm,
    rope_tables,
    stacked_layer_view,
)
from ..models.llama import _block
from .tp_block import _SMAP_KW  # pallas outputs carry no vma metadata


def stage_stack_llama_layers(params: Dict[str, Any], n_stages: int) -> Dict[str, Any]:
    """Per-layer param list -> stage-major stacked pytree.

    Every leaf of ``params["layers"][i]`` is stacked to ``[L, ...]`` then
    reshaped to ``[n_stages, L/n_stages, ...]`` under the ``"stages"`` key;
    packed ``QuantizedTensor`` leaves stack the same way (static metadata is
    per-layer-identical).  Shard the leading axis with ``P("stage")`` and
    each device stores only its own stage's weights.
    """
    layers = params["layers"]
    n_layers = len(layers)
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible by {n_stages} stages")
    per = n_layers // n_stages
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    staged = jax.tree.map(
        lambda a: a.reshape((n_stages, per) + a.shape[1:]), stacked
    )
    return {**{k: v for k, v in params.items() if k != "layers"},
            "stages": staged}


def pp_param_specs(staged_params: Dict[str, Any], axis: str = "stage"):
    """PartitionSpec tree for :func:`stage_stack_llama_layers` output:
    stage-stacked weights on the stage axis, everything else replicated."""
    return {
        k: (jax.tree.map(lambda _: P(axis), v) if k == "stages"
            else jax.tree.map(lambda _: P(), v))
        for k, v in staged_params.items()
    }


def make_pp_llama_forward(cfg, mesh: Mesh, n_microbatches: int,
                          axis: str = "stage"):
    """Returns ``forward(staged_params, tokens) -> logits`` (full-sequence,
    no KV cache) running a GPipe schedule over ``mesh.shape[axis]`` stages.

    ``staged_params`` comes from :func:`stage_stack_llama_layers`; quantized
    layers run through the scalar-prefetch stacked kernel per stage, so PP
    composes with packed weights for free.
    """
    n_stages = mesh.shape[axis]
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def forward(staged_params, tokens: jnp.ndarray) -> jnp.ndarray:
        b, s = tokens.shape
        if b % n_microbatches:
            raise ValueError(f"batch {b} not divisible by {n_microbatches}")
        mb = b // n_microbatches
        positions = jnp.arange(s)
        mask = causal_mask(s)
        cos, sin = rope_tables(positions, cfg.hd, cfg.rope_theta,
                               cfg.condense_ratio)

        in_specs = (pp_param_specs(staged_params, axis), P(), P(), P(), P())

        # the lm_head is vocab-parallel over the stage axis when the head is
        # a dense [H, V] matrix with V % n_stages == 0 (the scoring path's
        # usual shape); otherwise every stage computes the full head as
        # before.  Vocab-parallel: the last stage's final hidden state fans
        # out to all stages (one [B, S, H] ppermute hop), each stage
        # computes its V/n_stages column slice, and the out_specs
        # concatenation assembles the logits -- no stage computes the
        # full-vocab matmul and the [n_stages, B, S, V] replicated logits
        # buffer of the naive scheme never materializes.
        head_w = staged_params.get("lm_head")
        if cfg.tie_word_embeddings:
            vocab = staged_params["embed"].shape[0]
            vocab_parallel = vocab % n_stages == 0
        else:
            vocab_parallel = (
                isinstance(head_w, dict)
                and isinstance(head_w.get("w"), jnp.ndarray)
                and head_w["w"].ndim == 2
                and head_w["w"].shape[1] % n_stages == 0
            )
        out_spec = P(None, None, axis) if vocab_parallel else P(axis)

        @partial(shard_map, mesh=mesh, **_SMAP_KW,
                 in_specs=in_specs, out_specs=out_spec)
        def run(params, tokens, cos, sin, mask):
            stage = jax.lax.axis_index(axis)
            local = jax.tree.map(lambda a: a[0], params["stages"])
            # folded params carry input_norm=None; any leaf gives the depth
            n_local = jax.tree.leaves(local)[0].shape[0]
            x_embed = params["embed"][tokens]  # [B, S, H] (embed replicated)
            h = x_embed.shape[-1]

            def layer_body(x, l):
                lp = stacked_layer_view(local, l)
                x, _ = _block(x, lp, cfg, cos, sin, mask, None)
                return x, None

            def tick(carry, t):
                recv, outputs = carry
                # stage 0 pulls micro-batch t from the queue (clamped once the
                # queue drains: those ticks' results are never written); other
                # stages consume last tick's ppermute payload
                mb_i = jnp.clip(t, 0, n_microbatches - 1)
                x0 = jax.lax.dynamic_slice_in_dim(x_embed, mb_i * mb, mb, 0)
                x = jnp.where(stage == 0, x0, recv)
                y, _ = jax.lax.scan(layer_body, x, jnp.arange(n_local))
                nxt = jax.lax.ppermute(y, axis, perm)
                # the last stage's result for micro-batch t-(n_stages-1)
                out_i = jnp.clip(t - (n_stages - 1), 0, n_microbatches - 1)
                cur = jax.lax.dynamic_slice_in_dim(outputs, out_i, 1, 0)
                upd = jnp.where(t >= n_stages - 1, y[None], cur)
                outputs = jax.lax.dynamic_update_slice_in_dim(outputs, upd,
                                                              out_i, 0)
                return (nxt, outputs), None

            # the carries become device-varying after the first ppermute; mark
            # the (replicated-zero) initial values varying so scan types match
            recv0 = jax.lax.pcast(jnp.zeros((mb, s, h), x_embed.dtype),
                                  (axis,), to="varying")
            out0 = jax.lax.pcast(
                jnp.zeros((n_microbatches, mb, s, h), x_embed.dtype),
                (axis,), to="varying")
            n_ticks = n_microbatches + n_stages - 1
            (_, outputs), _ = jax.lax.scan(tick, (recv0, out0),
                                           jnp.arange(n_ticks))

            # only the last stage's buffer is meaningful
            x = outputs.reshape(b, s, h)
            if vocab_parallel:
                # broadcast the final hidden state from the last stage (a
                # masked [B,S,H] psum -- ppermute cannot fan out one source
                # to all destinations), then vocab-parallel head: stage d
                # computes logits[..., d*vs:(d+1)*vs], out_specs concatenates
                x = jax.lax.psum(
                    jnp.where(stage == n_stages - 1, x, jnp.zeros_like(x)),
                    axis)
                x = rmsnorm(x, params["final_norm"], cfg.rms_norm_eps)
                if cfg.tie_word_embeddings:
                    w = params["embed"].T.astype(x.dtype)
                else:
                    w = params["lm_head"]["w"].astype(x.dtype)
                vs = w.shape[1] // n_stages
                wl = jax.lax.dynamic_slice_in_dim(w, stage * vs, vs, 1)
                logits = jnp.dot(x, wl)
                if (not cfg.tie_word_embeddings
                        and params["lm_head"].get("b") is not None):
                    bl = jax.lax.dynamic_slice_in_dim(
                        params["lm_head"]["b"], stage * vs, vs, 0)
                    logits = logits + bl
                return logits
            # fallback (packed/odd-vocab head): every stage runs the
            # replicated full head so the out_specs stay uniform
            x = rmsnorm(x, params["final_norm"], cfg.rms_norm_eps)
            if cfg.tie_word_embeddings:
                logits = jnp.dot(x, params["embed"].T.astype(x.dtype))
            else:
                logits = linear(x, params["lm_head"])
            return logits[None]

        out = run(staged_params, tokens, cos, sin, mask)
        return out if vocab_parallel else out[-1]

    return forward
