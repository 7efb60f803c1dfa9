"""Inference engine: jitted prefill/decode, sampling, continuous batching.

Replaces the reference's ad-hoc benchmark loop (gptq/opt.py:308-354
token-by-token decode with HF past_key_values) with a real engine:

  * left-padded batched prefill (one jitted program), so every row's last
    position aligns and the KV timeline is uniform;
  * jitted single-token decode steps with donated caches;
  * greedy / temperature / top-k sampling;
  * Orca-style token-level continuous batching: finished slots are re-filled
    from a request queue and stream their prompt tokens through the same
    [B, 1] decode program (no separate per-request prefill compilation);
  * optional (data, model) mesh: params are placed with tensor-parallel
    NamedShardings and GSPMD inserts the collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from ..parallel import apply_sharding, make_mesh, param_specs
from .kvcache import cache_max_len, make_caches


def sample_tokens(logits: jnp.ndarray, rng, temperature: float, top_k: int = 0):
    """logits [B, V] -> tokens [B]."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k > 0:
        thresh = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < thresh, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("forward", "cfg", "abits"))
def _prefill(params, tokens, positions, mask, caches, forward, cfg, abits=None):
    from ..ops.qmatmul import activation_quant

    with activation_quant(abits):
        logits, caches = forward(
            params, tokens, cfg, caches=caches, positions=positions, attn_mask=mask
        )
    return logits[:, -1], caches


@partial(jax.jit,
         static_argnames=("forward", "cfg", "temperature", "top_k", "abits"),
         donate_argnames=("caches",))
def _decode_step(params, tok, positions, mask, caches, rng, forward, cfg,
                 temperature, top_k, abits=None):
    from ..ops.qmatmul import activation_quant

    with activation_quant(abits):
        logits, caches = forward(
            params, tok, cfg, caches=caches, positions=positions, attn_mask=mask
        )
    nxt = sample_tokens(logits[:, -1], rng, temperature, top_k)
    return nxt, caches


@partial(jax.jit,
         static_argnames=("forward", "cfg", "temperature", "top_k", "t_max",
                          "c", "abits"),
         donate_argnames=("caches",))
def _generate_chunk(params, tok0, pads, cur0, caches, rng, forward, cfg,
                    temperature, top_k, t_max, c, abits=None):
    """C decode steps device-side for generate() (shared left-padded
    timeline).  Bit-identical to C iterations of :func:`_decode_step` --
    same positions/mask construction, same per-step rng split sequence --
    but ONE host sync per chunk instead of per token (~25 ms each through a
    tunneled chip).  Returns ([B, C] sampled tokens, final token, caches,
    advanced rng); the host discards post-EOS garbage exactly as serve()
    does."""
    from ..ops.qmatmul import activation_quant

    cols = jnp.arange(t_max)

    def step(carry, _):
        tok, caches, cur, rng = carry
        positions = (cur - pads)[:, None]
        mask = (
            (cols[None, None, None, :] <= cur)
            & (cols[None, None, None, :] >= pads[:, None, None, None])
        )
        rng, sub = jax.random.split(rng)
        with activation_quant(abits):
            logits, caches = forward(params, tok, cfg, caches=caches,
                                     positions=positions, attn_mask=mask)
        nxt = sample_tokens(logits[:, -1], sub, temperature, top_k)
        return (nxt[:, None], caches, cur + 1, rng), nxt

    (tok, caches, _, rng), sampled = jax.lax.scan(
        step, (tok0, caches, cur0, rng), None, length=c)
    return jnp.swapaxes(sampled, 0, 1), tok[:, 0], caches, rng


def _stamp(caches, lens, valid, page_table):
    """Set per-slot lengths/valid/page-table on every cache view INSIDE the
    jitted program: one host->device transfer per array per sync, instead
    of fresh per-layer copies on the host (~100 tiny eager transfers per
    sync through the tunnel -- they measured as ~half the serve wall).

    ``caches`` is the per-layer view list OR one stacked ([L, ...]) view
    (scan-over-layers serving); stacked lengths broadcast to ``[L, B]``
    (layer-l updates advance row l) while ``valid`` stays ``[B]``, shared
    by every layer of the wave."""
    def one(c):
        ln = lens
        arr = getattr(c, "k", None)
        if arr is None:
            arr = getattr(c, "k_codes", None)
        if arr is not None and arr.ndim == 5:  # stacked view: [L, B, T, H, D]
            ln = jnp.broadcast_to(lens[None], (arr.shape[0],) + lens.shape)
        upd = {"length": ln, "valid": valid}
        if page_table is not None:
            upd["page_table"] = page_table
        return (c._replace(**upd) if hasattr(c, "_replace")
                else c.replace(**upd))

    if _is_view_list(caches):
        return [one(c) for c in caches]
    return one(caches)


def _clear_valid(caches):
    """valid=None on every view (per-slot partial-write scope ends)."""
    def one(c):
        return (c._replace(valid=None) if hasattr(c, "_replace")
                else c.replace(valid=None))

    if _is_view_list(caches):
        return [one(c) for c in caches]
    return one(caches)


def _is_view_list(caches) -> bool:
    # KVCacheView is a NamedTuple (a tuple!); a cache VIEW has a .length
    # field, a view LIST does not
    return isinstance(caches, (list, tuple)) and not hasattr(caches, "length")


def _cache0(caches):
    """First per-layer view, or the stacked view itself."""
    return caches[0] if _is_view_list(caches) else caches


@partial(jax.jit,
         static_argnames=("forward", "cfg", "temperature", "top_k", "t_max",
                          "c", "abits"),
         donate_argnames=("caches",))
def _serve_chunk(params, meta, page_table, caches, rng, forward, cfg,
                 temperature, top_k, t_max, c, abits=None):
    """C decode steps device-side between host syncs (continuous batching).

    Per step, each slot's next input is its queued prompt token while its
    prompt is still streaming (``i+1 < feed_len``), else the token just
    sampled -- the device-side mirror of the serve loop's per-token
    bookkeeping, so one host round-trip (the dominant cost through a
    tunneled chip, ~25 ms) now advances C tokens.  Returns the [B, C]
    sampled tokens; the host decides which are real outputs.

    ``meta`` packs [tok0 | feed_next.ravel | feed_len | lens0] into ONE
    int32 vector: each eager host->device transfer has real latency through
    a tunneled chip, and per-array inputs measured as a large share of the
    serve wall (NOTES round 3).
    """
    from ..ops.qmatmul import activation_quant

    ns = meta.shape[0] // (c + 3)
    tok0 = meta[:ns][:, None]
    feed_next = meta[ns : ns + ns * c].reshape(ns, c)
    feed_len = meta[ns + ns * c : 2 * ns + ns * c]
    lens0 = meta[2 * ns + ns * c :]
    caches = _stamp(caches, lens0, None, page_table)
    cols = jnp.arange(t_max)

    def step(carry, inp):
        tok, caches, lens, rng = carry
        i, feed_col = inp
        lens_c = jnp.minimum(lens, t_max - 1)
        positions = lens_c[:, None]
        mask = cols[None, None, None, :] <= lens_c[:, None, None, None]
        rng, sub = jax.random.split(rng)
        with activation_quant(abits):
            logits, caches = forward(params, tok, cfg, caches=caches,
                                     positions=positions, attn_mask=mask)
        nxt = sample_tokens(logits[:, -1], sub, temperature, top_k)
        tok_next = jnp.where((i + 1) < feed_len, feed_col, nxt)[:, None]
        return (tok_next, caches, lens + 1, rng), nxt

    (_, caches, _, _), sampled = jax.lax.scan(
        step, (tok0, caches, lens0, rng),
        (jnp.arange(c), jnp.swapaxes(feed_next, 0, 1)),
    )
    return jnp.swapaxes(sampled, 0, 1), caches


@partial(jax.jit,
         static_argnames=("forward", "cfg", "temperature", "top_k", "t_max",
                          "s_len", "c", "abits", "p_abits"),
         donate_argnames=("caches",))
def _serve_combo(params, meta, page_table, caches, rng, forward, cfg,
                 temperature, top_k, t_max, s_len, c, abits=None,
                 p_abits=None):
    """One prefill wave + C decode steps, device-side (ONE host sync).

    The wave feeds each slot's pending prompt tokens ([B, S] right-padded,
    per-slot ``valid``); decode-ready slots piggyback as 1-valid-token
    columns (Orca).  The chunk then decodes C further tokens for every slot,
    starting from ``where(tok_src, wave_sample, tok0_else)`` -- the host
    precomputes ``tok_src`` (True = the slot's prompt completes in the wave,
    so it consumes its wave sample; False = its prompt still has tokens:
    ``tok0_else`` is the next one and ``feed_next``/``feed_len`` stream the
    rest through the chunk's feed machinery, _serve_chunk conventions).
    Halving host round-trips matters because each one costs ~25 ms through a
    tunneled chip -- and on any deployment it serializes the device against
    the host scheduler.

    ``meta`` packs [toks.ravel | n_valid | lens0 | tok_src | tok0_else |
    feed_next.ravel | feed_len] into ONE int32 vector (one host->device
    transfer per sync instead of eight), and the wave sample rides as
    column 0 of the returned [B, 1 + C] array (one device->host fetch).
    """
    from ..ops.qmatmul import activation_quant

    ns = meta.shape[0] // (s_len + c + 5)
    off = 0

    def take(count):
        nonlocal off
        v = meta[off : off + count]
        off += count
        return v

    toks = take(ns * s_len).reshape(ns, s_len)
    n_valid = take(ns)
    lens0 = take(ns)
    tok_src = take(ns) != 0
    tok0_else = take(ns)
    feed_next = take(ns * c).reshape(ns, c)
    feed_len = take(ns)

    caches = _stamp(caches, lens0, n_valid, page_table)
    cols = jnp.arange(t_max)
    s = toks.shape[1]
    lens_c = jnp.minimum(lens0, t_max - 1)
    positions = jnp.minimum(lens_c[:, None] + jnp.arange(s)[None, :], t_max - 1)
    mask = cols[None, None, None, :] <= positions[:, None, :, None]
    rng, sub = jax.random.split(rng)
    # the WAVE is the large-m prefill matmul where the int8-MXU activation
    # paths win; the chunk below stays on the decode setting (m=slots)
    with activation_quant(p_abits):
        logits, caches = forward(params, toks, cfg, caches=caches,
                                 positions=positions, attn_mask=mask)
    idx = jnp.clip(n_valid - 1, 0, s - 1)
    last = jnp.take_along_axis(logits, idx[:, None, None], axis=1)[:, 0]
    wave_tok = sample_tokens(last, sub, temperature, top_k)

    # chunk phase: lengths advanced by the wave's valid counts; per-slot
    # partial-write semantics end here (every chunk step writes one token).
    # Flat per-layer views already consumed their valid on write; the
    # stacked view KEEPS it (every scan layer reads the same mask), so it
    # is cleared here either way.
    lens1 = lens0 + n_valid
    caches = _clear_valid(caches)
    tok0 = jnp.where(tok_src, wave_tok, tok0_else)[:, None]

    def step(carry, inp):
        tok, caches, lens, rng = carry
        i, feed_col = inp
        lens_c = jnp.minimum(lens, t_max - 1)
        positions = lens_c[:, None]
        mask = cols[None, None, None, :] <= lens_c[:, None, None, None]
        rng, sub = jax.random.split(rng)
        with activation_quant(abits):
            logits, caches = forward(params, tok, cfg, caches=caches,
                                     positions=positions, attn_mask=mask)
        nxt = sample_tokens(logits[:, -1], sub, temperature, top_k)
        tok_next = jnp.where((i + 1) < feed_len, feed_col, nxt)[:, None]
        return (tok_next, caches, lens + 1, rng), nxt

    (_, caches, _, _), sampled = jax.lax.scan(
        step, (tok0, caches, lens1, rng),
        (jnp.arange(c), jnp.swapaxes(feed_next, 0, 1)),
    )
    out = jnp.concatenate([wave_tok[:, None], jnp.swapaxes(sampled, 0, 1)],
                          axis=1)
    return out, caches


class InferenceEngine:
    """Batch generation over a (possibly quantized, possibly sharded) model."""

    def __init__(
        self,
        params: Dict[str, Any],
        cfg,
        forward: Callable,
        family: Optional[str] = None,
        engine_cfg: EngineConfig = EngineConfig(),
        eos_token: int = -1,
        pad_token: int = 0,
        dtype=jnp.float32,
        tp_block: bool = False,
    ):
        self.cfg = cfg
        self.forward = forward
        self.engine_cfg = engine_cfg
        self.eos_token = eos_token
        self.pad_token = pad_token
        self.dtype = dtype
        self.mesh = None
        # tp_block with a 1-device mesh is allowed: it measures the shard_map
        # wrapper + psum overhead against the plain engine on one chip (the
        # d=1 probes behind the +8.7%/layer number)
        if engine_cfg.mesh.ndevices > 1 or tp_block:
            if family is None:
                raise ValueError("family required for sharded engines")
            self.mesh = make_mesh(engine_cfg.mesh)
            tp_stacked = False
            if tp_block:
                from ..parallel import tp_block as tpb

                d = self.mesh.shape["model"]
                scan_fwd = getattr(forward, "__name__", "") in (
                    "llama_forward_scan", "opt_forward_scan",
                    "bloom_forward_scan",
                )
                if "layers_stacked" in params:
                    # already-stacked params must arrive TP-prepared (the
                    # engine cannot repack/fuse [L, ...] artifacts in place)
                    tpb.validate_tp_stacked(params, d, family)
                    tp_stacked = True
                elif scan_fwd:
                    # flat params + scan forward: prepare + stack here --
                    # the TP x scan composition (the only executable shape
                    # for 70B-class depth: one compiled block body per
                    # shard, not num_layers unrolled shard_map copies)
                    params = tpb.prepare_tp_stacked(
                        params, d, fuse=engine_cfg.fuse_projections,
                        family=family)
                    tp_stacked = True
                else:
                    # shard_map gives row-parallel linears a bare row SLICE
                    # of the packed array; sub-byte pairing must be confined
                    # to each shard first (GSPMD, by contrast, keeps the
                    # logical computation global, so k_shards=1 artifacts
                    # are fine there)
                    params = self._repack_row_parallel(params, family, d)
                    if engine_cfg.fuse_projections and family == "llama":
                        # shard-BLOCKED fused qkv/gate_up (columns laid out
                        # [q_0 k_0 v_0 | q_1 k_1 v_1 | ...] so the N
                        # sharding gives each shard a locally-fused block);
                        # the single-chip fusion layout cannot column-shard
                        params = tpb.fuse_projections_tp(params, d)
            specs = param_specs(family, params)
            if tp_block:
                # the shard_map forwards read the embed REPLICATED (in_specs
                # P(); OPT/BLOOM also read it transposed as the tied head).
                # Leaving the GSPMD vocab-sharded placement would insert an
                # all-gather of the whole table before every call.
                from jax.sharding import PartitionSpec as _P

                specs["embed"] = _P()
            self.params = apply_sharding(params, specs, self.mesh)
            if tp_block:
                # explicit shard_map megatron forward: fused kernels run per
                # shard (GSPMD cannot partition pallas_call)
                from ..parallel import tp_block as tpb

                if tp_stacked:
                    stacked_builders = {
                        "llama": tpb.make_tp_llama_forward_stacked,
                        "opt": tpb.make_tp_opt_forward_stacked,
                        "bloom": tpb.make_tp_bloom_forward_stacked,
                    }
                    tp_fwd = stacked_builders[family](cfg, self.mesh)
                else:
                    builders = {
                        "llama": tpb.make_tp_llama_forward,
                        "opt": tpb.make_tp_opt_forward,
                        "bloom": tpb.make_tp_bloom_forward,
                    }
                    tp_fwd = builders[family](cfg, self.mesh)

                def forward_wrap(params, tokens, _cfg, caches=None,
                                 positions=None, attn_mask=None):
                    return tp_fwd(params, tokens, caches=caches,
                                  positions=positions, attn_mask=attn_mask)

                self.forward = forward_wrap
        else:
            # llama only: the transform rewrites llama-shaped layer dicts
            # (q/k/v -> qkv); other families' forwards don't know the fused
            # keys, and family=None gives no shape guarantee
            if engine_cfg.fuse_projections and family is None:
                import warnings

                warnings.warn(
                    "EngineConfig.fuse_projections is set but family is "
                    "None: the fused qkv/gate_up fast path only applies "
                    "with family='llama'", stacklevel=2)
            if engine_cfg.fuse_projections and family == "llama" \
                    and "layers" in params:
                # exact fused qkv / gate_up artifacts (column-wise concat of
                # per-group quantized tensors); ~20 us/layer decode win on
                # v5e (scripts/probe_e2e_tiles.py).  Params that arrive
                # already STACKED (layers_stacked) cannot be fused here --
                # fuse per layer BEFORE stacking (fuse_llama_layer /
                # build_quantized_llama(fuse=True), as __graft_entry__ and
                # bench.py do); StackedFusedView then keeps the win on the
                # scan path.  When the engine stacks below (scan forward +
                # flat params), this fusion has already run, so the stacked
                # views keep the win.
                from ..models.llama import fuse_llama_projections

                params = fuse_llama_projections(params)
            if "layers" in params and getattr(forward, "__name__", "") in (
                "llama_forward_scan", "opt_forward_scan",
                "bloom_forward_scan",
            ):
                # convenience: a scan forward with flat per-layer params --
                # stack here (fusion above already applied) instead of
                # erroring on the missing "layers_stacked" key.  Memory-
                # bounded 70B-class builders should still quantize straight
                # into stacked buffers themselves (peak HBM = model + one
                # layer, bench.build_quantized_llama(stacked=True)).
                from ..models.common import stack_model_layers

                params = stack_model_layers(params)
            self.params = params

    # ----------------------------------------------------------- internals

    @staticmethod
    def _repack_row_parallel(params, family: str, d: int):
        """Repack row-parallel packed artifacts to k_shards=d (see
        quantize.qtensor.repack_k_shards)."""
        from ..parallel.tp_block import _FAMILY_LINEARS
        from ..quantize.qtensor import QuantizedTensor, repack_k_shards

        _, row_keys = _FAMILY_LINEARS[family]
        layers = []
        for blk in params.get("layers", []):
            nb = dict(blk)
            for key in row_keys:
                lin = nb.get(key)
                if isinstance(lin, dict) and isinstance(
                    lin.get("w"), QuantizedTensor
                ):
                    nb[key] = {**lin, "w": repack_k_shards(lin["w"], d)}
            layers.append(nb)
        return {**params, "layers": layers}

    def _n_kv_heads(self):
        return getattr(self.cfg, "num_kv_heads", getattr(self.cfg, "num_heads"))

    def _fresh_caches(self, batch: int):
        stacked = "layers_stacked" in self.params
        if stacked and self.engine_cfg.kv.paged:
            raise NotImplementedError(
                "paged KV caches do not compose with scan-over-layers "
                "params; use contiguous (quantized) caches for the scan "
                "path or flat layers for paging"
            )
        from .kvcache import make_stacked_caches

        mk = make_stacked_caches if stacked else make_caches
        return mk(
            len(self.params["layers"]) if "layers" in self.params else self.cfg.num_layers,
            batch, self._n_kv_heads(), self.cfg.hd, self.engine_cfg.kv, self.dtype,
        )

    @staticmethod
    def _left_pad(prompts: Sequence[Sequence[int]], pad_token: int):
        lens = np.array([len(p) for p in prompts])
        L = int(lens.max())
        toks = np.full((len(prompts), L), pad_token, np.int32)
        for i, p in enumerate(prompts):
            toks[i, L - len(p):] = np.asarray(p, np.int32)
        pads = L - lens
        return toks, pads, L

    # ------------------------------------------------------------ generate

    def generate(
        self,
        prompts: Sequence[Sequence[int]],
        max_new_tokens: int = 32,
        temperature: float = 0.0,
        top_k: int = 0,
        seed: int = 0,
    ) -> List[List[int]]:
        """Generate continuations; returns newly generated tokens per prompt."""
        if any(len(p) == 0 for p in prompts):
            raise ValueError("empty prompts are not allowed")
        b = len(prompts)
        toks, pads, L = self._left_pad(prompts, self.pad_token)
        caches = self._fresh_caches(b)
        t_max = cache_max_len(_cache0(caches))
        if L + max_new_tokens > t_max:
            raise ValueError(
                f"prompt ({L}) + max_new ({max_new_tokens}) exceeds "
                f"kv.max_seq_len ({t_max})"
            )

        pads_j = jnp.asarray(pads, jnp.int32)
        cols = jnp.arange(t_max)

        # chunked prefill: bounded program size/memory for long prompts
        # (engine_cfg.prefill_chunk); every chunk runs the same jitted program
        chunk = max(1, self.engine_cfg.prefill_chunk)
        start = 0
        logits = None
        toks_j = jnp.asarray(toks)
        while start < L:
            end = min(start + chunk, L)
            positions = jnp.clip(
                jnp.arange(start, end)[None, :] - pads_j[:, None], 0, None
            )
            mask = (
                (cols[None, None, None, :]
                 <= jnp.arange(start, end)[None, None, :, None])
                & (cols[None, None, None, :] >= pads_j[:, None, None, None])
            )
            logits, caches = _prefill(
                self.params, toks_j[:, start:end], positions, mask, caches,
                self.forward, self.cfg, self.engine_cfg.prefill_abits(),
            )
            start = end

        rng = jax.random.PRNGKey(seed)
        rng, sub = jax.random.split(rng)
        next_tok = sample_tokens(logits, sub, temperature, top_k)

        out = [[int(next_tok[i])] for i in range(b)]
        done = np.array([out[i][0] == self.eos_token for i in range(b)])
        cur = L
        chunk_c = max(1, self.engine_cfg.decode_chunk)
        if chunk_c > 1:
            # chunked device-side decode: one host sync per chunk_c tokens
            # (identical outputs to the per-token loop below -- same
            # positions/mask/rng sequence; post-EOS garbage is discarded)
            cur_j = jnp.asarray(cur, jnp.int32)
            tok = next_tok[:, None]
            remaining = max_new_tokens - 1
            while remaining > 0 and not done.all():
                step_c = int(min(chunk_c, remaining))
                sampled, tok_last, caches, rng = _generate_chunk(
                    self.params, tok, pads_j, cur_j, caches, rng,
                    self.forward, self.cfg, temperature, top_k, t_max,
                    step_c, self.engine_cfg.activation_bits,
                )
                cur_j = cur_j + step_c
                remaining -= step_c
                toks_np = np.asarray(sampled)
                for i in range(b):
                    for j in range(step_c):
                        if done[i]:
                            break
                        t = int(toks_np[i, j])
                        out[i].append(t)
                        if t == self.eos_token:
                            done[i] = True
                tok = tok_last[:, None]
            return out
        for _ in range(max_new_tokens - 1):
            if done.all():
                break
            positions = (cur - pads_j)[:, None]
            mask = (
                (cols[None, None, None, :] <= cur)
                & (cols[None, None, None, :] >= pads_j[:, None, None, None])
            )
            rng, sub = jax.random.split(rng)
            next_tok, caches = _decode_step(
                self.params, next_tok[:, None], positions, mask, caches, sub,
                self.forward, self.cfg, temperature, top_k,
                self.engine_cfg.activation_bits,
            )
            cur += 1
            toks_np = np.asarray(next_tok)
            for i in range(b):
                if not done[i]:
                    out[i].append(int(toks_np[i]))
                    if toks_np[i] == self.eos_token:
                        done[i] = True
        return out

    # ------------------------------------------- continuous batching (Orca)

    def serve(
        self,
        requests: Sequence[Sequence[int]],
        max_new_tokens: int = 32,
        temperature: float = 0.0,
        top_k: int = 0,
        seed: int = 0,
        chunk: int = 1,
        stats: Optional[Dict[str, int]] = None,
    ) -> List[List[int]]:
        """Token-level continuous batching over a request queue.

        Every step runs one [B, 1] decode program.  Idle slots admit the next
        queued request and stream its prompt tokens through the same program
        (their logits are ignored until the prompt is exhausted).  KV
        timelines are *slot-local*: each slot writes its token at its own
        cache column (vmapped per-row scatter in the cache update), so a slot
        admitted late starts at column 0 and ``max_seq_len`` bounds each
        *request*, not the total tokens the batch has ever served.

        ``chunk > 1`` runs that many steps device-side per host round-trip
        (:func:`_serve_chunk`): host-loop overhead (sync + page bookkeeping)
        amortizes over the chunk, at the cost of admission/EOS reaction
        latency of up to ``chunk-1`` steps (a finished slot computes garbage
        tokens for the rest of its chunk; they are discarded and its cache
        columns are recycled on re-admission).
        """
        if any(len(r) == 0 for r in requests):
            raise ValueError("empty prompts are not allowed")
        nslots = min(self.engine_cfg.max_batch_size, max(1, len(requests)))
        caches = self._fresh_caches(nslots)
        t_max = cache_max_len(_cache0(caches))
        for r in requests:
            if len(r) + max_new_tokens > t_max:
                raise ValueError(
                    f"request ({len(r)} tokens) + max_new ({max_new_tokens}) "
                    f"exceeds kv.max_seq_len ({t_max})"
                )

        import time as _time

        t_serve0 = _time.perf_counter()
        sync_t = [t_serve0]  # wall time of the last device sync (fetch)
        first_tok_t: Dict[int, float] = {}  # request -> first-token time
        done_t: Dict[int, float] = {}       # request -> completion time
        queue = list(range(len(requests)))
        results: Dict[int, List[int]] = {}
        # per-slot state
        slot_req = [-1] * nslots          # request id
        slot_len = np.zeros(nslots, np.int64)     # slot-local cache column
        slot_fed = np.zeros(nslots, np.int64)     # prompt tokens fed
        slot_gen = np.zeros(nslots, np.int64)     # tokens generated
        pending_tok = np.zeros(nslots, np.int64)  # next token to feed

        rng = jax.random.PRNGKey(seed)

        # paged KV: this loop owns the page allocator (vLLM-style scheduler
        # side); pages are allocated as a slot's length crosses a page
        # boundary, freed when its request completes, and the updated table
        # rides in with the next step's cache pytree.
        paged = self.engine_cfg.kv.paged
        if paged:
            from .kvcache import PageAllocator, pool_pages

            page = self.engine_cfg.kv.page_size
            mp = t_max // page
            allocator = PageAllocator(pool_pages(nslots, self.engine_cfg.kv))
            slot_pages: List[List[int]] = [[] for _ in range(nslots)]
            table_np = np.zeros((nslots, mp), np.int32)

        def note_tok(rid):
            # latency bookkeeping at SYNC granularity: tokens become visible
            # to a client at the host fetch, so TTFT/TPOT are measured
            # against sync wall times, not device steps
            if len(results[rid]) == 1:
                first_tok_t[rid] = sync_t[0]

        def release(s):
            done_t[slot_req[s]] = sync_t[0]
            slot_req[s] = -1
            slot_len[s] = 0
            if paged:
                allocator.free(slot_pages[s])
                slot_pages[s] = []
                table_np[s, :] = 0

        def admit(s):
            rid = queue.pop(0)
            slot_req[s] = rid
            slot_len[s] = 0
            slot_fed[s] = 0
            slot_gen[s] = 0
            results[rid] = []
            pending_tok[s] = requests[rid][0]

        def ensure_pages(lens_np):
            for s in range(nslots):
                if slot_req[s] < 0:
                    continue
                while len(slot_pages[s]) <= lens_np[s] // page:
                    pg = allocator.alloc()
                    table_np[s, len(slot_pages[s])] = pg
                    slot_pages[s].append(pg)

        chunk = max(1, int(chunk))
        prefill_cap = max(8, self.engine_cfg.prefill_chunk)
        if stats is not None:
            stats.update(n_combos=0, n_chunks=0, n_steps=0,
                         n_generated=0, n_prompt_fed=0,
                         t_combos_s=0.0, t_chunks_s=0.0)
        while queue or any(r >= 0 for r in slot_req):
            # admit queued requests into idle slots (deferred under paging
            # until the pool has a page for the new request's first column)
            for s in range(nslots):
                if slot_req[s] < 0 and queue and (
                    not paged or allocator.free_count > 0
                ):
                    admit(s)

            # ---- prefill wave: slots with unfed prompt tokens get them in
            # one [B, S] forward (right-padded; per-slot `valid` counts keep
            # other slots' cache state untouched).  S is a power-of-2 bucket
            # so distinct compiled programs stay few.  Decode-ready slots
            # PIGGYBACK on the same wave (Orca iteration-level scheduling):
            # their pending sampled token rides as a 1-valid-token "prompt
            # chunk", so no slot ever stalls while another slot prefills --
            # this was the 2.3x serve-vs-static-decode gap in BENCH_r02.
            remaining = np.array([
                len(requests[slot_req[s]]) - slot_fed[s] if slot_req[s] >= 0
                else 0
                for s in range(nslots)
            ])
            c = chunk
            sampled = None
            if remaining.max(initial=0) > 0:
                # ---- combo: wave + chunk in ONE device call (one host sync)
                cap = int(min(remaining.max(), prefill_cap))
                sbkt = 8
                while sbkt < cap:
                    sbkt *= 2
                toks_np = np.zeros((nslots, sbkt), np.int64)
                valid_np = np.zeros(nslots, np.int64)
                piggyback = np.zeros(nslots, bool)
                for s in range(nslots):
                    if slot_req[s] >= 0 and remaining[s] == 0:
                        # decode-ready slot: advance one token in this wave
                        toks_np[s, 0] = pending_tok[s]
                        valid_np[s] = 1
                        piggyback[s] = True
                        continue
                    cnt = int(min(remaining[s], sbkt))
                    if cnt <= 0:
                        continue
                    rid = slot_req[s]
                    toks_np[s, :cnt] = requests[rid][
                        slot_fed[s] : slot_fed[s] + cnt
                    ]
                    valid_np[s] = cnt
                # chunk-phase inputs: slots whose prompt completes this wave
                # decode from their wave sample (tok_src); slots with prompt
                # left stream it through the chunk's feed machinery
                tok_src = np.zeros(nslots, bool)
                tok0_else = np.zeros(nslots, np.int64)
                feed_next = np.zeros((nslots, c), np.int64)
                feed_len = np.zeros(nslots, np.int64)
                for s in range(nslots):
                    if slot_req[s] < 0:
                        continue
                    if piggyback[s] or remaining[s] <= valid_np[s]:
                        tok_src[s] = True
                    else:
                        rid = slot_req[s]
                        rem = requests[rid][slot_fed[s] + valid_np[s]:]
                        tok0_else[s] = rem[0]
                        nfeed = int(min(len(rem), c))
                        feed_next[s, : max(nfeed - 1, 0)] = rem[1:nfeed]
                        feed_len[s] = nfeed
                lens_np = np.minimum(slot_len, t_max - 1)
                if paged:
                    ensure_pages(
                        np.minimum(lens_np + np.maximum(valid_np, 1) - 1 + c,
                                   t_max - 1)
                    )
                pt = jnp.asarray(table_np) if paged else None
                rng, sub = jax.random.split(rng)
                if stats is not None:
                    stats["n_combos"] += 1
                    stats["n_steps"] += 1 + c  # wave ~= one step + C chunk
                meta = np.concatenate([
                    toks_np.ravel(), valid_np, lens_np,
                    tok_src.astype(np.int64), tok0_else,
                    feed_next.ravel(), feed_len,
                ]).astype(np.int32)
                out, caches = _serve_combo(
                    self.params, jnp.asarray(meta), pt, caches, sub,
                    self.forward, self.cfg, temperature, top_k, t_max,
                    sbkt, c, self.engine_cfg.activation_bits,
                    self.engine_cfg.prefill_abits(),
                )
                out_np = np.asarray(out)
                t_prev, sync_t[0] = sync_t[0], _time.perf_counter()
                if stats is not None:
                    stats["t_combos_s"] = round(
                        stats.get("t_combos_s", 0.0) + sync_t[0] - t_prev, 4)
                wave_np, sampled = out_np[:, 0], out_np[:, 1:]
                # device advanced every slot by valid + c; releases below
                # reset their slots to 0 (admit() also resets)
                slot_len += valid_np + c
                for s in range(nslots):
                    if valid_np[s] <= 0:
                        continue
                    rid = slot_req[s]
                    if not piggyback[s]:
                        slot_fed[s] += valid_np[s]
                        if stats is not None:
                            stats["n_prompt_fed"] += int(valid_np[s])
                        if slot_fed[s] < len(requests[rid]):
                            continue  # prompt continues via the chunk feed
                    tok = int(wave_np[s])  # next generated token
                    results[rid].append(tok)
                    note_tok(rid)
                    if stats is not None:
                        stats["n_generated"] += 1
                    slot_gen[s] += 1
                    if tok == self.eos_token or slot_gen[s] >= max_new_tokens:
                        release(s)  # its chunk tokens are discarded garbage
                    else:
                        pending_tok[s] = tok
            else:
                # ---- pure decode: prompts all fed, no wave needed
                feed_next = np.zeros((nslots, c), np.int64)
                feed_len = np.zeros(nslots, np.int64)
                # this chunk's tokens are written at the slot's own columns;
                # idle slots keep writing (and reading) garbage that nothing
                # consumes (page-table entry 0 -> the reserved garbage page
                # under paging)
                lens_np = np.minimum(slot_len, t_max - 1)
                if paged:
                    ensure_pages(np.minimum(lens_np + c - 1, t_max - 1))
                pt = jnp.asarray(table_np) if paged else None
                rng, sub = jax.random.split(rng)
                if stats is not None:
                    stats["n_chunks"] += 1
                    stats["n_steps"] += c
                meta = np.concatenate([
                    pending_tok, feed_next.ravel(), feed_len, lens_np,
                ]).astype(np.int32)
                sampled, caches = _serve_chunk(
                    self.params, jnp.asarray(meta), pt, caches, sub,
                    self.forward, self.cfg, temperature, top_k, t_max,
                    c, self.engine_cfg.activation_bits,
                )
                sampled = np.asarray(sampled)
                t_prev, sync_t[0] = sync_t[0], _time.perf_counter()
                if stats is not None:
                    stats["t_chunks_s"] = round(
                        stats.get("t_chunks_s", 0.0) + sync_t[0] - t_prev, 4)
                slot_len += c
            for s in range(nslots):
                rid = slot_req[s]
                if rid < 0:
                    continue
                prompt = requests[rid]
                for i in range(c):
                    if slot_fed[s] < len(prompt):
                        slot_fed[s] += 1
                        if stats is not None:
                            stats["n_prompt_fed"] += 1
                    if slot_fed[s] < len(prompt):
                        continue  # this step consumed a prompt token
                    tok = int(sampled[s, i])
                    results[rid].append(tok)
                    note_tok(rid)
                    if stats is not None:
                        stats["n_generated"] += 1
                    slot_gen[s] += 1
                    if tok == self.eos_token or slot_gen[s] >= max_new_tokens:
                        release(s)  # rest of the chunk is discarded garbage
                        break
                if slot_req[s] >= 0:
                    pending_tok[s] = (
                        prompt[slot_fed[s]] if slot_fed[s] < len(prompt)
                        else int(sampled[s, c - 1])
                    )
        if stats is not None:
            # per-request latency (sync-granularity; see note_tok)
            stats["ttft_s"] = [
                round(first_tok_t[r] - t_serve0, 4)
                for r in sorted(first_tok_t)
            ]
            stats["tpot_s"] = [
                round((done_t[r] - first_tok_t[r])
                      / max(len(results[r]) - 1, 1), 4)
                for r in sorted(done_t) if r in first_tok_t
            ]
        return [results[i] for i in range(len(requests))]
