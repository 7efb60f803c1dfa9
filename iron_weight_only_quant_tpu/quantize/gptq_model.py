"""Layer-sequential GPTQ over a whole model (C10 capability).

Mirrors the reference flow (gptq_utils.py:53-194): capture the inputs of
transformer block 0, then per block -- accumulate per-linear Hessians from
one forward with original weights, solve GPTQ for every linear, recompute
the block's outputs with quantized weights as the next block's inputs.
Only one block's activations are live at a time (the reference keeps only
one block on GPU; here it keeps XLA working sets small).

Instead of PyTorch forward hooks, linears are recorded through the
functional seam ``models.common.recording_linears``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GPTQConfig, QuantSpec
from ..models.common import recording_linears
from .gptq import GPTQResult, gptq_quantize, hessian_update
from .trueobs import trueobs_quantize
from .qtensor import QuantizedTensor
from ..ops.packing import pack_codes


def annotate_linears(block_params: Dict[str, Any]) -> Dict[str, Any]:
    """Add a ``"name"`` key to every *linear* dict (2-D weight) in a block.

    Norm params are also ``{"w": ..., "b": ...}`` dicts but 1-D -- excluded,
    like the reference only hooks ``nn.Linear`` (gptq_utils find_layers).
    """
    out = {}
    for k, v in block_params.items():
        if isinstance(v, dict) and "w" in v and getattr(v["w"], "ndim", 0) == 2:
            out[k] = {**v, "name": k}
        else:
            out[k] = v
    return out


def gptq_result_to_qtensor(res, spec: QuantSpec, k: int, n: int) -> QuantizedTensor:
    """Pack a GPTQ solve (rows=N out-features, cols=K in-features) into the
    standard artifact layout.

    Grid equivalence: GPTQ stores unsigned codes in [0, maxq] with
    ``w = scale * (code - zero)`` -- exactly our affine rule.  Per-group
    scales pack as [K/G, N]; act-order with groups has column-interleaved
    scales and is not packable (kept fake-quant, like the reference's own
    packed path which only supports per-channel).
    """
    if res.perm is not None and res.scales.shape[1] > 1:
        raise NotImplementedError("act_order + groups: use fake-quant path")
    codes = res.codes.T  # [K, N]
    scales = res.scales.T  # [n_groups, N]
    zeros = res.zeros.T
    qweight = pack_codes(codes, spec.bits)
    return QuantizedTensor(
        qweight, scales.astype(jnp.float32), zeros.astype(jnp.float32),
        None, spec, (k, n), "affine",
    )


def quantize_blocks_gptq(
    inputs: List[jnp.ndarray],
    blocks: List[Dict[str, Any]],
    block_apply: Callable[[jnp.ndarray, Dict[str, Any]], jnp.ndarray],
    spec: QuantSpec,
    gcfg: GPTQConfig,
    pack: bool = True,
    progress: Optional[Callable[[str], None]] = None,
    stage_order: Optional[List[List[str]]] = None,
) -> List[Dict[str, Any]]:
    """Core loop: quantize each block given streaming inputs.

    ``inputs``: per-sample activations entering block 0 (list of [1, S, H]).
    ``block_apply(x, params) -> x_out`` runs one block (mask/rope closed over).
    ``stage_order``: when given (true-sequential mode, reference
    gptq/llama.py:75-83), linears are quantized stage by stage, each stage's
    Hessians collected with the *previous stages already quantized*.
    Returns new block param dicts with quantized weights.
    """
    if spec.fmt != "int":
        raise NotImplementedError("GPTQ supports int format only")  # quant_wrapper.py:24-25
    groupsize = spec.group_size if spec.group_size > 0 else -1
    if gcfg.solver == "trueobs" and groupsize != -1:
        # the reference TrueOBS quantizer finds params once on the full
        # matrix (fast_trueobs.py:72-73) -- per-channel only
        raise NotImplementedError("TrueOBS is per-channel: use group_size<=0")

    def solve(bp, name, h):
        w = bp[name]["w"]  # [K, N]
        k, n = w.shape
        if gcfg.solver == "trueobs":
            # TrueOBS finds per-channel params once (no groups); sparseout
            # keeps fp outliers, so the result stays fake-quant dense.
            res = trueobs_quantize(
                w.T.astype(jnp.float32), h,
                bits=spec.bits, sym=spec.symmetric,
                blocksize=gcfg.blocksize, percdamp=gcfg.percdamp,
                mse=gcfg.mse, sparseout=gcfg.sparseout, nearest=gcfg.nearest,
            )
            if pack and not gcfg.sparseout:
                gres = GPTQResult(
                    res.q, res.codes, res.scale[:, None], res.zero[:, None],
                    None,
                )
                return gptq_result_to_qtensor(gres, spec, k, n)
            return res.q.T.astype(w.dtype)
        res = gptq_quantize(
            w.T.astype(jnp.float32), h,
            bits=spec.bits, sym=spec.symmetric, groupsize=groupsize,
            blocksize=gcfg.blocksize, percdamp=gcfg.percdamp,
            actorder=gcfg.act_order, static_groups=gcfg.static_groups,
            mse=gcfg.mse, trits=gcfg.trits,
        )
        if pack and not gcfg.trits and not (gcfg.act_order and groupsize != -1):
            return gptq_result_to_qtensor(res, spec, k, n)
        return res.q.T.astype(w.dtype)  # fake-quant dense

    new_blocks = []
    xs = list(inputs)
    for li, bp in enumerate(blocks):
        if progress:
            progress(f"GPTQ block {li + 1}/{len(blocks)}")
        bp_named = annotate_linears(bp)
        lin_names = [k for k, v in bp_named.items() if isinstance(v, dict) and "name" in v]
        stages = [lin_names] if stage_order is None else [
            [n for n in st if n in lin_names] for st in stage_order
        ]

        new_bp = dict(bp)
        for stage in stages:
            if not stage:
                continue
            hs: Dict[str, jnp.ndarray] = {}
            ns: Dict[str, jnp.ndarray] = {}
            for name in stage:
                cdim = bp[name]["w"].shape[0]
                hs[name] = jnp.zeros((cdim, cdim), jnp.float32)
                ns[name] = jnp.asarray(0.0)

            def record(name, x, _stage=tuple(stage)):
                if name in _stage:
                    hs[name], ns[name] = hessian_update(hs[name], ns[name], x)

            # Hessians over the block with all previous stages quantized
            current = annotate_linears(new_bp)
            with recording_linears(record):
                for x in xs:
                    block_apply(x, current)

            for name in stage:
                new_bp[name] = {**bp[name], "w": solve(new_bp, name, hs[name])}
                hs[name] = None  # free

        # next block's inputs from the quantized block
        xs = [block_apply(x, new_bp) for x in xs]
        new_blocks.append(new_bp)
    return new_blocks


# ---------------------------------------------------------- family adapters

def _llama_ctx(params, cfg, sample):
    from ..models import llama as L
    from ..models.common import causal_mask, rope_tables

    s = sample.shape[1]
    positions = jnp.arange(s)
    cos, sin = rope_tables(positions, cfg.hd, cfg.rope_theta, cfg.condense_ratio)
    mask = causal_mask(s)
    x0 = params["embed"][sample]

    def apply(x, bp):
        return L._block(x, bp, cfg, cos, sin, mask, None)[0]

    return x0, apply


def _opt_ctx(params, cfg, sample):
    from ..models import opt as O
    from ..models.common import causal_mask

    s = sample.shape[1]
    mask = causal_mask(s)
    x0 = params["embed"][sample] + params["embed_pos"][jnp.arange(s) + O.POS_OFFSET]

    def apply(x, bp):
        return O._block(x, bp, cfg, mask, None)[0]

    return x0, apply


def _bloom_ctx(params, cfg, sample):
    from ..models import bloom as B
    from ..models.common import causal_mask, layernorm

    s = sample.shape[1]
    mask = causal_mask(s)
    bias = B._alibi_bias(cfg, s)
    x0 = params["embed"][sample]
    x0 = layernorm(
        x0, params["embed_norm"]["w"], params["embed_norm"]["b"], cfg.layer_norm_eps
    )

    def apply(x, bp):
        return B._block(x, bp, cfg, mask, bias, None)[0]

    return x0, apply


_FAMILY_CTX = {"llama": _llama_ctx, "opt": _opt_ctx, "bloom": _bloom_ctx}

# true-sequential intra-block quantization order (reference gptq/llama.py:75-83)
_FAMILY_STAGES = {
    "llama": [["k", "v", "q"], ["o"], ["up", "gate"], ["down"]],
    "opt": [["k", "v", "q"], ["o"], ["fc1"], ["fc2"]],
    "bloom": [["k", "v", "q"], ["o"], ["fc1"], ["fc2"]],
}


def quantize_model_gptq(
    params: Dict[str, Any],
    cfg,
    family: str,
    calib_samples: List[np.ndarray],  # each [1, S] int tokens
    spec: QuantSpec,
    gcfg: GPTQConfig = GPTQConfig(),
    pack: bool = True,
    progress: Optional[Callable[[str], None]] = print,
    true_sequential: bool = False,
) -> Dict[str, Any]:
    """Whole-model layer-sequential GPTQ; returns new params pytree."""
    ctx_fn = _FAMILY_CTX[family]
    xs, apply = [], None
    for sample in calib_samples[: gcfg.nsamples]:
        x0, apply = ctx_fn(params, cfg, jnp.asarray(sample, jnp.int32))
        xs.append(x0)
    new_layers = quantize_blocks_gptq(
        xs, params["layers"], apply, spec, gcfg, pack=pack, progress=progress,
        stage_order=_FAMILY_STAGES[family] if true_sequential else None,
    )
    return {**params, "layers": new_layers}
