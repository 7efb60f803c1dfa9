"""SmoothQuant-style activation smoothing (C23 capability).

The reference only *compares against* SmoothQuant through an external
package (reference.py:1-85); here the technique is native: per-channel
activation scales are migrated into the preceding weights,

    y = (x / s) @ (s * W),

with ``s = act_absmax^alpha / weight_absmax^(1-alpha)``, flattening
activation outliers before weight-only (or weight+activation) quantization.

For inference-only weight quantization the smoothing must be *folded*: the
division of x by s folds into the preceding normalization layer's scale, and
s multiplies into the linear's weight rows.  This module supports the
foldable sites (attention/MLP input projections after a norm).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax.numpy as jnp
import numpy as np

from ..models.common import recording_linears

# per family: (norm key, keys of linears fed by that norm)
FOLD_SITES = {
    "llama": [("input_norm", ["q", "k", "v"]), ("post_norm", ["gate", "up"])],
    "opt": [("attn_norm", ["q", "k", "v"]), ("final_norm", ["fc1"])],
    "bloom": [("attn_norm", ["q", "k", "v"]), ("post_norm", ["fc1"])],
}


def collect_act_scales(
    forward, params: Dict[str, Any], cfg, samples: List[np.ndarray]
) -> Dict[str, jnp.ndarray]:
    """Per-linear per-channel absmax of inputs over calibration samples.

    Requires annotated linears (quantize.gptq_model.annotate_linears)."""
    maxes: Dict[str, jnp.ndarray] = {}

    def cb(name, x):
        m = jnp.max(jnp.abs(x.reshape(-1, x.shape[-1])), axis=0)
        maxes[name] = jnp.maximum(maxes[name], m) if name in maxes else m

    with recording_linears(cb):
        for s in samples:
            forward(params, jnp.asarray(s, jnp.int32), cfg)
    return maxes


def smooth_block(
    block: Dict[str, Any],
    act_scales: Dict[str, jnp.ndarray],
    family: str,
    alpha: float = 0.5,
    eps: float = 1e-5,
) -> Dict[str, Any]:
    """Fold smoothing scales into one block's norm + input projections."""
    out = dict(block)
    for norm_key, lin_keys in FOLD_SITES[family]:
        acts = [act_scales[k] for k in lin_keys if k in act_scales]
        if not acts:
            continue
        act_max = jnp.clip(jnp.max(jnp.stack(acts), axis=0), eps, None)
        w_max = jnp.clip(
            jnp.max(
                jnp.stack([jnp.max(jnp.abs(block[k]["w"]), axis=1) for k in lin_keys]),
                axis=0,
            ),
            eps,
            None,
        )
        s = jnp.clip(act_max**alpha / w_max ** (1 - alpha), eps, None)

        norm = block[norm_key]
        if isinstance(norm, dict):  # layernorm {w, b}: both divide by s
            out[norm_key] = {"w": norm["w"] / s, "b": norm["b"] / s}
        else:  # rmsnorm weight vector
            out[norm_key] = norm / s
        for k in lin_keys:
            lin = block[k]
            out[k] = {**lin, "w": lin["w"] * s[:, None]}
    return out


def _annotate_with_layer(block: Dict[str, Any], idx: int) -> Dict[str, Any]:
    out = {}
    for k, v in block.items():
        if isinstance(v, dict) and "w" in v and getattr(v["w"], "ndim", 0) == 2:
            out[k] = {**v, "name": f"{idx}.{k}"}
        else:
            out[k] = v
    return out


def smooth_model(
    params: Dict[str, Any],
    cfg,
    family: str,
    forward,
    samples: List[np.ndarray],
    alpha: float = 0.5,
) -> Dict[str, Any]:
    """Whole-model smoothing pass (run BEFORE quantization)."""
    annotated = {
        **params,
        "layers": [_annotate_with_layer(b, i) for i, b in enumerate(params["layers"])],
    }
    act_scales = collect_act_scales(forward, annotated, cfg, samples)
    new_layers = []
    for i, b in enumerate(params["layers"]):
        per_layer = {
            k.split(".", 1)[1]: v
            for k, v in act_scales.items()
            if k.startswith(f"{i}.")
        }
        new_layers.append(smooth_block(b, per_layer, family, alpha))
    return {**params, "layers": new_layers}
