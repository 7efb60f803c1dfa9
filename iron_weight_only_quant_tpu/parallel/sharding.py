"""Tensor-parallel PartitionSpecs for model params (dense or quantized).

Megatron-style column/row parallel linears on the ``"model"`` mesh axis:

  * q/k/v/gate/up/fc1 : column-parallel -- weight ``[K, N]`` sharded
    ``P(None, "model")``, bias ``P("model")``
  * o/down/fc2        : row-parallel -- ``P("model", None)``; GSPMD inserts
    the reduce (psum / reduce-scatter) on the output
  * embeddings        : vocab-sharded ``P("model", None)``
  * norms             : replicated

For a packed :class:`QuantizedTensor` the same spec applies leaf-wise:
``qweight`` (packed K dim maps to logical K), ``scales``/``zeros``
``[K/G, N]`` follow the weight's column sharding; for row-parallel weights
the per-group side info is K-sharded the same way.  Correctness under any of
these shardings comes from the XLA dequant path being plain XLA ops; the
fused Pallas kernel runs within a shard (shard_map integration lands with
per-shard packing).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..quantize.qtensor import QuantizedTensor

COL = {"w": P(None, "model"), "b": P("model")}
ROW = {"w": P("model", None), "b": P()}
REP = {"w": P(), "b": P()}

_LLAMA_LAYER = {
    "input_norm": P(),
    "q": COL, "k": COL, "v": COL, "o": ROW,
    "post_norm": P(),
    "gate": COL, "up": COL, "down": ROW,
    # shard-blocked fused artifacts (tp_block.fuse_projections_tp)
    "qkv": COL, "gate_up": COL,
}
_OPT_LAYER = {
    "attn_norm": REP,
    "q": COL, "k": COL, "v": COL, "o": ROW,
    "final_norm": REP,
    "fc1": COL, "fc2": ROW,
}
_BLOOM_LAYER = {
    "attn_norm": REP,
    "q": COL, "k": COL, "v": COL, "o": ROW,
    "post_norm": REP,
    "fc1": COL, "fc2": ROW,
}


def _stack_spec(spec):
    """Prepend a replicated layer axis to a flat layer spec (stacked params)."""
    if isinstance(spec, dict):
        return {k: _stack_spec(v) for k, v in spec.items()}
    if isinstance(spec, P):
        return P(None, *spec)
    return spec


def param_specs(family: str, params: Dict[str, Any]) -> Dict[str, Any]:
    """Build a spec pytree mirroring ``params`` (flat or layer-stacked)."""
    layer = {"llama": _LLAMA_LAYER, "opt": _OPT_LAYER, "bloom": _BLOOM_LAYER}[family]
    if "layers_stacked" in params:
        stacked_layer = _stack_spec(dict(layer))
        specs: Dict[str, Any] = {"layers_stacked": {
            key: stacked_layer.get(key, P())
            for key in params["layers_stacked"]
        }}
    else:
        n_layers = len(params["layers"])
        specs = {"layers": [dict(layer) for _ in range(n_layers)]}
    specs["embed"] = P("model", None)
    if family == "opt":
        specs["embed_pos"] = P()
        if "final_norm" in params:
            specs["final_norm"] = REP
    elif family == "bloom":
        specs["embed_norm"] = REP
        specs["final_norm"] = REP
    else:
        specs["final_norm"] = P()
        if "lm_head" in params:
            specs["lm_head"] = COL
    return specs


def _compatible_spec(shape, spec: P, mesh: Mesh) -> P:
    """Drop spec axes whose mesh extent does not divide the array dim.

    Keeps placement legal for e.g. per-group scale arrays with few rows, or
    dims like 11008 that don't divide by every mesh size; dropped axes mean
    replication along that dimension.
    """
    out = []
    for i, axis in enumerate(spec):
        if axis is None or i >= len(shape):
            out.append(None)
            continue
        extent = mesh.shape[axis] if isinstance(axis, str) else 1
        out.append(axis if shape[i] % extent == 0 else None)
    return P(*out)


def _leaf_sharding(value: Any, spec, mesh: Mesh):
    if isinstance(value, QuantizedTensor):
        wspec = spec["w"] if isinstance(spec, dict) else spec

        def place(leaf, leaf_spec):
            if leaf is None:
                return None
            leaf_spec = _compatible_spec(leaf.shape, leaf_spec, mesh)
            return jax.device_put(leaf, NamedSharding(mesh, leaf_spec))

        # zeros may be [1,1] (symmetric): replicate those
        def side_spec(side):
            if side is None:
                return None
            return wspec if any(dim > 1 for dim in side.shape) else P()

        # replace() keeps ALL static metadata (incl. side_pad, which a
        # positional reconstruction silently dropped)
        return value.replace(
            qweight=place(value.qweight, wspec),
            scales=place(value.scales, side_spec(value.scales)),
            zeros=place(value.zeros, side_spec(value.zeros)),
            codebook=(place(value.codebook, P())
                      if value.codebook is not None else None),
        )
    spec = _compatible_spec(value.shape, spec, mesh)
    return jax.device_put(value, NamedSharding(mesh, spec))


def apply_sharding(params: Dict[str, Any], specs: Dict[str, Any], mesh: Mesh):
    """Place every param according to its spec (dicts with 'w'/'b' handled)."""

    def walk(p, s):
        from ..models.common import FusedLinear

        if isinstance(p, FusedLinear):
            wspec = s["w"] if isinstance(s, dict) else s
            return p.replace(
                w=walk(p.w, wspec),
                b=None if p.b is None
                else _leaf_sharding(p.b, s["b"] if isinstance(s, dict)
                                    else P("model"), mesh),
            )
        if isinstance(p, QuantizedTensor):
            return _leaf_sharding(p, s, mesh)
        if isinstance(p, dict):
            out = {}
            for key, val in p.items():
                if key == "name":
                    out[key] = val
                    continue
                sub = s[key] if isinstance(s, dict) and key in s else s
                out[key] = walk(val, sub)
            return out
        if isinstance(p, list):
            return [walk(v, s[i] if isinstance(s, list) else s) for i, v in enumerate(p)]
        if p is None:
            return None
        if hasattr(p, "ndim"):
            spec = s if not isinstance(s, dict) else P()
            if isinstance(spec, P) and p.ndim < len([a for a in spec if a]):
                spec = P()
            return _leaf_sharding(p, spec, mesh)
        return p

    return walk(params, specs)
