"""Packed-artifact serialization.

The reference's main path re-quantizes the fp16 checkpoint on every run and
never saves the result (SURVEY.md §5 checkpoint/resume); only its GPTQ tree
can save packed 3-bit models.  Here quantization is done once: the whole
params pytree (dense arrays + packed QuantizedTensors) round-trips through a
single ``.npz`` plus a JSON manifest describing structure, model config, and
quant specs.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import AlignSpec, FloatFormat, QuantSpec
from .qtensor import QuantizedTensor

# v2: 3-bit packing switched from bit-planes (bp3) to the s21 layout
# (2-bit quads + MSB plane) consumed by the fused kernel
_FORMAT_VERSION = 2


def _spec_to_dict(spec: QuantSpec) -> dict:
    d = dataclasses.asdict(spec)
    return d


def _spec_from_dict(d: dict) -> QuantSpec:
    d = dict(d)
    if d.get("float_format"):
        d["float_format"] = FloatFormat(**d["float_format"])
    if d.get("align"):
        d["align"] = AlignSpec(**d["align"])
    return QuantSpec(**d)


def save_artifact(path: str, family: str, cfg, params: Dict[str, Any]) -> None:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    manifest: Dict[str, Any] = {
        "version": _FORMAT_VERSION,
        "family": family,
        "config": dataclasses.asdict(cfg),
        "nodes": {},
    }

    def walk(node, key):
        if isinstance(node, QuantizedTensor):
            manifest["nodes"][key] = {
                "type": "qtensor",
                "spec": _spec_to_dict(node.spec),
                "shape": list(node.shape),
                "mode": node.mode,
                "k_shards": node.k_shards,
                "n_pad": node.n_pad,
                "k_pad": node.k_pad,
                "has_zeros": node.zeros is not None,
                "has_codebook": node.codebook is not None,
            }
            arrays[key + ".qweight"] = np.asarray(node.qweight)
            arrays[key + ".scales"] = np.asarray(node.scales)
            if node.zeros is not None:
                arrays[key + ".zeros"] = np.asarray(node.zeros)
            if node.codebook is not None:
                arrays[key + ".codebook"] = np.asarray(node.codebook)
            return
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "name":
                    continue
                walk(v, f"{key}.{k}" if key else k)
            return
        if isinstance(node, list):
            manifest["nodes"].setdefault("__lists__", {})[key] = len(node)
            for i, v in enumerate(node):
                walk(v, f"{key}.{i}")
            return
        if node is None:
            return
        manifest["nodes"][key] = {"type": "array", "dtype": str(np.asarray(node).dtype)}
        arrays[key] = np.asarray(node)

    walk(params, "")
    np.savez_compressed(p / "params.npz", **arrays)
    (p / "manifest.json").write_text(json.dumps(manifest, indent=2))


def load_artifact(path: str, dtype=None) -> Tuple[str, Any, Dict[str, Any]]:
    """Returns (family, cfg, params)."""
    p = Path(path)
    manifest = json.loads((p / "manifest.json").read_text())
    if manifest.get("version", 1) != _FORMAT_VERSION:
        raise ValueError(
            f"artifact format v{manifest.get('version', 1)} != "
            f"v{_FORMAT_VERSION}; re-run quantization (the sub-byte packing "
            "layout changed)"
        )
    data = np.load(p / "params.npz")

    from ..models.bloom import BloomConfig
    from ..models.llama import LlamaConfig
    from ..models.opt import OPTConfig

    cfg_cls = {"llama": LlamaConfig, "opt": OPTConfig, "bloom": BloomConfig}[
        manifest["family"]
    ]
    cfg_fields = {f.name for f in dataclasses.fields(cfg_cls)}
    cfg = cfg_cls(**{k: v for k, v in manifest["config"].items() if k in cfg_fields})

    nodes = manifest["nodes"]
    lists = nodes.get("__lists__", {})

    # rebuild the tree from flat keys
    root: Dict[str, Any] = {}

    def ensure(container, parts):
        cur = root
        for i, part in enumerate(parts[:-1]):
            prefix = ".".join(parts[: i + 1])
            nxt_is_list = prefix in lists
            if isinstance(cur, list):
                part = int(part)
                while len(cur) <= part:
                    cur.append({})
                if nxt_is_list and not isinstance(cur[part], list):
                    cur[part] = []
                cur = cur[part]
            else:
                if part not in cur:
                    cur[part] = [] if nxt_is_list else {}
                cur = cur[part]
        return cur

    def assign(key, value):
        parts = key.split(".")
        cur = ensure(root, parts)
        last = parts[-1]
        if isinstance(cur, list):
            idx = int(last)
            while len(cur) <= idx:
                cur.append(None)
            cur[idx] = value
        else:
            cur[last] = value

    for key, info in nodes.items():
        if key == "__lists__":
            continue
        if info["type"] == "qtensor":
            spec = _spec_from_dict(info["spec"])
            qt = QuantizedTensor(
                jnp.asarray(data[key + ".qweight"]),
                jnp.asarray(data[key + ".scales"]),
                jnp.asarray(data[key + ".zeros"]) if info["has_zeros"] else None,
                jnp.asarray(data[key + ".codebook"]) if info["has_codebook"] else None,
                spec,
                tuple(info["shape"]),
                info["mode"],
                info.get("k_shards", 1),
                info.get("n_pad", 0),
                info.get("k_pad", 0),
            )
            assign(key, qt)
        else:
            arr = jnp.asarray(data[key])
            if dtype is not None and arr.dtype in (jnp.float32, jnp.float16, jnp.bfloat16):
                arr = arr.astype(dtype)
            assign(key, arr)

    # linear dicts saved without explicit b=None: restore None biases
    def fix_linears(node):
        if isinstance(node, dict):
            if "w" in node and "b" not in node:
                node["b"] = None
            for v in node.values():
                fix_linears(v)
        elif isinstance(node, list):
            for v in node:
                fix_linears(v)

    fix_linears(root)
    return manifest["family"], cfg, root
