"""HF checkpoint conversion (the L2 boundary: HF weights -> our pytrees).

Two entry points:
  * :func:`from_hf_model` -- convert an in-memory ``transformers`` model
    (used by the parity test suite against tiny random models);
  * :func:`load_checkpoint_dir` -- read ``config.json`` + ``*.safetensors``
    directly, no torch model instantiation (the production path for
    LLaMA-70B-class checkpoints, SURVEY.md §7 hard-part 5).

HF linear weights are ``[out, in]``; ours are ``[in, out]`` -- transposed
here once at conversion.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .bloom import BloomConfig, bloom_forward
from .llama import LlamaConfig, llama_forward
from .opt import OPTConfig, opt_forward


def _lin(sd: Dict[str, np.ndarray], prefix: str, dtype) -> Dict[str, Any]:
    w = jnp.asarray(sd[prefix + ".weight"], dtype).T
    b = sd.get(prefix + ".bias")
    return {"w": w, "b": jnp.asarray(b, dtype) if b is not None else None}


def _ln(sd, prefix, dtype):
    return {
        "w": jnp.asarray(sd[prefix + ".weight"], dtype),
        "b": jnp.asarray(sd[prefix + ".bias"], dtype),
    }


# ----------------------------------------------------------------- llama

def llama_config_from_hf(c) -> LlamaConfig:
    return LlamaConfig(
        vocab_size=c.vocab_size,
        hidden_size=c.hidden_size,
        intermediate_size=c.intermediate_size,
        num_layers=c.num_hidden_layers,
        num_heads=c.num_attention_heads,
        num_kv_heads=getattr(c, "num_key_value_heads", c.num_attention_heads),
        head_dim=getattr(c, "head_dim", None),
        max_position_embeddings=c.max_position_embeddings,
        rms_norm_eps=c.rms_norm_eps,
        rope_theta=getattr(c, "rope_theta", 10000.0),
        tie_word_embeddings=getattr(c, "tie_word_embeddings", False),
    )


def convert_llama(sd: Dict[str, np.ndarray], cfg: LlamaConfig, dtype=jnp.float32):
    pre = "model."
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{pre}layers.{i}."
        layers.append({
            "input_norm": jnp.asarray(sd[lp + "input_layernorm.weight"], dtype),
            "q": _lin(sd, lp + "self_attn.q_proj", dtype),
            "k": _lin(sd, lp + "self_attn.k_proj", dtype),
            "v": _lin(sd, lp + "self_attn.v_proj", dtype),
            "o": _lin(sd, lp + "self_attn.o_proj", dtype),
            "post_norm": jnp.asarray(sd[lp + "post_attention_layernorm.weight"], dtype),
            "gate": _lin(sd, lp + "mlp.gate_proj", dtype),
            "up": _lin(sd, lp + "mlp.up_proj", dtype),
            "down": _lin(sd, lp + "mlp.down_proj", dtype),
        })
    params = {
        "embed": jnp.asarray(sd[pre + "embed_tokens.weight"], dtype),
        "layers": layers,
        "final_norm": jnp.asarray(sd[pre + "norm.weight"], dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _lin(sd, "lm_head", dtype)
    return params


# ------------------------------------------------------------------- opt

def opt_config_from_hf(c) -> OPTConfig:
    return OPTConfig(
        vocab_size=c.vocab_size,
        hidden_size=c.hidden_size,
        ffn_dim=c.ffn_dim,
        num_layers=c.num_hidden_layers,
        num_heads=c.num_attention_heads,
        max_position_embeddings=c.max_position_embeddings,
        do_layer_norm_before=c.do_layer_norm_before,
    )


def convert_opt(sd: Dict[str, np.ndarray], cfg: OPTConfig, dtype=jnp.float32):
    pre = "model.decoder."
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{pre}layers.{i}."
        layers.append({
            "attn_norm": _ln(sd, lp + "self_attn_layer_norm", dtype),
            "q": _lin(sd, lp + "self_attn.q_proj", dtype),
            "k": _lin(sd, lp + "self_attn.k_proj", dtype),
            "v": _lin(sd, lp + "self_attn.v_proj", dtype),
            "o": _lin(sd, lp + "self_attn.out_proj", dtype),
            "final_norm": _ln(sd, lp + "final_layer_norm", dtype),
            "fc1": _lin(sd, lp + "fc1", dtype),
            "fc2": _lin(sd, lp + "fc2", dtype),
        })
    params = {
        "embed": jnp.asarray(sd[pre + "embed_tokens.weight"], dtype),
        "embed_pos": jnp.asarray(sd[pre + "embed_positions.weight"], dtype),
        "layers": layers,
    }
    # post-LN OPT variants (e.g. 350m) have no top-level final layer norm
    if pre + "final_layer_norm.weight" in sd:
        params["final_norm"] = _ln(sd, pre + "final_layer_norm", dtype)
    return params


# ----------------------------------------------------------------- bloom

def bloom_config_from_hf(c) -> BloomConfig:
    return BloomConfig(
        vocab_size=c.vocab_size,
        hidden_size=c.hidden_size,
        num_layers=c.n_layer,
        num_heads=c.n_head,
        layer_norm_eps=getattr(c, "layer_norm_epsilon", 1e-5),
    )


def _split_bloom_qkv(w_fused, b_fused, cfg: BloomConfig, dtype):
    """Fused [3H, H] qkv with per-head [heads, 3, hd] layout -> 3 linears."""
    h, hd = cfg.hidden_size, cfg.hd
    wt = np.asarray(w_fused).T.reshape(h, cfg.num_heads, 3, hd)  # [in, heads, 3, hd]
    bt = np.asarray(b_fused).reshape(cfg.num_heads, 3, hd)
    out = []
    for j in range(3):
        wj = wt[:, :, j, :].reshape(h, h)
        bj = bt[:, j, :].reshape(h)
        out.append({"w": jnp.asarray(wj, dtype), "b": jnp.asarray(bj, dtype)})
    return out


def convert_bloom(sd: Dict[str, np.ndarray], cfg: BloomConfig, dtype=jnp.float32):
    pre = "transformer."
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{pre}h.{i}."
        q, k, v = _split_bloom_qkv(
            sd[lp + "self_attention.query_key_value.weight"],
            sd[lp + "self_attention.query_key_value.bias"],
            cfg, dtype,
        )
        layers.append({
            "attn_norm": _ln(sd, lp + "input_layernorm", dtype),
            "q": q, "k": k, "v": v,
            "o": _lin(sd, lp + "self_attention.dense", dtype),
            "post_norm": _ln(sd, lp + "post_attention_layernorm", dtype),
            "fc1": _lin(sd, lp + "mlp.dense_h_to_4h", dtype),
            "fc2": _lin(sd, lp + "mlp.dense_4h_to_h", dtype),
        })
    return {
        "embed": jnp.asarray(sd[pre + "word_embeddings.weight"], dtype),
        "embed_norm": _ln(sd, pre + "word_embeddings_layernorm", dtype),
        "layers": layers,
        "final_norm": _ln(sd, pre + "ln_f", dtype),
    }


# ------------------------------------------------------------ entry points

FAMILIES: Dict[str, Tuple[Callable, Callable, Callable]] = {
    "llama": (llama_config_from_hf, convert_llama, llama_forward),
    "opt": (opt_config_from_hf, convert_opt, opt_forward),
    "bloom": (bloom_config_from_hf, convert_bloom, bloom_forward),
}


def from_hf_model(model, dtype=jnp.float32):
    """transformers model -> (cfg, params, forward_fn)."""
    family = model.config.model_type
    if family not in FAMILIES:
        raise ValueError(f"unsupported model family {family!r}")
    cfg_fn, conv_fn, fwd = FAMILIES[family]
    cfg = cfg_fn(model.config)
    sd = {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}
    return cfg, conv_fn(sd, cfg, dtype), fwd


def load_checkpoint_dir(path: str, dtype=jnp.bfloat16):
    """safetensors checkpoint dir -> (cfg, params, forward_fn); no torch."""
    from safetensors import safe_open

    p = Path(path)
    hf_cfg = json.loads((p / "config.json").read_text())

    class _Cfg:
        def __init__(self, d):
            self.__dict__.update(d)

    c = _Cfg(hf_cfg)
    family = hf_cfg["model_type"]
    if family not in FAMILIES:
        raise ValueError(f"unsupported model family {family!r}")
    cfg_fn, conv_fn, fwd = FAMILIES[family]
    cfg = cfg_fn(c)

    sd: Dict[str, np.ndarray] = {}
    for f in sorted(p.glob("*.safetensors")):
        with safe_open(str(f), framework="numpy") as sf:
            for key in sf.keys():
                sd[key] = sf.get_tensor(key)
    return cfg, conv_fn(sd, cfg, dtype), fwd
