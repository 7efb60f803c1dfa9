"""Activation smoothing: function preservation + outlier flattening."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iron_weight_only_quant_tpu.config import QuantSpec
from iron_weight_only_quant_tpu.models import (
    LlamaConfig,
    OPTConfig,
    llama_forward,
    llama_init,
    opt_forward,
    opt_init,
)
from iron_weight_only_quant_tpu.quantize.model_pass import quantize_model_params
from iron_weight_only_quant_tpu.quantize.smooth import smooth_model


@pytest.fixture(scope="module")
def samples():
    rng = np.random.default_rng(0)
    return [rng.integers(0, 250, size=(1, 24)) for _ in range(3)]


@pytest.mark.parametrize("family,make", [
    ("llama", lambda: (LlamaConfig.tiny(), llama_init, llama_forward)),
    ("opt", lambda: (OPTConfig.tiny(), opt_init, opt_forward)),
])
def test_smoothing_preserves_function(family, make, samples):
    cfg, init, fwd = make()
    params = init(cfg, jax.random.PRNGKey(0))
    smoothed = smooth_model(params, cfg, family, fwd, samples, alpha=0.5)
    toks = jnp.asarray(samples[0], jnp.int32)
    a, _ = fwd(params, toks, cfg)
    b, _ = fwd(smoothed, toks, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)


def test_smoothing_flattens_outliers(samples):
    """Inject an outlier channel; smoothing must reduce the quantized-model
    error it causes."""
    cfg = OPTConfig.tiny()
    params = opt_init(cfg, jax.random.PRNGKey(1))
    # create an activation outlier: scale one hidden channel of every
    # attn_norm weight strongly
    for b in params["layers"]:
        b["attn_norm"]["w"] = b["attn_norm"]["w"].at[7].mul(30.0)

    toks = jnp.asarray(np.concatenate(samples, axis=0), jnp.int32)
    ref, _ = opt_forward(params, toks, cfg)

    spec = QuantSpec(fmt="int", bits=4, group_size=-2, symmetric=True)
    q_plain, _ = quantize_model_params(params, spec)
    smoothed = smooth_model(params, cfg, "opt", opt_forward, samples, alpha=0.8)
    q_smooth, _ = quantize_model_params(smoothed, spec)

    err_plain = float(jnp.mean((opt_forward(q_plain, toks, cfg)[0] - ref) ** 2))
    err_smooth = float(jnp.mean((opt_forward(q_smooth, toks, cfg)[0] - ref) ** 2))
    assert err_smooth < err_plain, (err_smooth, err_plain)
