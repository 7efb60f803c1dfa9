"""GPipe pipeline parallelism must reproduce the single-device forward.

Runs on the virtual CPU mesh (conftest forces 8 CPU devices); the reference
has no pipeline schedule at all (layer placement only, main.py:331-345), so
the oracle is our own unrolled forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from iron_weight_only_quant_tpu.config import QuantSpec
from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward, llama_init
from iron_weight_only_quant_tpu.parallel.pp import (
    make_pp_llama_forward,
    stage_stack_llama_layers,
)
from iron_weight_only_quant_tpu.quantize.model_pass import quantize_model_params


@pytest.fixture(scope="module")
def model4():
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=4, num_heads=4, num_kv_heads=2, max_position_embeddings=128,
    )
    params = llama_init(cfg, jax.random.PRNGKey(0))
    return cfg, params


@pytest.fixture(scope="module")
def stage_mesh():
    return Mesh(np.array(jax.devices()[:4]), ("stage",))


@pytest.fixture(scope="module")
def tokens():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.integers(0, 250, size=(4, 10)), jnp.int32)


@pytest.mark.parametrize("n_micro", [1, 2, 4])
def test_pp_matches_unrolled(model4, stage_mesh, tokens, n_micro):
    cfg, params = model4
    staged = stage_stack_llama_layers(params, 4)
    fwd = make_pp_llama_forward(cfg, stage_mesh, n_microbatches=n_micro)
    want, _ = llama_forward(params, tokens, cfg)
    got = fwd(staged, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pp_quantized(model4, stage_mesh, tokens):
    cfg, params = model4
    qp, _ = quantize_model_params(
        params, QuantSpec(fmt="int", bits=8, group_size=32, symmetric=False)
    )
    staged = stage_stack_llama_layers(qp, 4)
    fwd = make_pp_llama_forward(cfg, stage_mesh, n_microbatches=2)
    want, _ = llama_forward(qp, tokens, cfg)
    got = fwd(staged, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pp_two_stages_two_layers_each(model4, tokens):
    cfg, params = model4
    mesh = Mesh(np.array(jax.devices()[:2]), ("stage",))
    staged = stage_stack_llama_layers(params, 2)
    fwd = make_pp_llama_forward(cfg, mesh, n_microbatches=2)
    want, _ = llama_forward(params, tokens, cfg)
    got = fwd(staged, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pp_rejects_bad_split(model4):
    cfg, params = model4
    with pytest.raises(ValueError):
        stage_stack_llama_layers(params, 3)
    mesh = Mesh(np.array(jax.devices()[:4]), ("stage",))
    fwd = make_pp_llama_forward(cfg, mesh, n_microbatches=3)
    staged = stage_stack_llama_layers(params, 4)
    with pytest.raises(ValueError):
        fwd(staged, jnp.ones((4, 8), jnp.int32))  # 4 % 3 != 0


def test_pp_packed_head_falls_back(model4, stage_mesh, tokens):
    """A packed (QuantizedTensor) lm_head cannot vocab-shard over the
    stage axis; the replicated-head fallback must still match (round 4:
    dense divisible heads take the vocab-parallel path, covered above)."""
    from iron_weight_only_quant_tpu.quantize import quantize_tensor

    cfg, params = model4
    qhead = quantize_tensor(
        params["lm_head"]["w"],
        QuantSpec(fmt="int", bits=8, group_size=32, symmetric=False),
    )
    p2 = {**params, "lm_head": {"w": qhead, "b": None}}
    staged = stage_stack_llama_layers(p2, 4)
    fwd = make_pp_llama_forward(cfg, stage_mesh, n_microbatches=2)
    want, _ = llama_forward(p2, cfg=cfg, tokens=tokens)
    got = fwd(staged, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
