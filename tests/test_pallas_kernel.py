"""Fused dequant-matmul kernel vs XLA reference (Pallas interpret mode on CPU).

On real TPU hardware the same comparisons run in scripts/tpu_smoke.py; CI
here exercises the kernel logic through the interpreter.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from iron_weight_only_quant_tpu.config import PER_CHANNEL, PER_TENSOR, QuantSpec
from iron_weight_only_quant_tpu.ops.pallas.dequant_matmul import (
    fused_quantized_matmul,
    kernel_supported,
)
from iron_weight_only_quant_tpu.ops.qmatmul import dequantize_weight
from iron_weight_only_quant_tpu.quantize import quantize_tensor

SPECS = [
    QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False),
    QuantSpec(fmt="int", bits=4, group_size=128, symmetric=True),
    QuantSpec(fmt="int", bits=4, group_size=64, symmetric=False),
    QuantSpec(fmt="int", bits=4, group_size=PER_CHANNEL, symmetric=True),
    QuantSpec(fmt="int", bits=4, group_size=PER_TENSOR, symmetric=False),
    QuantSpec(fmt="int", bits=8, group_size=128, symmetric=False),
    QuantSpec(fmt="int", bits=8, group_size=PER_CHANNEL, symmetric=True),
    QuantSpec(fmt="bfp", bits=4, group_size=128),
]


@pytest.fixture(scope="module")
def weight():
    rng = np.random.default_rng(1)
    return jnp.asarray(rng.normal(size=(512, 256)).astype(np.float32) * 0.05)


@pytest.mark.parametrize(
    "spec", SPECS,
    ids=lambda s: f"{s.fmt}{s.storage_bits}g{s.group_size}{'s' if s.symmetric else 'u'}",
)
@pytest.mark.parametrize("m", [1, 16])
def test_fused_matches_xla(weight, spec, m):
    rng = np.random.default_rng(2)
    qt = quantize_tensor(weight, spec)
    assert kernel_supported(qt), "kernel must support this layout"
    x = jnp.asarray(rng.normal(size=(m, 512)).astype(np.float32))
    y_ref = x @ dequantize_weight(qt)
    y = fused_quantized_matmul(x, qt, interpret=True)
    assert y.shape == (m, 256)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-4)


def test_batched_input(weight):
    rng = np.random.default_rng(3)
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    qt = quantize_tensor(weight, spec)
    x = jnp.asarray(rng.normal(size=(2, 3, 512)).astype(np.float32))
    y = fused_quantized_matmul(x, qt, interpret=True)
    y_ref = x @ dequantize_weight(qt)
    assert y.shape == (2, 3, 256)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-4)


def test_unsupported_shapes_rejected():
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(96, 100)).astype(np.float32))  # N !% 128
    qt = quantize_tensor(w, QuantSpec(fmt="int", bits=4, group_size=PER_CHANNEL))
    assert not kernel_supported(qt)


@pytest.mark.parametrize("spec", [
    QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False),
    QuantSpec(fmt="int", bits=8, group_size=128, symmetric=True),
])
def test_w4a8_close_to_full_precision(weight, spec):
    """int8-activation path: small extra error, same result structurally."""
    rng = np.random.default_rng(9)
    qt = quantize_tensor(weight, spec)
    x = jnp.asarray(rng.normal(size=(4, 512)).astype(np.float32))
    y_ref = np.asarray(x @ dequantize_weight(qt))
    y = np.asarray(fused_quantized_matmul(x, qt, interpret=True, activation_bits=8))
    rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert rel < 0.01, rel
