"""Analysis tool tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iron_weight_only_quant_tpu.analysis import (
    activation_pre_align,
    capture_linear_inputs,
    codeword_histogram,
    exponent_histogram,
    exponent_outlier_stats,
    fp16_bit_sparsity,
)
from iron_weight_only_quant_tpu.config import QuantSpec, fp_spec
from iron_weight_only_quant_tpu.quantize import quantize_tensor


@pytest.fixture(scope="module")
def fp8_qt():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32) * 0.05)
    return quantize_tensor(w, fp_spec("fp8", 4, 3, group_size=128))


class TestHistograms:
    def test_codeword_histogram_lut(self, fp8_qt):
        values, counts = codeword_histogram(fp8_qt)
        assert counts.sum() == 256 * 128
        assert len(values) == 256

    def test_codeword_histogram_int(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))
        qt = quantize_tensor(w, QuantSpec(fmt="int", bits=4, group_size=64))
        values, counts = codeword_histogram(qt)
        assert counts.sum() == 128 * 64
        assert values.min() >= 0 and values.max() <= 15

    def test_exponent_histogram(self, fp8_qt):
        fields, counts = exponent_histogram(fp8_qt)
        assert len(fields) == 16
        assert counts.sum() == 256 * 128

    def test_outlier_stats(self, fp8_qt):
        st = exponent_outlier_stats(fp8_qt, lo=12, hi=15)
        assert 0 <= st["frac_groups_with_outlier"] <= 1
        assert sum(st["outlier_count_hist"]) == st["n_groups"]


class TestBitSparsity:
    def test_known_values(self):
        # all values equal -> aligned mantissa identical; leading bit always 1
        out = fp16_bit_sparsity(np.full(32, 1.5, np.float16))
        zc = out["zero_counts"]
        assert zc[0] == 0  # MSB (leading 1) never zero
        assert zc[1] == 0  # 1.5 -> mantissa 0.5 -> second bit set
        assert zc[2] == 32  # rest zero

    def test_shapes(self, rng):
        out = fp16_bit_sparsity(rng.normal(size=100))
        assert out["aligned_bits"].shape == (100, 13)
        assert len(out["zero_counts"]) == 13


class TestPreAlign:
    def test_reconstruction(self, rng):
        x = rng.normal(size=(4, 16)).astype(np.float32)
        planes, row_exp = activation_pre_align(x, mantissa_bits=12)
        assert planes.shape == (4, 16, 13)
        # reconstruct: sign * (mantissa bits as fixed point) * 2^row_exp
        mag = (planes[:, :, 1:] * (1 << np.arange(11, -1, -1))).sum(-1)
        recon = np.where(planes[:, :, 0] == 1, -mag, mag) / 2.0**11 * np.exp2(row_exp)[:, None]
        np.testing.assert_allclose(recon, x, atol=np.abs(x).max() * 2e-3)


class TestActivationCapture:
    def test_capture(self):
        from iron_weight_only_quant_tpu.models import OPTConfig, opt_forward, opt_init
        from iron_weight_only_quant_tpu.quantize.gptq_model import annotate_linears

        cfg = OPTConfig.tiny()
        params = opt_init(cfg, jax.random.PRNGKey(0))
        params["layers"] = [annotate_linears(b) for b in params["layers"]]
        toks = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
        cap = capture_linear_inputs(opt_forward, params, cfg, toks, names=["q", "fc1"])
        assert set(cap) == {"q", "fc1"}
        assert cap["q"].shape == (1, 4, cfg.hidden_size)
