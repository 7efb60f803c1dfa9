"""Packed artifact tests: dequantize must equal the fake-quant oracle exactly."""

import numpy as np
import pytest

import jax.numpy as jnp

from iron_weight_only_quant_tpu.config import (
    PER_CHANNEL,
    PER_TENSOR,
    QuantSpec,
    fp_spec,
)
from iron_weight_only_quant_tpu.formats import fake_quantize
from iron_weight_only_quant_tpu.ops import (
    dequantize_weight,
    pack_codes,
    quantized_matmul,
    unpack_codes,
)
from iron_weight_only_quant_tpu.quantize import quantize_tensor

SPECS = [
    QuantSpec(fmt="int", bits=4, group_size=128, symmetric=True),
    QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False),
    QuantSpec(fmt="int", bits=4, group_size=PER_CHANNEL, symmetric=False),
    QuantSpec(fmt="int", bits=4, group_size=PER_TENSOR, symmetric=True),
    QuantSpec(fmt="int", bits=2, group_size=64, symmetric=False),
    QuantSpec(fmt="int", bits=8, group_size=128, symmetric=True),
    QuantSpec(fmt="int", bits=3, group_size=64, symmetric=False),  # bit-plane packed
    fp_spec("fp4", 2, 1, group_size=128),
    fp_spec("fp4", 2, 1, group_size=128, symmetric=False),
    fp_spec("fp8", 4, 3, group_size=64),
    fp_spec("fp6", 3, 2, group_size=128),
    fp_spec("fp8", 4, 3, group_size=128, approximate=True),
    fp_spec("fp4", 1, 2, group_size=128, approximate=True, double_approximate=True),
    QuantSpec(fmt="bfp", bits=4, group_size=128),
    QuantSpec(fmt="bfp", bits=8, group_size=64),
]


@pytest.fixture(scope="module")
def weight():
    rng = np.random.default_rng(42)
    return jnp.asarray(rng.normal(size=(256, 192)).astype(np.float32) * 0.05)


class TestPacking:
    @pytest.mark.parametrize("bits", [2, 3, 4, 6, 8])
    def test_roundtrip(self, rng, bits):
        k, n = 64, 16
        lo, hi = (-128, 128) if bits == 8 else (0, 2**bits)
        codes = jnp.asarray(rng.integers(lo, hi, size=(k, n)), dtype=jnp.int32)
        packed = pack_codes(codes, bits)
        assert packed.dtype == jnp.uint8
        expected_rows = {3: 3 * k // 8, 6: 3 * k // 4}.get(
            bits, k // (8 // bits))
        assert packed.shape[0] == expected_rows
        back = unpack_codes(packed, bits, k)
        np.testing.assert_array_equal(np.asarray(codes), np.asarray(back))

    def test_int4_split_k_layout(self):
        # low nibble = first K-half; high nibble stored MSB-flipped so its
        # int8 view reads 16*hi - 128 (packing.py)
        codes = jnp.asarray([[1], [2], [3], [4]], dtype=jnp.int32)  # K=4
        packed = np.asarray(pack_codes(codes, 4))
        assert packed[0, 0] == 1 | ((3 ^ 8) << 4)
        assert packed[1, 0] == 2 | ((4 ^ 8) << 4)
        for b, hi in ((packed[0, 0], 3), (packed[1, 0], 4)):
            assert np.int8(b & 0xF0) == 16 * hi - 128


class TestQuantizedTensor:
    @pytest.mark.parametrize("spec", SPECS, ids=lambda s: f"{s.fmt}{s.storage_bits}g{s.group_size}"
                             f"{'a' if s.approximate else ''}{'s' if s.symmetric else 'u'}")
    def test_dequant_matches_oracle(self, weight, spec):
        qt = quantize_tensor(weight, spec)
        deq = dequantize_weight(qt)
        oracle = fake_quantize(weight, spec)
        np.testing.assert_array_equal(np.asarray(deq), np.asarray(oracle))

    def test_memory_footprint(self, weight):
        spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=True)
        qt = quantize_tensor(weight, spec)
        dense_bytes = weight.size * 2  # bf16 baseline
        assert qt.nbytes_packed() < dense_bytes * 0.3  # ~4.25 bits/weight

    def test_matmul_matches_dense(self, weight, rng):
        spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
        qt = quantize_tensor(weight, spec)
        x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
        y = quantized_matmul(x, qt, use_pallas=False)
        y_ref = x @ fake_quantize(weight, spec)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)

    def test_bias(self, weight, rng):
        spec = QuantSpec(fmt="int", bits=8, group_size=PER_CHANNEL, symmetric=True)
        qt = quantize_tensor(weight, spec)
        x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(192,)).astype(np.float32))
        y = quantized_matmul(x, qt, bias=b, use_pallas=False)
        y0 = quantized_matmul(x, qt, use_pallas=False)
        np.testing.assert_allclose(np.asarray(y - y0), np.tile(b, (4, 1)), rtol=1e-5)

    def test_unsupported_paths_raise(self, weight):
        with pytest.raises(NotImplementedError):
            quantize_tensor(weight, QuantSpec(fmt="fp4_e1m2", bits=4, group_size=128))
        with pytest.raises(NotImplementedError):
            quantize_tensor(
                weight, QuantSpec(fmt="int", bits=4, group_size=64, quant_axis=1)
            )


class TestKPadding:
    """K-dim storage padding: whole zero groups appended so awkward K
    (e.g. llama's 11008 intermediate) gets large kernel tiles; logical
    results must be untouched."""

    def test_padded_matches_oracle(self, weight, rng):
        spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
        qt = quantize_tensor(weight, spec, pad_k_to=512)
        assert qt.k_pad == 512 - 256 and qt.k_stored == 512
        deq = dequantize_weight(qt)
        assert deq.shape == weight.shape
        np.testing.assert_array_equal(np.asarray(deq),
                                      np.asarray(fake_quantize(weight, spec)))
        x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
        y = quantized_matmul(x, qt, use_pallas=False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x @ deq),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("bits", [4, 8])
    def test_padded_kernel_interpret(self, weight, rng, bits):
        from iron_weight_only_quant_tpu.ops.pallas.dequant_matmul import (
            fused_quantized_matmul,
            kernel_supported,
        )

        spec = QuantSpec(fmt="int", bits=bits, group_size=128, symmetric=False)
        qt = quantize_tensor(weight, spec, pad_k_to=512, pad_n_to=512)
        assert qt.k_pad == 256 and kernel_supported(qt)
        x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
        y = fused_quantized_matmul(x, qt, interpret=True)
        assert y.shape == (4, 192)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(x @ dequantize_weight(qt)),
                                   rtol=2e-5, atol=2e-4)

    def test_skipped_when_not_whole_groups(self, weight):
        # per-channel spec: padding would change column min/max -> skipped
        spec = QuantSpec(fmt="int", bits=4, group_size=PER_CHANNEL,
                         symmetric=False)
        qt = quantize_tensor(weight, spec, pad_k_to=512)
        assert qt.k_pad == 0
        # group size not dividing the multiple -> skipped too
        spec = QuantSpec(fmt="int", bits=4, group_size=96, symmetric=False)
        w = jnp.asarray(np.asarray(weight)[:192])
        qt = quantize_tensor(w, spec, pad_k_to=512)
        assert qt.k_pad == 0

    def test_artifact_roundtrip_keeps_k_pad(self, weight, tmp_path):
        from iron_weight_only_quant_tpu.models.llama import LlamaConfig
        from iron_weight_only_quant_tpu.quantize.artifact import (
            load_artifact,
            save_artifact,
        )

        spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
        qt = quantize_tensor(weight, spec, pad_k_to=512)
        cfg = LlamaConfig(hidden_size=8, num_layers=1, num_heads=2,
                          intermediate_size=16, vocab_size=32)
        save_artifact(str(tmp_path / "a"), "llama", cfg,
                      {"lin": {"w": qt, "b": None}})
        _, _, params = load_artifact(str(tmp_path / "a"))
        qt2 = params["lin"]["w"]
        assert qt2.k_pad == qt.k_pad and qt2.shape == qt.shape
        np.testing.assert_array_equal(np.asarray(dequantize_weight(qt2)),
                                      np.asarray(dequantize_weight(qt)))


class TestNPadding:
    def test_padded_matches_oracle(self, weight, rng):
        # N=192 padded to 512-multiple -> n_pad=320
        spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
        qt = quantize_tensor(weight, spec, pad_n_to=512)
        assert qt.n_pad == 512 - 192
        deq = dequantize_weight(qt)
        assert deq.shape == weight.shape
        np.testing.assert_array_equal(np.asarray(deq),
                                      np.asarray(fake_quantize(weight, spec)))
        x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
        y = quantized_matmul(x, qt, use_pallas=False)
        y_ref = x @ deq
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5,
                                   atol=1e-5)

    def test_padded_kernel_interpret(self, weight, rng):
        from iron_weight_only_quant_tpu.ops.pallas.dequant_matmul import (
            fused_quantized_matmul,
            kernel_supported,
        )

        spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=True)
        qt = quantize_tensor(weight, spec, pad_n_to=512)
        assert kernel_supported(qt)
        x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
        y = fused_quantized_matmul(x, qt, interpret=True)
        assert y.shape == (4, 192)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(x @ dequantize_weight(qt)),
                                   rtol=2e-5, atol=2e-4)
