"""C++ native library: parity vs the jnp reference implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from iron_weight_only_quant_tpu import native
from iron_weight_only_quant_tpu.config import QuantSpec
from iron_weight_only_quant_tpu.ops.packing import pack_codes, unpack_codes
from iron_weight_only_quant_tpu.quantize import quantize_tensor

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def weight(request):
    rng = np.random.default_rng(5)
    return rng.normal(size=(256, 64)).astype(np.float32) * 0.05


class TestNativePacking:
    def test_pack_matches_jnp(self, rng):
        codes = rng.integers(0, 16, size=(64, 32)).astype(np.int32)
        ours = native.native_pack_int4(codes)
        ref = np.asarray(pack_codes(jnp.asarray(codes), 4))
        np.testing.assert_array_equal(ours, ref)

    def test_unpack_roundtrip(self, rng):
        codes = rng.integers(0, 16, size=(64, 32)).astype(np.int32)
        packed = native.native_pack_int4(codes)
        back = native.native_unpack_int4(packed, 64)
        np.testing.assert_array_equal(back, codes)


class TestNativeQuantize:
    @pytest.mark.parametrize("symmetric", [True, False])
    def test_int4_matches_artifact(self, weight, symmetric):
        spec = QuantSpec(fmt="int", bits=4, group_size=64, symmetric=symmetric)
        qt = quantize_tensor(jnp.asarray(weight), spec)
        packed, scales, zeros = native.native_quantize_int4(weight, 64, symmetric)
        np.testing.assert_array_equal(packed, np.asarray(qt.qweight))
        np.testing.assert_allclose(scales, np.asarray(qt.scales), rtol=1e-6)
        if symmetric:
            assert np.all(zeros == 8.0)
        else:
            np.testing.assert_allclose(zeros, np.asarray(qt.zeros), rtol=1e-6)

    @pytest.mark.parametrize("symmetric", [True, False])
    def test_int8_matches_artifact(self, weight, symmetric):
        spec = QuantSpec(fmt="int", bits=8, group_size=64, symmetric=symmetric)
        qt = quantize_tensor(jnp.asarray(weight), spec)
        packed, scales, zeros = native.native_quantize_int8(weight, 64, symmetric)
        np.testing.assert_array_equal(packed, np.asarray(qt.qweight))
        np.testing.assert_allclose(scales, np.asarray(qt.scales), rtol=1e-6)
        if symmetric:
            assert np.all(zeros == 0.0)
        else:
            np.testing.assert_allclose(zeros, np.asarray(qt.zeros), rtol=1e-6)


class TestTokenShard:
    def test_mmap_reader(self, tmp_path, rng):
        tokens = rng.integers(0, 1000, size=4096).astype(np.int32)
        path = tmp_path / "shard.bin"
        tokens.tofile(path)
        with native.TokenShardReader(str(path)) as r:
            assert len(r) == 4096
            batch = r.batch([0, 100, 4096 - 16], seqlen=16)
            np.testing.assert_array_equal(batch[0], tokens[:16])
            np.testing.assert_array_equal(batch[1], tokens[100:116])
            np.testing.assert_array_equal(batch[2], tokens[-16:])
            with pytest.raises(ValueError):
                r.batch([4090], seqlen=16)  # out of range
