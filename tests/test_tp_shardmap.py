"""shard_map tensor-parallel quantized matmuls on the virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from iron_weight_only_quant_tpu.config import MeshConfig, QuantSpec
from iron_weight_only_quant_tpu.ops.qmatmul import dequantize_weight, quantized_matmul
from iron_weight_only_quant_tpu.parallel import make_mesh
from iron_weight_only_quant_tpu.parallel.tp import tp_column_matmul, tp_row_matmul
from iron_weight_only_quant_tpu.quantize import quantize_tensor


@pytest.fixture(scope="module")
def mesh(cpu_devices):
    return make_mesh(MeshConfig(data=1, model=4))


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(512, 256)).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.normal(size=(8, 512)).astype(np.float32))
    return w, x


SPECS = [
    QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False),
    QuantSpec(fmt="int", bits=8, group_size=128, symmetric=True),
    QuantSpec(fmt="int", bits=4, group_size=-2, symmetric=True),
]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: f"{s.fmt}{s.bits}g{s.group_size}")
class TestColumnParallel:
    def test_matches_global(self, mesh, data, spec):
        w, x = data
        qt = quantize_tensor(w, spec)
        y_global = quantized_matmul(x, qt, use_pallas=False)
        y_tp = tp_column_matmul(x, qt, mesh)
        np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_global),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: f"{s.fmt}{s.bits}g{s.group_size}")
class TestRowParallel:
    def test_matches_global(self, mesh, data, spec):
        w, x = data
        qt = quantize_tensor(w, spec, k_shards=4)
        y_global = quantized_matmul(x, qt, use_pallas=False)
        y_tp = tp_row_matmul(x, qt, mesh)
        np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_global),
                                   rtol=1e-5, atol=1e-5)

    def test_requires_matching_k_shards(self, mesh, data, spec):
        w, x = data
        qt = quantize_tensor(w, spec)  # k_shards=1
        with pytest.raises(ValueError):
            tp_row_matmul(x, qt, mesh)


class TestShardedPackingProperty:
    def test_segment_slices_self_contained(self, data):
        """Slicing a k_shards=D packed array at segment boundaries must equal
        packing each K segment alone -- the row-parallel layout contract."""
        w, _ = data
        spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
        d = 4
        qt = quantize_tensor(w, spec, k_shards=d)
        seg_k = w.shape[0] // d
        seg_p = qt.qweight.shape[0] // d
        for i in range(d):
            w_seg = w[i * seg_k : (i + 1) * seg_k]
            # per-segment scales follow from per-segment grouping of the
            # same values: quantize the segment alone and compare packing
            from iron_weight_only_quant_tpu.quantize.qtensor import QuantizedTensor

            rows = qt.scales.shape[0] // d
            local = QuantizedTensor(
                qt.qweight[i * seg_p : (i + 1) * seg_p],
                qt.scales[i * rows : (i + 1) * rows],
                qt.zeros[i * rows : (i + 1) * rows] if qt.zeros.shape[0] > 1 else qt.zeros,
                None, spec, (seg_k, w.shape[1]), "affine", 1,
            )
            np.testing.assert_array_equal(
                np.asarray(dequantize_weight(local)),
                np.asarray(dequantize_weight(qt))[i * seg_k : (i + 1) * seg_k],
            )

    def test_dequant_same_regardless_of_k_shards(self, data):
        w, _ = data
        spec = QuantSpec(fmt="int", bits=4, group_size=64, symmetric=True)
        a = dequantize_weight(quantize_tensor(w, spec))
        b = dequantize_weight(quantize_tensor(w, spec, k_shards=4))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
