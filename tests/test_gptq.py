"""GPTQ solver tests: golden parity vs the reference + properties."""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from iron_weight_only_quant_tpu.quantize.gptq import (
    gptq_quantize,
    hessian_update,
)

GOLDEN = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def data():
    return np.load(GOLDEN / "gptq.npz")


def accumulate_h(calib: np.ndarray) -> jnp.ndarray:
    h = jnp.zeros((calib.shape[-1], calib.shape[-1]), jnp.float32)
    n = jnp.asarray(0.0)
    for i in range(calib.shape[0]):
        h, n = hessian_update(h, n, jnp.asarray(calib[i]))
    return h


CASES = {
    "pc_sym_b4": dict(bits=4, sym=True, groupsize=-1),
    "pc_asym_b4": dict(bits=4, sym=False, groupsize=-1),
    "g16_asym_b4": dict(bits=4, sym=False, groupsize=16),
    "g16_asym_b4_act": dict(bits=4, sym=False, groupsize=16, actorder=True),
    "pc_sym_b3": dict(bits=3, sym=True, groupsize=-1),
    "pc_trits": dict(bits=2, sym=True, groupsize=-1, trits=True),
}


class TestGoldenParity:
    def test_hessian_matches(self, data):
        h = accumulate_h(data["calib"])
        ref_h = data["pc_sym_b4_H"]
        np.testing.assert_allclose(np.asarray(h), ref_h, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("key", list(CASES))
    def test_quantized_weights_match(self, data, key):
        w = jnp.asarray(data["weight"])
        h = jnp.asarray(data[key + "_H"])
        res = gptq_quantize(w, h, blocksize=16, percdamp=0.01, **CASES[key])
        golden = data[key]
        ours = np.asarray(res.q)
        # grid values are discrete; nearly all entries should match exactly,
        # small fp differences in the Cholesky chain may flip borderline
        # rounding for a few entries
        exact = np.isclose(ours, golden, rtol=1e-5, atol=1e-7)
        assert exact.mean() > 0.995, f"{key}: {100 * (1 - exact.mean()):.2f}% differ"
        np.testing.assert_allclose(ours, golden, atol=np.abs(w).max() * 0.3)


class TestProperties:
    def test_beats_rtn_on_correlated_input(self, rng):
        """GPTQ's raison d'etre: lower layer-output error than plain RTN."""
        rows, cols, n, s = 16, 64, 16, 64
        w = jnp.asarray(rng.normal(size=(rows, cols)).astype(np.float32))
        # correlated activations
        base = rng.normal(size=(n, s, 8)).astype(np.float32)
        mix = rng.normal(size=(8, cols)).astype(np.float32)
        xs = jnp.asarray(base @ mix + 0.1 * rng.normal(size=(n, s, cols)))
        h = jnp.zeros((cols, cols))
        cnt = jnp.asarray(0.0)
        for i in range(n):
            h, cnt = hessian_update(h, cnt, xs[i])
        res = gptq_quantize(w, h, bits=3, sym=False, groupsize=-1, blocksize=16)

        x2 = xs.reshape(-1, cols)
        err_gptq = float(jnp.mean((x2 @ res.q.T - x2 @ w.T) ** 2))
        # RTN on the same grid
        from iron_weight_only_quant_tpu.quantize.gptq import _find_params, _quantize_col
        scale, zero = _find_params(w, 3, False)
        q_rtn, _ = _quantize_col(w.T, scale[None, :], zero[None, :], 7.0)
        err_rtn = float(jnp.mean((x2 @ q_rtn - x2 @ w.T) ** 2))
        assert err_gptq < err_rtn * 0.9, (err_gptq, err_rtn)

    def test_codes_within_range(self, data):
        w = jnp.asarray(data["weight"])
        h = jnp.asarray(data["pc_asym_b4_H"])
        res = gptq_quantize(w, h, bits=4, sym=False, groupsize=-1, blocksize=16)
        assert res.codes.min() >= 0 and res.codes.max() <= 15

    def test_dequant_consistency(self, data):
        """q must equal scale * (codes - zero) with the emitted params."""
        w = jnp.asarray(data["weight"])
        h = jnp.asarray(data["g16_asym_b4_H"])
        res = gptq_quantize(w, h, bits=4, sym=False, groupsize=16, blocksize=16)
        cols = w.shape[1]
        scales = np.repeat(np.asarray(res.scales), 16, axis=1)[:, :cols]
        zeros = np.repeat(np.asarray(res.zeros), 16, axis=1)[:, :cols]
        recon = scales * (np.asarray(res.codes) - zeros)
        np.testing.assert_allclose(recon, np.asarray(res.q), rtol=1e-5, atol=1e-6)

    def test_static_groups(self, data):
        w = jnp.asarray(data["weight"])
        h = jnp.asarray(data["g16_asym_b4_H"])
        res = gptq_quantize(
            w, h, bits=4, sym=False, groupsize=16, blocksize=16, static_groups=True
        )
        assert np.isfinite(np.asarray(res.q)).all()
