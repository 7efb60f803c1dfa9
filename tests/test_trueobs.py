"""TrueOBS solver tests (reference: gptq/zeroShot/models/fast_trueobs.py).

The base solve (sparseout=False, nearest=False, groupless) is exactly GPTQ
with per-row params found once up-front -- so we cross-validate against our
golden-verified gptq_quantize.  The two TrueOBS-specific modes get
property tests: ``nearest`` must reproduce plain RTN rounding, and
``sparseout`` must keep every escaped weight bit-exact at fp.
"""

import numpy as np
import jax
import jax.numpy as jnp

from iron_weight_only_quant_tpu.quantize.gptq import (
    gptq_quantize,
    hessian_update,
    _find_params,
)
from iron_weight_only_quant_tpu.quantize.trueobs import trueobs_quantize

ROWS, COLS = 24, 64


def make_problem(seed=0, rows=ROWS, cols=COLS, nsamples=8, tokens=32):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.normal(size=(rows, cols)).astype(np.float32))
    # correlated activations so error propagation actually matters
    mix = rng.normal(size=(cols, cols)).astype(np.float32) * 0.3 + np.eye(
        cols, dtype=np.float32
    )
    h = jnp.zeros((cols, cols), jnp.float32)
    n = jnp.asarray(0.0)
    for i in range(nsamples):
        x = rng.normal(size=(tokens, cols)).astype(np.float32) @ mix
        h, n = hessian_update(h, n, jnp.asarray(x))
    return w, h


class TestBaseSolve:
    def test_matches_gptq_per_channel(self):
        """Groupless asym TrueOBS == GPTQ with groupsize=-1 (same grid)."""
        w, h = make_problem()
        ours = trueobs_quantize(w, h, bits=4, sym=False, blocksize=16)
        ref = gptq_quantize(w, h, bits=4, sym=False, groupsize=-1, blocksize=16)
        np.testing.assert_allclose(np.asarray(ours.q), np.asarray(ref.q),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(ours.codes),
                                      np.asarray(ref.codes))
        assert not bool(ours.outliers.any())
        assert float(ours.outlier_fraction) == 0.0

    def test_losses_shape_and_sign(self):
        w, h = make_problem(seed=1)
        res = trueobs_quantize(w, h, bits=3, sym=True)
        assert res.losses.shape == w.shape
        assert bool((res.losses >= 0).all())
        # 3-bit on unit-normal weights must have nonzero loss somewhere
        assert float(res.losses.sum()) > 0


class TestNearest:
    def test_nearest_is_rtn(self):
        """nearest=True skips propagation: plain grid rounding of w."""
        w, h = make_problem(seed=2)
        res = trueobs_quantize(w, h, bits=4, sym=False, nearest=True)
        scale, zero = _find_params(w, 4, False)
        q = jnp.clip(jnp.round(w / scale[:, None]) + zero[:, None], 0, 15)
        rtn = scale[:, None] * (q - zero[:, None])
        np.testing.assert_allclose(np.asarray(res.q), np.asarray(rtn),
                                   rtol=1e-6, atol=1e-7)

    def test_propagation_beats_nearest(self):
        """OBS loss with error propagation <= nearest rounding loss."""
        w, h = make_problem(seed=3)
        obs = trueobs_quantize(w, h, bits=3, sym=False, blocksize=16)
        rtn = trueobs_quantize(w, h, bits=3, sym=False, nearest=True)

        def hess_err(res):
            e = np.asarray(res.q) - np.asarray(w)
            return float(np.trace(e @ np.asarray(h) @ e.T))

        assert hess_err(obs) < hess_err(rtn)


class TestSparseout:
    def test_outliers_kept_exact(self):
        w, h = make_problem(seed=4)
        res = trueobs_quantize(w, h, bits=2, sym=False, sparseout=True,
                               blocksize=16)
        mask = np.asarray(res.outliers)
        assert mask.any(), "2-bit quant of normals must trip the outlier escape"
        scale, zero = _find_params(w, 2, False)
        # at outlier positions q equals the (propagation-updated) weight
        # exactly, and the recorded loss is zero
        losses = np.asarray(res.losses)
        assert (losses[mask] == 0).all()
        # non-outliers land exactly on the per-row grid
        q = np.asarray(res.q)
        s = np.asarray(scale)[:, None]
        z = np.asarray(zero)[:, None]
        codes = np.round(q / s + z)
        on_grid = np.abs(s * (codes - z) - q) < 1e-5
        assert on_grid[~mask].all()
        frac = float(res.outlier_fraction)
        assert 0 < frac < 0.5
        assert abs(frac - mask.mean()) < 1e-6

    def test_sparseout_reduces_error(self):
        w, h = make_problem(seed=5)
        dense = trueobs_quantize(w, h, bits=2, sym=False, blocksize=16)
        sparse = trueobs_quantize(w, h, bits=2, sym=False, sparseout=True,
                                  blocksize=16)
        err_d = float(jnp.sum((dense.q - w) ** 2))
        err_s = float(jnp.sum((sparse.q - w) ** 2))
        assert err_s < err_d


class TestTrueOBSModel:
    """TrueOBS wired through the layer-sequential calibration loop."""

    def _setup(self):
        import jax
        from iron_weight_only_quant_tpu.config import GPTQConfig, QuantSpec
        from iron_weight_only_quant_tpu.models import OPTConfig, opt_forward, opt_init
        from iron_weight_only_quant_tpu.quantize.gptq_model import quantize_model_gptq

        rng = np.random.default_rng(7)
        calib = [rng.integers(0, 250, size=(1, 32)) for _ in range(4)]
        cfg = OPTConfig.tiny()
        params = opt_init(cfg, jax.random.PRNGKey(1))
        spec = QuantSpec(fmt="int", bits=3, group_size=-2, symmetric=False)
        return calib, cfg, params, spec, GPTQConfig, opt_forward, quantize_model_gptq

    def test_packed_and_runs(self):
        calib, cfg, params, spec, GPTQConfig, opt_forward, qmg = self._setup()
        from iron_weight_only_quant_tpu.quantize.qtensor import QuantizedTensor

        qp = qmg(params, cfg, "opt", calib, spec,
                 GPTQConfig(nsamples=4, blocksize=32, solver="trueobs"),
                 progress=None)
        assert isinstance(qp["layers"][0]["q"]["w"], QuantizedTensor)
        toks = jnp.asarray(calib[0], jnp.int32)
        logits, _ = opt_forward(qp, toks, cfg)
        assert np.isfinite(np.asarray(logits)).all()

    def test_sparseout_improves_model_error(self):
        calib, cfg, params, spec, GPTQConfig, opt_forward, qmg = self._setup()
        toks = jnp.asarray(np.concatenate(calib, axis=0), jnp.int32)
        ref, _ = opt_forward(params, toks, cfg)

        def err(gcfg):
            qp = qmg(params, cfg, "opt", calib, spec, gcfg, progress=None)
            out, _ = opt_forward(qp, toks, cfg)
            a, b = np.asarray(out, np.float32), np.asarray(ref, np.float32)
            return float(np.mean((a - b) ** 2))

        dense = err(GPTQConfig(nsamples=4, blocksize=32, solver="trueobs"))
        sparse = err(GPTQConfig(nsamples=4, blocksize=32, solver="trueobs",
                                sparseout=True))
        assert sparse < dense, (sparse, dense)

    def test_groups_rejected(self):
        calib, cfg, params, spec, GPTQConfig, opt_forward, qmg = self._setup()
        from iron_weight_only_quant_tpu.config import QuantSpec
        import pytest

        gspec = QuantSpec(fmt="int", bits=3, group_size=16, symmetric=False)
        with pytest.raises(NotImplementedError):
            qmg(params, cfg, "opt", calib, gspec,
                GPTQConfig(nsamples=4, solver="trueobs"), progress=None)
