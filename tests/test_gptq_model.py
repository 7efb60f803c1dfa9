"""Layer-sequential model GPTQ: end-to-end on tiny models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iron_weight_only_quant_tpu.config import GPTQConfig, QuantSpec
from iron_weight_only_quant_tpu.models import (
    LlamaConfig,
    OPTConfig,
    llama_forward,
    llama_init,
    opt_forward,
    opt_init,
)
from iron_weight_only_quant_tpu.quantize.gptq_model import quantize_model_gptq
from iron_weight_only_quant_tpu.quantize.model_pass import quantize_model_params
from iron_weight_only_quant_tpu.quantize.qtensor import QuantizedTensor


@pytest.fixture(scope="module")
def calib():
    rng = np.random.default_rng(0)
    return [rng.integers(0, 250, size=(1, 32)) for _ in range(4)]


def _out_err(logits_a, logits_b):
    a, b = np.asarray(logits_a, np.float32), np.asarray(logits_b, np.float32)
    return float(np.mean((a - b) ** 2))


class TestGPTQModel:
    def test_llama_gptq_runs_packed(self, calib):
        cfg = LlamaConfig.tiny()
        params = llama_init(cfg, jax.random.PRNGKey(0))
        spec = QuantSpec(fmt="int", bits=4, group_size=32, symmetric=False)
        qp = quantize_model_gptq(
            params, cfg, "llama", calib, spec,
            GPTQConfig(nsamples=4, blocksize=32), progress=None,
        )
        # all 7 linears per layer became packed artifacts
        l0 = qp["layers"][0]
        for k in ("q", "k", "v", "o", "gate", "up", "down"):
            assert isinstance(l0[k]["w"], QuantizedTensor), k
        toks = jnp.asarray(calib[0], jnp.int32)
        logits, _ = llama_forward(qp, toks, cfg)
        assert np.isfinite(np.asarray(logits)).all()

    def test_gptq_beats_rtn_on_model_output(self, calib):
        """The GPTQ-vs-RTN PPL gap (gptq/README.md:29) in miniature: lower
        full-model output error on the calibration distribution."""
        cfg = OPTConfig.tiny()
        params = opt_init(cfg, jax.random.PRNGKey(1))
        toks = jnp.asarray(np.concatenate(calib, axis=0), jnp.int32)
        ref, _ = opt_forward(params, toks, cfg)

        spec = QuantSpec(fmt="int", bits=3, group_size=-2, symmetric=False)
        rtn_p, _ = quantize_model_params(params, spec)
        gptq_p = quantize_model_gptq(
            params, cfg, "opt", calib, spec,
            GPTQConfig(nsamples=4, blocksize=32), progress=None,
        )
        err_rtn = _out_err(opt_forward(rtn_p, toks, cfg)[0], ref)
        err_gptq = _out_err(opt_forward(gptq_p, toks, cfg)[0], ref)
        assert err_gptq < err_rtn, (err_gptq, err_rtn)

    def test_fake_quant_mode(self, calib):
        cfg = LlamaConfig.tiny()
        params = llama_init(cfg, jax.random.PRNGKey(0))
        spec = QuantSpec(fmt="int", bits=4, group_size=32, symmetric=False)
        qp = quantize_model_gptq(
            params, cfg, "llama", calib, spec,
            GPTQConfig(nsamples=4, blocksize=32, act_order=True),
            pack=False, progress=None,
        )
        l0 = qp["layers"][0]
        assert not isinstance(l0["q"]["w"], QuantizedTensor)
        assert l0["q"]["w"].shape == params["layers"][0]["q"]["w"].shape


class TestTrueSequential:
    def test_true_sequential_runs_and_helps(self, calib):
        """true-sequential: each stage's Hessian sees prior stages quantized
        (reference gptq/llama.py --true-sequential)."""
        cfg = OPTConfig.tiny()
        params = opt_init(cfg, jax.random.PRNGKey(3))
        toks = jnp.asarray(np.concatenate(calib, axis=0), jnp.int32)
        ref, _ = opt_forward(params, toks, cfg)
        spec = QuantSpec(fmt="int", bits=3, group_size=-2, symmetric=False)

        gp = quantize_model_gptq(params, cfg, "opt", calib, spec,
                                 GPTQConfig(nsamples=4, blocksize=32),
                                 progress=None)
        gp_ts = quantize_model_gptq(params, cfg, "opt", calib, spec,
                                    GPTQConfig(nsamples=4, blocksize=32),
                                    progress=None, true_sequential=True)
        err = _out_err(opt_forward(gp, toks, cfg)[0], ref)
        err_ts = _out_err(opt_forward(gp_ts, toks, cfg)[0], ref)
        # both must be finite and close; ts usually no worse
        assert np.isfinite(err_ts)
        assert err_ts < err * 1.5
