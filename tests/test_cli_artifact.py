"""CLI + artifact round-trip tests (the end-to-end user surface)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iron_weight_only_quant_tpu.config import QuantSpec
from iron_weight_only_quant_tpu.models import LlamaConfig, llama_forward, llama_init
from iron_weight_only_quant_tpu.quantize.artifact import load_artifact, save_artifact
from iron_weight_only_quant_tpu.quantize.model_pass import quantize_model_params
from iron_weight_only_quant_tpu.utils import append_results, read_results


class TestArtifact:
    def test_roundtrip(self, tmp_path):
        cfg = LlamaConfig.tiny()
        params = llama_init(cfg, jax.random.PRNGKey(0))
        qp, _ = quantize_model_params(
            params, QuantSpec(fmt="int", bits=4, group_size=32, symmetric=False)
        )
        toks = jnp.asarray([[1, 5, 9, 3]], jnp.int32)
        before, _ = llama_forward(qp, toks, cfg)

        save_artifact(str(tmp_path / "art"), "llama", cfg, qp)
        family, cfg2, params2 = load_artifact(str(tmp_path / "art"))
        assert family == "llama"
        assert cfg2 == cfg
        after, _ = llama_forward(params2, toks, cfg2)
        np.testing.assert_array_equal(np.asarray(before), np.asarray(after))

    def test_minifloat_artifact(self, tmp_path):
        from iron_weight_only_quant_tpu.config import fp_spec

        cfg = LlamaConfig.tiny()
        params = llama_init(cfg, jax.random.PRNGKey(1))
        qp, _ = quantize_model_params(params, fp_spec("fp8", 4, 3, group_size=32))
        save_artifact(str(tmp_path / "art"), "llama", cfg, qp)
        _, cfg2, params2 = load_artifact(str(tmp_path / "art"))
        toks = jnp.asarray([[2, 4]], jnp.int32)
        a, _ = llama_forward(qp, toks, cfg)
        b, _ = llama_forward(params2, toks, cfg2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCLI:
    def test_quantize_then_generate(self, tmp_path, capsys):
        from iron_weight_only_quant_tpu.cli import generate, quantize

        art = str(tmp_path / "demo-art")
        quantize.main(["--demo", "--w_bits", "4", "--w_group_size", "32",
                       "--out", art])
        out = capsys.readouterr().out
        assert "quantized 14 linears" in out

        generate.main(["--artifact", art, "--max_new_tokens", "3",
                       "--max_seq_len", "64"])
        out = capsys.readouterr().out
        assert "->" in out

    def test_eval_ppl_demo(self, tmp_path, capsys):
        from iron_weight_only_quant_tpu.cli import eval_ppl

        res = eval_ppl.main([
            "--demo", "--w_bits", "16", "8", "--w_group_size", "32",
            "--datasets", "synthetic", "--ppl_seqlen", "64",
            "--sample_size", "2",
            "--output", str(tmp_path / "r.json"),
        ])
        assert "w16_int_group32" in res and "w8_int_group32" in res
        saved = json.loads((tmp_path / "r.json").read_text())
        assert saved["w8_int_group32"]["datasets"]["synthetic"]["perplexity"] > 0

    def test_eval_ppl_gptq_demo(self, capsys):
        from iron_weight_only_quant_tpu.cli import eval_ppl

        res = eval_ppl.main([
            "--demo", "--w_bits", "4", "--w_group_size", "32", "--gptq",
            "--nsamples", "2", "--calib_dataset", "synthetic",
            "--datasets", "synthetic", "--ppl_seqlen", "64", "--sample_size", "1",
        ])
        (_, entry), = res.items()
        assert entry["datasets"]["synthetic"]["perplexity"] > 0

    def test_eval_zeroshot_demo(self, capsys, monkeypatch):
        from iron_weight_only_quant_tpu.cli import eval_zeroshot
        from iron_weight_only_quant_tpu.evals.zeroshot import tasks as T

        docs = [{"goal": "g", "sol1": "a b", "sol2": "c", "label": 0}]
        monkeypatch.setattr(T._DocTask, "docs", lambda self: docs)
        res = eval_zeroshot.main(["--demo", "--w_bits", "8", "--w_group_size",
                                  "32", "--tasks", "piqa"])
        assert "piqa" in res["w8"]


class TestResultsIO:
    def test_append_merges_valid_json(self, tmp_path):
        p = str(tmp_path / "out.json")
        append_results(p, {"a": 1})
        append_results(p, {"b": 2})
        assert read_results(p) == {"a": 1, "b": 2}
        # file is valid JSON (unlike the reference's append-mode quirk)
        json.loads(open(p).read())
