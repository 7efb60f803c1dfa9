"""Investigate the GPTQ W4 g128 e2e parity outlier (VERDICT r2 item 7).

COVERAGE.md's two-pipeline table shows rel ΔPPL 1.6e-4 for W4 g128 GPTQ vs
~1e-6 for every other case (including W3 g128 GPTQ at 4.6e-7).  Hypotheses:

  (a) fp32 Hessian accumulation-order sensitivity (torch vs XLA reduce
      order) -> test: re-run ours with float64 Hessian accumulation + solve;
  (b) near-tie rounding amplification: a column value landing within float
      noise of a .5 rounding boundary flips to a different CODE (a full
      quantization step, not an ulp), and GPTQ's error propagation spreads
      it -> test: count per-layer code mismatches ref-vs-ours and locate
      them.

Run on CPU: JAX_PLATFORMS=cpu python scripts/probe_gptq_parity.py
Results recorded in NOTES.md (round 3).
"""

import sys
import types

import numpy as np

sys.path.insert(0, ".")

import torch  # noqa: E402
import transformers  # noqa: E402

REF = "/root/reference"
for p in (f"{REF}/gptq", REF):
    if p not in sys.path:
        sys.path.insert(0, p)


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


_stub("lm_eval", evaluator=None, tasks=None)
_stub("lm_eval.models")
_stub("lm_eval.models.huggingface", HFLM=object)
_stub("fastchat")
_stub("fastchat.model", get_conversation_template=lambda *a, **k: None)
_woq = _stub("weight_only_quant")
_woq.__path__ = [REF]

SEQLEN = 128
NSAMPLES = 4


def build_checkpoint(tmp):
    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=SEQLEN, attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(cfg).float().eval()
    model.save_pretrained(tmp, safe_serialization=True)
    return tmp


def reference_quant(checkpoint, calib, w_bit, group):
    from types import SimpleNamespace

    import quant_wrapper as ref_quant_wrapper

    class _RopeShim(torch.nn.Module):
        def __init__(self, layer, rotary):
            super().__init__()
            self.layer = layer
            self.rotary = rotary

        def forward(self, hidden_states, **kw):
            if kw.get("position_embeddings") is None:
                pos = kw.get("position_ids")
                if pos is None:
                    pos = torch.arange(hidden_states.shape[1])[None]
                kw["position_embeddings"] = self.rotary(hidden_states, pos)
                kw["position_ids"] = pos
            return self.layer(hidden_states, **kw)

    model = transformers.LlamaForCausalLM.from_pretrained(
        checkpoint, torch_dtype=torch.float32, attn_implementation="eager"
    ).eval()
    rotary = model.model.rotary_emb
    for i, layer in enumerate(model.model.layers):
        model.model.layers[i] = _RopeShim(layer, rotary)
    if not torch.cuda.is_available():
        torch.cuda.synchronize = lambda *a, **k: None
    args = SimpleNamespace(
        w_bit=w_bit, a_bit=None, w_format="int", w_group_size=group,
        w_symmetric=False, gptq=True, mode=0,
        nsamples=NSAMPLES, percdamp=0.01, act_order=False,
        dataloader=[(torch.from_numpy(c), None) for c in calib],
    )
    model = ref_quant_wrapper.quantize_model(model, args)
    out = {}
    for name, mod in model.named_modules():
        w = getattr(mod, "weight", None)
        if w is not None and w.ndim == 2 and "layers" in name and hasattr(mod, "scales"):
            # the RopeShim wrapper inserts ".layer." into module paths
            out[name.replace(".layer.", ".")] = w.detach().numpy().T.copy()
    return out


def our_quant(checkpoint, calib, w_bit, group, with_ppl=False):
    import jax.numpy as jnp

    from iron_weight_only_quant_tpu.config import GPTQConfig, QuantSpec
    from iron_weight_only_quant_tpu.models.convert_hf import load_checkpoint_dir
    from iron_weight_only_quant_tpu.ops.qmatmul import dequantize_weight
    from iron_weight_only_quant_tpu.quantize.gptq_model import quantize_model_gptq

    cfg, params, fwd = load_checkpoint_dir(checkpoint, dtype=jnp.float32)
    spec = QuantSpec(fmt="int", bits=w_bit, group_size=group, symmetric=False)
    qparams = quantize_model_gptq(
        params, cfg, "llama", calib, spec,
        GPTQConfig(nsamples=NSAMPLES, percdamp=0.01), progress=None)
    out = {}
    names = {"q": "self_attn.q_proj", "k": "self_attn.k_proj",
             "v": "self_attn.v_proj", "o": "self_attn.o_proj",
             "gate": "mlp.gate_proj", "up": "mlp.up_proj",
             "down": "mlp.down_proj"}
    for li, blk in enumerate(qparams["layers"]):
        for k, v in blk.items():
            if isinstance(v, dict) and hasattr(v.get("w"), "qweight"):
                ref_name = f"model.layers.{li}.{names[k]}"
                out[ref_name] = np.asarray(dequantize_weight(v["w"]))
    if with_ppl:
        from iron_weight_only_quant_tpu.evals.ppl import SequentialPPLEvaluator

        rng = np.random.default_rng(1234)
        tokens = rng.integers(4, 250, size=(1, SEQLEN * 6), dtype=np.int64)
        ev = SequentialPPLEvaluator(qparams, fwd, cfg, seqlen=SEQLEN)
        ev._token_cache["synthetic"] = tokens
        ppl, _, _ = ev.calculate_ppl("synthetic")
        return out, ppl
    return out


def main():
    import tempfile

    rng = np.random.default_rng(99)
    calib = [rng.integers(4, 250, size=(1, SEQLEN), dtype=np.int64)
             for _ in range(NSAMPLES)]
    with tempfile.TemporaryDirectory() as tmp:
        ckpt = build_checkpoint(tmp)
        for w_bit in (4, 3):
            ref = reference_quant(ckpt, calib, w_bit, 128)
            ours = our_quant(ckpt, calib, w_bit, 128)
            print(f"\n=== W{w_bit} g128 GPTQ: dequantized-weight comparison ===")
            total_mism = 0
            for name in sorted(ref):
                r, o = ref[name], ours[name]
                # a "code mismatch" = |Δw| > half the local quant step; ulp
                # noise is orders of magnitude below any step
                diff = np.abs(r - o)
                step = np.maximum(
                    np.abs(r).max(axis=0, keepdims=True), 1e-8
                ) / (2**w_bit - 1)
                mism = int((diff > 0.5 * step).sum())
                total_mism += mism
                print(f"  {name}: max|Δw|={diff.max():.3e} "
                      f"rel={np.linalg.norm(diff)/np.linalg.norm(r):.2e} "
                      f"code-mismatches~{mism}/{r.size}")
            print(f"  total suspected code mismatches: {total_mism}")
        # within-implementation sensitivity: reversed calibration order is
        # MATHEMATICALLY identical (H = (2/N) sum x x^T is order-free) but
        # reorders the running-mean fp accumulation -- if that alone flips
        # thousands of codes while PPL stays put, the ref-vs-ours deltas
        # above are chaotic-but-quality-stable, not an implementation bug
        print("\n=== W4 g128: ours(calib order) vs ours(calib REVERSED) ===")
        o_f, ppl_f = our_quant(ckpt, calib, 4, 128, with_ppl=True)
        o_r, ppl_r = our_quant(ckpt, list(reversed(calib)), 4, 128,
                               with_ppl=True)
        total = 0
        for name in sorted(o_f):
            diff = np.abs(o_f[name] - o_r[name])
            step = np.abs(o_f[name]).max() / (2**4 - 1)
            mism = int((diff > 0.5 * step).sum())
            total += mism
            print(f"  {name}: max|Δw|={diff.max():.3e} code-flips~{mism}")
        print(f"  total code flips from accumulation order alone: {total}")
        print(f"  ppl fwd={ppl_f:.6f} rev={ppl_r:.6f} "
              f"rel Δ={abs(ppl_f-ppl_r)/ppl_f:.2e}")


if __name__ == "__main__":
    main()
