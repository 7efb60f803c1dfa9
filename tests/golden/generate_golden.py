#!/usr/bin/env python3
"""Generate golden fixtures by RUNNING the reference implementation.

This script imports the (read-only) reference repo at /root/reference,
feeds it fixed random inputs, and records its outputs as .npz files.  The
fixtures -- not the reference code -- are what the test suite depends on,
so the framework's codecs can be verified bit-for-bit against the actual
reference behavior without copying any reference code.

Usage (one-off, requires torch):  python tests/golden/generate_golden.py
"""

import os
import sys
from pathlib import Path

import numpy as np
import torch

REF = "/root/reference"
sys.path.insert(0, REF)
sys.path.insert(0, os.path.join(REF, "gptq"))

OUT = Path(__file__).parent

torch.manual_seed(0)
np.random.seed(0)


def gen_pseudo_quantize():
    from quant_funcs import pseudo_quantize_tensor

    x = torch.randn(64, 256, dtype=torch.float32)
    cases = {}
    for bits in (4, 8):
        for zp in (True, False):
            for gs, pt in ((-1, False), (128, False), (-1, True)):
                key = f"b{bits}_zp{int(zp)}_g{gs}_pt{int(pt)}"
                out = pseudo_quantize_tensor(
                    x.clone(), n_bits=bits, zero_point=zp, q_group_size=gs, per_tensor=pt
                )
                cases[key] = out.numpy()
    np.savez_compressed(OUT / "pseudo_quantize.npz", input=x.numpy(), **cases)
    print("pseudo_quantize.npz", len(cases), "cases")


def gen_quant_linear():
    import quant_linear as ql

    torch.manual_seed(1)
    w = torch.randn(64, 256, dtype=torch.float32) * 0.05
    cases = {}

    def run(key, **kw):
        lin = torch.nn.Linear(256, 64, bias=False)
        lin.weight.data = w.clone()
        q = ql.QuantLinear.from_linear(lin, **kw)
        cases[key] = q.weight.data.numpy()

    # INT formats: bits x granularity x symmetry
    for bits in (2, 3, 4, 8):
        for gs in (-1, -2, 64, 128):
            for sym in (True, False):
                run(f"int_b{bits}_g{gs}_s{int(sym)}", w_bit=bits, w_group_size=gs,
                    symmetric=sym, weight_format="int")
    # quant_dim=1 (transpose-first grouping)
    run("int_b4_g64_s1_qd1", w_bit=4, w_group_size=64, symmetric=True,
        weight_format="int", quant_dim=1)

    # Minifloat exact formats (default E/M splits)
    for fmtname, bits in (("fp4", 4), ("fp6", 6), ("fp8", 8)):
        for gs in (-1, -2, 128):
            for sym in (True, False):
                run(f"{fmtname}_g{gs}_s{int(sym)}", w_bit=bits, w_group_size=gs,
                    symmetric=sym, weight_format=fmtname)

    # Alternate E/M splits via configure_fp_formats
    ql.configure_fp_formats(fp4_exp_bits=1, fp4_mantissa_bits=2)
    run("fp4_e1m2_g128_s1", w_bit=4, w_group_size=128, symmetric=True, weight_format="fp4")
    ql.configure_fp_formats(fp6_exp_bits=2, fp6_mantissa_bits=3)
    run("fp6_e2m3_g128_s1", w_bit=6, w_group_size=128, symmetric=True, weight_format="fp6")
    ql.configure_fp_formats(fp8_exp_bits=3, fp8_mantissa_bits=4)
    run("fp8_e3m4_g128_s1", w_bit=8, w_group_size=128, symmetric=True, weight_format="fp8")
    ql.configure_fp_formats()  # restore defaults

    # Approximate / double-approximate decode (defaults from main.py CLI)
    run("fp8_approx_g128", w_bit=8, w_group_size=128, weight_format="fp8",
        approximate=True)
    run("fp8_dapprox_g128", w_bit=8, w_group_size=128, weight_format="fp8",
        approximate=True, double_approximate=True)
    run("fp6_approx_g128", w_bit=6, w_group_size=128, weight_format="fp6",
        approximate=True)
    run("fp6_dapprox_g128", w_bit=6, w_group_size=128, weight_format="fp6",
        approximate=True, double_approximate=True)
    run("fp4_approx_g128", w_bit=4, w_group_size=128, weight_format="fp4",
        approximate=True)
    run("fp4_dapprox_g128", w_bit=4, w_group_size=128, weight_format="fp4",
        approximate=True, double_approximate=True)
    ql.configure_fp_formats(fp4_exp_bits=1, fp4_mantissa_bits=2)
    run("fp4e1m2_approx_g128", w_bit=4, w_group_size=128, weight_format="fp4",
        approximate=True)
    ql.configure_fp_formats()
    # approximate with column grouping
    run("fp8_approx_g64_qd1", w_bit=8, w_group_size=64, weight_format="fp8",
        approximate=True, quant_dim=1)

    # BFP
    for bits in (4, 5, 6, 8):
        run(f"bfp_b{bits}_g128", w_bit=bits, w_group_size=128, weight_format="bfp")
    run("bfp_b4_g64", w_bit=4, w_group_size=64, weight_format="bfp")

    np.savez_compressed(OUT / "quant_linear.npz", input=w.numpy(), **cases)
    print("quant_linear.npz", len(cases), "cases")


def gen_fp4_cpu():
    from fp4_quantize_cpu import quantize_fp16_to_fp4_e1m2

    torch.manual_seed(2)
    w = torch.randn(64, 256, dtype=torch.float16)
    cases = {
        "g128": quantize_fp16_to_fp4_e1m2(w.clone(), group_size=128).numpy(),
        "g64": quantize_fp16_to_fp4_e1m2(w.clone(), group_size=64).numpy(),
        "pt": quantize_fp16_to_fp4_e1m2(w.clone(), group_size=-1, per_tensor=True).numpy(),
    }
    np.savez_compressed(OUT / "fp4_cpu.npz", input=w.numpy(), **cases)
    print("fp4_cpu.npz", len(cases), "cases")


def gen_gptq():
    torch.cuda.synchronize = lambda *a, **k: None  # reference calls it unconditionally
    from gptq import GPTQ
    from quant import Quantizer

    torch.manual_seed(3)
    rows, cols, nsamples, seq = 24, 64, 8, 32
    w = (torch.randn(rows, cols, dtype=torch.float32) * 0.1)
    xs = torch.randn(nsamples, seq, cols, dtype=torch.float32)

    cases = {}
    for key, kw, qkw in (
        ("pc_sym_b4", dict(blocksize=16, percdamp=0.01, groupsize=-1),
         dict(bits=4, perchannel=True, sym=True)),
        ("pc_asym_b4", dict(blocksize=16, percdamp=0.01, groupsize=-1),
         dict(bits=4, perchannel=True, sym=False)),
        ("g16_asym_b4", dict(blocksize=16, percdamp=0.01, groupsize=16),
         dict(bits=4, perchannel=True, sym=False)),
        ("g16_asym_b4_act", dict(blocksize=16, percdamp=0.01, groupsize=16, actorder=True),
         dict(bits=4, perchannel=True, sym=False)),
        ("pc_sym_b3", dict(blocksize=16, percdamp=0.01, groupsize=-1),
         dict(bits=3, perchannel=True, sym=True)),
        ("pc_trits", dict(blocksize=16, percdamp=0.01, groupsize=-1),
         dict(bits=2, perchannel=True, sym=True, trits=True)),
    ):
        lin = torch.nn.Linear(cols, rows, bias=False)
        lin.weight.data = w.clone()
        g = GPTQ(lin)
        g.quantizer = Quantizer()
        g.quantizer.configure(**qkw, mse=False)
        for i in range(nsamples):
            g.add_batch(xs[i], lin(xs[i]))
        H = g.H.clone()
        g.fasterquant(**kw)
        cases[key] = lin.weight.data.numpy()
        cases[key + "_H"] = H.numpy()
    np.savez_compressed(
        OUT / "gptq.npz", weight=w.numpy(), calib=xs.numpy(), **cases
    )
    print("gptq.npz", len(cases), "cases")


if __name__ == "__main__":
    gen_pseudo_quantize()
    gen_quant_linear()
    gen_fp4_cpu()
    gen_gptq()
    print("done")


def gen_custom_align():
    """Extra cases: custom alignment params incl. negative tail_pad_bits."""
    import quant_linear as ql

    torch.manual_seed(4)
    w = torch.randn(64, 256, dtype=torch.float32) * 0.05
    cases = {}

    def run(key, **kw):
        lin = torch.nn.Linear(256, 64, bias=False)
        lin.weight.data = w.clone()
        q = ql.QuantLinear.from_linear(lin, **kw)
        cases[key] = q.weight.data.numpy()

    run("fp8_approx_custom", w_bit=8, w_group_size=128, weight_format="fp8",
        approximate=True, fp8_hi_align_start=10, fp8_hi_align_exp_field=14,
        fp8_tail_pad_bits=2)
    run("fp8_approx_negpad", w_bit=8, w_group_size=128, weight_format="fp8",
        approximate=True, fp8_hi_align_start=12, fp8_hi_align_exp_field=15,
        fp8_tail_pad_bits=-1)
    run("fp6_dapprox_negpad", w_bit=6, w_group_size=64, weight_format="fp6",
        approximate=True, double_approximate=True, fp6_hi_align_start=3,
        fp6_hi_align_exp_field=6, fp6_tail_pad_bits=-1)
    np.savez_compressed(OUT / "quant_linear_custom.npz", input=w.numpy(), **cases)
    print("quant_linear_custom.npz", len(cases), "cases")


if __name__ == "__main__":
    gen_custom_align()
