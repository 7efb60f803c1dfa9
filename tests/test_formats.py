"""Codec tests: golden parity vs the reference implementation + properties."""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from iron_weight_only_quant_tpu.config import (
    PER_CHANNEL,
    PER_TENSOR,
    AlignSpec,
    FloatFormat,
    QuantSpec,
    fp_spec,
)
from iron_weight_only_quant_tpu.formats import (
    decode_int,
    encode_int,
    fake_quantize,
    make_groups,
    minifloat_codebook,
    pseudo_quantize,
    quantize_fp4_two_step,
    restore_from_groups,
)
from iron_weight_only_quant_tpu.formats.minifloat import code_to_float, float_to_code

GOLDEN = Path(__file__).parent / "golden"


def assert_matches_golden(ours, golden, name, rtol=0, atol=0):
    ours = np.asarray(ours, dtype=np.float32)
    golden = np.asarray(golden, dtype=np.float32)
    if rtol == 0 and atol == 0:
        mismatch = np.sum(ours != golden)
        assert mismatch == 0, (
            f"{name}: {mismatch}/{golden.size} values differ; "
            f"max abs diff {np.max(np.abs(ours - golden))}"
        )
    else:
        np.testing.assert_allclose(ours, golden, rtol=rtol, atol=atol, err_msg=name)


# ---------------------------------------------------------------- golden: C1

class TestPseudoQuantizeGolden:
    @pytest.fixture(scope="class")
    def data(self):
        return np.load(GOLDEN / "pseudo_quantize.npz")

    @pytest.mark.parametrize("bits", [4, 8])
    @pytest.mark.parametrize("zp", [True, False])
    @pytest.mark.parametrize("gs,pt", [(-1, False), (128, False), (-1, True)])
    def test_matches_reference(self, data, bits, zp, gs, pt):
        key = f"b{bits}_zp{int(zp)}_g{gs}_pt{int(pt)}"
        out = pseudo_quantize(
            jnp.asarray(data["input"]), bits=bits, zero_point=zp,
            group_size=gs, per_tensor=pt,
        )
        assert_matches_golden(out, data[key], key)


# ------------------------------------------------- golden: C2-C6 QuantLinear

def _spec_for_key(key: str) -> QuantSpec:
    """Map a golden-case key to the equivalent QuantSpec."""
    parts = key.split("_")
    if parts[0] == "int":
        bits = int(parts[1][1:])
        gs = int(parts[2][1:])
        sym = parts[3] == "s1"
        qd = 1 if (len(parts) > 4 and parts[4] == "qd1") else 0
        return QuantSpec(fmt="int", bits=bits, group_size=gs, symmetric=sym, quant_axis=qd)
    if parts[0] == "bfp":
        bits = int(parts[1][1:])
        gs = int(parts[2][1:])
        return QuantSpec(fmt="bfp", bits=bits, group_size=gs)
    # minifloat cases
    fmt_map = {
        "fp4": FloatFormat(2, 1), "fp6": FloatFormat(3, 2), "fp8": FloatFormat(4, 3),
        "fp4e1m2": FloatFormat(1, 2),
    }
    special = {
        "fp4_e1m2_g128_s1": FloatFormat(1, 2),
        "fp6_e2m3_g128_s1": FloatFormat(2, 3),
        "fp8_e3m4_g128_s1": FloatFormat(3, 4),
    }
    if key in special:
        ff = special[key]
        return QuantSpec(fmt="fp", bits=ff.total_bits, float_format=ff,
                         group_size=128, symmetric=True)
    ff = fmt_map[parts[0]]
    if "approx" in key or "dapprox" in key:
        gs = 64 if "g64" in key else 128
        qd = 1 if key.endswith("qd1") else 0
        return QuantSpec(
            fmt="fp", bits=ff.total_bits, float_format=ff, group_size=gs,
            approximate=True, double_approximate="dapprox" in key, quant_axis=qd,
        )
    gs = int(parts[1][1:])
    sym = parts[2] == "s1"
    return QuantSpec(fmt="fp", bits=ff.total_bits, float_format=ff,
                     group_size=gs, symmetric=sym)


class TestQuantLinearGolden:
    @pytest.fixture(scope="class")
    def data(self):
        return np.load(GOLDEN / "quant_linear.npz")

    @pytest.fixture(scope="class")
    def case_keys(self, data):
        return [k for k in data.files if k != "input"]

    def test_all_cases(self, data, case_keys):
        # golden weights are [out, in]; our kernels are [in, out]
        w = jnp.asarray(data["input"]).T
        failures = []
        for key in case_keys:
            spec = _spec_for_key(key)
            ours = np.asarray(fake_quantize(w, spec)).T
            golden = data[key]
            if not np.array_equal(ours, golden):
                nbad = int(np.sum(ours != golden))
                failures.append(
                    f"{key}: {nbad}/{golden.size} differ, "
                    f"max {np.max(np.abs(ours - golden)):.3g}"
                )
        assert not failures, "\n".join(failures)

    def test_case_count(self, case_keys):
        assert len(case_keys) == 67  # full reference format sweep


# ------------------------------------------------------------- golden: C8

class TestFp4CpuGolden:
    def test_matches_reference(self):
        data = np.load(GOLDEN / "fp4_cpu.npz")
        x = jnp.asarray(data["input"].astype(np.float32))
        for key, kw in (
            ("g128", dict(group_size=128)),
            ("g64", dict(group_size=64)),
            ("pt", dict(group_size=-1, per_tensor=True)),
        ):
            ours = quantize_fp4_two_step(x, **kw)
            # reference math ran in fp16; snap ours for comparison
            ours16 = np.asarray(ours, dtype=np.float16).astype(np.float32)
            # the reference returns the grouped view without restoring shape
            golden = data[key].astype(np.float32).reshape(ours16.shape)
            close = np.isclose(ours16, golden, rtol=2e-3, atol=1e-4)
            assert close.mean() > 0.995, f"{key}: {100 * (1 - close.mean()):.2f}% mismatch"


# ----------------------------------------------------------- property tests

class TestIntCodecProperties:
    def test_idempotent(self, rng):
        g = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
        for sym in (True, False):
            codes, s, z = encode_int(g, 4, sym)
            deq = decode_int(codes, s, z, sym)
            codes2, s2, z2 = encode_int(deq, 4, sym)
            deq2 = decode_int(codes2, s2, z2, sym)
            np.testing.assert_allclose(np.asarray(deq), np.asarray(deq2), rtol=1e-6)

    def test_code_range(self, rng):
        g = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32) * 10)
        for bits in (2, 3, 4, 8):
            codes, _, _ = encode_int(g, bits, True)
            assert codes.min() >= -(2 ** (bits - 1))
            assert codes.max() <= 2 ** (bits - 1) - 1
            codes, _, z = encode_int(g, bits, False)
            assert codes.min() >= 0 and codes.max() <= 2**bits - 1

    def test_error_bound(self, rng):
        g = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
        codes, s, z = encode_int(g, 8, False)
        deq = decode_int(codes, s, z, False)
        # error bounded by half an LSB per group
        err = np.abs(np.asarray(deq - g))
        assert np.all(err <= np.asarray(s) * 0.5 + 1e-7)


class TestMinifloatProperties:
    def test_fp4_e2m1_codebook(self):
        values = sorted(set(np.abs(minifloat_codebook(FloatFormat(2, 1))).tolist()))
        assert values == [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0]

    def test_fp4_e1m2_codebook(self):
        # matches the magnitudes of reference fp4_quantize_cpu.py FP4_E1M2_CLASS
        values = sorted(set(np.abs(minifloat_codebook(FloatFormat(1, 2))).tolist()))
        assert values == [0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5]

    def test_encode_decode_roundtrip_on_grid(self):
        for fmt in (FloatFormat(2, 1), FloatFormat(3, 2), FloatFormat(4, 3)):
            book = minifloat_codebook(fmt)
            codes = float_to_code(jnp.asarray(book), fmt)
            back = code_to_float(codes, fmt)
            # -0.0 decodes to 0.0; compare values
            np.testing.assert_array_equal(np.asarray(back) + 0.0, book + 0.0)

    def test_fp8_relative_error(self, rng):
        g = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
        spec = fp_spec("fp8", 4, 3, group_size=128)
        deq = fake_quantize(g.T, spec).T
        scale = np.max(np.abs(np.asarray(g)), axis=1, keepdims=True)
        err = np.abs(np.asarray(deq) - np.asarray(g)) / scale
        assert err.max() < 0.05

    def test_aligned_noop_when_disabled(self, rng):
        fmt = FloatFormat(4, 3)
        codes = jnp.asarray(rng.integers(0, 256, size=(8, 16)), dtype=jnp.int32)
        from iron_weight_only_quant_tpu.formats.minifloat import (
            decode_minifloat_aligned,
        )
        # alignment window above every possible exponent -> exact decode
        align = AlignSpec(hi_align_start=16, hi_align_exp_field=15)
        exact = code_to_float(codes, fmt)
        approx = decode_minifloat_aligned(codes, fmt, align)
        np.testing.assert_array_equal(np.asarray(exact) + 0.0, np.asarray(approx) + 0.0)


class TestGrouping:
    @pytest.mark.parametrize("gs", [PER_TENSOR, PER_CHANNEL, 32])
    @pytest.mark.parametrize("axis", [0, 1])
    def test_roundtrip(self, rng, gs, axis):
        w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
        g = make_groups(w, gs, axis)
        back = restore_from_groups(g, w.shape, axis)
        np.testing.assert_array_equal(np.asarray(w), np.asarray(back))

    def test_group_order_matches_reference_layout(self):
        # [in, out] = [4, 2]; reference groups along `in` of W.T=[out, in]
        w = jnp.arange(8, dtype=jnp.float32).reshape(4, 2)
        g = make_groups(w, 2, 0)
        # W.T rows: [0,2,4,6], [1,3,5,7]; groups of 2:
        np.testing.assert_array_equal(
            np.asarray(g), [[0, 2], [4, 6], [1, 3], [5, 7]]
        )


class TestCustomAlignGolden:
    """Custom alignment windows incl. negative tail_pad_bits (mantissa
    pre-truncation) vs reference-generated fixtures."""

    def test_cases(self):
        data = np.load(GOLDEN / "quant_linear_custom.npz")
        w = jnp.asarray(data["input"]).T
        cases = {
            "fp8_approx_custom": fp_spec(
                "fp8", 4, 3, group_size=128, approximate=True,
                align=AlignSpec(hi_align_start=10, hi_align_exp_field=14,
                                tail_pad_bits=2),
            ),
            "fp8_approx_negpad": fp_spec(
                "fp8", 4, 3, group_size=128, approximate=True,
                align=AlignSpec(hi_align_start=12, hi_align_exp_field=15,
                                tail_pad_bits=-1),
            ),
            "fp6_dapprox_negpad": fp_spec(
                "fp6", 3, 2, group_size=64, approximate=True,
                double_approximate=True,
                align=AlignSpec(hi_align_start=3, hi_align_exp_field=6,
                                tail_pad_bits=-1),
            ),
        }
        for key, spec in cases.items():
            ours = np.asarray(fake_quantize(w, spec)).T
            assert_matches_golden(ours, data[key], key)
