"""Typed, hashable configuration objects.

The reference passes quantization settings through duck-typed ``QuantArgs``
namespaces (reference main.py:220-249) and mutable module globals for the
minifloat field widths (reference quant_linear.py:84-110 configure_fp_formats).
Here everything is a frozen dataclass: hashable, so it can be a static
argument to ``jax.jit``, and self-validating.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

# Group-size sentinels (same convention as the reference CLI:
# reference main.py:155 "--w_group_size ... -1: per-tensor, -2: per-channel").
PER_TENSOR = -1
PER_CHANNEL = -2


@dataclass(frozen=True)
class FloatFormat:
    """A parametric minifloat format: 1 sign bit + ``exp_bits`` + ``mant_bits``.

    Bias is derived as ``2**(exp_bits-1) - 1`` exactly like the reference
    (quant_linear.py:10,13,16).  Subnormals are supported.
    """

    exp_bits: int
    mant_bits: int

    def __post_init__(self):
        if self.exp_bits < 1 or self.mant_bits < 0:
            raise ValueError(f"invalid minifloat format E{self.exp_bits}M{self.mant_bits}")

    @property
    def bias(self) -> int:
        return 2 ** (self.exp_bits - 1) - 1

    @property
    def total_bits(self) -> int:
        return 1 + self.exp_bits + self.mant_bits

    @property
    def max_exp_field(self) -> int:
        return (1 << self.exp_bits) - 1

    @property
    def max_value(self) -> float:
        """Largest representable magnitude.

        Mirrors reference quant_linear.py:740-741: the top exponent field is a
        normal value (no inf/nan encodings), so
        ``(1 + (2^M-1)/2^M) * 2^(2^E - 1 - bias)``.
        """
        m = self.mant_bits
        return (1.0 + ((1 << m) - 1) / (1 << m)) * 2.0 ** (self.max_exp_field - self.bias)

    @property
    def min_normal_exp(self) -> int:
        return 1 - self.bias


# Default formats, matching reference quant_linear.py:7-16.
FP4_E2M1 = FloatFormat(2, 1)
FP4_E1M2 = FloatFormat(1, 2)
FP6_E3M2 = FloatFormat(3, 2)
FP6_E2M3 = FloatFormat(2, 3)
FP8_E4M3 = FloatFormat(4, 3)
FP8_E3M4 = FloatFormat(3, 4)
FP8_E2M5 = FloatFormat(2, 5)


@dataclass(frozen=True)
class AlignSpec:
    """Parameters for the hardware-motivated approximate aligned decode.

    Mirrors the knobs of reference quant_linear.py:237-285
    (_fp_decode_aligned) and 288-363 (double approx):

    * codewords whose exponent field is in ``[hi_align_start,
      hi_align_exp_field]`` are decoded by right-shifting their mantissa to a
      shared exponent ``hi_align_exp_field`` instead of exact decode;
    * ``tail_pad_bits`` zero-pads (or, if negative, pre-truncates) the
      mantissa before the alignment shift;
    * ``align_subnorm_exp_as_one`` treats subnormal codes as exponent 1 when
      deciding alignment.
    """

    hi_align_start: int
    hi_align_exp_field: int
    tail_pad_bits: int = 0
    align_subnorm_exp_as_one: bool = True
    limit_align_exp_to_field: bool = True
    # double-approx only: if a group of 4 contains a max-exponent outlier,
    # align the whole group to the max exponent field.
    handle_max_outlier: bool = True


# Reference CLI defaults (main.py:170-178).
DEFAULT_ALIGN = {
    "fp4": AlignSpec(hi_align_start=1, hi_align_exp_field=1, tail_pad_bits=0),
    "fp6": AlignSpec(hi_align_start=4, hi_align_exp_field=7, tail_pad_bits=2),
    "fp8": AlignSpec(hi_align_start=12, hi_align_exp_field=15, tail_pad_bits=1),
}


@dataclass(frozen=True)
class QuantSpec:
    """Full description of one weight-quantization scheme.

    ``fmt`` selects the codec:
      * ``"int"``       -- uniform integer, ``bits`` wide (C3 in SURVEY.md)
      * ``"fp"``        -- minifloat via ``float_format``          (C4)
      * ``"bfp"``       -- block floating point, ``bits`` wide     (C6)
      * ``"fp4_e1m2"``  -- standalone two-step FP4 scheme          (C8)

    ``group_size`` follows the reference convention: -1 per-tensor,
    -2 per-channel, >0 per-group along the reduction dim.

    ``quant_axis``: 0 groups along the input-feature (reduction) axis of the
    ``[in, out]`` JAX kernel -- the reference's default ``quant_dim=0`` on its
    ``[out, in]`` weights; 1 groups along output features (reference
    ``quant_dim=1``, transpose-first grouping, quant_linear.py:640-647).
    """

    fmt: str = "int"
    bits: int = 4
    group_size: int = 128
    symmetric: bool = True
    quant_axis: int = 0
    float_format: Optional[FloatFormat] = None
    approximate: bool = False
    double_approximate: bool = False
    align: Optional[AlignSpec] = None

    def __post_init__(self):
        if self.fmt not in ("int", "fp", "bfp", "fp4_e1m2"):
            raise ValueError(f"unknown fmt {self.fmt!r}")
        if self.fmt == "int" and not (2 <= self.bits < 16):
            raise ValueError("int quantization supports 2..15 bits")
        if self.fmt == "fp" and self.float_format is None:
            raise ValueError("fmt='fp' requires float_format")
        if self.fmt in ("bfp",) and self.group_size <= 0:
            # Mirrors reference quant_wrapper.py:19-20.
            raise ValueError("BFP requires per-group quantization (group_size > 0)")
        if self.approximate and self.group_size <= 0:
            # Mirrors reference quant_linear.py:475-476.
            raise ValueError("approximate decode requires per-group quantization")
        if self.quant_axis not in (0, 1):
            raise ValueError("quant_axis must be 0 or 1")

    @property
    def storage_bits(self) -> int:
        if self.fmt == "int" or self.fmt == "bfp":
            return self.bits
        if self.fmt == "fp":
            return self.float_format.total_bits
        return 4  # fp4_e1m2

    def effective_align(self, kind: str) -> AlignSpec:
        return self.align if self.align is not None else DEFAULT_ALIGN[kind]


def fp_spec(kind: str, exp_bits: int, mant_bits: int, **kw) -> QuantSpec:
    """Convenience constructor mirroring the reference CLI surface
    (``--w_format fp4 --fp4_exp_bits E --fp4_mantissa_bits M``)."""
    fmt = FloatFormat(exp_bits, mant_bits)
    return QuantSpec(fmt="fp", bits=fmt.total_bits, float_format=fmt, **kw)


@dataclass(frozen=True)
class GPTQConfig:
    """GPTQ solver knobs (reference gptq/gptq.py:60-61 fasterquant args)."""

    nsamples: int = 128
    blocksize: int = 128
    percdamp: float = 0.01
    act_order: bool = False
    static_groups: bool = False
    mse: bool = False  # grid-shrink scale search (reference quant.py:78-95)
    trits: bool = False  # ternary {min,0,max} mode (reference quant.py:33-34)
    calib_dataset: str = "wikitext2"
    calib_seqlen: int = 2048
    seed: int = 0
    # TrueOBS variant solver (reference zeroShot/models/fast_trueobs.py):
    # per-channel params found once; optional sparse fp-outlier escape and
    # propagation-free nearest rounding.  sparseout output is fake-quant
    # dense (fp outliers are not grid-representable).
    solver: str = "gptq"  # "gptq" | "trueobs"
    sparseout: bool = False
    nearest: bool = False


@dataclass(frozen=True)
class KVCacheConfig:
    """KV-cache layout + quantization.

    The reference declares ``kv_bit``/``kv_group_size`` but never consumes
    them (utils.py:31-33); here KV quantization is real.
    """

    max_seq_len: int = 2048
    kv_bits: int = 16  # 16 = no quantization; 8 / 4 supported
    kv_group_size: int = 128
    # paged layout: KV lives in a shared page pool instead of per-slot slabs
    # of max_seq_len; continuous batching allocates/frees pages per request,
    # so pool memory tracks the *live* token count, not worst-case x batch.
    paged: bool = False
    page_size: int = 64
    # pool size in pages; 0 = worst case (batch * ceil(max_seq_len/page) + 1)
    num_pages: int = 0


@dataclass(frozen=True)
class MeshConfig:
    """Logical device mesh: data x model (tensor-parallel) axes."""

    data: int = 1
    model: int = 1

    @property
    def ndevices(self) -> int:
        return self.data * self.model


@dataclass(frozen=True)
class EngineConfig:
    mesh: MeshConfig = MeshConfig()
    kv: KVCacheConfig = KVCacheConfig()
    max_batch_size: int = 8
    prefill_chunk: int = 512
    activation_dtype: str = "bfloat16"
    # 8 enables W4A8/W8A8 serving (int8 MXU path, ~0.3% act-quant error)
    activation_bits: Optional[int] = None
    # activation bits for PREFILL phases only (chunked prefill + serve
    # waves): the int8 MXU path wins on the large-m wave matmuls and loses
    # on m=8 decode (NOTES round 1), so the phases want different settings.
    # 16 = split-int8 fixed point (full effective precision, the FIGLUT-I
    # realization); None = inherit activation_bits.
    prefill_activation_bits: Optional[int] = None

    def prefill_abits(self) -> Optional[int]:
        return (self.prefill_activation_bits
                if self.prefill_activation_bits is not None
                else self.activation_bits)
    # fuse qkv / gate_up packed artifacts at engine build (exact column
    # concat; e2e-measured ~20 us/layer decode win on v5e -- NOTES.md).
    # Applies to llama-family params (single-chip layout, or the
    # shard-blocked tp_block layout under tensor parallelism).
    fuse_projections: bool = False
    # generate() runs this many decode steps device-side per host sync
    # (lax.scan), so the first-touch API does not pay the ~25 ms host
    # round-trip per token; results are bit-identical to step-by-step
    # decode (same rng split sequence; post-EOS garbage is discarded on
    # the host exactly as serve() does).  1 = legacy per-token stepping.
    decode_chunk: int = 16


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)
