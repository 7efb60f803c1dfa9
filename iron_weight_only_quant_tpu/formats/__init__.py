"""Quantization codecs (the numerical contract of the framework).

Every codec operates on a 2-D "grouped view" ``[n_groups, group_width]`` in
float32 and returns integer codes plus the side information (scales / zeros /
shared exponents) needed to decode.  Grouping/ungrouping between weight
layouts and the grouped view lives in :mod:`.grouping`.

Codecs (SURVEY.md component numbers):
  * :mod:`.int_codec`   -- uniform integer, sym/asym            (C1/C3)
  * :mod:`.minifloat`   -- parametric E/M minifloat + approx    (C4/C5)
  * :mod:`.bfp`         -- block floating point                 (C6)
  * :mod:`.fp4_e1m2`    -- standalone two-step FP4              (C8)
"""

from .grouping import make_groups, restore_from_groups, group_view_shape
from .int_codec import (
    encode_int,
    decode_int,
    pseudo_quantize,
)
from .minifloat import (
    encode_minifloat,
    decode_minifloat,
    decode_minifloat_aligned,
    decode_minifloat_double_approx,
    minifloat_codebook,
)
from .bfp import encode_bfp, decode_bfp
from .fp4_e1m2 import quantize_fp4_two_step
from .api import quantize_groups, dequantize_groups, fake_quantize

__all__ = [
    "make_groups",
    "restore_from_groups",
    "group_view_shape",
    "encode_int",
    "decode_int",
    "pseudo_quantize",
    "encode_minifloat",
    "decode_minifloat",
    "decode_minifloat_aligned",
    "decode_minifloat_double_approx",
    "minifloat_codebook",
    "encode_bfp",
    "decode_bfp",
    "quantize_fp4_two_step",
    "quantize_groups",
    "dequantize_groups",
    "fake_quantize",
]
