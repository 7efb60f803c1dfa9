"""Model families in pure functional JAX (replaces reference L2: HF model zoo).

Each family provides: a frozen config, an ``init(cfg, key)`` random
initializer, a ``forward(params, tokens, cfg, ...)`` returning logits, and an
HF state-dict converter.  Linear weights may be dense arrays or
:class:`~iron_weight_only_quant_tpu.quantize.QuantizedTensor` -- the model
code is agnostic (models/common.py ``linear``).
"""

from .common import linear
from .llama import LlamaConfig, llama_forward, llama_init
from .opt import OPTConfig, opt_forward, opt_init
from .bloom import BloomConfig, bloom_forward, bloom_init

__all__ = [
    "linear",
    "LlamaConfig",
    "llama_forward",
    "llama_init",
    "OPTConfig",
    "opt_forward",
    "opt_init",
    "BloomConfig",
    "bloom_forward",
    "bloom_init",
]
