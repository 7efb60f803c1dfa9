"""Inference engine: KV caches, prefill/decode, batching."""

from .kvcache import make_caches
from .engine import InferenceEngine

__all__ = ["make_caches", "InferenceEngine"]
