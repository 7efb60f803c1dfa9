"""Evaluation harnesses: perplexity + zero-shot tasks."""

from .ppl import SequentialPPLEvaluator

__all__ = ["SequentialPPLEvaluator"]
