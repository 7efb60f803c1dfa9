"""Evaluation harnesses: perplexity + zero-shot tasks.

``lm_eval_adapter`` (external lm-evaluation-harness glue, reference
main.py:427-466) is import-gated on the optional ``lm_eval`` package and
not re-exported here.
"""

from .lm import EvalLM
from .ppl import SequentialPPLEvaluator

__all__ = ["SequentialPPLEvaluator", "EvalLM"]
