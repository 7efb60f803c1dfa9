"""Native zero-shot evaluation harness (C19/C21 capability).

A from-scratch, lm-eval-style task framework over the framework's own
loglikelihood API -- the TPU-native equivalent of the reference's vendored
EleutherAI mini-harness (gptq/zeroShot/**).
"""

from .base import MultipleChoiceTask, Task, evaluate, make_table
from .tasks import TASK_REGISTRY, get_task

__all__ = ["Task", "MultipleChoiceTask", "evaluate", "make_table",
           "TASK_REGISTRY", "get_task"]
