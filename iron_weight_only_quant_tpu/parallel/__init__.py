"""Device mesh + sharding for tensor/data-parallel inference.

The reference has no distributed backend at all (SURVEY.md §2.3): its only
multi-device mechanism is accelerate's layer placement.  Here parallelism is
first-class: a ``("data", "model")`` mesh, megatron-style tensor-parallel
PartitionSpecs over packed quantized weights, and XLA/GSPMD collectives over
ICI.
"""

from .mesh import make_mesh, multihost_init
from .pp import make_pp_llama_forward, stage_stack_llama_layers
from .sharding import apply_sharding, param_specs

__all__ = [
    "make_mesh",
    "multihost_init",
    "apply_sharding",
    "param_specs",
    "make_pp_llama_forward",
    "stage_stack_llama_layers",
]
