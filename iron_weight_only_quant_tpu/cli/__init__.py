"""Command-line entry points.

Replaces the reference's argparse-per-script surface (main.py,
eval_quant_lm_eval.py, gptq/{opt,llama,bloom}.py) and its 21 shell-script
sweep files with four commands:

  python -m iron_weight_only_quant_tpu.cli.quantize       checkpoint -> packed artifact
  python -m iron_weight_only_quant_tpu.cli.eval_ppl       PPL sweeps (bits x format x group)
  python -m iron_weight_only_quant_tpu.cli.eval_zeroshot  zero-shot task suite
  python -m iron_weight_only_quant_tpu.cli.generate       text generation / engine demo
"""
