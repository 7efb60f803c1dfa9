#!/usr/bin/env bash
# Real-data PPL parity: the single remaining network-gated quality gate.
#
# Runs wikitext2 W4/W3 x RTN/GPTQ through BOTH pipelines -- this framework
# (cli.eval_ppl, --no_fuse for per-projection reference-parity numerics) and
# the reference (main.py --eval_mode ppl in torch) -- and diffs the
# perplexities against each other and the BASELINE.md table
# (LLaMA-7B fp16 5.68 / 4-bit RTN 6.29 / 4-bit GPTQ 6.09, gptq/README.md:29;
# north star: agreement within 0.05 PPL, BASELINE.json).
#
# Requirements (the moment the environment provides them):
#   MODEL_PATH   -- a real LLaMA checkpoint dir (HF layout, safetensors)
#   datasets     -- network access to the HF hub, or LOCAL_PPL_DATASET_DIR
#                   pointing at wikitext2 saved via datasets.save_to_disk
#   REF_DIR      -- the reference repo (default /root/reference); its torch
#                   pipeline needs a GPU to finish in reasonable time
#
# With no MODEL_PATH the script DRY-RUNS the full command chain on the tiny
# synthetic fallback (--demo + synthetic dataset), proving every flag and
# output path works, so the real run is one env var away.

set -euo pipefail
cd "$(dirname "$0")/.."

MODEL_PATH="${MODEL_PATH:-}"
REF_DIR="${REF_DIR:-/root/reference}"
OUT_DIR="${OUT_DIR:-real_parity_results}"
DATASET="${DATASET:-wikitext}"
RUN_REFERENCE="${RUN_REFERENCE:-0}"   # 1 = also run the torch reference
mkdir -p "$OUT_DIR"

GROUP=128
if [ -z "$MODEL_PATH" ]; then
    echo "== no MODEL_PATH: dry-running the chain on the synthetic fallback =="
    MODEL_ARGS=(--demo)
    DATASET=synthetic
    GROUP=32   # the tiny demo model's hidden dim is 64
else
    MODEL_ARGS=(--model_path "$MODEL_PATH")
fi

run_ours() {  # name, extra args...
    local name="$1"; shift
    echo "== ours: $name =="
    python -m iron_weight_only_quant_tpu.cli.eval_ppl \
        "${MODEL_ARGS[@]}" --datasets "$DATASET" --no_fuse \
        --output "$OUT_DIR/ours_$name.json" "$@"
}

# fp16 baseline + RTN W4/W3 g128 + GPTQ W4/W3 g128
run_ours fp16     --w_bits 16
run_ours rtn      --w_bits 4 3 --w_group_size "$GROUP"
run_ours gptq     --w_bits 4 3 --w_group_size "$GROUP" --gptq \
                  --calib_dataset "$DATASET"

if [ "$RUN_REFERENCE" = "1" ] && [ -n "$MODEL_PATH" ]; then
    echo "== reference pipeline (torch, $REF_DIR) =="
    ( cd "$REF_DIR" && \
      python main.py --model_path "$MODEL_PATH" --eval_mode ppl \
          --quant_method rtn --w_bits 4 3 --w_group_size 128 \
          --output_dir "$PWD/$OUT_DIR/ref_rtn" && \
      python main.py --model_path "$MODEL_PATH" --eval_mode ppl \
          --quant_method gptq --w_bits 4 3 --w_group_size 128 \
          --output_dir "$PWD/$OUT_DIR/ref_gptq" )
fi

python - "$OUT_DIR" "$DATASET" <<'EOF'
import json, sys, glob, os
out_dir, dataset = sys.argv[1], sys.argv[2]
# BASELINE.md (gptq/README.md:29): llama-7b wikitext2
baseline = {"fp16_w16": 5.68, "rtn_w4": 6.29, "gptq_w4": 6.09,
            "rtn_w3": 25.54, "gptq_w3": 8.07}
print(f"\n== parity summary ({dataset}) ==")
rows = []
for path in sorted(glob.glob(os.path.join(out_dir, "ours_*.json"))):
    run = os.path.basename(path)[5:-5]
    with open(path) as f:
        res = json.load(f)
    for name, entry in res.items():
        ds = entry["datasets"].get(dataset)
        if ds is None:
            continue
        w = entry["quant_args"]["w_bit"]
        key = f"{run}_w{w}"
        base = baseline.get(key)
        delta = (f"  Δbaseline={ds['perplexity']-base:+.3f}"
                 if base is not None and dataset == "wikitext" else "")
        rows.append(f"  {key:<10} ppl={ds['perplexity']:.4f}{delta}")
print("\n".join(rows) if rows else "  (no results found)")
if dataset == "synthetic":
    print("  [dry run: synthetic data -- baselines not comparable]")
EOF
echo "done; results in $OUT_DIR/"
