#!/usr/bin/env python3
"""LLaMA-2-70B W4 g128 per-chip memory plan (VERDICT r3 item 3c).

Pure arithmetic -- asserts the serving configuration fits the 16 GB/chip
v5e at TP=4 and TP=8 with int4 KV at 4k context.  Shapes from
models.llama.LlamaConfig.llama2_70b(); the reference's best attempt at this
scale is layer-round-robin placement over 4-8 GPUs (gptq/opt.py:272-306,
scripts/llama-2-70b/scripts_0.sh).

Run: python scripts/plan_70b_memory.py  (prints a markdown table + asserts)
"""

import json

GB = 1024**3

# LlamaConfig.llama2_70b()
H, INTER, L, HQ, HKV, HD, VOCAB = 8192, 28672, 80, 64, 8, 128, 32000
G = 128          # quant group size
SIDE_BYTES = 8   # f32 scale + f32 zero per group
KV_BITS = 4
KV_G = 128
CTX = 4096
BATCH = 8
CHIP_HBM_GB = 16.0


def layer_linear_elems():
    qdim, kvdim = HQ * HD, HKV * HD
    return (H * qdim + 2 * H * kvdim + qdim * H       # q k v o
            + 2 * H * INTER + INTER * H)              # gate up down


def plan(tp: int):
    el = layer_linear_elems()
    w_packed = el / 2                       # int4 codes
    w_sides = el / G * SIDE_BYTES           # f32 s+z per group
    per_layer = (w_packed + w_sides) / tp   # column/row sharded exactly
    weights = per_layer * L

    # embed + packed lm_head: embed bf16 vocab-sharded over tp; the serving
    # default packs the head (int4 g128)
    embed = VOCAB * H * 2 / tp
    head = (VOCAB * H / 2 + VOCAB * H / G * SIDE_BYTES) / tp

    # int4 KV, per-(token, head, group) affine sides, heads sharded over tp
    # (HKV=8 divides tp in {4, 8})
    kv_heads_local = HKV / tp
    kv_codes = 2 * CTX * kv_heads_local * HD / 2            # k+v nibbles
    kv_sides = 2 * CTX * kv_heads_local * (HD // KV_G) * SIDE_BYTES
    kv = (kv_codes + kv_sides) * L * BATCH

    # activations + scratch: decode-step working set is tiny (B x H
    # replicated activations, one layer's tiles in VMEM); budget 1 GB for
    # XLA scratch/fragmentation to be conservative
    scratch = 1.0 * GB

    total = weights + embed + head + kv + scratch
    return {
        "tp": tp,
        "weights_gb": round(weights / GB, 2),
        "embed_head_gb": round((embed + head) / GB, 2),
        "kv_gb": round(kv / GB, 2),
        "scratch_budget_gb": round(scratch / GB, 2),
        "total_per_chip_gb": round(total / GB, 2),
        "fits_16gb": total / GB < CHIP_HBM_GB,
        "headroom_gb": round(CHIP_HBM_GB - total / GB, 2),
    }


def main():
    el = layer_linear_elems()
    total_params = el * L + 2 * VOCAB * H
    print(f"# 70B W4 g128 memory plan (ctx={CTX}, batch={BATCH}, int{KV_BITS} KV)")
    print(f"linear params: {el * L / 1e9:.1f}B (+{2 * VOCAB * H / 1e9:.2f}B "
          f"embed/head) = {total_params / 1e9:.1f}B total")
    whole = (el * L / 2 + el * L / G * SIDE_BYTES) / GB
    print(f"whole-model packed weights: {whole:.1f} GB "
          f"(vs {el * L * 2 / GB:.0f} GB bf16) -> TP>=4 required on 16 GB chips")
    rows = []
    for tp in (1, 4, 8):
        p = plan(tp)
        rows.append(p)
        print(json.dumps(p))
    assert not rows[0]["fits_16gb"], "TP=1 must NOT fit (sanity)"
    assert rows[1]["fits_16gb"], "TP=4 must fit 16 GB"
    assert rows[2]["fits_16gb"], "TP=8 must fit 16 GB"
    # row-parallel group alignment: K per shard must be a group multiple
    for tp in (4, 8):
        assert (HQ * HD // tp) % G == 0, "o-proj shard not group-aligned"
        assert (INTER // tp) % G == 0, "down-proj shard not group-aligned"
        assert HKV % tp == 0 or tp % HKV == 0, "kv heads vs tp"
    print("OK: TP=4 and TP=8 fit with group-aligned shards")


if __name__ == "__main__":
    main()
