#!/bin/bash
# Round-4 hardware measurement battery. Run with the TPU tunnel healthy;
# STRICTLY serial (two TPU processes contend on the tunnel and stall for
# minutes). Each step logs under $OUT; every step is individually
# timeout-bounded so one hang doesn't eat the session.
#
# Usage: bash benchmarks/hw_battery.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/hw_battery}
mkdir -p "$OUT"

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  tail -4 "$OUT/$name.log"
  echo "--- rc=$rc"
}

# 1. Headline (also sanity: tunnel works end to end).
run headline 900 python bench.py

# 2. mc vs per-node at 4K: the conv-bearing losing cases + control.
run mc_chain3_s2 900 python benchmarks/mc_profile.py --graph chain3 --sigma 2 --size 3840x2160
run mc_chain3_s4 900 python benchmarks/mc_profile.py --graph chain3 --sigma 4 --size 3840x2160
run mc_blur_s2   900 python benchmarks/mc_profile.py --graph blur --sigma 2 --size 3840x2160
run mc_sobel     700 python benchmarks/mc_profile.py --graph sobel --size 3840x2160
run mc_tmblur_s2 700 python benchmarks/mc_profile.py --graph tonemap-blur --sigma 2 --size 3840x2160

# 3. mc conv-stage profiler traces (attribution).
run mc_trace 1200 python benchmarks/mc_profile.py --graph chain3 --sigma 2 --size 3840x2160 --profile "$OUT/mctrace"
run mc_trace_top 120 python benchmarks/trace_top.py "$OUT/mctrace/mc" --n 25
run pn_trace_top 120 python benchmarks/trace_top.py "$OUT/mctrace/pernode" --n 25

# 4. mc tile sweep (REFORGE_MC_TILE_H; 2160-dividing multiples of 8).
for t in 80 120 216 240; do
  REFORGE_MC_TILE_H=$t run "mc_tile_$t" 700 python benchmarks/mc_profile.py \
    --graph chain3 --sigma 2 --size 3840x2160 --variants mc
done

# 5. Storage formats + the bf16 block-upcast variant.
run formats 1200 python benchmarks/format_profile.py --profile "$OUT/fmttrace"
run fmt_f32_top 120 python benchmarks/trace_top.py "$OUT/fmttrace/rgba32f" --n 20
run fmt_bf16_top 120 python benchmarks/trace_top.py "$OUT/fmttrace/rgba16f" --n 20
REFORGE_BF16_BLOCK_UPCAST=1 run bf16_blockupcast 700 python benchmarks/format_profile.py --formats rgba16f

# 6. Batch throughput (VERDICT #2: publish the number).
run batch 900 python benchmarks/batch_throughput.py

# 7. Structural-floor ablation with the new DMA-only floor variant.
run ablation 1800 python benchmarks/strip_ablation.py

# 8. Stripe-count A/B (env read at import: separate processes).
for s in 4 8 16; do
  REFORGE_ACC_STRIPES=$s run "stripes_$s" 700 python benchmarks/mc_profile.py \
    --graph blur --sigma 4 --size 3840x2160 --variants pernode
done

echo "battery complete: $OUT"
