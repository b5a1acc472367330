#!/bin/bash
# Round-4 measurement plan: burn down the round-3 queued matrix PLUS the
# round-4 candidates, unattended, the moment the TPU relay answers.
# Run with an idle host (never concurrently with pytest).
#
# Order matters: the gate re-capture (default config, full iters) comes
# FIRST so a mid-run relay death still leaves the headline number recorded.
set -u -o pipefail
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jaxcache}
ITERS=${AB_ITERS:-6}
TRIALS=${AB_TRIALS:-2}
OUT=${AB_OUT:-/tmp/ab_round4.jsonl}
: > "$OUT"

run() {
  local label="$1"; shift
  echo "=== $label ($*)" >&2
  local line rc
  line=$(env "$@" timeout 3000 python bench.py 2>/dev/null | tail -1)
  rc=$?
  if [ -z "$line" ] || [ "$rc" -ne 0 ]; then
    # Keep the JSONL parseable and the failure visible.
    echo "{\"label\": \"$label\", \"env\": \"$*\", \"error\": \"rc=$rc\"}" | tee -a "$OUT"
    return
  fi
  echo "{\"label\": \"$label\", \"env\": \"$*\", \"result\": $line}" | tee -a "$OUT"
}

screen() {  # screening pass: fewer iters/trials
  local label="$1"; shift
  run "$label" "$@" BENCH_ITERS=$ITERS BENCH_TRIALS=$TRIALS
}

# 1. Gate recapture at the pinned default (FULL iters — this is the number
#    the driver's BENCH_r04.json must reproduce; expect ~1761 + the
#    round-4 scale-fold delta).
run gate-default

# 2. Round-3 queued kernel matrix (screening).
screen mlp-full                BENCH_MLP=full
screen mlp-full_ln             BENCH_MLP=full_ln
screen qkv-ln                  BENCH_QKV_LN=1
screen full_ln+qkv-ln          BENCH_MLP=full_ln BENCH_QKV_LN=1
screen full_ln+qkv-ln+enc56    BENCH_MLP=full_ln BENCH_QKV_LN=1 BENCH_ENCODER_PAD=56
screen enc56                   BENCH_ENCODER_PAD=56

# 3. Operating-envelope widening (VERDICT #9): neighbors that should also
#    clear 1650 so the gate isn't a single pinned point.
screen batch128x16             BENCH_BATCH=128
screen batch192x16             BENCH_BATCH=192
screen batch224x16             BENCH_BATCH=224
screen batch128x32             BENCH_BATCH=128 BENCH_STEPS_PER_CALL=32

# 4. Fine-tune workload matrix.
screen ft-baseline             BENCH_WORKLOAD=finetune
screen ft-full_ln              BENCH_WORKLOAD=finetune BENCH_MLP=full_ln
screen ft-qkv-ln               BENCH_WORKLOAD=finetune BENCH_QKV_LN=1
screen ft-nopad                BENCH_WORKLOAD=finetune BENCH_VIT_PAD=0
screen ft-steps8               BENCH_WORKLOAD=finetune BENCH_FT_STEPS_PER_CALL=8
screen ft-steps4               BENCH_WORKLOAD=finetune BENCH_FT_STEPS_PER_CALL=4

# 5. Host input pipeline (no TPU needed, but record alongside).
run input-pipeline             BENCH_WORKLOAD=input

echo "done; results in $OUT" >&2
