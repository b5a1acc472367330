#!/bin/bash
# Round-3 kernel A/B matrix (PERF_NOTES.md "queued A/B matrix").
# Run on the real TPU with an idle host (never concurrently with pytest).
# Screening pass: fewer iters/trials than the gate config; confirm the
# winner with a full `python bench.py` before changing DEFAULTS.
set -u -o pipefail
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jaxcache}
ITERS=${AB_ITERS:-6}
TRIALS=${AB_TRIALS:-2}
OUT=${AB_OUT:-/tmp/ab_round3.jsonl}
: > "$OUT"

run() {
  local label="$1"; shift
  echo "=== $label ($*)" >&2
  local line rc
  line=$(env "$@" BENCH_ITERS=$ITERS BENCH_TRIALS=$TRIALS timeout 3000 python bench.py 2>/dev/null | tail -1)
  rc=$?
  if [ -z "$line" ] || [ "$rc" -ne 0 ]; then
    echo "{\"label\": \"$label\", \"env\": \"$*\", \"error\": \"rc=$rc\"}" | tee -a "$OUT"
    return
  fi
  echo "{\"label\": \"$label\", \"env\": \"$*\", \"result\": $line}" | tee -a "$OUT"
}

run baseline-fc1            BENCH_MLP=fc1
run mlp-full                BENCH_MLP=full
run mlp-full_ln             BENCH_MLP=full_ln
run qkv-ln                  BENCH_QKV_LN=1
run full_ln+qkv-ln          BENCH_MLP=full_ln BENCH_QKV_LN=1
run full_ln+qkv-ln+enc56    BENCH_MLP=full_ln BENCH_QKV_LN=1 BENCH_ENCODER_PAD=56
echo "--- finetune workload" >&2
run ft-baseline             BENCH_WORKLOAD=finetune
run ft-full_ln              BENCH_WORKLOAD=finetune BENCH_MLP=full_ln
echo "done; results in $OUT" >&2
