#!/bin/bash
# One-shot TPU measurement sweep: run when the axon tunnel is up.
#   bash benchmarks/run_all_tpu.sh [outdir]
# Produces $outdir/{msm,groth16,fft,poseidon}.json + smoke.txt.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_results}
mkdir -p "$OUT"

probe() {
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
}
if ! probe; then
  echo "TPU tunnel unreachable (jax.devices() hang); aborting" >&2
  exit 1
fi

echo "== kernel smoke (A/B + Mosaic acceptance) =="
timeout 3600 python benchmarks/tpu_smoke.py all 2>&1 | tee "$OUT/smoke.txt"

for metric in msm groth16 fft poseidon; do
  echo "== bench: $metric =="
  BENCH_METRIC=$metric timeout 3600 python bench.py \
    >"$OUT/$metric.json" 2>"$OUT/$metric.err" || \
    echo "bench $metric FAILED (see $OUT/$metric.err)" >&2
  cat "$OUT/$metric.json"
done

echo "== msm exactness at 2^16 (BASELINE config #2) =="
timeout 3600 python benchmarks/tpu_smoke.py msm 16 2>&1 | tee "$OUT/msm16.txt"
