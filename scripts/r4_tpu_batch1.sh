#!/bin/sh
# Round-4 TPU batch 1: V-cycle, fused retest, chunked re-measure, class-2
# without feas_polish.  One subprocess per experiment (axon worker crashes
# must not poison the next), one retry after a 60 s cool-down.
set -u
cd "$(dirname "$0")/.."
run_exp() {
  name=$1; budget=$2
  echo "=== $name (budget ${budget}s) ===" >&2
  timeout "$budget" python scripts/r4_exp.py "$name" \
      > "benchmarks/r4_${name}.out" 2> "benchmarks/r4_${name}.err"
  rc=$?
  echo "rc=$rc for $name" >&2
  if [ "$rc" -ne 0 ] && ! grep -q '^RESULT' "benchmarks/r4_${name}.out"; then
    echo "retrying $name after cool-down" >&2
    sleep 60
    timeout "$budget" python scripts/r4_exp.py "$name" \
        >> "benchmarks/r4_${name}.out" 2>> "benchmarks/r4_${name}.err"
    echo "retry rc=$? for $name" >&2
  fi
}
run_exp c1_v 900
run_exp c1_fused_smoke 900
if grep -q '"converged": true' benchmarks/r4_c1_fused_smoke.out 2>/dev/null \
   || grep -q '^RESULT' benchmarks/r4_c1_fused_smoke.out 2>/dev/null; then
  run_exp c1_fused 1200
fi
run_exp c1_chunked 1200
run_exp c2_nopolish 1200
echo "batch1 done" >&2
