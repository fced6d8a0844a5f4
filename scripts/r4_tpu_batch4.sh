#!/bin/sh
# Round-4 TPU batch 4: final kernel artifact with the marginal-slope
# methodology, flagship default-settings control, class-2 1024^2 (new
# scale), and class-1 1024^2 re-measure on the round-4 code.
set -u
cd "$(dirname "$0")/.."
echo "=== kernels (marginal) ===" >&2
timeout 4800 python benchmarks/run_kernels_isolated.py \
  --out benchmarks/KERNELS_tpu.jsonl --size 2048 \
  > benchmarks/r4_kernels2.log 2>&1
echo "rc=$? kernels" >&2
run_exp() {
  name=$1; budget=$2
  echo "=== $name ===" >&2
  timeout "$budget" python scripts/r4_exp.py "$name" \
      > "benchmarks/r4_${name}.out" 2> "benchmarks/r4_${name}.err"
  rc=$?
  echo "rc=$rc for $name" >&2
  if [ "$rc" -ne 0 ] && ! grep -q '^RESULT' "benchmarks/r4_${name}.out"; then
    sleep 60
    timeout "$budget" python scripts/r4_exp.py "$name" \
        >> "benchmarks/r4_${name}.out" 2>> "benchmarks/r4_${name}.err"
    echo "retry rc=$? for $name" >&2
  fi
}
run_exp c1_w 900
run_exp c2_1024 2400
run_exp c1_1024 2400
echo "batch4 done" >&2
