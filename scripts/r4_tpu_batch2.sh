#!/bin/sh
# Round-4 TPU batch 2: newton-solve decomposition (setup vs cycle vs
# full) x coarse-target sweep; then the VMEM-vs-HBM regime check for the
# loop benches at 4096/8192 (the 2048 operand is VMEM-resident).
set -u
cd "$(dirname "$0")/.."
run() {
  stage=$1; ct=$2
  echo "=== newton $stage ct=$ct ===" >&2
  OTAMG_NEWTON_STAGE=$stage OTAMG_COARSE_TARGET=$ct \
    timeout 900 python scripts/r4_newton_profile.py \
    >> benchmarks/r4_newton.out 2>> benchmarks/r4_newton.err
  echo "rc=$? for $stage ct=$ct" >&2
}
for ct in 128 512; do
  run setup $ct
  run cycle1 $ct
  run full $ct
done
run full 256
for sz in 4096 8192; do
  for b in bip_gemv_loop bip_sweep_loop; do
    echo "=== $b size=$sz ===" >&2
    timeout 900 python benchmarks/kernels.py --size $sz --only $b \
      --out benchmarks/KERNELS_tpu.jsonl \
      >> benchmarks/r4_loops.out 2>> benchmarks/r4_loops.err
    echo "rc=$? for $b $sz" >&2
  done
done
echo "batch2 done" >&2
