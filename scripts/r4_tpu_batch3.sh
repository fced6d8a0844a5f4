#!/bin/sh
# Round-4 TPU batch 3: coarse-target frontier (newton decomposition at
# 800/1280), flagship 500^2 e2e at tuned coarse targets, and the Pallas
# CSR production-consumer validation.
set -u
cd "$(dirname "$0")/.."
newton() {
  ct=$1
  echo "=== newton full ct=$ct ===" >&2
  OTAMG_NEWTON_STAGE=full OTAMG_COARSE_TARGET=$ct \
    timeout 900 python scripts/r4_newton_profile.py \
    >> benchmarks/r4_newton.out 2>> benchmarks/r4_newton.err
  echo "rc=$?" >&2
}
e2e() {
  ct=$1
  echo "=== c1_w e2e ct=$ct ===" >&2
  OTAMG_COARSE_TARGET=$ct timeout 900 python scripts/r4_exp.py c1_w \
    >> benchmarks/r4_ct_e2e.out 2>> benchmarks/r4_ct_e2e.err
  echo "rc=$?" >&2
}
newton 800
newton 1280
e2e 400
e2e 500
echo "=== csr consumer ===" >&2
timeout 1200 python scripts/r4_csr_tpu.py \
  > benchmarks/r4_csr.out 2> benchmarks/r4_csr.err
echo "rc=$? for csr" >&2
echo "=== compile audit (default ct) ===" >&2
timeout 900 python scripts/r4_compile_audit.py \
  > benchmarks/r4_compile.out 2> benchmarks/r4_compile.err
echo "rc=$? for compile audit" >&2
echo "batch3 done" >&2
