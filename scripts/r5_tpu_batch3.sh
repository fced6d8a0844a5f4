#!/bin/bash
# Round-5 TPU batch 3: class-2 without the polish crutch (VERDICT item
# 3) — the round-5 trajectory (fused deep, F) converges unpolished on
# the CPU-mesh reproduction; test the chip. Waits for batch 2.
cd /root/repo
LOG=benchmarks/r5_batch3.log
while ! grep -q "batch2 done" benchmarks/r5_batch2.log 2>/dev/null; do
  sleep 60
done
{
  echo "=== batch3 start $(date -u +%FT%TZ)"
  for exp in c2_nopolish c2_2048_nopolish; do
    echo "--- r5_exp $exp $(date -u +%FT%TZ)"
    timeout 2400 python scripts/r5_exp.py $exp
    sleep 15
  done
  echo "--- newton_full F fused 4096 (8192-node)"
  OTAMG_NEWTON_STAGE=full OTAMG_CYCLE=f OTAMG_FUSE_DEEP=1 \
    OTAMG_SIZE=4096 timeout 1800 python scripts/r5_newton_profile.py
  sleep 10
  OTAMG_NEWTON_STAGE=full OTAMG_CYCLE=f OTAMG_FUSE_DEEP=0 \
    OTAMG_SIZE=4096 timeout 1800 python scripts/r5_newton_profile.py
  echo "=== batch3 done $(date -u +%FT%TZ)"
} >> $LOG 2>&1
