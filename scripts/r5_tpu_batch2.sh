#!/bin/bash
# Round-5 TPU batch 2: algebraic fused Newton profile + warm scale
# frontier (VERDICT items 2 and 4). Serialized; one experiment per
# process.
cd /root/repo
LOG=benchmarks/r5_batch2.log
{
  echo "=== batch2 start $(date -u +%FT%TZ)"
  echo "--- newton_full F fused(algebraic) 2048"
  OTAMG_NEWTON_STAGE=full OTAMG_CYCLE=f OTAMG_FUSE_DEEP=1 \
    OTAMG_SIZE=2048 timeout 1500 python scripts/r5_newton_profile.py
  sleep 10
  for exp in c1_1024 c2_1024 c1_2048 c2_2048; do
    echo "--- r5_exp $exp $(date -u +%FT%TZ)"
    timeout 2400 python scripts/r5_exp.py $exp
    sleep 15
  done
  echo "--- r5_exp c1_4096 $(date -u +%FT%TZ)"
  timeout 3600 python scripts/r5_exp.py c1_4096
  sleep 15
  echo "--- r5_exp c2_4096 $(date -u +%FT%TZ)"
  timeout 5400 python scripts/r5_exp.py c2_4096
  echo "=== batch2 done $(date -u +%FT%TZ)"
} >> $LOG 2>&1
