#!/bin/bash
# Round-5 TPU batch 7: warm-sample spread at scale (3 samples each).
cd /root/repo
LOG=benchmarks/r5_batch7.log
{
  echo "=== batch7 start $(date -u +%FT%TZ)"
  OTAMG_WARM_SAMPLES=3 timeout 2400 python scripts/r5_exp.py c1_1024
  sleep 15
  OTAMG_WARM_SAMPLES=3 timeout 3000 python scripts/r5_exp.py c1_2048
  echo "=== batch7 done $(date -u +%FT%TZ)"
} >> $LOG 2>&1
