#!/bin/bash
# Round-5 TPU batch 6: e2e roofline accounting at scale (2048^2 both
# classes, recording ssn_total/cycles_total/model_gbps/roofline_frac).
cd /root/repo
LOG=benchmarks/r5_batch6.log
while ! grep -q "batch5 done" benchmarks/r5_batch5.log 2>/dev/null; do
  sleep 60
done
{
  echo "=== batch6 start $(date -u +%FT%TZ)"
  for exp in c1_2048 c2_2048_nopolish; do
    echo "--- r5_exp $exp"
    timeout 2400 python scripts/r5_exp.py $exp
    sleep 15
  done
  echo "=== batch6 done $(date -u +%FT%TZ)"
} >> $LOG 2>&1
