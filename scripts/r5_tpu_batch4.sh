#!/bin/bash
# Round-5 TPU batch 4: retry c1_4096 (batch-2 attempt died on a relay
# remote-compile disconnect) + a c2_4096 warm re-sample. Waits for
# batch 3.
cd /root/repo
LOG=benchmarks/r5_batch4.log
while ! grep -q "batch3 done" benchmarks/r5_batch3.log 2>/dev/null; do
  sleep 60
done
{
  echo "=== batch4 start $(date -u +%FT%TZ)"
  echo "--- r5_exp c1_4096 (retry)"
  OTAMG_WARM_SAMPLES=2 timeout 4500 python scripts/r5_exp.py c1_4096
  sleep 20
  echo "=== batch4 done $(date -u +%FT%TZ)"
} >> $LOG 2>&1
