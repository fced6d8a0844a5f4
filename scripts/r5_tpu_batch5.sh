#!/bin/bash
# Round-5 TPU batch 5: official bench.py through the full harness with
# the polish-free class-2 config (validates the driver's end-of-round
# run ahead of time). Waits for batch 4.
cd /root/repo
LOG=benchmarks/r5_batch5.log
while ! grep -q "batch4 done" benchmarks/r5_batch4.log 2>/dev/null; do
  sleep 60
done
{
  echo "=== batch5 start $(date -u +%FT%TZ)"
  OTAMG_BENCH_DEADLINE_S=3000 timeout 3100 python bench.py
  echo "=== batch5 done $(date -u +%FT%TZ)"
} >> $LOG 2>&1
