#!/bin/bash
# Round-5 TPU batch 1: validate the fused deep correction on the chip.
#   (a) newton profile at 4096 nodes: F+fused vs F vs W (ct=128)
#   (b) official bench.py (median-of-3 warm, fuse_deep on)
# Serialized — one chip behind the relay; each step its own process.
cd /root/repo
LOG=benchmarks/r5_batch1.log
{
  echo "=== batch1 start $(date -u +%FT%TZ)"
  for cfg in "f 1" "f 0" "w 0"; do
    set -- $cfg
    echo "--- newton_full cycle=$1 fuse=$2"
    OTAMG_NEWTON_STAGE=full OTAMG_CYCLE=$1 OTAMG_FUSE_DEEP=$2 \
      OTAMG_SIZE=2048 timeout 1500 python scripts/r5_newton_profile.py
    sleep 10
  done
  echo "--- bench.py $(date -u +%FT%TZ)"
  OTAMG_BENCH_DEADLINE_S=3000 timeout 3100 python bench.py
  echo "=== batch1 done $(date -u +%FT%TZ)"
} >> $LOG 2>&1
