#!/bin/bash
# Run each bisect step in a fresh process on the TPU; log outcomes.
LOG=/tmp/tpu_bisect.log
: > $LOG
for s in components strength setup cycle1 cycle30 he apd2it apd10it; do
  echo "=== step $s $(date +%H:%M:%S) ===" >> $LOG
  OTAMG_BISECT_STEP=$s timeout 2400 python /root/repo/scripts/tpu_bisect.py >> $LOG 2>&1
  rc=$?
  echo "=== step $s rc=$rc $(date +%H:%M:%S) ===" >> $LOG
  if [ $rc -ne 0 ]; then
    sleep 300   # let a crashed relay/worker recover
  else
    sleep 20
  fi
done
echo "=== bisect done ===" >> $LOG
