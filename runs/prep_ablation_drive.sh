#!/bin/bash
# Drive runs/prep_ablation.py one stage per fresh process (rc=3 = more
# stages remain; see the round-5 finding in prep_ablation.py). Bounded:
# at most 40 launches, 30 s between them.
cd /root/repo
for i in $(seq 1 40); do
  python runs/prep_ablation.py >> runs/prep_ablation.log 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then echo "[drive] complete after $i launches"; exit 0; fi
  if [ $rc -ne 3 ]; then
    echo "[drive] launch $i exited rc=$rc (not 3); sleeping 120 then retrying"
    sleep 120
  else
    sleep 5
  fi
done
echo "[drive] gave up after 40 launches"
exit 1
