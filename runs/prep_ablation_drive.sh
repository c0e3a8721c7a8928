#!/bin/bash
# Drive runs/prep_ablation.py one stage per fresh process.
# rc=3: a stage completed, more remain -> relaunch immediately.
# rc=4: only transient compile failures this launch -> sleep 240, retry.
# rc=0: all stages done. Bounded at 60 launches.
cd /root/repo
for i in $(seq 1 60); do
  python runs/prep_ablation.py >> runs/prep_ablation.log 2>&1
  rc=$?
  case $rc in
    0) echo "[drive] complete after $i launches"; exit 0;;
    3) sleep 5;;
    4) echo "[drive] launch $i: transient failures only; sleeping 240"
       sleep 240;;
    *) echo "[drive] launch $i exited rc=$rc; sleeping 120"
       sleep 120;;
  esac
done
echo "[drive] gave up after 60 launches"
exit 1
