#!/bin/bash
# Drive runs/prep_ablation.py one stage per fresh process.
# rc=3: a stage completed, more remain -> relaunch immediately.
# rc=4: only transient compile failures this launch -> retry up to 3
#       consecutive times, then exit 4 so the outer chain can wait out
#       the service outage (runs/tpu_chain.sh wait_for_service).
# rc=0: all stages done.
cd /root/repo
consec4=0
for i in $(seq 1 60); do
  python runs/prep_ablation.py >> runs/prep_ablation.log 2>&1
  rc=$?
  case $rc in
    0) echo "[drive] complete after $i launches"; exit 0;;
    3) consec4=0; sleep 5;;
    4) consec4=$((consec4+1))
       if [ $consec4 -ge 3 ]; then
         echo "[drive] 3 consecutive transient-only launches; yielding rc=4"
         exit 4
       fi
       echo "[drive] launch $i: transient failures only; sleeping 180"
       sleep 180;;
    *) echo "[drive] launch $i exited rc=$rc; sleeping 120"
       sleep 120;;
  esac
done
echo "[drive] gave up after 60 launches"
exit 1
