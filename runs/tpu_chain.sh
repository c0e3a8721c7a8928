#!/bin/bash
# Round-5 serialized TPU job chain (one TPU process at a time —
# CLAUDE.md). Every job is internally resumable (per-stage JSON or
# Orbax checkpoints), so a compile-service outage costs a retry, not
# the run. Each job gets a bounded retry loop; the chain records
# per-job status in runs/tpu_chain_status.txt.
cd /root/repo
STATUS=runs/tpu_chain_status.txt
: > $STATUS

note() { echo "[chain $(date +%H:%M:%S)] $*" | tee -a $STATUS; }

run_with_retries() {
  local name="$1"; shift
  local tries="$1"; shift
  for i in $(seq 1 "$tries"); do
    note "$name: attempt $i/$tries"
    "$@" >> "runs/${name}.log" 2>&1
    rc=$?
    if [ $rc -eq 0 ]; then note "$name: DONE"; return 0; fi
    note "$name: rc=$rc; sleeping 240 before retry"
    sleep 240
  done
  note "$name: GAVE UP after $tries attempts"
  return 1
}

# 1. prep ablation (per-stage fresh-process protocol; its own driver
#    loops internally)
run_with_retries prep_drive 2 bash runs/prep_ablation_drive.sh

# 2. s2d f=24 coherent 64k (VERDICT #2) — checkpoint-resumable
run_with_retries s2d24 8 python runs/train_s2d_coherent.py 24 64000

# 3. dense-grid SOLO density envelope (VERDICT #3) — checkpoint-resumable
run_with_retries solo_dense 8 python runs/train_solo_dense.py

# 4. 8-channel universal probe (VERDICT #5b) — checkpoint-resumable
run_with_retries universal8 6 python runs/universal8.py

# 5. 3ch universal at 24k steps (VERDICT #5a) — restart-from-scratch
run_with_retries universal24k 3 \
  env ITERS=2000 TAG=24k python runs/train_universal.py

# 6. SOLOLite s2d at the shipped recipe (VERDICT #4) — checkpoint-resumable
run_with_retries solo_s2d 6 python runs/train_solo_s2d.py

note "chain complete"
