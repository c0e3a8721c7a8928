#!/bin/bash
# Round-5 serialized TPU job chain (one TPU process at a time —
# CLAUDE.md). Trainings run FIRST: medium-sized training programs
# compile (slowly) through the degraded service while the ablation's
# big 1920-patch programs are rejected outright, so the ablation runs
# opportunistically between trainings. Outage-aware: probes service
# health before spending job retries. Every job is internally
# resumable (per-stage JSON or Orbax checkpoints).
cd /root/repo
STATUS=runs/tpu_chain_status.txt
: > $STATUS

note() { echo "[chain $(date +%H:%M:%S)] $*" | tee -a $STATUS; }

wait_for_service() {
  for i in $(seq 1 120); do
    if timeout 300 python runs/tpu_probe.py >> runs/tpu_probe.log 2>&1; then
      note "service OK (probe $i)"
      return 0
    fi
    note "service down (probe $i); sleeping 240"
    sleep 240
  done
  note "service never recovered"; return 1
}

run_with_retries() {
  local name="$1"; shift
  local tries="$1"; shift
  for i in $(seq 1 "$tries"); do
    wait_for_service || return 1
    note "$name: attempt $i/$tries"
    "$@" >> "runs/${name}.log" 2>&1
    rc=$?
    if [ $rc -eq 0 ]; then note "$name: DONE"; return 0; fi
    note "$name: rc=$rc; re-probing service before retry"
    sleep 60
  done
  note "$name: GAVE UP after $tries attempts"
  return 1
}

# opportunistic single ablation sweep (exits fast when the service
# rejects its big programs; resumes from per-stage JSON)
ablation_sweep() {
  run_with_retries prep_drive 1 bash runs/prep_ablation_drive.sh
}

# 1. s2d f=24 coherent 64k (VERDICT #2) — checkpoint-resumable
run_with_retries s2d24 10 python runs/train_s2d_coherent.py 24 64000

ablation_sweep

# 2. dense-grid SOLO density envelope (VERDICT #3) — checkpoint-resumable
run_with_retries solo_dense 10 python runs/train_solo_dense.py

ablation_sweep

# 3. 8-channel universal probe (VERDICT #5b) — checkpoint-resumable
run_with_retries universal8 8 python runs/universal8.py

# 4. 3ch universal at 24k steps (VERDICT #5a) — restart-from-scratch
run_with_retries universal24k 3 \
  env ITERS=2000 TAG=24k python runs/train_universal.py

# 5. SOLOLite s2d at the shipped recipe (VERDICT #4) — checkpoint-resumable
run_with_retries solo_s2d 8 python runs/train_solo_s2d.py

# 6. final ablation sweeps
run_with_retries prep_drive_final 3 bash runs/prep_ablation_drive.sh

note "chain complete"
