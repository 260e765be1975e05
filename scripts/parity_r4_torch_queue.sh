#!/bin/bash
# Round-4 torch-side parity queue (single-core host; run sequentially).
# Seed 0 for unetpp/segformer comes from round 3 (runs_evidence/
# parity_r3_recovered/) on the byte-identical regenerated npz; this
# queue adds seeds 1,2 and the three DOFA seeds at 112 px (the size at
# which the reference's patch-14 conv arithmetic is self-consistent,
# see BASELINE.md "Quality parity").
set -u
OUT=runs_evidence/parity_r4
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # model data seed epochs
  local model=$1 data=$2 seed=$3 epochs=$4
  local tag="${model}_s${seed}"
  if [ -f "$OUT/parity_torch_${tag}.json" ]; then
    echo "skip $tag (exists)"; return
  fi
  echo "=== torch $tag start $(date) ==="
  python scripts/parity_train_torch.py --model "$model" --data "$data" \
    --seed "$seed" --epochs "$epochs" --threads 1 \
    --out "$OUT/parity_torch_${tag}.json" \
    > "$OUT/parity_torch_${tag}.log" 2>&1
  echo "=== torch $tag done $(date) rc=$? ==="
}

run segformer /tmp/parity.npz 1 25
run segformer /tmp/parity.npz 2 25
run unetpp /tmp/parity.npz 1 25
run unetpp /tmp/parity.npz 2 25
run dofa /tmp/parity112.npz 0 25
run dofa /tmp/parity112.npz 1 25
run dofa /tmp/parity112.npz 2 25
echo "ALL DONE $(date)"
