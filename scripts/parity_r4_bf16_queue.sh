#!/bin/bash
# Round-4 bf16-mixed parity rows (VERDICT r3 #5): re-run the JAX side of
# the quality-parity study under the production `bf16-mixed` precision
# policy, same data bytes / recipe / seeds as the f32 rows, so
# BASELINE.md can record the bf16-vs-f32 delta users actually rely on.
# Runs on the TPU chip; sequential (single host core).
set -u
OUT=runs_evidence/parity_r4
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # model data seed epochs
  local model=$1 data=$2 seed=$3 epochs=$4
  local tag="${model}_bf16_s${seed}"
  if [ -f "$OUT/parity_jax_${tag}.json" ]; then
    echo "skip $tag (exists)"; return
  fi
  echo "=== jax $tag start $(date) ==="
  python scripts/parity_train_jax.py --model "$model" --data "$data" \
    --seed "$seed" --epochs "$epochs" --precision bf16-mixed \
    --out "$OUT/parity_jax_${tag}.json" \
    > "$OUT/parity_jax_${tag}.log" 2>&1
  echo "=== jax $tag done $(date) rc=$? ==="
}

for s in 0 1 2; do
  run unetpp /tmp/parity.npz "$s" 25
  run segformer /tmp/parity.npz "$s" 25
  run dofa /tmp/parity112.npz "$s" 25
done
echo "ALL_JAX_BF16_DONE $(date)"
