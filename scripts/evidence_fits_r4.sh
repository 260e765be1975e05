#!/bin/bash
# Round-4 evidenced training runs (VERDICT r3 #6): one CLI fit per model
# family on the real chip, exercising the round-3 training-logic changes
# in anger — PlateauController (patience shortened to 2 so the LR drop
# actually fires inside 10 epochs), the OneCycleLR surface (DOFA
# variant config), and eval-loss masking (every validation pass).
# Evidence (metrics.jsonl + params.json + README) is copied into
# runs_evidence/<name>_r4/ afterwards by the session.
set -eu
cd "$(dirname "$0")/.."

echo "=== fit unetpp (plateau patience=2) $(date) ==="
python -m geo_deep_learning_tpu.cli.main fit \
  --config configs/unetplus_config_RGB.yaml \
  trainer.default_root_dir=runs/unetpp_r4 \
  trainer.logger.init_args.save_dir=runs/unetpp_r4 \
  model.init_args.scheduler.init_args.patience=2 \
  > /tmp/fit_unetpp_r4.log 2>&1
echo "rc=$?"

echo "=== fit segformer (plateau patience=2) $(date) ==="
python -m geo_deep_learning_tpu.cli.main fit \
  --config configs/segformer_config_RGB.yaml \
  trainer.default_root_dir=runs/segformer_r4 \
  trainer.logger.init_args.save_dir=runs/segformer_r4 \
  model.init_args.scheduler.init_args.patience=2 \
  > /tmp/fit_segformer_r4.log 2>&1
echo "rc=$?"

echo "=== fit dofa (OneCycleLR) $(date) ==="
python -m geo_deep_learning_tpu.cli.main fit \
  --config configs/dofa_config_RGB_onecycle.yaml \
  > /tmp/fit_dofa_r4.log 2>&1
echo "rc=$?"

echo "ALL_FITS_DONE $(date)"
