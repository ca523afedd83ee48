#!/bin/bash
# Continuation of scripts/run_synth_pipeline.sh from after stage 1 — for
# restarts on flaky hosts (the tunneled chip can wedge mid-run; stage 1 is
# checkpoint-resumable, the later stages are idempotent). Takes the
# calibration flags from logs/synpano_vae via tools/calibrate_latents.py
# unless CALIB is provided in the environment.
set -e
cd "$(dirname "$0")/.."
export WANDB_MODE=disabled

CN_EPOCHS=${CN_EPOCHS:-40}
COMMON="--data=Matterport3D --data.data_dir=data/SyntheticRooms \
  --data.pano_height=256 --data.pers_resolution=128 --data.cam_sampler=horizon \
  --data.batch_size=4 --data.num_workers=4 --model=PanFusion \
  --model.preset=demo --model.num_views=8"

if [ -z "$CALIB" ]; then
  JAX_PLATFORMS=cpu python tools/calibrate_latents.py \
    --ckpt logs/synpano_vae/checkpoints/last --cpu | tee /tmp/calib.txt
  CALIB=$(grep -o -- "--model.latent_shift=[^ ]* --model.latent_scale=[^ ]*" /tmp/calib.txt)
fi
echo "calibration: $CALIB"

echo "=== stage 1.25: guidance-scale sweep ==="
python scripts/probe_guidance.py --ckpt logs/synpano_diff/checkpoints/last \
  --out logs/synpano_diff/guidance_sweep --scales 1,2,3,5,9 || true

echo "=== stage 1.5: predict panels from the trained model ==="
WANDB_RUN_ID=synpano_diff python -m panfusion_tpu.cli predict $COMMON \
  --data.batch_size=1 --data.repeat_predict=1 --data.predict_limit=6 \
  --model.diff_timestep=50 \
  ${PREDICT_EXTRA:---model.guidance_scale=2} \
  --ckpt_path=logs/synpano_diff/checkpoints/last || true
# guidance 2 is the FAED-selected scale for the from-scratch demo preset
# (BASELINE.md round-4 sample-quality table); override via PREDICT_EXTRA

echo "=== stage 2: layout-conditioned ControlNet fit ($CN_EPOCHS epochs) ==="
WANDB_RUN_ID=synpano_cn python -m panfusion_tpu.cli fit $COMMON \
  --model.layout_cond=true --data.layout_cond_type=distance_map \
  --trainer.lr=2e-4 --trainer.max_epochs=$CN_EPOCHS \
  --trainer.val_every_n_epochs=10 $CALIB \
  --ckpt_path=logs/synpano_diff/checkpoints/last

echo "=== pipeline continuation done ==="
