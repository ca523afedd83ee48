#!/bin/bash
# From-scratch learning demonstration on the procedural synthetic-rooms
# dataset (VERDICT round 1, Next #3 diffusion stage + #7 ControlNet stage):
# VAE recon pretrain -> latent calibration -> dual-branch diffusion fit
# (warm-started) -> layout-conditioned ControlNet fit (warm-started, the
# reference's two-stage recipe README.md:215) -> predict sanity.
# Mirrors the README "from-scratch demo recipe" with epoch counts sized
# for a single-session chip budget. Run on the real chip.
set -e
cd "$(dirname "$0")/.."
export WANDB_MODE=disabled

VAE_EPOCHS=${VAE_EPOCHS:-12}
DIFF_EPOCHS=${DIFF_EPOCHS:-24}
CN_EPOCHS=${CN_EPOCHS:-6}
COMMON="--data=Matterport3D --data.data_dir=data/SyntheticRooms \
  --data.pano_height=256 --data.pers_resolution=128 --data.cam_sampler=horizon \
  --data.batch_size=4 --data.num_workers=4 --model=PanFusion \
  --model.preset=demo --model.num_views=8"

echo "=== stage 0: VAE recon pretrain ($VAE_EPOCHS epochs) ==="
WANDB_RUN_ID=synpano_vae2 python -m panfusion_tpu.cli fit $COMMON \
  --trainer.objective=vae_recon --trainer.lr=5e-4 --trainer.use_cosine=false \
  --trainer.max_epochs=$VAE_EPOCHS

echo "=== stage 0.5: latent calibration (CPU) ==="
JAX_PLATFORMS=cpu python tools/calibrate_latents.py \
  --ckpt logs/synpano_vae2/checkpoints/last --cpu | tee /tmp/calib.txt
CALIB=$(grep -o -- "--model.latent_shift=[^ ]* --model.latent_scale=[^ ]*" /tmp/calib.txt)
echo "calibration: $CALIB"

echo "=== stage 1: dual-branch diffusion fit ($DIFF_EPOCHS epochs) ==="
WANDB_RUN_ID=synpano_diff python -m panfusion_tpu.cli fit $COMMON \
  --trainer.trainable=full --trainer.lr=2e-4 \
  --trainer.max_epochs=$DIFF_EPOCHS $CALIB \
  --ckpt_path=logs/synpano_vae2/checkpoints/last

echo "=== stage 1.5: sample from the trained model ==="
WANDB_RUN_ID=synpano_diff python -m panfusion_tpu.cli predict $COMMON \
  --data.repeat_predict=1 --model.diff_timestep=50 \
  --ckpt_path=logs/synpano_diff/checkpoints/last || true

echo "=== stage 2: layout-conditioned ControlNet fit ($CN_EPOCHS epochs) ==="
WANDB_RUN_ID=synpano_cn python -m panfusion_tpu.cli fit $COMMON \
  --model.layout_cond=true --data.layout_cond_type=distance_map \
  --trainer.lr=2e-4 --trainer.max_epochs=$CN_EPOCHS $CALIB \
  --ckpt_path=logs/synpano_diff/checkpoints/last

echo "=== pipeline done ==="
