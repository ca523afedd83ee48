#!/bin/bash
# From-scratch learning demonstration on the procedural synthetic-rooms
# dataset: VAE recon pretrain -> latent calibration -> dual-branch diffusion
# fit (warm-started, text tower trainable) -> guidance-scale sweep ->
# predict panels -> layout-conditioned ControlNet fit (warm-started, the
# reference's two-stage recipe README.md:215).
#
# Round-3 sizing (VERDICT round 2, Next #1): stage 1 runs ~20k steps —
# round 2's 1,200 steps converged the eps-loss but never materialized a
# denoiser prior (every sample decoded to noise). The text tower now trains
# too (--trainer.trainable=full_text): from scratch there is no pretrained
# CLIP, and conditioning through a frozen RANDOM encoder starves the
# prompt signal. Run on the real chip.
set -e
cd "$(dirname "$0")/.."
export WANDB_MODE=disabled

VAE_EPOCHS=${VAE_EPOCHS:-12}
DIFF_EPOCHS=${DIFF_EPOCHS:-200}
CN_EPOCHS=${CN_EPOCHS:-40}
COMMON="--data=Matterport3D --data.data_dir=data/SyntheticRooms \
  --data.pano_height=256 --data.pers_resolution=128 --data.cam_sampler=horizon \
  --data.batch_size=4 --data.num_workers=4 --model=PanFusion \
  --model.preset=demo --model.num_views=8"

echo "=== stage 0: VAE recon pretrain ($VAE_EPOCHS epochs) ==="
WANDB_RUN_ID=synpano_vae python -m panfusion_tpu.cli fit $COMMON \
  --trainer.objective=vae_recon --trainer.lr=5e-4 --trainer.use_cosine=false \
  --trainer.max_epochs=$VAE_EPOCHS

echo "=== stage 0.5: latent calibration (CPU) ==="
JAX_PLATFORMS=cpu python tools/calibrate_latents.py \
  --ckpt logs/synpano_vae/checkpoints/last --cpu | tee /tmp/calib.txt
CALIB=$(grep -o -- "--model.latent_shift=[^ ]* --model.latent_scale=[^ ]*" /tmp/calib.txt)
echo "calibration: $CALIB"

echo "=== stage 1: dual-branch diffusion fit ($DIFF_EPOCHS epochs) ==="
WANDB_RUN_ID=synpano_diff python -m panfusion_tpu.cli fit $COMMON \
  --trainer.trainable=full_text --trainer.lr=2e-4 \
  --trainer.max_epochs=$DIFF_EPOCHS --trainer.val_every_n_epochs=10 $CALIB \
  --ckpt_path=logs/synpano_vae/checkpoints/last

echo "=== stage 1.25: guidance-scale sweep ==="
python scripts/probe_guidance.py --ckpt logs/synpano_diff/checkpoints/last \
  --out logs/synpano_diff/guidance_sweep --scales 1,2,3,5,9 || true

echo "=== stage 1.5: predict panels from the trained model ==="
WANDB_RUN_ID=synpano_diff python -m panfusion_tpu.cli predict $COMMON \
  --data.batch_size=1 --data.repeat_predict=1 --data.predict_limit=6 \
  --model.diff_timestep=50 \
  --ckpt_path=logs/synpano_diff/checkpoints/last || true

echo "=== stage 2: layout-conditioned ControlNet fit ($CN_EPOCHS epochs) ==="
WANDB_RUN_ID=synpano_cn python -m panfusion_tpu.cli fit $COMMON \
  --model.layout_cond=true --data.layout_cond_type=distance_map \
  --trainer.lr=2e-4 --trainer.max_epochs=$CN_EPOCHS \
  --trainer.val_every_n_epochs=10 $CALIB \
  --ckpt_path=logs/synpano_diff/checkpoints/last

echo "=== pipeline done ==="
