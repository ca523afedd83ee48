#!/bin/bash
# Round-5 learning/evidence pipeline (VERDICT r4 Next #2/#3/#4/#6):
#   A. VAE: resume the 600-step stage-0 pretrain to ~10k steps (the 0.43x
#      decoder ceiling caps everything downstream)
#   B. recalibrate latents from the retrained VAE
#   C. diffusion: FRESH fit (old weights live in the old latent frame);
#      round-4 run archived at logs/synpano_diff_r4
#   D. ControlNet stage, 3x longer than round 4
#   E. samples at the DEFAULT demo config (guidance auto=2) via the CLI
#      (provenance stamped), FAED gates in the new provenance format
#   F. 8-room / 64-pair layout contrast with paired statistics
#   G. eval sweep WITH the manhattan-layout leg + trained RoomNet FID slot
# Stages are idempotent-ish; STAGE=<letter> starts there.
set -e
cd "$(dirname "$0")/.."
export WANDB_MODE=disabled
LOG=/tmp/round5_stages.log
STAGE=${STAGE:-A}
VAE_EPOCHS=${VAE_EPOCHS:-200}
DIFF_EPOCHS=${DIFF_EPOCHS:-400}
CN_EPOCHS=${CN_EPOCHS:-120}
COMMON="--data=Matterport3D --data.data_dir=data/SyntheticRooms \
  --data.pano_height=256 --data.pers_resolution=128 --data.cam_sampler=horizon \
  --data.batch_size=4 --data.num_workers=4 --model=PanFusion \
  --model.preset=demo --model.num_views=8"
echo "=== round5 pipeline start stage=$STAGE $(date)" >> $LOG

stage_le() { [[ "$STAGE" < "$1" || "$STAGE" == "$1" ]]; }

if stage_le A; then
  echo "=== A: VAE resume-retrain to $VAE_EPOCHS epochs ==="
  WANDB_RUN_ID=synpano_vae python -m panfusion_tpu.cli fit $COMMON \
    --trainer.objective=vae_recon --trainer.lr=5e-4 --trainer.use_cosine=false \
    --trainer.max_epochs=$VAE_EPOCHS
  echo "A done $(date)" >> $LOG
  # re-probe the pole-pad hypothesis against the better-trained decoder
  python scripts/probe_pole_pad.py --cpu --n 4 \
    --out logs/synpano_vae/pole_pad_probe_r5.json || true
fi

if stage_le B; then
  echo "=== B: latent recalibration ==="
  python tools/calibrate_latents.py --cpu \
    --ckpt logs/synpano_vae/checkpoints/last | tee /tmp/calib5.txt
  grep -o -- "--model.latent_shift=[^ ]* --model.latent_scale=[^ ]*" \
    /tmp/calib5.txt > /tmp/calib5_flags.txt
  echo "B done: $(cat /tmp/calib5_flags.txt)" >> $LOG
fi
CALIB=${CALIB:-$(cat /tmp/calib5_flags.txt 2>/dev/null || true)}

if stage_le C; then
  echo "=== C: fresh diffusion fit ($DIFF_EPOCHS epochs) calib=$CALIB ==="
  # ARCHIVE-BY-COPY, then remove only what must go for a fresh fit (the
  # old-latent-frame checkpoint and the curve). Never `mv` the run dir:
  # committed evidence paths must not sit deleted in the worktree if the
  # chain dies mid-stage (the round-end auto-commit would record the
  # deletions). predict/test clear later, right before regeneration.
  if [ -e logs/synpano_diff ] && [ ! -e logs/synpano_diff_r4 ]; then
    cp -r logs/synpano_diff logs/synpano_diff_r4
    rm -rf logs/synpano_diff/checkpoints
    rm -f logs/synpano_diff/metrics.jsonl
  fi
  WANDB_RUN_ID=synpano_diff python -m panfusion_tpu.cli fit $COMMON \
    --trainer.trainable=full_text --trainer.lr=2e-4 \
    --trainer.max_epochs=$DIFF_EPOCHS --trainer.val_every_n_epochs=10 $CALIB \
    --ckpt_path=logs/synpano_vae/checkpoints/last
  echo "C done $(date)" >> $LOG
fi

if stage_le D; then
  echo "=== D: ControlNet stage ($CN_EPOCHS epochs) ==="
  if [ -e logs/synpano_cn ] && [ ! -e logs/synpano_cn_r4 ]; then
    cp -r logs/synpano_cn logs/synpano_cn_r4
    rm -rf logs/synpano_cn/checkpoints
    rm -f logs/synpano_cn/metrics.jsonl
  fi
  WANDB_RUN_ID=synpano_cn python -m panfusion_tpu.cli fit $COMMON \
    --model.layout_cond=true --data.layout_cond_type=distance_map \
    --trainer.lr=2e-4 --trainer.max_epochs=$CN_EPOCHS \
    --trainer.val_every_n_epochs=10 $CALIB \
    --ckpt_path=logs/synpano_diff/checkpoints/last
  echo "D done $(date)" >> $LOG
fi

if stage_le E; then
  echo "=== E: samples at DEFAULT config + gates ==="
  python scripts/probe_guidance.py --ckpt logs/synpano_diff/checkpoints/last \
    --out logs/synpano_diff/guidance_sweep --scales 1,2,3,5,9 || true
  # clear stale samples immediately before regeneration (predict/test skip
  # idempotently on existing prompt.txt)
  rm -rf logs/synpano_diff/predict logs/synpano_diff/test
  WANDB_RUN_ID=synpano_diff python -m panfusion_tpu.cli predict $COMMON \
    --data.batch_size=1 --data.repeat_predict=1 --data.predict_limit=6 \
    --model.diff_timestep=50 \
    --ckpt_path=logs/synpano_diff/checkpoints/last
  WANDB_RUN_ID=synpano_diff python -m panfusion_tpu.cli test $COMMON \
    --data.batch_size=1 --model.diff_timestep=50 \
    --ckpt_path=logs/synpano_diff/checkpoints/last
  python tools/faed_distance.py \
    --gt_glob 'data/SyntheticRooms/*/matterport_stitched_images/*.png' \
    --gen_glob 'logs/synpano_diff/predict/*/pano.jpg' \
    --ckpt weights/faed --height 256 --noise_floor \
    --out logs/synpano_diff/faed_gate.json
  python tools/faed_distance.py \
    --gt_glob 'data/SyntheticRooms/*/matterport_stitched_images/*.png' \
    --gen_glob 'logs/synpano_diff/test/*/pano.png' \
    --ckpt weights/faed --height 256 --noise_floor \
    --out logs/synpano_diff/faed_gate_test20.json
  echo "E done $(date)" >> $LOG
fi

if stage_le F; then
  echo "=== F: 8-room layout contrast ==="
  python scripts/probe_layout_cond.py --ckpt logs/synpano_cn/checkpoints/last \
    --out logs/synpano_cn/contrast8 \
    --rooms room0200_v0,room0201_v0,room0202_v0,room0203_v0,room0204_v0,room0205_v0,room0206_v0,room0207_v0
  echo "F done $(date)" >> $LOG
fi

if stage_le G; then
  echo "=== G: eval sweep (layout leg ON, RoomNet FID slot) ==="
  WANDB_RUN_ID=synpano_diff python -m panfusion_tpu.cli test --model=EvalPanoGen \
    --data=Matterport3D --data.data_dir=data/SyntheticRooms --data.num_workers=4 \
    --data.layout_anno_dir=data/SyntheticRooms/annotations \
    --data.pano_height=256 --data.pers_resolution=128 --data.cam_sampler=horizon \
    --data.manhattan_layout=true
  echo "G done $(date)" >> $LOG
fi

if stage_le H; then
  echo "=== H: full-size train smoke (512x1024, 20 views, SD2 dims) ==="
  # VERDICT r4 missing #3: show the FULL-SCALE train loop learning (loss
  # decreasing over ~1.6k steps at the measured ~0.43 s/step), not just
  # stepping. Random-init SD2 towers (no weights exist offline), LoRA +
  # WarpAttn trainables — the reference's own training stage
  # (README.md:199 trains 512x1024 + 20 views).
  WANDB_RUN_ID=fullsize_smoke python -m panfusion_tpu.cli fit \
    --data=Matterport3D --data.data_dir=data/SyntheticRooms \
    --data.pano_height=512 --data.pers_resolution=256 \
    --data.batch_size=1 --data.num_workers=4 --data.cam_sampler=icosahedron \
    --model=PanFusion --trainer.lr=1e-4 \
    --trainer.max_epochs=8 --trainer.val_every_n_epochs=100
  echo "H done $(date)" >> $LOG
fi

if stage_le I; then
  # evidence lives under gitignored logs/ — self-commit so a chain that
  # finishes unattended still lands its artifacts in git
  bash scripts/commit_round5_evidence.sh >> $LOG 2>&1 || true
fi

echo "=== round5 pipeline done $(date)" >> $LOG
