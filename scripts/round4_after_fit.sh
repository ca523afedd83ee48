#!/bin/bash
# Round-4 orchestration: everything that runs on the chip after the stage-1
# v-prediction diffusion fit completes. Stages are idempotent/resumable;
# each appends to /tmp/round4_stages.log so progress is observable.
set -x
cd "$(dirname "$0")/.."
export WANDB_MODE=disabled
CALIB="--model.latent_shift=-2.1234,-2.9562,0.0481,-3.8029 --model.latent_scale=0.5598,0.4834,0.3373,0.4771"
LOG=/tmp/round4_stages.log
echo "=== round4_after_fit start $(date)" >> $LOG

# stage 1.25/1.5/2: guidance sweep -> predict panels -> ControlNet fit
CALIB="$CALIB" bash scripts/resume_synth_pipeline.sh \
  && echo "resume_synth_pipeline OK $(date)" >> $LOG \
  || echo "resume_synth_pipeline FAILED $(date)" >> $LOG

# eval suite: FAED fit -> HorizonNet fit -> layout IoU -> test generations
# -> EvalPanoGen sweep -> FAED noise-floor gate
HN_EPOCHS=20 bash scripts/run_eval_suite.sh \
  && echo "run_eval_suite OK $(date)" >> $LOG \
  || echo "run_eval_suite FAILED $(date)" >> $LOG

# layout-conditioning contrast probe (needs synpano_cn + weights/horizonnet)
python scripts/probe_layout_cond.py --ckpt logs/synpano_cn/checkpoints/last \
  --out logs/synpano_cn/contrast \
  && echo "probe_layout_cond OK $(date)" >> $LOG \
  || echo "probe_layout_cond FAILED $(date)" >> $LOG

echo "=== round4_after_fit done $(date)" >> $LOG
