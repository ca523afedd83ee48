#!/bin/bash
# Score saved test-split generations (reference scripts/eval.sh).
python -m panfusion_tpu.cli test --data=Matterport3D --model=EvalPanoGen "$@"
