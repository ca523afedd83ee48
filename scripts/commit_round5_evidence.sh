#!/bin/bash
# Force-add and commit the round-5 learning-run evidence (logs/ is
# gitignored — evidence must be `git add -f`ed; round-3 lesson). Called by
# round5_pipeline.sh as its final stage so chain-produced artifacts land
# in git even if the interactive session is gone when the chain finishes.
set -x
cd "$(dirname "$0")/.."

python - <<'EOF'
import json
p = "logs/EVIDENCE.json"
e = json.load(open(p))
for n in [
    "synpano_diff/faed_gate_test20.json",
    "synpano_cn/contrast8/contrast.json",
    "fullsize_smoke/metrics.jsonl",
    "synpano_vae/pole_pad_probe_r5.json",
]:
    import os
    if os.path.exists(os.path.join("logs", n)) and n not in e["artifacts"]:
        e["artifacts"].append(n)
json.dump(e, open(p, "w"), indent=1)
print("EVIDENCE.json updated")
EOF

git add -f \
  logs/EVIDENCE.json \
  logs/synpano_vae/metrics.jsonl logs/synpano_vae/media \
  logs/synpano_vae/pole_pad_probe_r5.json logs/synpano_vae/config.*.json \
  logs/synpano_diff/metrics.jsonl logs/synpano_diff/media \
  logs/synpano_diff/predict logs/synpano_diff/test \
  logs/synpano_diff/guidance_sweep logs/synpano_diff/faed_gate.json \
  logs/synpano_diff/faed_gate_test20.json logs/synpano_diff/summary.json \
  logs/synpano_diff/config.*.json logs/synpano_diff/test_samples.json \
  logs/synpano_cn/metrics.jsonl logs/synpano_cn/media \
  logs/synpano_cn/contrast8 logs/synpano_cn/config.*.json \
  logs/fullsize_smoke/metrics.jsonl logs/fullsize_smoke/config.*.json \
  2>/dev/null
git add -f /tmp/calib5.txt 2>/dev/null || true
cp /tmp/fused_parity.log logs/fused_parity_r5.log 2>/dev/null \
  && git add -f logs/fused_parity_r5.log
cp /tmp/bench_fused.log logs/bench_fused_r5.log 2>/dev/null \
  && git add -f logs/bench_fused_r5.log

git commit -m "Round-5 learning-run evidence: retrained VAE chain, default-config gates, 8-room contrast, layout-leg sweep, full-size smoke

Produced by scripts/round5_pipeline.sh (see config.*.json snapshots and
per-sample provenance.json stamps for the exact flags of every stage)." \
  || echo "nothing to commit"
