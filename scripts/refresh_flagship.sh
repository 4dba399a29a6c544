#!/bin/bash
# Refresh the committed flagship artifact after a (re)training run:
#   1. export latest orbax checkpoint -> bench_results/{flagship_params.npz,config.json}
#   2. restore the tuned decode defaults the trainer doesn't own
#   3. regenerate golden fixtures (CPU f32 parity mode)
#   4. run the golden + decode tests
# Usage: scripts/refresh_flagship.sh [ckpt_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
CKPT="${1:-train_ws/ckpts}"

python scripts/export_flagship.py "$CKPT"

python - <<'EOF'
import json
# The exported config carries training-run decode defaults; restore the
# measured serving defaults (avg penalty is REQUIRED for sane beam
# scores under label smoothing — docs/PERF.md).
with open("bench_results/config.json") as f:
    c = json.load(f)
c["decode"]["length_penalty"] = "avg"
c["decode"]["use_pallas"] = True
with open("bench_results/config.json", "w") as f:
    json.dump(c, f, indent=2)
print("decode config:", c["decode"])
EOF

python scripts/make_golden.py
python -m pytest tests/test_golden.py tests/test_decode.py -q
