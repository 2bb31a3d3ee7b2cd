#!/usr/bin/env bash
# 10-seed small-range evaluation protocol (ref /root/reference/cmr_test.bash
# + evaluation_cmrresult.py): run the CMRNet-protocol eval with 10 fixed
# decalibration seeds and aggregate.
#
# Usage: scripts/cmr_test.sh <root_path> <model_dir> [log_dir]
set -euo pipefail
ROOT=${1:?root_path}
MODEL=${2:?model_dir}
LOG=${3:-info_test_cmr}

for seed in 0 1 2 3 4 5 6 7 8 9; do
  python evaluate.py --dataset kd_cmr_snr --network i2pnet \
    --root_path "$ROOT" --model_dir "$MODEL" \
    --log_dir "$LOG" --seed "$seed" --tag "_seed${seed}"
done

python - "$LOG" <<'EOF'
import sys
from i2pnet_tpu.eval.analysis import aggregate_seeds

agg = aggregate_seeds(f"{sys.argv[1]}/prediction_seed*.txt")
print("== 10-seed aggregate ==")
for k, v in agg.items():
    print(f"  {k}: {v}")
EOF
