#!/usr/bin/env bash
# 10-seed small-range evaluation protocol (ref /root/reference/cmr_test.bash
# + evaluation_cmrresult.py): run the CMRNet-protocol eval with 10 fixed
# decalibration seeds and aggregate.
#
# Usage: scripts/cmr_test.sh <root_path> <model_dir> [log_dir] [test_rt_dir]
#   test_rt_dir: optional directory of the reference's per-seed pickles
#   (test_RT_seq00_10.00_2.00_<tag>.pkl, ref kitti_odometry_cmr.py:274-283);
#   without it each seed uses the deterministic generated table.
set -euo pipefail
ROOT=${1:?root_path}
MODEL=${2:?model_dir}
LOG=${3:-info_test_cmr}
RTDIR=${4:-}

for seed in 0 1 2 3 4 5 6 7 8 9; do
  EXTRA=()
  if [ -n "$RTDIR" ]; then
    TAG=$(python -c "from i2pnet_tpu.data.preprocess import cmr_seed_value; print(cmr_seed_value($seed))")
    EXTRA=(--test_rt "$RTDIR/test_RT_seq00_10.00_2.00_${TAG}.pkl")
  fi
  python evaluate.py --dataset kd_cmr_snr --network i2pnet \
    --root_path "$ROOT" --model_dir "$MODEL" \
    --log_dir "$LOG" --seed "$seed" --tag "_seed${seed}" "${EXTRA[@]}"
done

python - "$LOG" <<'EOF'
import sys
from i2pnet_tpu.eval.analysis import aggregate_seeds

agg = aggregate_seeds(f"{sys.argv[1]}/prediction_seed*.txt")
print("== 10-seed aggregate ==")
for k, v in agg.items():
    print(f"  {k}: {v}")
EOF
