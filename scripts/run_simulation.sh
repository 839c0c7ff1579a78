#!/bin/bash
# Closed-loop LIBERO evaluation queue over the four suites with the
# released per-suite patch placements (evaluation_tool equivalent).
python - "$@" <<'PY'
import sys
from roboticattack_tpu.eval.queue import run_queue, SUITE_PLACEMENTS

# patch_by_suite: edit to point at trained patches
patches = {suite: f"run/uada/latest/{suite}/patch.pt" for suite in SUITE_PLACEMENTS}
run_queue(patches, output_dir="experiments/logs", num_trials=50,
          extra_args=list(sys.argv[1:]))
PY
