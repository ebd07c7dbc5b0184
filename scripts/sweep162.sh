#!/bin/bash
# Full-grid sweep: 18 methods x 9 datasets = 162 experiments, the
# reference's eval_all.sh grid (144 = 16 x 9; this zoo carries 18
# methods) in ONE training process per tranche + ONE eval process.
#
# Reference analog: /root/reference/eval_all.sh pays 144 cold starts.
# TPU redesign: persistent XLA compile cache + one-process amortization
# (scripts/sweep_seed.py, eval_all.py) so each (net, scale) shape
# compiles once and every repeat is a disk hit.
#
# Tranches are ordered cheap-compile-first so the bulk of the grid
# lands early; epochs are smoke budgets (the sweep artifact is the
# engine at scale, not converged PSNR - see docs/SWEEP.md and the
# converged PARITY_RUN_*.yaml evidence).
#
# Usage: bash scripts/sweep162.sh [ROOT]   (default /root/repo/.sweep162)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ROOT="${1:-$REPO/.sweep162}"
LOG="$ROOT/sweep162.log"
mkdir -p "$ROOT"
cd "$REPO"

echo "=== sweep162 start $(date +%s) ===" >> "$LOG"
T0=$(date +%s)

# Phase A: the 3-cells x 3-scales synthetic tree (offline builder,
# 12 raw tiles -> 9 datasets; deterministic from seed 0).
python - <<EOF >> "$LOG" 2>&1
import os, sys
sys.path.insert(0, '$REPO')
root = '$ROOT'
if not os.path.isdir(os.path.join(root, 'caco2')):
    from scripts.parity_run import make_raw_sessions
    from srcaco2_tpu.data import build_scripts as B
    sessions = make_raw_sessions(root, n_tiles=12)
    B.build_caco2_from_raw(sessions, root, hr_size=512, psize=128,
                           del_border=8, min_area=0.1, threshold=4.0,
                           n_test_tiles=2, n_valid_tiles=1)
    print('# tree built')
else:
    print('# tree present')
EOF
echo "=== tree done +$(( $(date +%s) - T0 ))s ===" >> "$LOG"

seed () {  # nets epochs batch eval_bsize
  python scripts/sweep_seed.py --root "$ROOT" --fast \
    --nets "$1" --epochs "$2" --batch "$3" --eval_bsize "$4" \
    >> "$LOG" 2>&1
  echo "=== tranche $1 done +$(( $(date +%s) - T0 ))s ===" >> "$LOG"
}

# T1: fast convs (compile ~4-40 s per shape)
seed SRCNN,VDSR,DFCAN,MSLapSRN,DSRSplines 12 32 4
# T2: mid transformers + recursives (compile ~16-140 s)
seed SwinIR,ENLCN,NLSN,EDSR_LIIF,CSRCNN,DRRN,OmniSR 8 32 2
# T3: heavy-compile transformers + dense-connectivity (compile ~40-260 s)
seed GRL,ProSR,ACT,DBPN,SRFBN 5 16 2
# T4: MemNet (heaviest: 290 s compile, 26 p/s; batch 8 / eval 1)
seed MemNet 3 8 1

# Phase C: ONE eval process over the whole tree (incremental + resume).
python eval_all.py --exps_root "$ROOT/exps_sweep" \
  --out "$ROOT/eval_all_results.json" >> "$LOG" 2>&1
echo "=== eval_all done +$(( $(date +%s) - T0 ))s ===" >> "$LOG"

# Phase D: Table-5-layout markdown.
python scripts/sweep_table.py --results "$ROOT/eval_all_results.json" \
  --out docs/sweep_table.md >> "$LOG" 2>&1
echo "=== sweep162 COMPLETE +$(( $(date +%s) - T0 ))s ===" >> "$LOG"
