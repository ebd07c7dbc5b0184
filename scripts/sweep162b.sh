#!/bin/bash
# Continuation of scripts/sweep162.sh with the measured pace
# corrections: --final_eval_only (one validation per experiment — the
# per-epoch 256-square evals dominated attention-net seeds at x2) and
# an eval_bsize-1 repair tranche for SwinIR x2 (the 256-square eval
# program OOMs HLO temp at bsize 2). Completed experiments are skipped
# via passed.txt, so this is safe to re-run from any interruption.
#
# Usage: bash scripts/sweep162b.sh [ROOT]
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ROOT="${1:-$REPO/.sweep162}"
LOG="$ROOT/sweep162.log"
mkdir -p "$ROOT"
cd "$REPO"
echo "=== sweep162b start $(date +%s) ===" >> "$LOG"
T0=$(date +%s)

seed () {  # nets epochs batch eval_bsize [extra args...]
  local nets="$1" epochs="$2" batch="$3" ebs="$4"; shift 4
  python scripts/sweep_seed.py --root "$ROOT" --fast --final_eval_only \
    --nets "$nets" --epochs "$epochs" --batch "$batch" \
    --eval_bsize "$ebs" "$@" >> "$LOG" 2>&1
  echo "=== tranche $nets done +$(( $(date +%s) - T0 ))s ===" >> "$LOG"
}

# T2 remainder (SwinIR non-x2 already passed; skip logic handles it)
seed ENLCN,NLSN,EDSR_LIIF,CSRCNN,DRRN,OmniSR 6 32 2
# T3: heavy-compile transformers + dense-connectivity
seed GRL,ProSR,ACT,DBPN,SRFBN 4 16 2
# T4: MemNet
seed MemNet 3 8 1
# Repair: SwinIR x2 at eval_bsize 1 (+ the x4 CELL1 guard casualty)
seed SwinIR 6 32 1

# ONE eval process over the whole tree (incremental + resume).
python eval_all.py --exps_root "$ROOT/exps_sweep" \
  --out "$ROOT/eval_all_results.json" >> "$LOG" 2>&1
echo "=== eval_all done +$(( $(date +%s) - T0 ))s ===" >> "$LOG"

python scripts/sweep_table.py --results "$ROOT/eval_all_results.json" \
  --out docs/sweep_table.md >> "$LOG" 2>&1
echo "=== sweep162b COMPLETE +$(( $(date +%s) - T0 ))s ===" >> "$LOG"
