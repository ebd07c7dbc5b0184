#!/bin/bash
# Continuation of scripts/sweep162.sh with the measured pace
# corrections:
#  - --final_eval_only: one validation per experiment (the per-epoch
#    256-square evals dominated attention-net seeds at x2);
#  - SCALE-MAJOR order (x4 -> x8 -> x2): a deadline cutoff then leaves
#    every method with its x4 row rather than some methods with
#    nothing — graceful degradation of the grid artifact;
#  - eval_bsize 1 for SwinIR (the x2 256-square eval program OOMs HLO
#    temp at bsize 2).
# Completed experiments are skipped via passed.txt, so this is safe to
# re-run from any interruption; eval_all resumes incrementally.
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

seed () {  # nets scales epochs batch eval_bsize
  python scripts/sweep_seed.py --root "$ROOT" --fast --final_eval_only \
    --nets "$1" --scales "$2" --epochs "$3" --batch "$4" \
    --eval_bsize "$5" >> "$LOG" 2>&1
  echo "=== tranche $1 x$2 done +$(( $(date +%s) - T0 ))s ===" >> "$LOG"
}

for SC in 4 8 2; do
  seed ENLCN,NLSN,EDSR_LIIF,CSRCNN,DRRN,OmniSR "$SC" 6 32 2
  seed SwinIR "$SC" 6 32 1
  seed GRL,ProSR,ACT,DBPN,SRFBN "$SC" 4 16 2
  seed MemNet "$SC" 3 8 1
done

# ONE eval process over the whole tree (incremental + resume).
python eval_all.py --exps_root "$ROOT/exps_sweep" \
  --out "$ROOT/eval_all_results.json" >> "$LOG" 2>&1
echo "=== eval_all done +$(( $(date +%s) - T0 ))s ===" >> "$LOG"

python scripts/sweep_table.py --results "$ROOT/eval_all_results.json" \
  --out docs/sweep_table.md >> "$LOG" 2>&1
echo "=== sweep162b COMPLETE +$(( $(date +%s) - T0 ))s ===" >> "$LOG"
