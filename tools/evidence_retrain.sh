#!/bin/bash
# Rebuild the trained-weights evidence (docs/PERF.md "Trained-weights
# evidence") from scratch, durably.
#
# Round 5 trained the evidence model into /tmp/evidence_run; a host reboot
# wiped /tmp and with it the checkpoint the pending chip-queue items
# (q42 DeepCache-on-trained, q50 eval refresh) need. This script re-runs
# the whole recipe with every artifact under a reboot-surviving directory
# (default /root/repo/.evidence, gitignored), and is resumable: each phase
# is skipped when its output already exists.
#
# Usage:  bash tools/evidence_retrain.sh           # all phases
#         EV_STEPS=20000 EV_ROOT=... bash tools/evidence_retrain.sh
#
# Phases (serialize with the chip queue — one chip, one CPU core):
#   1. dataset   tools/make_synth_dataset.py -> $EV_ROOT/synth_train
#                (CPU-only, ~20-40 min on this 1-core box)
#   2. train     train.loop 20k steps, bs 8, 256px crops (~3.5 h on v5e-1)
#   3. eval      tools/evidence_eval.py on the best_loss checkpoint
# The precision/DeepCache ladders on the result stay in tools/chip_queue.sh
# (q42/q50) so a relay death mid-ladder resumes from the queue, not here.
set -eu
cd "$(dirname "$0")/.."
EV_ROOT=${EV_ROOT:-/root/repo/.evidence}
# 60000 since round 3: the 20k draws sit on the variance edge (one wins
# denoise, one loses all three — docs/PERF.md); q44/q51 gate at >=40k.
# Round 4 note: after a reboot wiped .evidence (dataset + the 20k
# partial), the round-4 relaunch used EV_STEPS=40000 — the gate minimum —
# because 60k (~10.5h at ~1.6 steps/s) cannot finish inside one round's
# wall clock AND leave chip time for q44/q51 themselves. Extend an
# existing >=40k run to 60k by re-running with EV_STEPS=60000 after
# removing .evidence/run/.train_done (training auto-resumes).
EV_STEPS=${EV_STEPS:-60000}
DATA="$EV_ROOT/synth_train"
RUN="$EV_ROOT/run"
CKPT_BEST="$RUN/evidence_dim64_synth_best_loss"
mkdir -p "$EV_ROOT"

if [ -f "$DATA/.done" ]; then
    echo "[evidence] dataset: already generated, skipping"
else
    echo "[evidence] dataset: generating 1500x320px procedural images..."
    python tools/make_synth_dataset.py "$DATA" 1500 320 0
    touch "$DATA/.done"
fi

if [ -f "$RUN/.train_done" ]; then
    echo "[evidence] train: already done, skipping"
else
    echo "[evidence] train: $EV_STEPS steps (auto-resumes from the last save)..."
    python -m srgd_tpu.train.loop -c conf/trained_evidence_dim64_synth.yaml \
        --data_dir "$DATA" --out_dir "$RUN" \
        --steps "$EV_STEPS" --log_every 200 --save_every 1000
    # train.loop exits 75 on a graceful early stop, but verify the saved
    # step anyway so a partially trained checkpoint can never be marked
    # complete (a SIGKILL-ed stint leaves the old marker-less state)
    python - "$RUN/evidence_dim64_synth" "$EV_STEPS" <<'PYEOF'
import sys
from srgd_tpu.checkpoint.io import restore_params
step = int(restore_params(sys.argv[1])['step'])
need = int(sys.argv[2])
print(f'[evidence] train: checkpoint step {step} (need >= {need})')
sys.exit(0 if step >= need else 1)
PYEOF
    touch "$RUN/.train_done"
fi

if [ -f "$EV_ROOT/eval.log" ]; then
    echo "[evidence] eval: already done ($EV_ROOT/eval.log), skipping"
else
    echo "[evidence] eval: scoring $CKPT_BEST ..."
    EV_CKPT="$CKPT_BEST" python tools/evidence_eval.py \
        2>&1 | tee "$EV_ROOT/eval.log"
fi

echo "[evidence] complete; now run: bash tools/chip_queue.sh  (q42/q50)"
