#!/bin/bash
# Prioritized TPU measurement queue (run the moment the relay is alive).
#
# The TPU relay on this box dies unpredictably and is unrecoverable from
# inside the VM, so chip-time measurements must be capture-it-now. This
# script runs the currently-outstanding measurements in priority order,
# logging each to $CHIPQ_DIR/<name>.log and marking completion with a
# .done file so a re-run resumes where it left off.
#
# Usage:  bash tools/chip_queue.sh            # run everything outstanding
#         CHIPQ_ONLY=q30 bash tools/chip_queue.sh   # run one item
#         CHIPQ_FORCE=1 ... # re-measure items already recorded in docs
#
# Measured-and-recorded items (q10-q40 per-time calibration ladders,
# q32-q39 DeepCache, q42/q50 trained-weights ladders/eval, q60 bench
# reconfirm, q70 percentile cal, q80-q82 cold start, and — since round 4
# — q44/q46/q47 DeepCache-combination ladders, q51/q52/q53 trained-eval
# incl. the full 60k train + wide eval: ALL in docs/PERF.md) are skipped
# by default: their numbers survive in the docs even though reboots keep
# wiping the markers/artifacts. Set CHIPQ_FORCE=1 to re-measure them.
# Round-5 update: q90 (CFG ladder), q91 (compile cache), q95
# (fast-profile bench), q94 (convert->serve on-device) and q92a/b/c (the
# 12k-step dim-128 trained re-gate: int8/dc OUT of bf16's band, eta
# verdicts reproduce) are ALL MEASURED and recorded in docs/PERF.md —
# recorded_item so a marker-wiping reboot doesn't re-burn them.
# OUTSTANDING items, in run order:
#   q93  a/b: second-draw dim-64 retrain to 40k + eta few-step ladder —
#        two-draw robustness for the eta-1.0 serving default (r4 #7;
#        partial steps banked in .evidence/run_draw2, auto-resumes)
#   q92-ext: extend .evidence/run128 past 12k to a converged step count
#        and re-run q92b/c there (the 12k re-gate may be undertrained)
set -u
cd "$(dirname "$0")/.."
# .chipq (gitignored, under the repo) survives reboots; /tmp does not.
CHIPQ_DIR=${CHIPQ_DIR:-.chipq}
export CHIPQ_DIR   # q91's bash -c child resolves "$CHIPQ_DIR" itself
mkdir -p "$CHIPQ_DIR"

echo "[chipq] preflight: checking the TPU relay (<=120s)..."
if ! timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'; print('[chipq] devices:', jax.devices())"; then
    echo "[chipq] relay is DEAD (jax.devices() hung or returned CPU) — aborting."
    exit 1
fi

# Same contract as run_item, for items whose numbers already live in
# docs/PERF.md: skipped unless explicitly re-requested (CHIPQ_FORCE=1 or
# CHIPQ_ONLY=<name>), so a marker-wiping reboot doesn't burn chip time
# re-answering settled questions.
recorded_item() {
    # CHIPQ_ONLY matches by prefix (CHIPQ_ONLY=q30 runs q30_bench_pertime256)
    if [ -n "${CHIPQ_ONLY:-}" ]; then
        case "$1" in
            "${CHIPQ_ONLY}"*) run_item "$@" ;;
        esac
        return
    fi
    if [ -n "${CHIPQ_FORCE:-}" ]; then
        run_item "$@"
        return
    fi
    echo "[chipq] $1: recorded in docs/PERF.md, skipping (CHIPQ_FORCE=1 re-measures)"
}

run_item() {
    local name="$1" tmo="$2"; shift 2
    # CHIPQ_FORCE=1 re-measures even past a .done marker (header contract)
    if [ -z "${CHIPQ_FORCE:-}" ] && [ -e "$CHIPQ_DIR/$name.done" ]; then
        echo "[chipq] $name: already done, skipping"
        return 0
    fi
    if [ -n "${CHIPQ_ONLY:-}" ]; then
        case "$name" in
            "${CHIPQ_ONLY}"*) ;;
            *) echo "[chipq] $name: skipped (CHIPQ_ONLY=${CHIPQ_ONLY})"; return 0 ;;
        esac
    fi
    echo "[chipq] $name: running (timeout ${tmo}s), log $CHIPQ_DIR/$name.log"
    if timeout "$tmo" "$@" > "$CHIPQ_DIR/$name.log" 2>&1; then
        touch "$CHIPQ_DIR/$name.done"
        echo "[chipq] $name: OK"
        tail -8 "$CHIPQ_DIR/$name.log" | sed 's/^/    /'
    else
        echo "[chipq] $name: FAILED (rc=$?) — tail:"
        tail -15 "$CHIPQ_DIR/$name.log" | sed 's/^/    /'
    fi
}

# q10: flagship >=256ch per-time quality ladder, default 0/1 draw
recorded_item q10_ladder256 3600 env QP_DIM=128 QP_LR=128 QP_STEPS=50 \
    QP_QMIN=256 QP_MODES='float32,w8a8dyn,w8a8,w8a8t' \
    python tools/quality_probe.py

# q20: the bad draw (dynamic measured 43.81 dB at >=256ch here)
recorded_item q20_ladder256_badseed 3600 env QP_DIM=128 QP_LR=128 QP_STEPS=50 \
    QP_QMIN=256 QP_WSEED=42 QP_CSEED=43 \
    QP_MODES='float32,w8a8dyn,w8a8,w8a8t' \
    python tools/quality_probe.py

# q30: per-time throughput at >=256ch coverage (calibration cached so a
# queue re-run after a relay death skips the ~3.5 min calibrate phase)
recorded_item q30_bench_pertime256 2400 env BENCH_QUANT=w8a8calt \
    BENCH_QUANT_MIN_CH=256 BENCH_CAL_CACHE="$CHIPQ_DIR/cal_calt256.npz" \
    python bench.py

# q32-q36: DeepCache throughput — how much does skipping the deep half
# every Nth step buy end-to-end? (interval N, split stage D; bf16+int8-512
# default precision, calibration shared via the cal cache)
recorded_item q32_bench_dc2 2400 env BENCH_DEEPCACHE=2:2 \
    BENCH_CAL_CACHE="$CHIPQ_DIR/cal_cal512.npz" python bench.py
recorded_item q34_bench_dc3 2400 env BENCH_DEEPCACHE=3:2 \
    BENCH_CAL_CACHE="$CHIPQ_DIR/cal_cal512.npz" python bench.py
recorded_item q36_bench_dc5 2400 env BENCH_DEEPCACHE=5:2 \
    BENCH_CAL_CACHE="$CHIPQ_DIR/cal_cal512.npz" python bench.py
recorded_item q38_bench_dc3d3 2400 env BENCH_DEEPCACHE=3:3 \
    BENCH_CAL_CACHE="$CHIPQ_DIR/cal_cal512.npz" python bench.py

# q39: DeepCache quality ladder at flagship shapes (all vs fp32 exact;
# bf16 exact is the reference point for the dc-only delta)
recorded_item q39_ladder_deepcache 4800 env QP_DIM=128 QP_LR=128 QP_STEPS=50 \
    QP_MODES='float32,bfloat16,bfloat16+dc2.2,bfloat16+dc3.2,bfloat16+dc5.2,bfloat16+dc3.3' \
    QP_SAVE_DIR="$CHIPQ_DIR/q39_canvases" \
    python tools/quality_probe.py

# Trained evidence checkpoint: the durable retrain location first
# (tools/evidence_retrain.sh — /tmp gets wiped on reboot), legacy /tmp after.
EV_CKPT_DIR=""
for d in "${EV_ROOT:-/root/repo/.evidence}/run/evidence_dim64_synth_best_loss" \
         /tmp/evidence_run/evidence_dim64_synth_best_loss; do
    [ -d "$d" ] && EV_CKPT_DIR="$d" && break
done

# q42: DeepCache ladder on TRAINED weights (random weights don't contract
# approximation error — this is the quality claim that matters).
# RESOLVED round 7 (docs/PERF.md "Quality ladder, TRAINED weights"):
# dc2:2 costs -0.97 dB vs bf16 -> promoted to bench default; dc5:2 pinned
# quality-degraded. Re-measures only with CHIPQ_FORCE=1.
if [ -n "$EV_CKPT_DIR" ]; then
    recorded_item q42_ladder_dc_trained 4800 env QP_DIM=64 QP_LR=128 QP_STEPS=50 \
        QP_CKPT="$EV_CKPT_DIR" \
        QP_MODES='float32,bfloat16,bfloat16+dc2.2,bfloat16+dc3.2,bfloat16+dc5.2' \
        QP_SAVE_DIR="$CHIPQ_DIR/q42_canvases" \
        python tools/quality_probe.py
else
    echo "[chipq] q42: trained checkpoint missing (run tools/evidence_retrain.sh) — skipping"
fi

# Long-train gate: q44/q51 only make sense on a checkpoint trained well
# past the 20k-step r5/r7 evidence runs (round 3 restarted the pipeline
# at --steps 60000; a partially-resumed run must not masquerade as the
# long-train evidence — see ADVICE r2 on .train_done).
# ADVICE r3: the gate must be cheap, CPU-only, bounded, and loud on
# failure — a hung/broken restore must read as "gate broken" in the log,
# not silently as "not trained enough".
EV_LONG=""
if [ -n "$EV_CKPT_DIR" ]; then
    # read TRAINING PROGRESS from the rolling checkpoint, not the
    # best_loss copy the evals use — the copy's 'step' is frozen at its
    # last improvement (e.g. 38000 on a 40000-step run), which wrongly
    # closed the gate in round 4
    EV_LONG=$(timeout 300 python - "${EV_CKPT_DIR%_best_loss}" <<'PYEOF'
import sys
import jax
jax.config.update('jax_platforms', 'cpu')  # ambient JAX_PLATFORMS=axon
try:
    from srgd_tpu.checkpoint.io import restore_params
    step = int(restore_params(sys.argv[1])['step'])
    print(f'[chipq] long-train gate: checkpoint step {step}', file=sys.stderr)
except Exception as e:
    print(f'[chipq] long-train gate BROKEN (treating as not-ready): '
          f'{type(e).__name__}: {e}', file=sys.stderr)
    step = 0
print('yes' if step >= 40000 else '')
PYEOF
) || echo "[chipq] long-train gate timed out/failed (rc=$?) — treating as not-ready" >&2
fi

############################################################
# ROUND 5 (VERDICT r4) — live items, highest priority first
############################################################

# q91: persistent compilation cache cold/warm pair (VERDICT r4 #2).
# BENCH_r04 spent 313.8 s in compile+first vs 2.9 s measuring; the test
# suite's .jax_cache recipe was never tried against the axon relay. A
# DEDICATED cache dir is wiped first so "cold" is honest; the second run
# is a fresh process against the now-warm cache. Compare the two
# 'compile+first' phase lines. BENCH_PROFILE= keeps the runs comparable
# with BENCH_r04 (single-metric).
recorded_item q91_compile_cache_coldwarm 7200 bash -c '
    rm -rf "$CHIPQ_DIR/q91_cache"
    echo "=== COLD (empty compile cache) ==="
    SRGD_COMPILE_CACHE="$CHIPQ_DIR/q91_cache" BENCH_PROFILE= \
        BENCH_CAL_CACHE="$CHIPQ_DIR/cal_cal512.npz" python bench.py || exit 1
    echo "=== WARM (fresh process, same cache dir) ==="
    SRGD_COMPILE_CACHE="$CHIPQ_DIR/q91_cache" BENCH_PROFILE= \
        BENCH_CAL_CACHE="$CHIPQ_DIR/cal_cal512.npz" python bench.py
'

# q90: classifier-free guidance utility ladder on the 60k checkpoint
# (VERDICT r4 #1 — the reference's NAMESAKE mechanism, model.py:3138-3158,
# has golden-pinned math but zero trained-weights utility evidence).
# Ladders class_cond_scale {1.5,2,3} (+ 2@warmup10) and cond_scale
# {1.5,2} at the validated eta1-ddim-50 profile on all three classes,
# with wrong-label controls at scale 1 and 2. Defaults overridden to all
# 3 classes so the per-class table covers the winning class too.
if [ -n "$EV_LONG" ]; then
    recorded_item q90_cfg_ladder 12600 env EV_CKPT="$EV_CKPT_DIR" \
        EV_IMAGES=0 EV_LADDER_CLASSES='' EV_CFG=1 EV_CFG_CLASSES='0,1,2' \
        SRGD_COMPILE_CACHE="$CHIPQ_DIR/q91_cache" \
        python tools/evidence_eval.py
else
    echo "[chipq] q90: long-train checkpoint not ready — skipping"
fi

# q95: the round-5 bench contract — headline + the validated fast-profile
# second metric (eta1-ddim25, VERDICT r4 #4) in one run, exactly what the
# driver will execute at round end. Also warms the default .jax_cache.
recorded_item q95_bench_fast_profile 7200 env \
    BENCH_CAL_CACHE="$CHIPQ_DIR/cal_cal512.npz" python bench.py

# q92a: train the FLAGSHIP-WIDTH dim-128 net on the evidence pipeline
# (VERDICT r4 #3: every trained gate is dim-64; DeepCache proved
# trained-vs-random FLIPS verdicts). 12k steps ~= the dim-64 draws'
# variance-edge budget; auto-resumes, so a timeout/relay death retries
# from the last save on the next queue pass.
RUN128="${EV_ROOT:-/root/repo/.evidence}/run128"
CKPT128="$RUN128/evidence_dim128_synth_best_loss"
if [ -d "${EV_ROOT:-/root/repo/.evidence}/synth_train" ]; then
    recorded_item q92a_train_dim128 12600 env TRAIN_MILESTONE_EVERY=6000 \
        python -m srgd_tpu.train.loop \
        -c conf/trained_evidence_dim128_synth.yaml \
        --data_dir "${EV_ROOT:-/root/repo/.evidence}/synth_train" \
        --out_dir "$RUN128" \
        --steps 12000 --log_every 200 --save_every 1000
else
    echo "[chipq] q92a: dataset missing (tools/evidence_retrain.sh phase 1) — skipping"
fi

# q92b: re-gate the ship defaults on trained dim-128 features — bf16,
# int8cal-deep512 (w8a8 at QP_QMIN=512), dc2:2 on both, dc3:2 — all vs
# fp32 on the SAME trained weights.
if [ -d "$CKPT128" ]; then
    recorded_item q92b_ladder_dim128_trained 10800 env \
        QP_CONF=conf/trained_evidence_dim128_synth.yaml \
        QP_CKPT="$CKPT128" QP_LR=128 QP_STEPS=50 QP_QMIN=512 \
        QP_MODES='float32,bfloat16,w8a8,w8a8+dc2.2,bfloat16+dc2.2,bfloat16+dc3.2' \
        QP_SAVE_DIR="$CHIPQ_DIR/q92_canvases" \
        python tools/quality_probe.py
    # q92c: few-step eta ladder + SR-vs-input per class at dim 128
    recorded_item q92c_eta_ladder_dim128 12600 env EV_CKPT="$CKPT128" \
        EV_CONF=conf/trained_evidence_dim128_synth.yaml \
        EV_IMAGES=2 EV_LADDER_IMAGES=1 \
        EV_LADDER_MODES='ddim-25,dpmpp-25,ddim:1.0-50,ddim:1.0-25' \
        python tools/evidence_eval.py
else
    echo "[chipq] q92b/c: dim-128 trained checkpoint not ready — skipping"
fi

# q93a: SECOND-DRAW dim-64 retrain (seed 1) to the 40k gate minimum
# (VERDICT r4 #7: the eta-1.0 serving default is load-bearing on one
# training draw). Auto-resumes like q92a.
RUN2="${EV_ROOT:-/root/repo/.evidence}/run_draw2"
CKPT2="$RUN2/evidence_dim64_draw2_best_loss"
if [ -d "${EV_ROOT:-/root/repo/.evidence}/synth_train" ]; then
    run_item q93a_train_draw2 18000 \
        python -m srgd_tpu.train.loop \
        -c conf/trained_evidence_dim64_draw2.yaml \
        --data_dir "${EV_ROOT:-/root/repo/.evidence}/synth_train" \
        --out_dir "$RUN2" \
        --steps 40000 --log_every 200 --save_every 1000
fi

# q93b: the q51-style eta few-step ladder on the second draw
if [ -d "$CKPT2" ]; then
    run_item q93b_eta_ladder_draw2 10800 env EV_CKPT="$CKPT2" \
        EV_IMAGES=0 EV_LADDER_IMAGES=2 \
        EV_LADDER_MODES='ddim-25,dpmpp-25,ddim:1.0-50,ddim:1.0-25' \
        python tools/evidence_eval.py
else
    echo "[chipq] q93b: second-draw checkpoint not ready — skipping"
fi

# q94: synthesized flagship ckpt through the serve daemon ON-DEVICE
recorded_item q94_serve_flagship_ckpt 3600 bash tools/serve_ckpt_probe.sh

# q44: DeepCache + few-step ladder refresh on the LONG-trained checkpoint
# (does the q42 dc2:2 verdict and the q50 eta1-ddim25 winner hold as the
# model converges further?)
# q51 RUNS FIRST among the long-train items — it is the two-rounds-pending
# headline (VERDICT r2 #4: does SR beat its degraded input on >=2 of 3
# classes?), and since round 4 evidence_eval also carries the multi-class
# multi-canvas few-step ladder (VERDICT r3 #3) whose summary table is the
# time-to-quality evidence for the validated serving profile.
if [ -n "$EV_LONG" ]; then
    recorded_item q51_evidence_eval_longtrain 10800 env \
        EV_CKPT="$EV_CKPT_DIR" \
        python tools/evidence_eval.py
else
    echo "[chipq] q51: long-train checkpoint (>=40k steps) not ready — skipping"
fi

# q44: DeepCache ladder on the LONG-trained checkpoint (does the q42
# dc2:2 verdict hold as the model converges?), now including two
# non-uniform refresh schedules (VERDICT r3 #5 — refresh densest at low
# noise where features drift most; refresh_mask syntax, walked in
# sampling order high->low noise). Cost-matched pairs at 50 exec steps:
#   dc3.2@0.5x5/0.5x2 = 18 refreshes ~ uniform dc3.2's 17
#   dc5.2@0.7x9/0.3x2 = 12 refreshes, between dc3 (17) and dc5 (10)
if [ -n "$EV_LONG" ]; then
    recorded_item q44_ladder_dc_longtrain 7200 env QP_DIM=64 QP_LR=128 QP_STEPS=50 \
        QP_CKPT="$EV_CKPT_DIR" \
        QP_MODES='float32,bfloat16,bfloat16+dc2.2,bfloat16+dc3.2,bfloat16+dc3.2@0.5x5/0.5x2,bfloat16+dc5.2@0.7x9/0.3x2' \
        QP_SAVE_DIR="$CHIPQ_DIR/q44_canvases" \
        python tools/quality_probe.py
else
    echo "[chipq] q44: long-train checkpoint (>=40k steps) not ready — skipping"
fi

# q47: dc2:2 on top of >=256ch int8 — the unmeasured combination from
# VERDICT r3 weak #2. Throughput first (bench, dynamic+smooth a=0.75:
# the seed-robust >=256ch mode per docs/PERF.md) ...
recorded_item q47_bench_dc2_256dynsmooth 2400 env BENCH_DEEPCACHE=2:2 \
    BENCH_QUANT=w8a8 BENCH_QUANT_MIN_CH=256 BENCH_QUANT_SMOOTH=0.75 \
    python bench.py
# ... and quality on the trained checkpoint (gated: random weights don't
# contract approximation error — the q42 lesson)
if [ -n "$EV_LONG" ]; then
    recorded_item q47_ladder_dc2_256dynsmooth 4800 env QP_DIM=64 QP_LR=128 \
        QP_STEPS=50 QP_CKPT="$EV_CKPT_DIR" QP_QMIN=256 \
        QP_MODES='float32,bfloat16,w8a8dyn@0.75,w8a8dyn@0.75+dc2.2' \
        QP_SAVE_DIR="$CHIPQ_DIR/q47_canvases" \
        python tools/quality_probe.py
fi

# q46: non-uniform schedule throughput confirmations on the int8-deep
# default (the quality side rides in q44)
recorded_item q46_bench_dc3sched 2400 env 'BENCH_DEEPCACHE=3:2:0.5x5/0.5x2' \
    BENCH_CAL_CACHE="$CHIPQ_DIR/cal_cal512.npz" python bench.py
recorded_item q46_bench_dc5sched 2400 env 'BENCH_DEEPCACHE=5:2:0.7x9/0.3x2' \
    BENCH_CAL_CACHE="$CHIPQ_DIR/cal_cal512.npz" python bench.py

# q53: wider-n eval on the 60k checkpoint — the round-4 "wins every
# canvas whose input is below ~28.5 dB" break-even finding rests on 6
# canvases; 5/class for part 1 and 4/class for the ladder firms it up.
# Gated on the rolling checkpoint reaching 60k (the round-4 extension).
EV_60K=""
if [ -n "$EV_CKPT_DIR" ]; then
    EV_60K=$(timeout 300 python - "${EV_CKPT_DIR%_best_loss}" <<'PYEOF'
import sys
import jax
jax.config.update('jax_platforms', 'cpu')
try:
    from srgd_tpu.checkpoint.io import restore_params
    step = int(restore_params(sys.argv[1])['step'])
    print(f'[chipq] 60k gate: checkpoint step {step}', file=sys.stderr)
except Exception as e:
    print(f'[chipq] 60k gate BROKEN: {type(e).__name__}: {e}',
          file=sys.stderr)
    step = 0
print('yes' if step >= 60000 else '')
PYEOF
) || echo "[chipq] 60k gate timed out/failed — treating as not-ready" >&2
fi
if [ -n "$EV_60K" ]; then
    recorded_item q53_evidence_eval_60k_wide 10800 env \
        EV_CKPT="$EV_CKPT_DIR" EV_IMAGES=5 EV_LADDER_IMAGES=4 \
        python tools/evidence_eval.py
else
    echo "[chipq] q53: 60k checkpoint not ready — skipping"
fi

# q52: training-draw variance at EQUAL steps (VERDICT r3 #8/weak 5).
# Part 1 (SR vs degraded input per class) on the 20k milestone snapshot of
# the round-4 draw, comparable against the recorded r5-20k and r7-19k
# draws in docs/PERF.md — three draws at ~20k steps give the spread that
# tells us how much of any ladder delta is just the training draw.
EV_M20="${EV_ROOT:-/root/repo/.evidence}/run/evidence_dim64_synth_step20000"
if [ -d "$EV_M20" ]; then
    recorded_item q52_evidence_eval_20k_draw 7200 env \
        EV_CKPT="$EV_M20" EV_LADDER_IMAGES=0 \
        python tools/evidence_eval.py
else
    echo "[chipq] q52: 20k milestone snapshot missing — skipping"
fi

# q70/q72: percentile calibration estimator at >=256ch (VERDICT r2 #9 chip
# half). RESOLVED round 7 — pinned negative: on the decider 42/43 draw,
# running-max 46.03 / p99.9 42.60 / p99.5 38.01 / p99 32.14 dB
# (monotonically worse with clipping; docs/PERF.md "did NOT work").
# q72 was skipped as unable to change the verdict.
recorded_item q70_ladder256_pct_badseed 4800 env QP_DIM=128 QP_LR=128 QP_STEPS=50 \
    QP_QMIN=256 QP_WSEED=42 QP_CSEED=43 \
    QP_MODES='float32,w8a8,w8a8%p99.9,w8a8%p99.5,w8a8%p99' \
    python tools/quality_probe.py
recorded_item q72_ladder256_pct 4800 env QP_DIM=128 QP_LR=128 QP_STEPS=50 \
    QP_QMIN=256 \
    QP_MODES='float32,w8a8,w8a8%p99.9,w8a8%p99.5,w8a8%p99' \
    python tools/quality_probe.py

# q40: per-time at the shipping >=512ch coverage (quality headroom check)
recorded_item q40_ladder512_pertime 2400 env QP_DIM=128 QP_LR=128 QP_STEPS=50 \
    QP_QMIN=512 QP_MODES='float32,w8a8,w8a8t' \
    python tools/quality_probe.py

# q50: trained-evidence eval refresh at the surviving best_loss checkpoint.
# RESOLVED round 7 (docs/PERF.md end-to-end SR tables + sampler step
# ladder, eta1-ddim25 few-step winner). Re-measures with CHIPQ_FORCE=1.
if [ -n "$EV_CKPT_DIR" ]; then
    recorded_item q50_evidence_eval 10800 env \
        EV_CKPT="$EV_CKPT_DIR" \
        python tools/evidence_eval.py
else
    echo "[chipq] q50: checkpoint missing (run tools/evidence_retrain.sh) — skipping"
fi

# (q51 moved up: it now runs first among the long-train items)

# q60: headline bench reconfirmation on the current default
recorded_item q60_bench_default 2400 env \
    BENCH_CAL_CACHE="$CHIPQ_DIR/cal_cal512.npz" python bench.py

echo "[chipq] queue complete; logs in $CHIPQ_DIR"
