#!/bin/bash
# Convert -> SERVE at real width on-device (VERDICT r4 #8, chipq q94).
#
# flagship_ckpt_dryrun attested torch.load -> convert -> batch CLI on CPU
# at 16px; this probe runs the same SYNTHESIZED reference-format flagship
# .pth (dim 128, ~137M params — the real epoch300 artifact is an
# unfetchable Git-LFS pointer) through the serving daemon on the chip:
# start `srgd_tpu.serve --mode http`, wait for health, POST one 64px
# image, assert a 256px PNG comes back. Few sample steps + the validated
# fast-profile sampler knobs (ddim eta 1.0) keep the request bounded; the
# claim being attested is ckpt-convert -> device serving at flagship
# width, not quality (random weights).
#
# Usage: bash tools/serve_ckpt_probe.sh   (on the chip; ~10-25 min, mostly
# the first-request compile through the relay unless .jax_cache is warm)
set -eu
cd "$(dirname "$0")/.."
WORK=${WORK:-.chipq/q94_serve}
PORT=${PORT:-8491}
mkdir -p "$WORK"
PTH="$WORK/flagship_synth.pth"

if [ ! -f "$PTH" ]; then
    echo "[q94] synthesizing flagship-geometry reference-format .pth ..."
    JAX_PLATFORMS=cpu python - "$PTH" <<'PYEOF'
import os
import sys

import torch

sys.path.insert(0, '.')
from tests.torch_ref import make_state_dict

sd = make_state_dict(dim=128, dim_mults=(1, 2, 4, 8),
                     full_attn=(False, False, False, True),
                     num_classes=3, learned_sinusoidal_dim=32, seed=0)
torch.save({'ema_model': {f'model.{k}': v for k, v in sd.items()}},
           sys.argv[1])
print(f'[q94] wrote {sys.argv[1]}: {os.path.getsize(sys.argv[1])/1e6:.1f} MB')
PYEOF
fi

python - "$WORK/in.png" <<'PYEOF'
import sys

import numpy as np
from PIL import Image

Image.fromarray((np.random.default_rng(0).random((64, 64, 3)) * 255)
                .astype(np.uint8)).save(sys.argv[1])
PYEOF

echo "[q94] starting serve daemon (flagship conf + synthesized ckpt) ..."
python -m srgd_tpu.serve \
    -c conf/conditional_continuous_linear_df8kost_dim128.yaml \
    -m "$PTH" --mode http --port "$PORT" --lr_bucket 64 \
    --num_sample_steps 4 --continuous_sampler ddim --ddim_eta 1.0 \
    > "$WORK/serve.log" 2>&1 &
echo $! > "$WORK/serve.pid"
# kill by recorded PID only (never by pattern)
trap 'kill "$(cat "$WORK/serve.pid")" 2>/dev/null || true' EXIT

for i in $(seq 1 120); do
    sleep 5
    if curl -sf "http://127.0.0.1:$PORT/healthz" -o "$WORK/healthz.json"; then
        echo "[q94] healthz OK after $((i*5))s: $(cat "$WORK/healthz.json")"
        break
    fi
    if ! kill -0 "$(cat "$WORK/serve.pid")" 2>/dev/null; then
        echo "[q94] serve daemon died during startup:"; tail -30 "$WORK/serve.log"
        exit 1
    fi
    if [ "$i" = 120 ]; then
        echo "[q94] serve never became healthy:"; tail -30 "$WORK/serve.log"
        exit 1
    fi
done

T0=$(date +%s)
echo "[q94] POST /v1/sr (first request pays the flagship compile) ..."
curl -sf --max-time 1500 -X POST --data-binary @"$WORK/in.png" \
    "http://127.0.0.1:$PORT/v1/sr?label=0&seed=71" -o "$WORK/out.png"
echo "[q94] request served in $(( $(date +%s) - T0 ))s"

python - "$WORK/out.png" <<'PYEOF'
import sys

from PIL import Image

im = Image.open(sys.argv[1])
assert im.size == (256, 256), im.size
print('[q94] SERVE PROBE PASSED: 64px -> %s PNG from the converted '
      'flagship checkpoint, on-device' % (im.size,))
PYEOF
