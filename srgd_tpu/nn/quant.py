"""W8A8 quantized convolution for the int8 MXU path (inference).

TPU v5e executes s8 x s8 -> s32 convolutions at 394 TOP/s — 2x the bf16
rate — and int8 activations halve HBM traffic. ``QuantConv`` is a drop-in
for ``flax.linen.Conv`` with an IDENTICAL parameter tree (float ``kernel``
(H, W, I, O) + ``bias``), so checkpoints convert and round-trip unchanged;
quantization happens at apply time:

- weights: symmetric per-output-channel scales, folded into the epilogue;
- activations: symmetric per-tensor scale. Two modes:
  * DYNAMIC (default): amax / 127 computed in-graph each call — robust, no
    calibration needed, but the amax pass costs HBM bandwidth;
  * CALIBRATED: run ``calibrate_quant`` once over representative inputs to
    record running-max scales in a ``quant_stats`` variable collection;
    applies carrying that collection use the static scales and skip the
    amax pass (measured ~10-15% faster conv chains, docs/PERF.md).
    ``cal_mode`` picks the per-call scale estimator the running max
    aggregates (VERDICT r2 #9 — running-max is outlier-hostage at >=256ch):
    'max' (amax, default) or 'p<pct>' (|x| percentile, e.g. 'p99.9' — clips
    the outlier tail). The estimator only changes what calibration RECORDS;
    the apply-time int8 path is identical in all modes.
- optional SmoothQuant-style smoothing (``smooth_alpha`` > 0): activation
  outliers concentrate in a few input channels, so a per-tensor activation
  scale wastes most of the int8 grid on the quiet channels. Per-input-channel
  factors s_c = a_c^alpha * w_c^(alpha-1) migrate that range into the weights
  (x/s_c quantizes finer; w*s_c absorbs it exactly — the float product is
  unchanged). Free at apply time: the divide fuses into the quantize pass
  that already reads x, and the per-channel a_c reduce replaces (costs the
  same as) the per-tensor amax pass.

This is a TPU-native inference feature with no reference counterpart (the
reference samples in fp32 end to end — /root/reference/inference.py:83-84);
quality evidence vs the bf16 path lives in tools/quality_probe.py and
docs/PERF.md.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _cal_amax(xf, mode):
    """Per-call effective amax under calibration estimator ``mode``.

    'max': exact amax (running-max calibration, the crude baseline).
    'p<pct>': the |x| percentile, e.g. 'p99.9' — activation values above it
    clip at apply time, spending the int8 grid on the bulk instead of the
    outlier tail. MEASURED NEGATIVE on the flagship (chipq q70, docs/PERF.md
    "did NOT work"): on the known-bad >=256ch draw it degrades monotonically
    with clipping (max 46.03 / p99.9 42.60 / p99.5 38.01 / p99 32.14 dB) —
    the activation tails carry signal in this net. Kept as an opt-in knob.

    An elementwise-MSE grid search over clip points was tried and removed:
    at int8 granularity (127 levels) the rounding-error gain from clipping
    never outweighs the squared clip error of even extreme tails, so the
    MSE optimum degenerates to amax on gaussian/cubed-gaussian/lognormal/
    spiked inputs alike (pinned negative, docs/PERF.md quant section).
    Calibration-time only — never runs in the sampling hot path."""
    amax = jnp.max(jnp.abs(xf))
    if mode == 'max':
        return amax
    if mode.startswith('p'):
        pct = float(mode[1:])
        if not 0.0 < pct <= 100.0:
            raise ValueError(f'cal_mode percentile out of (0, 100]: {mode!r}')
        return jnp.quantile(jnp.abs(xf).reshape(-1), pct / 100.0)
    raise ValueError(f"unknown cal_mode {mode!r}: expected 'max' or 'p<pct>'")


class QuantConv(nn.Module):
    """2-D convolution executed as s8 x s8 -> s32 on the MXU.

    Parameter tree matches ``nn.Conv`` (float kernel/bias), so enabling or
    disabling quantization never touches checkpoints. Output dtype follows
    ``dtype`` like the rest of the net.
    """

    features: int
    kernel_size: Sequence[int]
    padding: Union[int, str] = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    smooth_alpha: float = 0.0
    cal_mode: str = 'max'        # 'max' | 'p<pct>' (calibration-time only)
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param('kernel', self.kernel_init,
                            (kh, kw, in_ch, self.features), jnp.float32)
        bias = (self.param('bias', self.bias_init,
                           (self.features,), jnp.float32)
                if self.use_bias else None)

        wf = kernel.astype(jnp.float32)
        xf = x.astype(jnp.float32)
        # Activation statistics: calibrated static if a quant_stats collection
        # rides along, dynamic otherwise. Never touch the collection during
        # net.init (every collection is mutable there, and recording scales
        # from the zeros init inputs would freeze the scales at ~0).
        calibrating = (self.is_mutable_collection('quant_stats')
                       and not self.is_initializing())

        if self.smooth_alpha > 0.0:
            if self.cal_mode != 'max':
                # smoothing already absorbs the outlier channels the
                # percentile/mse estimators exist to clip, and the two
                # static-scale mechanisms compound badly when combined
                # (docs/PERF.md: cal+smooth 45-48 dB) — reject, don't stack
                raise ValueError('quantize_cal_mode != max cannot be '
                                 'combined with quantize_smooth_alpha > 0')
            # SmoothQuant: per-input-channel activation amax a_c drives both
            # the smoothing factors and the (smoothed) per-tensor scale.
            if calibrating or self.has_variable('quant_stats', 'act_amax_ch'):
                sv = self.variable('quant_stats', 'act_amax_ch',
                                   lambda: jnp.zeros((in_ch,), jnp.float32))
                if calibrating:
                    dyn = jnp.max(jnp.abs(xf), axis=(0, 1, 2))
                    sv.value = jnp.maximum(sv.value, dyn)
                    a_c = dyn
                else:
                    a_c = sv.value
            else:
                a_c = jnp.max(jnp.abs(xf), axis=(0, 1, 2))
            w_c = jnp.max(jnp.abs(wf), axis=(0, 1, 3))
            ok = (a_c > 0.0) & (w_c > 0.0)
            alpha = self.smooth_alpha
            s_c = jnp.where(ok, (a_c ** alpha) * (w_c ** (alpha - 1.0)), 1.0)
            wf = wf * s_c[None, None, :, None]
            # amax of x/s_c, from a_c directly (no second pass over x)
            s_x = jnp.max(a_c / s_c) / 127.0 + 1e-12
            x_div = s_c * s_x                     # per-channel quantize divisor
        else:
            if calibrating or self.has_variable('quant_stats', 'act_scale'):
                sv = self.variable('quant_stats', 'act_scale',
                                   lambda: jnp.zeros((), jnp.float32))
                if calibrating:
                    dyn = _cal_amax(xf, self.cal_mode) / 127.0 + 1e-12
                    sv.value = jnp.maximum(sv.value, dyn)
                    s_x = dyn
                else:
                    s_x = sv.value
            else:
                s_x = jnp.max(jnp.abs(xf)) / 127.0 + 1e-12
            x_div = s_x

        # per-output-channel symmetric weight scales (epilogue-folded),
        # computed AFTER smoothing so they absorb the s_c fold exactly
        s_w = jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0 + 1e-12
        wq = jnp.round(wf / s_w).astype(jnp.int8)
        xq = jnp.clip(jnp.round(xf / x_div), -127.0, 127.0).astype(jnp.int8)

        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        acc = jax.lax.conv_general_dilated(
            xq, wq, window_strides=(1, 1), padding=pad,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.int32)

        y = acc.astype(jnp.float32) * (s_x * s_w)
        if bias is not None:
            y = y + bias
        return y.astype(self.dtype)


def _make_calibrate_apply(net):
    """Jitted stats-recording apply. Built ONCE per calibration run and
    passed through repeated ``calibrate_quant`` calls: jax.jit caches on
    function identity, so a fresh lambda per call would recompile (6x the
    relay's slow compile in per-time mode)."""
    import jax

    return jax.jit(lambda v, args, kwargs: net.apply(
        v, *args, mutable=['quant_stats'], **kwargs)[1])


def calibrate_quant(net, variables, calls, apply=None):
    """Record static activation scales for every QuantConv in ``net``.

    ``calls``: iterable of (args, kwargs) forwarded to ``net.apply``. Returns
    the variables dict with a populated ``quant_stats`` collection (running
    max over all calls); pass the result wherever params went before. For
    diffusion denoisers, calibrate across several noise levels — FiLM
    conditioning changes activation ranges with t. ``apply``: optional
    prebuilt ``_make_calibrate_apply(net)`` for jit reuse across calls.
    """
    if apply is None:
        apply = _make_calibrate_apply(net)
    for args, kwargs in calls:
        upd = apply(variables, args, kwargs)
        if 'quant_stats' not in upd:
            # no QuantConv anywhere (e.g. quantize_min_channels above every
            # stage width): nothing to calibrate — a no-op, not an error
            return variables
        variables = {**variables, 'quant_stats': upd['quant_stats']}
    return variables


def calibrate_sampler(wrapper, params, rng, *, tile_size=256, batch=4,
                      channels=3, class_label=None, n_times=6,
                      cond_sample=None, margin=1.0, per_time=False):
    """PTQ-calibrate a diffusion wrapper's denoiser for (tiled) sampling.

    Runs the denoiser at ``n_times`` representative noise levels (the
    wrapper's ``calibration_times``) on unit-normal latents — the sampler's
    input distribution — with both a real and a null (all-zero) condition so
    the CFG branch is covered, then returns params carrying the recorded
    ``quant_stats``. ``cond_sample``: optional (B, H, W, C) condition canvas
    in [-1, 1] to draw calibration condition tiles from (defaults to uniform
    noise). ``margin`` scales the recorded amax, headroom for inputs hotter
    than the calibration set.

    ``per_time=True`` records a SEPARATE stats set per calibration time
    (diffusion activations shrink as noise decays, so one global running-max
    over all noise levels over-scales the low-noise steps). The result
    carries ``quant_stats_t`` (stacked, leading dim = n calibration times)
    plus ``quant_stats_times`` (the matching net time inputs); samplers
    select the nearest entry per step via ``diffusion.base.
    select_time_stats`` at the family's ``net_apply`` boundary.
    """
    import jax
    import jax.numpy as jnp

    net = wrapper.net
    times = wrapper.calibration_times(params, n_times)
    kx, kc = jax.random.split(jax.random.PRNGKey(0) if rng is None else rng)
    shape = (batch, tile_size, tile_size, channels)
    x = jax.random.normal(kx, shape, jnp.float32)
    if cond_sample is not None:
        cs = cond_sample[:1]
        if cs.shape[1] < tile_size or cs.shape[2] < tile_size:
            # canvas smaller than the calibration tile: tile it out
            cs = jnp.tile(cs, (1, -(-tile_size // cs.shape[1]),
                               -(-tile_size // cs.shape[2]), 1))
        cond = jnp.broadcast_to(cs[:, :tile_size, :tile_size, :], shape)
    else:
        cond = jax.random.uniform(kc, shape, jnp.float32, -1.0, 1.0)
    label = (jnp.zeros((batch,), jnp.int32) if class_label is None
             else jnp.broadcast_to(jnp.asarray(class_label), (batch,)))
    has_classes = getattr(net, 'num_classes', None) is not None

    def calls_at(i):
        t_b = jnp.full((batch,), times[i], jnp.float32)
        calls = []
        for c in (cond, jnp.zeros_like(cond)):      # real + CFG-null condition
            kw = dict(cond=c)
            if has_classes:
                kw['class_label'] = label
            calls.append(((x, t_b), kw))
        if has_classes:
            # class-CFG null branch: the class embedding is zeroed via
            # class_mask (unet.py), which shifts activation ranges too
            calls.append(((x, t_b), dict(
                cond=cond, class_label=label,
                class_mask=jnp.zeros((batch,), jnp.float32))))
        return calls

    # strip non-net collections the wrappers add (learned log-SNR subtree)
    net_vars = {k: v for k, v in params.items() if k != 'log_snr'} \
        if isinstance(params, dict) else params
    out = dict(params) if isinstance(params, dict) else dict(net_vars)

    if per_time:
        apply = _make_calibrate_apply(net)
        per_time_stats = []
        for i in range(times.shape[0]):
            vars_i = calibrate_quant(net, net_vars, calls_at(i), apply=apply)
            if 'quant_stats' not in vars_i:
                return params   # no QuantConv in this net — a clean no-op
            per_time_stats.append(vars_i['quant_stats'])
        stacked = jax.tree.map(lambda *s: jnp.stack(s) * margin,
                               *per_time_stats)
        out['quant_stats_t'] = stacked
        out['quant_stats_times'] = jnp.asarray(times, jnp.float32)
        return out

    calls = [c for i in range(times.shape[0]) for c in calls_at(i)]
    net_vars = calibrate_quant(net, net_vars, calls)
    if 'quant_stats' not in net_vars:
        return params       # no QuantConv in this net — calibration is a no-op
    out['quant_stats'] = jax.tree.map(lambda s: s * margin,
                                      net_vars['quant_stats'])
    return out


CAL_CACHE_VERSION = 1
_CAL_COLLECTIONS = ('quant_stats', 'quant_stats_t', 'quant_stats_times')


def calibration_fingerprint(conf, *, ckpt_path='', tile_size=256,
                            per_time=False, seed=0, class_label=None,
                            n_times=6, batch=4):
    """Meta dict that uniquely determines a calibration result's structure
    and values: the model geometry + quantization spec fix the quant_stats
    tree (which convs carry scales, per-channel shapes), the sampling knobs
    fix the recorded values, and the checkpoint identity (path + size +
    mtime) fixes the weights the activations flowed through. Exact equality
    of this dict is the cache-validity criterion in ``load_calibration`` —
    a fingerprint mismatch can otherwise silently drop stats keys, and a
    QuantConv without its stats variable falls back to DYNAMIC scales (a
    quiet perf/quality change, never an error)."""
    import os
    fp = {
        'version': CAL_CACHE_VERSION,
        'model': conf.model,
        'unet_dim': conf.unet_dim,
        'dim_mults': conf.ddpm_unet_dim_mults,
        'quantize': conf.quantize,
        'quantize_min_channels': conf.quantize_min_channels,
        'quantize_smooth_alpha': float(conf.quantize_smooth_alpha),
        'quantize_cal_mode': getattr(conf, 'quantize_cal_mode', 'max'),
        'per_time': bool(per_time),
        'n_times': int(n_times),
        'batch': int(batch),
        'tile_size': int(tile_size),
        'seed': int(seed),
        'class_label': None if class_label is None else int(class_label),
        'ckpt': str(ckpt_path),
    }
    if ckpt_path and os.path.exists(ckpt_path):
        st = os.stat(ckpt_path)
        fp['ckpt_size'] = st.st_size
        fp['ckpt_mtime'] = int(st.st_mtime)
    return fp


def save_calibration(path, params, meta):
    """Persist the calibration collections to ``path`` (.npz).

    Saves whichever of ``quant_stats`` / ``quant_stats_t`` /
    ``quant_stats_times`` ride on ``params``, flattened with '/'-joined
    keys, plus the JSON-encoded ``meta`` fingerprint. Raises if ``params``
    carry no calibration (calling before ``calibrate_sampler`` is a bug,
    not a cache miss)."""
    import json
    import numpy as np
    from flax import traverse_util

    if not isinstance(params, dict):
        raise ValueError('save_calibration: params is not a variables dict')
    cols = {k: params[k] for k in _CAL_COLLECTIONS if k in params}
    if not cols:
        raise ValueError(
            'save_calibration: params carry no quant_stats collections — '
            'run calibrate_sampler first (or the net has no QuantConv at '
            'this quantize_min_channels)')
    flat = {}
    for col, tree in cols.items():
        if col == 'quant_stats_times':
            flat[col] = np.asarray(tree)
            continue
        for k, v in traverse_util.flatten_dict(tree, sep='/').items():
            flat[f'{col}/{k}'] = np.asarray(v)
    meta_json = json.dumps(meta, sort_keys=True)
    np.savez(path, __meta__=np.frombuffer(meta_json.encode(), np.uint8),
             **flat)


def load_calibration(path, params, meta):
    """Load a calibration cache saved by ``save_calibration``.

    Returns ``params`` merged with the cached collections when the stored
    fingerprint equals ``meta`` exactly; returns ``None`` (with a warning
    naming the differing fields) on any mismatch so callers recalibrate.
    Raises on a structurally corrupt file."""
    import json
    import logging
    import numpy as np
    from flax import traverse_util

    with np.load(path) as z:
        if '__meta__' not in z:
            raise ValueError(f'{path}: not a calibration cache (no meta)')
        stored = json.loads(bytes(z['__meta__']).decode())
        if stored != meta:
            diff = sorted(k for k in set(stored) | set(meta)
                          if stored.get(k) != meta.get(k))
            logging.getLogger(__name__).warning(
                'calibration cache %s does not match the current model/'
                'sampling setup (differs on: %s) — recalibrating', path,
                ', '.join(diff))
            return None
        cols = {}
        for key in z.files:
            if key == '__meta__':
                continue
            col, _, rest = key.partition('/')
            if col not in _CAL_COLLECTIONS:
                raise ValueError(f'{path}: unexpected entry {key!r}')
            if col == 'quant_stats_times':
                cols[col] = jnp.asarray(z[key])
            else:
                cols.setdefault(col, {})[rest] = jnp.asarray(z[key])
    out = dict(params)
    for col, tree in cols.items():
        out[col] = (tree if not isinstance(tree, dict)
                    else traverse_util.unflatten_dict(tree, sep='/'))
    return out


def conv(features, kernel_size, *, padding=0, use_bias=True,
         dtype=jnp.float32, quant: Optional[str] = None,
         kernel_init=None, bias_init=None, name=None):
    """nn.Conv or its W8A8 twin, keyed on ``quant``.

    ``quant``: None (float) or 'w8a8[:<alpha>[:<cal_mode>]]' — alpha > 0
    enables SmoothQuant smoothing, cal_mode picks the calibration scale
    estimator ('max'/'p<pct>'/'mse', see QuantConv).
    """
    kw = {}
    if kernel_init is not None:
        kw['kernel_init'] = kernel_init
    if bias_init is not None:
        kw['bias_init'] = bias_init
    if quant is not None and quant.startswith('w8a8'):
        parts = quant.split(':')
        alpha = float(parts[1]) if len(parts) > 1 else 0.0
        cal_mode = parts[2] if len(parts) > 2 else 'max'
        return QuantConv(features, kernel_size, padding=padding,
                         use_bias=use_bias, dtype=dtype, name=name,
                         smooth_alpha=alpha, cal_mode=cal_mode, **kw)
    return nn.Conv(features, kernel_size, padding=padding,
                   use_bias=use_bias, dtype=dtype, name=name, **kw)
