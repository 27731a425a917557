"""Shared diffusion machinery: normalization, fused classifier-free guidance,
and chunked tile mapping.

Guidance design (TPU-native): the reference runs two sequential net calls when
a CFG scale != 1 (/root/reference/model.py:3147-3154). Here the conditional and
null branches are stacked into ONE doubled batch and split after a single
forward — same math (null + (cond - null) * scale), half the launches, and the
guidance-warmup gate becomes a traced per-step scale so the whole sampler
compiles to a single scan.

The reference's CFG nulls are: LR-condition null = zeros condition image
(model.py:681-684) and class null = omitting the class-embedding add
(model.py:692-694), reproduced via cond=0 / class_mask=0.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def normalize_to_neg_one_to_one(img):
    return img * 2.0 - 1.0


def unnormalize_to_zero_to_one(t):
    return (t + 1.0) * 0.5


GUIDANCE_NONE = 'none'
GUIDANCE_COND = 'cond'
GUIDANCE_CLASS = 'class'


def select_time_stats(params, time_scalar):
    """Per-timestep PTQ quant scales (nn/quant.py calibrate_sampler
    per_time=True): slice the stacked ``quant_stats_t`` collection at the
    calibration time nearest the current net time input and hand the slice
    to the net as an ordinary ``quant_stats`` collection. No-op for params
    without the stacked stats. Runs in-graph (argmin + dynamic slice over
    tiny per-conv scale tensors), so scanned samplers stay a single
    compiled program and no activation-sized amax pass is reintroduced."""
    if not isinstance(params, dict) or 'quant_stats_t' not in params:
        return params
    times = params['quant_stats_times']
    idx = jnp.argmin(jnp.abs(times - time_scalar))
    stats = jax.tree.map(
        lambda s: jax.lax.dynamic_index_in_dim(s, idx, 0, keepdims=False),
        params['quant_stats_t'])
    p = {k: v for k, v in params.items()
         if k not in ('quant_stats_t', 'quant_stats_times')}
    p['quant_stats'] = stats
    return p


def resolve_guidance_mode(cond_scale: float, class_cond_scale: float) -> str:
    """Static (trace-time) guidance mode. Parity incl. the dual-CFG
    NotImplementedError guard (/root/reference/model.py:3138-3139)."""
    if cond_scale != 1.0 and class_cond_scale != 1.0:
        raise NotImplementedError(
            'Currently, you cannot specify both cond_scale and class_cond_scale '
            'at the same time.')
    if cond_scale != 1.0:
        return GUIDANCE_COND
    if class_cond_scale != 1.0:
        return GUIDANCE_CLASS
    return GUIDANCE_NONE


def guided_denoise(net_apply: Callable, params, x, time_b, cond, class_label,
                   mode: str, scale, deep_cache=None, return_cache=False):
    """One (possibly doubled-batch) denoiser call with CFG merge.

    net_apply(params, x, time, cond, class_label, class_mask) -> prediction.
    ``scale`` may be a traced scalar (guidance warmup); when it equals 1.0 the
    merge reduces to the conditional output exactly, matching the reference's
    warmup behavior of calling the net once (model.py:3349-3356).

    Deep-feature caching (nn/unet.py): ``return_cache=True`` makes the call
    return (prediction, cache); ``deep_cache=<cache>`` runs the net's
    shallow-only program with that cache. The cache is always sample-major —
    under CFG the net's doubled batch is folded to (B, 2, ...) on the way
    out and unfolded on the way in, so samplers can store one cache row per
    sample regardless of the guidance mode.
    """
    b = x.shape[0]
    kw = {}
    if deep_cache is not None or return_cache:
        kw = dict(deep_cache=deep_cache, return_cache=return_cache)
    if mode == GUIDANCE_NONE:
        return net_apply(params, x, time_b, cond, class_label, None, **kw)

    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([time_b, time_b], axis=0)
    if mode == GUIDANCE_COND:
        cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
        label2 = None if class_label is None else jnp.concatenate(
            [class_label, class_label], axis=0)
        mask2 = None
    else:  # GUIDANCE_CLASS
        cond2 = None if cond is None else jnp.concatenate([cond, cond], axis=0)
        label2 = jnp.concatenate([class_label, class_label], axis=0)
        mask2 = jnp.concatenate(
            [jnp.ones((b,), jnp.float32), jnp.zeros((b,), jnp.float32)], axis=0)

    if deep_cache is not None:
        # (B, 2, ...) sample-major -> (2B, ...) doubled-batch order
        kw['deep_cache'] = jnp.concatenate(
            [deep_cache[:, 0], deep_cache[:, 1]], axis=0)
    out2 = net_apply(params, x2, t2, cond2, label2, mask2, **kw)
    if return_cache:
        out2, cache2 = out2
        cache = jnp.stack([cache2[:b], cache2[b:]], axis=1)
    cond_out, null_out = out2[:b], out2[b:]
    merged = null_out + (cond_out - null_out) * scale
    return (merged, cache) if return_cache else merged


def cache_zeros(net, depth: int, batch: int, h: int, w: int, mode: str):
    """Initial (never-read) deep-cache buffer for DeepCache-style sampling:
    sample-major, with a CFG pair axis when guidance doubles the net batch
    (guided_denoise). ``depth`` is the U-Net stage where the cached deep
    half starts; h/w are the tile/image resolution the net runs at."""
    shape = (batch, h >> (depth - 1), w >> (depth - 1),
             net.dim * net.dim_mults[depth - 1])
    if mode != GUIDANCE_NONE:
        shape = (batch, 2) + shape[1:]
    return jnp.zeros(shape, net.dtype)


def refresh_mask(schedule: str, interval: int, n: int):
    """DeepCache refresh positions as a bool[n] numpy mask over EXECUTED step
    indices (plain samplers: j = i - start; tiled: j = (i - start) // 2, the
    per-parity step counter).

    schedule == '' (default): uniform — refresh when j % interval == 0, the
    round-3 behavior. Otherwise a comma list of ``COUNTxINTERVAL`` segments
    walked in sampling order (high noise -> low noise), where COUNT is an
    absolute step count or a fraction of n (floats <= 1), and the LAST
    segment extends to fill n regardless of its COUNT. Each segment refreshes
    at its local j % INTERVAL == 0, so every segment opens with a refresh.
    Example: '0.5x3,0.5x1' = sparse refresh (every 3rd) in the first half,
    every step in the low-noise second half. '/' is accepted as a segment
    separator too (for contexts where ',' already delimits, e.g.
    quality_probe QP_MODES / BENCH_DEEPCACHE). j = 0 is always a refresh
    (the first executed step has no cache to reuse).
    """
    import numpy as np
    if not schedule:
        return np.arange(n) % max(interval, 1) == 0
    mask = np.zeros(n, dtype=bool)
    pos = 0
    segments = [s.strip() for s in schedule.replace('/', ',').split(',')
                if s.strip()]
    for k, seg in enumerate(segments):
        cnt_s, _, int_s = seg.partition('x')
        iv = max(int(int_s), 1)
        cnt_f = float(cnt_s)
        cnt = int(round(cnt_f * n)) if cnt_f <= 1.0 else int(cnt_f)
        if k == len(segments) - 1:
            cnt = n - pos
        cnt = min(cnt, n - pos)
        mask[pos:pos + cnt] = np.arange(cnt) % iv == 0
        pos += cnt
        if pos >= n:
            break
    if n > 0:
        mask[0] = True  # the first executed step has no cache to reuse
    return mask


def chunked_map(fn: Callable, n_chunks: int, *arrays):
    """Apply ``fn`` over leading-axis chunks of the given arrays.

    arrays have leading dim n (all equal, divisible by n_chunks after the
    caller's padding). n_chunks == 1 calls fn directly (no lax.map overhead).
    fn takes the chunked arrays and returns one array (or tuple of arrays).
    """
    if n_chunks == 1:
        return fn(*arrays)
    split = [a.reshape((n_chunks, a.shape[0] // n_chunks) + a.shape[1:])
             for a in arrays]
    out = jax.lax.map(lambda xs: fn(*xs), tuple(split))
    return jax.tree.map(
        lambda a: a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:]), out)


def pick_chunk(n_tiles: int, batch_size: int) -> int:
    """Tile-chunk size for one grid parity: an exact divisor of n_tiles
    <= batch_size when a sublane-aligned one exists (multiple of 8 and
    >= batch_size/2) — zero padded-tile forwards, e.g. 64 tiles at
    batch_size 16 -> 4 chunks of 16. Otherwise batch_size + padding:
    measured on v5e, a non-multiple-of-8 batch costs far more via sublane
    padding than the padded tiles do (batch 9 ran ~25% slower than batch 8
    on the 81-tile grid). Results are chunk-invariant by design (noise is
    drawn at canvas level), so this only affects speed."""
    cap = max(1, min(batch_size, n_tiles))
    for d in range(cap, 7, -1):
        if n_tiles % d == 0 and d % 8 == 0 and 2 * d >= cap:
            return d
    return cap


def prepare_tile_context(cond_padded, geom, batch: int, batch_size: int,
                         class_label):
    """Shared tiled-sampler setup: zero-margined condition canvas split into
    per-parity padded tile batches + per-tile labels + interior mask.

    Returns (cond_tiles[2], label_tiles[2], n_chunks[2], chunks[2],
    interior_mask). Chunk sizes are per-parity (pick_chunk) so each grid's
    tile count divides exactly whenever possible.
    """
    from srgd_tpu.tiling import extract_tiles, zero_margin

    cond_zeroed = zero_margin(cond_padded, geom)
    n_tiles = (geom.n_tiles_even * batch, geom.n_tiles_odd * batch)
    chunks = [pick_chunk(n, batch_size) for n in n_tiles]
    cond_tiles, label_tiles, n_chunks = [], [], []
    for parity in (0, 1):
        ct, _ = pad_tiles_to_multiple(
            extract_tiles(cond_zeroed, geom, parity), chunks[parity])
        cond_tiles.append(ct)
        n_chunks.append(ct.shape[0] // chunks[parity])
        if class_label is not None:
            assert class_label.shape == (batch,), (
                f'class_label must be one label per canvas: '
                f'{class_label.shape} vs batch {batch}')
            lt = jnp.repeat(class_label, n_tiles[parity] // batch)
            label_tiles.append(jnp.pad(lt, (0, ct.shape[0] - lt.shape[0])))
        else:
            label_tiles.append(None)

    if geom.has_margin:
        it, il, ib, ir = geom.interior
        interior_mask = jnp.zeros((1, geom.padded_h, geom.padded_w, 1),
                                  jnp.float32).at[:, it:ib, il:ir, :].set(1.0)
    else:
        interior_mask = None
    return cond_tiles, label_tiles, n_chunks, chunks, interior_mask


def run_tiled_host_loop(jit_cache: dict, cache_key, step_builders: dict,
                        select, params, state, cond_tiles, label_tiles, rng,
                        indices, capture: bool, extra_args=()):
    """Execute a tiled sampler as a host-side Python loop over per-step jitted
    functions (one compile per (parity, variant)), instead of one lax.scan.

    Needed on deployments where the whole-sampler HLO exceeds compile-service
    request limits (axon remote compile returns HTTP 413 for the 250-step
    single-scan program on 2K canvases); also gives per-step dispatch at ~ms
    cost against ~100ms+ step compute.

    step_builders: {tag: fn_builder} where fn_builder() returns
      f(params, state, cond_tiles_p, label_tiles_p, rng, i, *extra_args)
      -> state. ``state`` is any pytree of canvases (e.g. the image, or
      (image, x0) when the x0 trajectory is captured).
    select(i) -> (tag, parity). Jitted fns are cached in jit_cache[cache_key].
    extra_args: traced arrays every step needs (e.g. a params-derived schedule
    table) — passed as arguments so the cached jitted fns never close over
    params-dependent values (a stale-closure hazard).

    Unless ``capture`` is set (captured frames must outlive the next step),
    the state argument is donated: each step's output reuses the previous
    canvas allocation, saving an alloc+copy of the largest arrays in the loop.
    Returns (state, frames) where frames is the per-step stack of state
    (per-leaf, leading time axis) or None.
    """
    fns_key = (cache_key, capture)
    fns = jit_cache.get(fns_key)
    if fns is None:
        donate = () if capture else (1,)
        fns = {tag: jax.jit(builder(), donate_argnums=donate)
               for tag, builder in step_builders.items()}
        jit_cache[fns_key] = fns
    traj = []
    for i in indices:
        tag, parity = select(int(i))
        state = fns[tag](params, state, cond_tiles[parity], label_tiles[parity],
                         rng, jnp.asarray(i, jnp.int32), *extra_args)
        if capture:
            traj.append(state)
    if capture:
        return state, jax.tree.map(lambda *xs: jnp.stack(xs), *traj)
    return state, None


def crop_frames(frames, crop):
    """Crop a (T, B, H, W, C) frame stack to the output region.

    The reference's tiled debug captures keep the full padded canvas per step
    but crop the initial frame (/root/reference/model.py:3320-3325, 3398-3401);
    here every frame is cropped so the stack has one uniform, stackable shape
    (the padding margin is re-noise bookkeeping, not image content)."""
    left, top, right, bottom = crop
    return frames[:, :, top:bottom, left:right, :]


def pad_tiles_to_multiple(tiles: jnp.ndarray, chunk: int):
    """Pad the tile axis to a multiple of ``chunk``; returns (padded, n_orig).

    Reference packs the remainder minibatch separately (model.py:3383-3390);
    on TPU we pad to a static multiple and drop the padding after (SURVEY.md
    section 7 'remainder minibatch')."""
    n = tiles.shape[0]
    n_pad = (-n) % chunk
    if n_pad == 0:
        return tiles, n
    pad_width = [(0, n_pad)] + [(0, 0)] * (tiles.ndim - 1)
    return jnp.pad(tiles, pad_width), n
