"""PyTorch .pth checkpoint <-> Flax params conversion (both directions).

The reference checkpoint is ``torch.load(path)['ema_model']``: the state dict
of the EMA shadow of the diffusion *wrapper*, so U-Net tensors live under the
``model.`` prefix (Gaussian/continuous families) or ``net.`` (EDM family)
(/root/reference/model.py:3659-3664; key structure from SURVEY.md section 5.4).

Mapping is mechanical because srgd_tpu module names mirror torch Sequential
indices (downs_{i}_{j} etc. — see srgd_tpu/nn/unet.py). Layout transforms:

- Conv2d weight  OIHW -> HWIO
- Linear weight  (out, in) -> (in, out)
- GroupNorm weight/bias -> Block.norm_scale / norm_bias
- RMSNorm g      (1, C, 1, 1) -> (C,)
- Embedding weight -> Embed.embedding (unchanged)
- learned-sinusoidal 'weights' (unchanged)

Wrapper-level buffers (betas, alphas_cumprod, ...) are discarded: srgd_tpu
rebuilds them in float64 from the config (srgd_tpu/diffusion/schedules.py).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _to_numpy(t):
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (possibly on CPU); avoid importing torch at module scope
    return t.detach().cpu().numpy()


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


# Rules: (regex on the unet-relative torch key) -> (flax path parts fn, transform)
# Applied in order; first match wins. {m} is the regex match.

def _resnet_rules(torch_prefix: str, flax_name: str):
    p, f = torch_prefix, flax_name
    return [
        (rf'^{p}\.mlp\.1\.weight$', lambda m: (f, 'mlp', 'kernel'), dense_kernel),
        (rf'^{p}\.mlp\.1\.bias$', lambda m: (f, 'mlp', 'bias'), None),
        (rf'^{p}\.block(\d)\.proj\.weight$', lambda m: (f, f'block{m.group(1)}', 'proj', 'kernel'), conv_kernel),
        (rf'^{p}\.block(\d)\.proj\.bias$', lambda m: (f, f'block{m.group(1)}', 'proj', 'bias'), None),
        (rf'^{p}\.block(\d)\.norm\.weight$', lambda m: (f, f'block{m.group(1)}', 'norm_scale'), None),
        (rf'^{p}\.block(\d)\.norm\.bias$', lambda m: (f, f'block{m.group(1)}', 'norm_bias'), None),
        (rf'^{p}\.res_conv\.weight$', lambda m: (f, 'res_conv', 'kernel'), conv_kernel),
        (rf'^{p}\.res_conv\.bias$', lambda m: (f, 'res_conv', 'bias'), None),
    ]


def _attn_rules(torch_prefix: str, flax_name: str):
    p, f = torch_prefix, flax_name
    rms = lambda w: w.reshape(-1)
    return [
        (rf'^{p}\.norm\.g$', lambda m: (f, 'norm', 'g'), rms),
        (rf'^{p}\.to_qkv\.weight$', lambda m: (f, 'to_qkv', 'kernel'), conv_kernel),
        # full attention: plain conv out
        (rf'^{p}\.to_out\.weight$', lambda m: (f, 'to_out', 'kernel'), conv_kernel),
        (rf'^{p}\.to_out\.bias$', lambda m: (f, 'to_out', 'bias'), None),
        # linear attention: Sequential(conv, RMSNorm)
        (rf'^{p}\.to_out\.0\.weight$', lambda m: (f, 'to_out', 'kernel'), conv_kernel),
        (rf'^{p}\.to_out\.0\.bias$', lambda m: (f, 'to_out', 'bias'), None),
        (rf'^{p}\.to_out\.1\.g$', lambda m: (f, 'out_norm', 'g'), rms),
    ]


def _updown_rules(torch_prefix: str, flax_name: str):
    """Downsample (Sequential idx 1), PixelShuffleUpsample (net.0),
    NearestUpsample (Sequential idx 1), or a bare conv (final stage)."""
    p, f = torch_prefix, flax_name
    return [
        (rf'^{p}\.1\.weight$', lambda m: (f, 'conv', 'kernel'), conv_kernel),
        (rf'^{p}\.1\.bias$', lambda m: (f, 'conv', 'bias'), None),
        (rf'^{p}\.net\.0\.weight$', lambda m: (f, 'conv', 'kernel'), conv_kernel),
        (rf'^{p}\.net\.0\.bias$', lambda m: (f, 'conv', 'bias'), None),
        (rf'^{p}\.weight$', lambda m: (f, 'kernel'), conv_kernel),
        (rf'^{p}\.bias$', lambda m: (f, 'bias'), None),
    ]


def _unet_rules(num_stages: int = 4):
    rules = [
        (r'^init_conv\.weight$', lambda m: ('init_conv', 'kernel'), conv_kernel),
        (r'^init_conv\.bias$', lambda m: ('init_conv', 'bias'), None),
        (r'^time_mlp\.0\.weights$', lambda m: ('time_mlp', 'pos_emb', 'weights'), None),
        (r'^time_mlp\.1\.weight$', lambda m: ('time_mlp', 'fc1', 'kernel'), dense_kernel),
        (r'^time_mlp\.1\.bias$', lambda m: ('time_mlp', 'fc1', 'bias'), None),
        (r'^time_mlp\.3\.weight$', lambda m: ('time_mlp', 'fc2', 'kernel'), dense_kernel),
        (r'^time_mlp\.3\.bias$', lambda m: ('time_mlp', 'fc2', 'bias'), None),
        (r'^class_mlp\.0\.weight$', lambda m: ('class_mlp', 'emb', 'embedding'), None),
        (r'^class_mlp\.1\.weight$', lambda m: ('class_mlp', 'fc1', 'kernel'), dense_kernel),
        (r'^class_mlp\.1\.bias$', lambda m: ('class_mlp', 'fc1', 'bias'), None),
        (r'^class_mlp\.3\.weight$', lambda m: ('class_mlp', 'fc2', 'kernel'), dense_kernel),
        (r'^class_mlp\.3\.bias$', lambda m: ('class_mlp', 'fc2', 'bias'), None),
    ]
    for updown, tpf in (('downs', 'downs'), ('ups', 'ups')):
        for i in range(num_stages):
            for j in (0, 1):
                rules += _resnet_rules(rf'{updown}\.{i}\.{j}', f'{tpf}_{i}_{j}')
            rules += _attn_rules(rf'{updown}\.{i}\.2', f'{tpf}_{i}_2')
            rules += _updown_rules(rf'{updown}\.{i}\.3', f'{tpf}_{i}_3')
    rules += _resnet_rules('mid_block1', 'mid_block1')
    rules += _attn_rules('mid_attn', 'mid_attn')
    rules += _resnet_rules('mid_block2', 'mid_block2')
    rules += _resnet_rules('final_res_block', 'final_res_block')
    rules += [
        (r'^final_conv\.weight$', lambda m: ('final_conv', 'kernel'), conv_kernel),
        (r'^final_conv\.bias$', lambda m: ('final_conv', 'bias'), None),
    ]
    return rules


def _set_path(tree: dict, path: Tuple[str, ...], value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def convert_unet_state_dict(state_dict: Dict[str, 'np.ndarray'],
                            num_stages: int = 4,
                            dtype=np.float32,
                            strict: bool = True):
    """Convert a reference-format U-Net state dict to flax params.

    ``state_dict`` keys must be unet-relative (``init_conv.weight``, ...);
    use :func:`strip_wrapper_prefix` first for wrapper-level dicts.
    Returns ``(params_dict, unmatched_keys)``; raises on unmatched when strict.
    """
    rules = [(re.compile(pat), path_fn, tf) for pat, path_fn, tf in _unet_rules(num_stages)]
    params: dict = {}
    unmatched = []
    for key, val in state_dict.items():
        arr = _to_numpy(val)
        for pat, path_fn, tf in rules:
            m = pat.match(key)
            if m:
                out = tf(arr) if tf is not None else arr
                _set_path(params, path_fn(m), np.asarray(out, dtype=dtype))
                break
        else:
            unmatched.append(key)
    if strict and unmatched:
        raise KeyError(f'unconverted torch keys: {unmatched[:10]}'
                       f'{"..." if len(unmatched) > 10 else ""}')
    return params, unmatched


_WRAPPER_PREFIXES = ('model.', 'net.')

# wrapper-level buffers the reference re-registers; rebuilt from config here
_BUFFER_KEYS = re.compile(
    r'^(betas|alphas_cumprod|alphas_cumprod_prev|sqrt_alphas_cumprod|'
    r'sqrt_one_minus_alphas_cumprod|log_one_minus_alphas_cumprod|'
    r'sqrt_recip_alphas_cumprod|sqrt_recipm1_alphas_cumprod|'
    r'posterior_variance|posterior_log_variance_clipped|'
    r'posterior_mean_coef1|posterior_mean_coef2|loss_weight)$')


def strip_wrapper_prefix(state_dict):
    """Split a diffusion-wrapper state dict into (unet_sd, extras).

    extras keeps non-U-Net entries (schedule buffers, learned log_snr net)."""
    unet_sd, extras = {}, {}
    for key, val in state_dict.items():
        for pref in _WRAPPER_PREFIXES:
            if key.startswith(pref):
                unet_sd[key[len(pref):]] = val
                break
        else:
            extras[key] = val
    return unet_sd, extras


def load_torch_checkpoint(path: str):
    """torch.load the reference .pth and return the 'ema_model' state dict
    (parity: /root/reference/model.py:3659-3664)."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=True)
    sd = ckpt['ema_model'] if 'ema_model' in ckpt else ckpt
    return {k: v for k, v in sd.items()}


_LEARNED_LOG_SNR_KEYS = {
    'log_snr.net.1.net.weight': ('l1', 'kernel'),
    'log_snr.net.1.net.bias': ('l1', 'bias'),
    'log_snr.net.2.fn.0.net.weight': ('l2', 'kernel'),
    'log_snr.net.2.fn.0.net.bias': ('l2', 'bias'),
    'log_snr.net.2.fn.2.net.weight': ('l3', 'kernel'),
    'log_snr.net.2.fn.2.net.bias': ('l3', 'bias'),
}


def convert_learned_log_snr(extras: dict, dtype=np.float32):
    """Learned monotonic schedule net (MonotonicLinear stack,
    /root/reference/model.py:2614-2676; torch keys via Sequential/Residual
    nesting: log_snr.net.{1,2.fn.0,2.fn.2}.net.{weight,bias})."""
    out: dict = {}
    for tk, (layer, leaf) in _LEARNED_LOG_SNR_KEYS.items():
        if tk in extras:
            arr = _to_numpy(extras[tk])
            if leaf == 'kernel':
                arr = dense_kernel(arr)
            out.setdefault(layer, {})[leaf] = np.asarray(arr, dtype)
    return out or None


# ---------------------------------------------------------------------------
# Reverse conversion: flax params -> reference torch key layout
# ---------------------------------------------------------------------------

def inv_conv_kernel(w: np.ndarray) -> np.ndarray:
    """HWIO -> OIHW."""
    return np.transpose(w, (3, 2, 0, 1))


def inv_dense_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _rev_resnet(mod: dict, tp: str, out: dict):
    out[f'{tp}.mlp.1.weight'] = inv_dense_kernel(mod['mlp']['kernel'])
    out[f'{tp}.mlp.1.bias'] = mod['mlp']['bias']
    for b in ('block1', 'block2'):
        blk = mod[b]
        out[f'{tp}.{b}.proj.weight'] = inv_conv_kernel(blk['proj']['kernel'])
        out[f'{tp}.{b}.proj.bias'] = blk['proj']['bias']
        out[f'{tp}.{b}.norm.weight'] = blk['norm_scale']
        out[f'{tp}.{b}.norm.bias'] = blk['norm_bias']
    if 'res_conv' in mod:
        out[f'{tp}.res_conv.weight'] = inv_conv_kernel(mod['res_conv']['kernel'])
        out[f'{tp}.res_conv.bias'] = mod['res_conv']['bias']


def _rev_attn(mod: dict, tp: str, out: dict):
    out[f'{tp}.norm.g'] = np.reshape(mod['norm']['g'], (1, -1, 1, 1))
    out[f'{tp}.to_qkv.weight'] = inv_conv_kernel(mod['to_qkv']['kernel'])
    if 'out_norm' in mod:
        # linear attention: to_out is Sequential(conv1x1, RMSNorm)
        out[f'{tp}.to_out.0.weight'] = inv_conv_kernel(mod['to_out']['kernel'])
        out[f'{tp}.to_out.0.bias'] = mod['to_out']['bias']
        out[f'{tp}.to_out.1.g'] = np.reshape(mod['out_norm']['g'],
                                             (1, -1, 1, 1))
    else:
        out[f'{tp}.to_out.weight'] = inv_conv_kernel(mod['to_out']['kernel'])
        out[f'{tp}.to_out.bias'] = mod['to_out']['bias']


def _rev_conv(mod: dict, tkey: str, out: dict):
    out[f'{tkey}.weight'] = inv_conv_kernel(mod['kernel'])
    if 'bias' in mod:
        out[f'{tkey}.bias'] = mod['bias']


def flax_to_torch_unet_state_dict(params: dict, *,
                                  pixel_shuffle_upsample: bool = True,
                                  dtype=np.float32) -> dict:
    """Inverse of :func:`convert_unet_state_dict`: flax U-Net params ->
    unet-relative reference torch keys (numpy values; OIHW convs,
    (out, in) linears, (1, C, 1, 1) RMSNorm gains).

    Structure cues come from the params tree itself: attention kind from the
    ``out_norm`` presence, bare-conv final up/down stages from a top-level
    ``kernel``; only the PixelShuffle-vs-Nearest upsample Sequential index
    needs the config flag (both hold one conv named ``conv``).
    """
    out: dict = {}
    _rev_conv(params['init_conv'], 'init_conv', out)
    tm = params['time_mlp']
    if 'pos_emb' in tm:       # learned-sinusoidal (torch Sequential idx 0)
        out['time_mlp.0.weights'] = tm['pos_emb']['weights']
    out['time_mlp.1.weight'] = inv_dense_kernel(tm['fc1']['kernel'])
    out['time_mlp.1.bias'] = tm['fc1']['bias']
    out['time_mlp.3.weight'] = inv_dense_kernel(tm['fc2']['kernel'])
    out['time_mlp.3.bias'] = tm['fc2']['bias']
    if 'class_mlp' in params:
        cm = params['class_mlp']
        out['class_mlp.0.weight'] = cm['emb']['embedding']
        out['class_mlp.1.weight'] = inv_dense_kernel(cm['fc1']['kernel'])
        out['class_mlp.1.bias'] = cm['fc1']['bias']
        out['class_mlp.3.weight'] = inv_dense_kernel(cm['fc2']['kernel'])
        out['class_mlp.3.bias'] = cm['fc2']['bias']

    n_stages = 1 + max(int(k.split('_')[1]) for k in params
                       if k.startswith('downs_'))
    for updown in ('downs', 'ups'):
        for i in range(n_stages):
            for j in (0, 1):
                _rev_resnet(params[f'{updown}_{i}_{j}'],
                            f'{updown}.{i}.{j}', out)
            _rev_attn(params[f'{updown}_{i}_2'], f'{updown}.{i}.2', out)
            tail = params[f'{updown}_{i}_3']
            if 'kernel' in tail:                       # bare final-stage conv
                _rev_conv(tail, f'{updown}.{i}.3', out)
            elif updown == 'downs':                    # Downsample Sequential
                _rev_conv(tail['conv'], f'{updown}.{i}.3.1', out)
            elif pixel_shuffle_upsample:               # PixelShuffle net.0
                _rev_conv(tail['conv'], f'{updown}.{i}.3.net.0', out)
            else:                                      # Nearest Sequential
                _rev_conv(tail['conv'], f'{updown}.{i}.3.1', out)
    _rev_resnet(params['mid_block1'], 'mid_block1', out)
    _rev_attn(params['mid_attn'], 'mid_attn', out)
    _rev_resnet(params['mid_block2'], 'mid_block2', out)
    _rev_resnet(params['final_res_block'], 'final_res_block', out)
    _rev_conv(params['final_conv'], 'final_conv', out)
    return {k: np.asarray(v, dtype) for k, v in out.items()}


def export_torch_state_dict(tree: dict, *, model: str,
                            pixel_shuffle_upsample: bool = True,
                            dtype=np.float32) -> dict:
    """Flax variables -> a reference-format wrapper state dict.

    ``tree``: {'params': unet_params[, 'log_snr': ...]} (what the factory /
    converter produce). Returns the 'ema_model'-shaped dict the reference
    loads (model.py:3660-3662): U-Net tensors under 'model.' ('net.' for the
    EDM family), learned log-SNR net under its torch Sequential keys.
    Schedule buffers (betas, alphas_cumprod, ...) are NOT emitted — the
    reference rebuilds them at construction, so the discrete families load
    with ``load_strict: false``; the shipped continuous model round-trips
    key-exact.
    """
    prefix = 'net.' if 'elucidated' in model else 'model.'
    sd = {prefix + k: v for k, v in flax_to_torch_unet_state_dict(
        tree['params'], pixel_shuffle_upsample=pixel_shuffle_upsample,
        dtype=dtype).items()}
    if tree.get('log_snr'):
        for tk, (layer, leaf) in _LEARNED_LOG_SNR_KEYS.items():
            arr = np.asarray(tree['log_snr'][layer][leaf], dtype)
            sd[tk] = inv_dense_kernel(arr) if leaf == 'kernel' else arr
    return sd


def convert_checkpoint(path: str, num_stages: int = 4, dtype=np.float32,
                       strict: bool = True):
    """Full pipeline: .pth -> {'params': flax unet params[, 'log_snr': ...]}."""
    sd = load_torch_checkpoint(path)
    unet_sd, extras = strip_wrapper_prefix(sd)
    extras = {k: v for k, v in extras.items() if not _BUFFER_KEYS.match(k)}
    params, unmatched = convert_unet_state_dict(unet_sd, num_stages, dtype, strict=False)
    if strict and unmatched:
        raise KeyError(f'unconverted torch keys: {unmatched}')
    tree = {'params': params}
    log_snr = convert_learned_log_snr(extras, dtype)
    if log_snr is not None:
        tree['log_snr'] = log_snr
        extras = {k: v for k, v in extras.items()
                  if k not in _LEARNED_LOG_SNR_KEYS}
    return tree, unmatched, extras
