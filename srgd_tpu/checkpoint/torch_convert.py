"""PyTorch .pth checkpoint -> Flax params conversion.

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
