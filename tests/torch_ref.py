"""Independent PyTorch *functional* re-derivation of the reference U-Net math,
used as the golden model for parity tests (the reference's own libraries are
not installed in this image).

This is a test fixture, written NCHW with torch.nn.functional primitives and
consuming a state dict with the reference's exact key names
(/root/reference/model.py:359-725) — so it simultaneously validates
srgd_tpu's math and the torch->flax checkpoint converter.
"""

import math

import torch
import torch.nn.functional as F


def _conv(x, sd, key, padding=0):
    return F.conv2d(x, sd[f'{key}.weight'], sd.get(f'{key}.bias'), padding=padding)


def _linear(x, sd, key):
    return F.linear(x, sd[f'{key}.weight'], sd[f'{key}.bias'])


def _block(x, sd, key, scale_shift=None):
    x = _conv(x, sd, f'{key}.proj', padding=1)
    x = F.group_norm(x, 8, sd[f'{key}.norm.weight'], sd[f'{key}.norm.bias'], eps=1e-5)
    if scale_shift is not None:
        scale, shift = scale_shift
        x = x * (scale + 1) + shift
    return F.silu(x)


def _resnet(x, t, sd, key):
    scale_shift = None
    if f'{key}.mlp.1.weight' in sd:
        ts = _linear(F.silu(t), sd, f'{key}.mlp.1')[:, :, None, None]
        scale_shift = ts.chunk(2, dim=1)
    h = _block(x, sd, f'{key}.block1', scale_shift)
    h = _block(h, sd, f'{key}.block2')
    if f'{key}.res_conv.weight' in sd:
        return h + _conv(x, sd, f'{key}.res_conv')
    return h + x


def _rmsnorm(x, g):
    return F.normalize(x, dim=1) * g * (x.shape[1] ** 0.5)


def _linear_attention(x, sd, key, heads=4, dim_head=32):
    b, c, hh, ww = x.shape
    n = hh * ww
    y = _rmsnorm(x, sd[f'{key}.norm.g'])
    qkv = F.conv2d(y, sd[f'{key}.to_qkv.weight'])
    q, k, v = qkv.reshape(b, 3, heads, dim_head, n).unbind(1)
    q = q.softmax(dim=-2) * dim_head ** -0.5
    k = k.softmax(dim=-1)
    context = torch.einsum('bhdn,bhen->bhde', k, v)
    out = torch.einsum('bhde,bhdn->bhen', context, q)
    out = out.reshape(b, heads * dim_head, hh, ww)
    out = _conv(out, sd, f'{key}.to_out.0')
    return _rmsnorm(out, sd[f'{key}.to_out.1.g'])


def _full_attention(x, sd, key, heads=4, dim_head=32):
    b, c, hh, ww = x.shape
    n = hh * ww
    y = _rmsnorm(x, sd[f'{key}.norm.g'])
    qkv = F.conv2d(y, sd[f'{key}.to_qkv.weight'])
    q, k, v = qkv.reshape(b, 3, heads, dim_head, n).unbind(1)
    q, k, v = (t.transpose(-2, -1) for t in (q, k, v))  # (b, h, n, d)
    sim = torch.einsum('bhnd,bhmd->bhnm', q, k) * dim_head ** -0.5
    out = torch.einsum('bhnm,bhmd->bhnd', sim.softmax(dim=-1), v)
    out = out.transpose(-2, -1).reshape(b, heads * dim_head, hh, ww)
    return _conv(out, sd, f'{key}.to_out')


def _attn(x, sd, key, is_full):
    fn = _full_attention if is_full else _linear_attention
    return fn(x, sd, key) + x


def _downsample(x, sd, key):
    b, c, h, w = x.shape
    y = x.reshape(b, c, h // 2, 2, w // 2, 2)
    y = y.permute(0, 1, 3, 5, 2, 4).reshape(b, c * 4, h // 2, w // 2)
    return _conv(y, sd, f'{key}.1')


def _pixelshuffle_up(x, sd, key):
    y = F.silu(_conv(x, sd, f'{key}.net.0'))
    return F.pixel_shuffle(y, 2)


def _nearest_up(x, sd, key):
    y = F.interpolate(x, scale_factor=2, mode='nearest')
    return _conv(y, sd, f'{key}.1', padding=1)


def _time_embedding(time, sd, dim, learned):
    if learned:
        w = sd['time_mlp.0.weights']
        x = time[:, None]
        freqs = x * w[None, :] * 2 * math.pi
        emb = torch.cat([x, freqs.sin(), freqs.cos()], dim=-1)
    else:
        half = dim // 2
        scale = math.log(10000) / (half - 1)
        freqs = torch.exp(torch.arange(half, dtype=time.dtype) * -scale)
        arg = time[:, None] * freqs[None, :]
        emb = torch.cat([arg.sin(), arg.cos()], dim=-1)
    emb = _linear(emb, sd, 'time_mlp.1')
    emb = F.gelu(emb)
    return _linear(emb, sd, 'time_mlp.3')


def unet_forward(sd, x, time, class_label=None, cond=None, *,
                 dim, dim_mults=(1, 2, 4, 8), full_attn=(False, False, False, True),
                 learned_sinusoidal=True, pixel_shuffle=True):
    """NCHW forward with reference semantics (model.py:678-725)."""
    n_stages = len(dim_mults)
    if cond is None:
        cond = torch.zeros_like(x)
    x = torch.cat([x, cond], dim=1)
    x = _conv(x, sd, 'init_conv', padding=3)
    r = x

    t = _time_embedding(time, sd, dim, learned_sinusoidal)
    if class_label is not None:
        c = F.embedding(class_label, sd['class_mlp.0.weight'])
        c = _linear(c, sd, 'class_mlp.1')
        c = _linear(F.gelu(c), sd, 'class_mlp.3')
        t = t + c

    hs = []
    for i in range(n_stages):
        x = _resnet(x, t, sd, f'downs.{i}.0')
        hs.append(x)
        x = _resnet(x, t, sd, f'downs.{i}.1')
        x = _attn(x, sd, f'downs.{i}.2', full_attn[i])
        hs.append(x)
        if i < n_stages - 1:
            x = _downsample(x, sd, f'downs.{i}.3')
        else:
            x = _conv(x, sd, f'downs.{i}.3', padding=1)

    x = _resnet(x, t, sd, 'mid_block1')
    x = _attn(x, sd, 'mid_attn', True)
    x = _resnet(x, t, sd, 'mid_block2')

    rev_full = list(reversed(full_attn))
    for i in range(n_stages):
        x = torch.cat([x, hs.pop()], dim=1)
        x = _resnet(x, t, sd, f'ups.{i}.0')
        x = torch.cat([x, hs.pop()], dim=1)
        x = _resnet(x, t, sd, f'ups.{i}.1')
        x = _attn(x, sd, f'ups.{i}.2', rev_full[i])
        if i < n_stages - 1:
            x = (_pixelshuffle_up if pixel_shuffle else _nearest_up)(x, sd, f'ups.{i}.3')
        else:
            x = _conv(x, sd, f'ups.{i}.3', padding=1)

    x = torch.cat([x, r], dim=1)
    x = _resnet(x, t, sd, 'final_res_block')
    return _conv(x, sd, 'final_conv')


# ---------------------------------------------------------------------------
# Random state-dict generator with reference key names/shapes
# ---------------------------------------------------------------------------

def make_state_dict(dim=16, dim_mults=(1, 2), full_attn=(False, True),
                    channels=3, learned_sinusoidal_dim=8, num_classes=None,
                    learned_sinusoidal=True, pixel_shuffle=True, heads=4,
                    dim_head=32, seed=0):
    g = torch.Generator().manual_seed(seed)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    sd = {}
    time_dim = dim * 4
    n_stages = len(dim_mults)
    dims = [dim] + [dim * m for m in dim_mults]
    in_out = list(zip(dims[:-1], dims[1:]))
    hidden = heads * dim_head

    def add_conv(key, o, i, k):
        sd[f'{key}.weight'] = t(o, i, k, k)
        sd[f'{key}.bias'] = t(o)

    def add_resnet(key, d_in, d_out):
        sd[f'{key}.mlp.1.weight'] = t(d_out * 2, time_dim)
        sd[f'{key}.mlp.1.bias'] = t(d_out * 2)
        add_conv(f'{key}.block1.proj', d_out, d_in, 3)
        sd[f'{key}.block1.norm.weight'] = 1 + t(d_out)
        sd[f'{key}.block1.norm.bias'] = t(d_out)
        add_conv(f'{key}.block2.proj', d_out, d_out, 3)
        sd[f'{key}.block2.norm.weight'] = 1 + t(d_out)
        sd[f'{key}.block2.norm.bias'] = t(d_out)
        if d_in != d_out:
            add_conv(f'{key}.res_conv', d_out, d_in, 1)

    def add_attn(key, d, is_full):
        sd[f'{key}.norm.g'] = 1 + t(1, d, 1, 1)
        sd[f'{key}.to_qkv.weight'] = t(hidden * 3, d, 1, 1)
        if is_full:
            add_conv(f'{key}.to_out', d, hidden, 1)
        else:
            add_conv(f'{key}.to_out.0', d, hidden, 1)
            sd[f'{key}.to_out.1.g'] = 1 + t(1, d, 1, 1)

    add_conv('init_conv', dim, channels * 2, 7)
    if learned_sinusoidal:
        sd['time_mlp.0.weights'] = t(learned_sinusoidal_dim // 2)
        fourier = learned_sinusoidal_dim + 1
    else:
        fourier = dim
    sd['time_mlp.1.weight'] = t(time_dim, fourier)
    sd['time_mlp.1.bias'] = t(time_dim)
    sd['time_mlp.3.weight'] = t(time_dim, time_dim)
    sd['time_mlp.3.bias'] = t(time_dim)

    if num_classes is not None:
        sd['class_mlp.0.weight'] = t(num_classes, dim)
        sd['class_mlp.1.weight'] = t(time_dim, dim)
        sd['class_mlp.1.bias'] = t(time_dim)
        sd['class_mlp.3.weight'] = t(time_dim, time_dim)
        sd['class_mlp.3.bias'] = t(time_dim)

    for i, (d_in, d_out) in enumerate(in_out):
        add_resnet(f'downs.{i}.0', d_in, d_in)
        add_resnet(f'downs.{i}.1', d_in, d_in)
        add_attn(f'downs.{i}.2', d_in, full_attn[i])
        if i < n_stages - 1:
            add_conv(f'downs.{i}.3.1', d_out, d_in * 4, 1)
        else:
            add_conv(f'downs.{i}.3', d_out, d_in, 3)

    mid = dims[-1]
    add_resnet('mid_block1', mid, mid)
    add_attn('mid_attn', mid, True)
    add_resnet('mid_block2', mid, mid)

    rev_inout = list(reversed(in_out))
    rev_full = list(reversed(full_attn))
    for i, (d_in, d_out) in enumerate(rev_inout):
        add_resnet(f'ups.{i}.0', d_out + d_in, d_out)
        add_resnet(f'ups.{i}.1', d_out + d_in, d_out)
        add_attn(f'ups.{i}.2', d_out, rev_full[i])
        if i < n_stages - 1:
            if pixel_shuffle:
                add_conv(f'ups.{i}.3.net.0', d_in * 4, d_out, 1)
            else:
                add_conv(f'ups.{i}.3.1', d_in, d_out, 3)
        else:
            add_conv(f'ups.{i}.3', d_in, d_out, 3)

    add_resnet('final_res_block', dim * 2, dim)
    add_conv('final_conv', channels, dim, 1)
    return sd
