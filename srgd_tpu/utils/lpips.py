"""LPIPS perceptual metric (VGG16 backbone), TPU-native JAX.

The reference's checkpoint policy names ``test_target: best_lpips``
(/root/reference/config.py:181) but ships no metric code. This module
implements the LPIPS(VGG) computation with math parity to the
richzhang/PerceptualSimilarity reference implementation:

  scale inputs -> VGG16 conv features at relu1_2/relu2_2/relu3_3/relu4_3/
  relu5_3 -> unit-normalize channels -> squared difference -> learned 1x1
  linear heads -> spatial mean -> sum over the five layers.

The pretrained VGG16 + LPIPS linear weights CANNOT be fetched in this
environment (no network egress, torchvision absent), so ``lpips`` takes an
explicit params pytree: convert the official torch weights offline with
``convert_torch_lpips`` and load the .npz with ``load_lpips_params``.
Requesting best_lpips without weights raises a clear error in the trainer
(srgd_tpu/train/loop.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# VGG16 feature config: (block, convs-per-block, width); features tapped
# after the last ReLU of each block, pre-pool.
VGG_BLOCKS = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))

# LPIPS input scaling layer constants (richzhang's ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def vgg16_features(params, x):
    """x: (B, H, W, 3) in [-1, 1] (LPIPS convention). Returns the 5 tap
    feature maps. params['conv_{b}_{i}'] = {'kernel': HWIO, 'bias': (C,)}."""
    feats = []
    h = x
    for bi, (n_convs, _width) in enumerate(VGG_BLOCKS):
        for ci in range(n_convs):
            p = params[f'conv_{bi}_{ci}']
            h = jax.lax.conv_general_dilated(
                h, p['kernel'].astype(h.dtype), (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            h = h + p['bias'].astype(h.dtype)
            h = jax.nn.relu(h)
        feats.append(h)
        if bi < len(VGG_BLOCKS) - 1:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), 'VALID')
    return feats


def _unit_normalize(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(f), axis=-1, keepdims=True))
    return f / (norm + eps)


def lpips(a, b, params):
    """LPIPS(VGG) distance between image batches a, b in [0, 1], NHWC.

    params: {'vgg': vgg16 params, 'lin': {'lin{k}': (C_k,) weights}}.
    Returns (B,) distances (lower = more similar)."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)

    def prep(x):
        x = x * 2.0 - 1.0                       # [0,1] -> [-1,1]
        return (x - shift) / scale

    fa = vgg16_features(params['vgg'], prep(a))
    fb = vgg16_features(params['vgg'], prep(b))
    total = 0.0
    for k, (xa, xb) in enumerate(zip(fa, fb)):
        d = jnp.square(_unit_normalize(xa) - _unit_normalize(xb))
        w = params['lin'][f'lin{k}'].astype(d.dtype)   # (C,) nonneg 1x1 conv
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


def convert_torch_lpips(vgg_features_state: dict, lin_state: dict) -> dict:
    """Convert torch state dicts to the params pytree.

    vgg_features_state: torchvision vgg16().features.state_dict()
      (keys '{idx}.weight' OIHW / '{idx}.bias'; conv indices
       0,2, 5,7, 10,12,14, 17,19,21, 24,26,28).
    lin_state: lpips.LPIPS(net='vgg') lin state dict
      (keys 'lin{k}.model.1.weight' of shape (1, C, 1, 1)).
    """
    conv_idx = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
    vgg = {}
    for bi, idxs in enumerate(conv_idx):
        for ci, idx in enumerate(idxs):
            w = np.asarray(vgg_features_state[f'{idx}.weight'], np.float32)
            b = np.asarray(vgg_features_state[f'{idx}.bias'], np.float32)
            vgg[f'conv_{bi}_{ci}'] = {
                'kernel': np.transpose(w, (2, 3, 1, 0)),   # OIHW -> HWIO
                'bias': b}
    lin = {}
    for k in range(5):
        w = np.asarray(lin_state[f'lin{k}.model.1.weight'], np.float32)
        lin[f'lin{k}'] = w.reshape(-1)
    return {'vgg': vgg, 'lin': lin}


def save_lpips_params(path: str, params: dict):
    flat = {}
    for name, p in params['vgg'].items():
        flat[f'vgg.{name}.kernel'] = np.asarray(p['kernel'])
        flat[f'vgg.{name}.bias'] = np.asarray(p['bias'])
    for name, w in params['lin'].items():
        flat[f'lin.{name}'] = np.asarray(w)
    np.savez(path, **flat)


def load_lpips_params(path: str) -> dict:
    data = np.load(path)
    vgg, lin = {}, {}
    for key in data.files:
        if key.startswith('vgg.'):
            _, name, leaf = key.split('.')
            vgg.setdefault(name, {})[leaf] = jnp.asarray(data[key])
        else:
            lin[key.split('.', 1)[1]] = jnp.asarray(data[key])
    return {'vgg': vgg, 'lin': lin}


def random_lpips_params(rng: jax.Array) -> dict:
    """Random-weight params with the right structure — for tests only (the
    metric is meaningless without the pretrained weights)."""
    vgg, lin = {}, {}
    c_in = 3
    for bi, (n_convs, width) in enumerate(VGG_BLOCKS):
        for ci in range(n_convs):
            rng, k1, k2 = jax.random.split(rng, 3)
            vgg[f'conv_{bi}_{ci}'] = {
                'kernel': jax.random.normal(k1, (3, 3, c_in, width),
                                            jnp.float32) * 0.05,
                'bias': jnp.zeros((width,), jnp.float32)}
            c_in = width
        lin[f'lin{bi}'] = jnp.abs(jax.random.normal(
            jax.random.fold_in(rng, bi), (width,), jnp.float32))
    return {'vgg': vgg, 'lin': lin}
