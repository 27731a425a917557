"""Full-forward parity: srgd_tpu SRUnet (NHWC/flax) vs an independent torch
functional re-derivation of the reference U-Net, through the checkpoint
converter. This is the strongest correctness test we can run without the
reference's (uninstalled) libraries: it validates layer math, layout
conversion, and key mapping at once."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from srgd_tpu.checkpoint.torch_convert import convert_unet_state_dict
from srgd_tpu.nn.unet import SRUnet
from tests.torch_ref import make_state_dict, unet_forward

ATOL = 2e-4


def _run_pair(dim=16, dim_mults=(1, 2), full_attn=(False, True), size=16,
              num_classes=None, learned_sinusoidal=True, pixel_shuffle=True,
              batch=2, with_cond=True, with_label=False, seed=0):
    torch.manual_seed(seed)
    sd = make_state_dict(dim=dim, dim_mults=dim_mults, full_attn=full_attn,
                         num_classes=num_classes,
                         learned_sinusoidal=learned_sinusoidal,
                         learned_sinusoidal_dim=8,
                         pixel_shuffle=pixel_shuffle, seed=seed)
    params, unmatched = convert_unet_state_dict(
        {k: v.numpy() for k, v in sd.items()}, num_stages=len(dim_mults))
    assert not unmatched, unmatched

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(batch, size, size, 3)).astype(np.float32)
    cond = rng.normal(size=(batch, size, size, 3)).astype(np.float32) if with_cond else None
    time = rng.normal(size=(batch,)).astype(np.float32)
    label = rng.integers(0, num_classes, size=(batch,)) if with_label else None

    net = SRUnet(dim=dim, dim_mults=dim_mults, full_attn=full_attn,
                 learned_sinusoidal_cond=learned_sinusoidal,
                 learned_sinusoidal_dim=8,
                 pixel_shuffle_upsample=pixel_shuffle,
                 num_classes=num_classes)
    ours = net.apply({'params': params}, jnp.asarray(x), jnp.asarray(time),
                     cond=None if cond is None else jnp.asarray(cond),
                     class_label=None if label is None else jnp.asarray(label))
    ours = np.asarray(ours)

    with torch.no_grad():
        theirs = unet_forward(
            sd, torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(time),
            class_label=None if label is None else torch.from_numpy(label),
            cond=None if cond is None else torch.from_numpy(cond).permute(0, 3, 1, 2),
            dim=dim, dim_mults=dim_mults, full_attn=full_attn,
            learned_sinusoidal=learned_sinusoidal, pixel_shuffle=pixel_shuffle)
    theirs = theirs.permute(0, 2, 3, 1).numpy()

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=ATOL, rtol=1e-3)
    return sd, params, net, x, time, cond


def test_parity_2stage():
    _run_pair()


def test_parity_3stage_conditional():
    _run_pair(dim=8, dim_mults=(1, 2, 4), full_attn=(False, False, True),
              size=24, num_classes=3, with_label=True, seed=1)


def test_parity_nearest_upsample():
    _run_pair(pixel_shuffle=False, seed=2)


def test_parity_plain_sinusoidal():
    # gaussian family uses the non-learned sinusoidal embedding (dim>=2 halves)
    _run_pair(dim=16, learned_sinusoidal=False, seed=3)


def test_parity_no_cond():
    # null LR condition: reference substitutes zeros_like (model.py:681-684)
    _run_pair(with_cond=False, seed=4)


def test_class_mask_equals_no_label():
    """class_mask=0 must equal omitting the label entirely (the CFG null)."""
    sd = make_state_dict(dim=8, dim_mults=(1, 2), full_attn=(False, True),
                         num_classes=3, seed=5, learned_sinusoidal_dim=8)
    params, _ = convert_unet_state_dict({k: v.numpy() for k, v in sd.items()},
                                        num_stages=2)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    time = jnp.asarray(rng.normal(size=(2,)).astype(np.float32))
    label = jnp.asarray([1, 2])

    net = SRUnet(dim=8, dim_mults=(1, 2), full_attn=(False, True),
                 learned_sinusoidal_cond=True, learned_sinusoidal_dim=8,
                 num_classes=3)
    out_nolabel = net.apply({'params': params}, x, time, class_label=None)
    out_masked = net.apply({'params': params}, x, time, class_label=label,
                           class_mask=jnp.zeros((2,)))
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_nolabel),
                               atol=1e-6)
    out_label = net.apply({'params': params}, x, time, class_label=label)
    assert np.abs(np.asarray(out_label) - np.asarray(out_nolabel)).max() > 1e-4


def test_downsample_factor_assert():
    net = SRUnet(dim=8, dim_mults=(1, 2, 4), full_attn=(False, False, True))
    x = jnp.zeros((1, 18, 18, 3))
    with pytest.raises(AssertionError):
        net.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
