"""The shipped flagship YAML loads and builds the shipped model.

Parity target: /root/reference/conf/conditional_continuous_linear_df8kost_dim128.yaml
loaded through Config(**yaml) (/root/reference/config.py:191-194) and built by
get_model (/root/reference/model.py:3500-3666)."""

import os

import jax
import jax.numpy as jnp

from srgd_tpu.config import load_config
from srgd_tpu.diffusion.continuous import ContinuousDiffusion
from srgd_tpu.factory import build_wrapper
from srgd_tpu.nn.unet import build_unet_from_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAGSHIP_YAML = os.path.join(
    REPO, 'conf', 'conditional_continuous_linear_df8kost_dim128.yaml')
SERVING_YAML = os.path.join(
    REPO, 'conf',
    'conditional_continuous_linear_df8kost_dim128_tpu_serving.yaml')


def test_flagship_yaml_loads():
    conf = load_config(FLAGSHIP_YAML)
    # the values that select the shipped model (reference yaml:15-17, 44-49)
    assert conf.model == 'conditional_continuous'
    assert conf.noise_schedule == 'linear'
    assert conf.num_sample_steps == 250
    assert conf.unet_dim == 128
    assert conf.ddpm_unet_dim_mults == '1,2,4,8'
    assert conf.learned_sinusoidal_cond is True
    assert conf.learned_sinusoidal_dim == 32
    assert conf.image_size == 256 and conf.lr_image_size == 64  # 4x
    assert conf.num_classes == 3  # default, not overridden (config.py:20)
    assert conf.ema_decay == 0.9999
    assert conf.class_cond_drop_prob == 0.1


def test_flagship_yaml_builds_shipped_wrapper():
    conf = load_config(FLAGSHIP_YAML)
    net = build_unet_from_config(conf)
    wrapper = build_wrapper(conf, net)
    assert isinstance(wrapper, ContinuousDiffusion)
    assert wrapper.num_sample_steps == 250
    assert wrapper.noise_schedule == 'linear'
    # factory forces the dpmpp flag off for continuous (model.py:3636)
    assert conf.use_dpmpp_solver is False

    # parameter count matches the released checkpoint: 550,400,570-byte fp32
    # EMA state dict ~= 137M params (BASELINE.md). eval_shape only — no FLOPs.
    shapes = jax.eval_shape(
        lambda k: net.init(k, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,)),
                           cond=jnp.zeros((1, 256, 256, 3)),
                           class_label=jnp.zeros((1,), jnp.int32)),
        jax.random.PRNGKey(0))
    n_params = sum(int(jnp.prod(jnp.array(a.shape)))
                   for a in jax.tree.leaves(shapes))
    assert 130e6 < n_params < 145e6, n_params


def test_tpu_serving_yaml_same_model_different_execution():
    """The serving profile must load the SAME checkpoint (identical model
    keys and parameter tree) and differ only in TPU execution knobs."""
    base = load_config(FLAGSHIP_YAML)
    srv = load_config(SERVING_YAML)
    for key in ('model', 'noise_schedule', 'num_sample_steps', 'unet_dim',
                'ddpm_unet_dim_mults', 'learned_sinusoidal_cond',
                'learned_sinusoidal_dim', 'image_size', 'num_classes'):
        assert getattr(base, key) == getattr(srv, key), key
    assert srv.compute_dtype == 'bfloat16'
    assert srv.quantize == 'w8a8' and srv.quantize_min_channels == 512

    net_b = build_unet_from_config(base)
    net_s = build_unet_from_config(srv)
    args = (jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)))
    kw = dict(cond=jnp.zeros((1, 32, 32, 3)),
              class_label=jnp.zeros((1,), jnp.int32))
    sb = jax.eval_shape(lambda k: net_b.init(k, *args, **kw),
                        jax.random.PRNGKey(0))
    ss = jax.eval_shape(lambda k: net_s.init(k, *args, **kw),
                        jax.random.PRNGKey(0))
    assert jax.tree.structure(sb) == jax.tree.structure(ss)
    assert [a.shape for a in jax.tree.leaves(sb)] == \
        [a.shape for a in jax.tree.leaves(ss)]


def test_numeric_string_coercion():
    """YAML 1.1 parses 'lr: 1e-4' (the shipped reference YAML's spelling) as
    a string; float/int fields coerce after load so the trainer gets real
    numbers. Non-numeric strings survive for downstream validation."""
    import tempfile

    from srgd_tpu.config import load_config

    with tempfile.NamedTemporaryFile('w', suffix='.yaml', delete=False) as f:
        f.write('lr: 1e-4\nmin_lr: 1e-7\nepochs: "300"\nprefix: 1e-4\n')
        path = f.name
    conf = load_config(path)
    assert conf.lr == 1e-4 and isinstance(conf.lr, float)
    assert conf.min_lr == 1e-7
    assert conf.epochs == 300 and isinstance(conf.epochs, int)
    assert conf.prefix == '1e-4'        # str field: untouched

    # the real shipped reference YAML's lr arrives as a float
    conf = load_config(
        '/root/reference/conf/conditional_continuous_linear_df8kost_dim128.yaml')
    assert conf.lr == 1e-4 and isinstance(conf.lr, float)
