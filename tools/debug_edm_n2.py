"""Mechanism probe for the red EDM tiled golden (VERDICT r3 weak #1).

Hypothesis: the failure is not in the tiled machinery but in the n=2 Karras
schedule itself — sigmas [80, 0.002, 0] make the Heun correction amplify any
fp discrepancy in the second network eval by 0.5*(sigma_hat-sigma_next)/
sigma_next ~= 2e4, so jax-vs-torch f32 conv noise (~1e-7 relative) lands at
~1e-3..1e-2 absolute. Test: run the PASSING single-tile Heun golden setup at
16px with n_steps in {2, 3, 4} and print max_err — no tiling involved.
"""
import sys
import numpy as np
import torch
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tests')
from test_reference_golden import ref_model, _ReplayNoise, nchw  # noqa: E402
from srgd_tpu.checkpoint.torch_convert import convert_unet_state_dict  # noqa
from srgd_tpu.diffusion.elucidated import ElucidatedDiffusion  # noqa
from srgd_tpu.nn.unet import SRUnet  # noqa

ref = ref_model()
dim = 8
torch.manual_seed(2)
tnet = ref.ConditionalSRUnet(
    dim=dim, dim_mults=(1, 2), full_attn=(False, True),
    learned_sinusoidal_cond=True, learned_sinusoidal_dim=8, num_classes=3)
tnet.eval()
sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
params, unmatched = convert_unet_state_dict(sd, num_stages=2)
assert not unmatched
jnet = SRUnet(dim=dim, dim_mults=(1, 2), full_attn=(False, True),
              learned_sinusoidal_cond=True, learned_sinusoidal_dim=8,
              num_classes=3)

gen = np.random.default_rng(5)
cond01 = gen.uniform(size=(1, 16, 16, 3)).astype(np.float32)
label = np.asarray([2])

for n_steps in (2, 3, 4):
    tdiff = ref.ConditionalElucidatedDiffusionSR(
        tnet, image_size=16, num_sample_steps=n_steps)
    jdiff = ElucidatedDiffusion(net=jnet, image_size=16,
                                num_sample_steps=n_steps)
    sig = np.asarray(tdiff.sample_schedule(n_steps))

    rng0 = jax.random.PRNGKey(29)
    rng1, init_key = jax.random.split(rng0)
    shape = (1, 16, 16, 3)
    init_raw = np.asarray(jax.random.normal(init_key, shape, jnp.float32))
    eps = [np.asarray(jax.random.normal(jax.random.fold_in(rng1, i), shape,
                                        jnp.float32))
           for i in range(n_steps)]

    ours = jdiff.sample_org(params={'params': params}, rng=rng0,
                            condition_x=jnp.asarray(cond01),
                            class_label=jnp.asarray(label))
    queue = [nchw(init_raw)] + [nchw(e) for e in eps]
    with torch.no_grad(), _ReplayNoise(queue) as replay:
        theirs = tdiff.sample_org(
            batch_size=1, condition_x=torch.as_tensor(nchw(cond01)),
            class_label=torch.as_tensor(label))
        assert not replay.queue
    theirs = np.moveaxis(theirs.numpy(), 1, -1)
    max_err = np.abs(np.asarray(ours) - theirs).max()
    # worst-step analytic amplification of second-eval fp noise
    amp = max(0.5 * (sig[i] - sig[i + 1]) / sig[i + 1]
              for i in range(n_steps - 1))
    print(f'n_steps={n_steps}: sigmas={np.round(sig, 4)} '
          f'heun_amp={amp:.0f} max_err={max_err:.2e}')
