"""Checkpoint conversion CLI: reference torch .pth <-> native orbax params.

Forward (default): the factory converts .pth files on the fly
(factory.load_params); this CLI does it once offline so repeated inference
runs skip the torch load + key rewrite (~550 MB of fp32 for the shipped
model).

    python -m srgd_tpu.checkpoint.convert \
        -c conf/conditional_continuous_linear_df8kost_dim128.yaml \
        -m model.pth -o converted_ckpt/ [--param_dtype bfloat16]

Reverse (``--reverse``): export a native checkpoint (an orbax params dir —
either converter output or a trainer state, whose EMA weights are taken,
matching the reference's EMA-shadow save) back to the reference's .pth
layout, so models trained here migrate back to the torch stack:

    python -m srgd_tpu.checkpoint.convert -c conf.yaml --reverse \
        -m trained_ckpt_dir/ -o exported.pth

Reference checkpoint format: torch.load(...)['ema_model'] EMA state dict
(/root/reference/model.py:3659-3664).
"""

from __future__ import annotations

import argparse
import logging

logger = logging.getLogger('srgd_tpu.convert')


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format='%(asctime)s %(message)s')
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('-c', '--conf', required=True, help='model config YAML')
    p.add_argument('-m', '--ckpt_path', required=True,
                   help='torch .pth (forward) / orbax params dir (reverse)')
    p.add_argument('-o', '--out_dir', required=True,
                   help='orbax output dir (forward) / .pth path (reverse)')
    p.add_argument('--param_dtype', default='',
                   help='float32 / bfloat16 (default: config param_dtype; '
                        'reverse always exports float32, the torch format)')
    p.add_argument('--reverse', action='store_true',
                   help='export orbax params back to the reference .pth '
                        'layout instead')
    args = p.parse_args(argv)

    # honor JAX_PLATFORMS=cpu even under the axon site hook, like the other
    # CLI entry points (conversion never needs the accelerator)
    from srgd_tpu.utils.platform import sync_platform_env
    sync_platform_env()

    import jax
    import jax.numpy as jnp

    from srgd_tpu.config import load_config

    conf = load_config(args.conf)

    if args.reverse:
        import numpy as np
        import torch

        from srgd_tpu.checkpoint.io import restore_params
        from srgd_tpu.checkpoint.torch_convert import export_torch_state_dict

        raw = restore_params(args.ckpt_path)
        # trainer states carry the EMA shadow; bare converter output is the
        # variables dict itself
        tree = raw['ema_params'] if 'ema_params' in raw else raw
        sd = export_torch_state_dict(
            tree, model=conf.model,
            pixel_shuffle_upsample=conf.pixel_shuffle_upsample)
        n = sum(int(np.asarray(v).size) for v in sd.values())
        torch.save({'ema_model': {k: torch.from_numpy(np.asarray(v))
                                  for k, v in sd.items()}}, args.out_dir)
        logger.info('exported %s -> %s (%.1fM params, %d torch keys)',
                    args.ckpt_path, args.out_dir, n / 1e6, len(sd))
        return

    from srgd_tpu.checkpoint.io import save_params
    from srgd_tpu.checkpoint.torch_convert import convert_checkpoint

    params, unmatched, extras = convert_checkpoint(
        args.ckpt_path, num_stages=len(conf.ddpm_unet_dim_mults.split(',')),
        strict=conf.load_strict)
    dtype = args.param_dtype or conf.param_dtype
    if dtype == 'bfloat16':
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    n = sum(int(a.size) for a in jax.tree.leaves(params))
    save_params(args.out_dir, params)
    logger.info('converted %s -> %s (%.1fM params, dtype=%s, unmatched=%s, '
                'extras=%d)', args.ckpt_path, args.out_dir, n / 1e6, dtype,
                unmatched, len(extras))


if __name__ == '__main__':
    main()
