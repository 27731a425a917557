"""Checkpoint conversion CLI: reference torch .pth -> native orbax params.

The factory converts .pth files on the fly (factory.load_params); this CLI
does it once offline so repeated inference runs skip the torch load + key
rewrite (~550 MB of fp32 for the shipped model).

    python -m srgd_tpu.checkpoint.convert \
        -c conf/conditional_continuous_linear_df8kost_dim128.yaml \
        -m model.pth -o converted_ckpt/ [--param_dtype bfloat16]

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
    p.add_argument('-m', '--ckpt_path', required=True, help='torch .pth')
    p.add_argument('-o', '--out_dir', required=True, help='orbax output dir')
    p.add_argument('--param_dtype', default='',
                   help='float32 / bfloat16 (default: config param_dtype)')
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from srgd_tpu.checkpoint.io import save_params
    from srgd_tpu.checkpoint.torch_convert import convert_checkpoint
    from srgd_tpu.config import load_config

    conf = load_config(args.conf)
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
