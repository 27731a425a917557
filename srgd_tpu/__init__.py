"""srgd-tpu: TPU-native Real-SRGD (classifier-free guided diffusion for
real-world 4x super-resolution), rebuilt from scratch in JAX/XLA/Pallas.

Public surface:
    srgd_tpu.config.load_config      YAML -> Config (reference field surface)
    srgd_tpu.factory.get_model       Config -> (wrapper, net, params)
    wrapper.tiled_sample / .sample   inference
    wrapper.loss                     training loss
    python -m srgd_tpu.infer         reference-parity CLI
    python -m srgd_tpu.train.loop    trainer
    python -m srgd_tpu.checkpoint.convert   .pth -> orbax
"""

__version__ = '0.2.0'
