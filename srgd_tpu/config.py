"""Configuration system.

Mirrors the reference's two-level config (dataclass defaults <- YAML overrides,
then CLI flags override specific fields post-load): /root/reference/config.py:5-194.
Field names and defaults are behavior-defining API surface, so they are preserved
verbatim; unknown YAML keys raise TypeError exactly like ``Config(**yaml)`` does in
the reference (config.py:191-194).

TPU-specific additions live at the bottom and are strictly additive (a reference
YAML loads unchanged).
"""

from __future__ import annotations

from dataclasses import dataclass, fields as dc_fields

import yaml


@dataclass
class Config:
    save_dir: str = 'srgd'
    prefix: str = 'conditional_continuous_linear'

    base_dir: str = './input/'
    dataset_name: str = 'cropped_df2kost_400x400_overlap200'

    # gaussian / elucidated / continuous and conditional_* variants
    model: str = 'continuous'

    cond_drop_prob: float = 0.1
    cond_scale: float = 1.        # CFG scale for the LR-image condition

    num_classes: int = 3
    conditional_task_type: str = 'realsr_denoise_sr'
    class_cond_drop_prob: float = 0.1
    class_cond_scale: float = 1.  # CFG scale for the degradation-class condition
    test_label: int = 0

    guidance_start_steps: int = 0
    class_guidance_start_steps: int = 0
    generation_start_steps: int = 0

    # discrete Gaussian diffusion family
    objective: str = 'pred_noise'  # pred_noise / pred_x0 / pred_v
    beta_schedule: str = 'linear'  # linear / cosine / sigmoid
    timesteps: int = 1000
    sampling_timesteps: int = 250  # < timesteps selects DDIM sampling
    offset_noise_strength: float = 0.

    loss_type: str = 'l2'  # l1 / l2 / smooth_l1

    # EDM (elucidated) family
    num_sample_steps: int = 32
    sigma_min: float = 0.002
    sigma_max: float = 80
    sigma_data: float = 0.5
    rho: float = 7
    P_mean: float = -1.2
    P_std: float = 1.2
    S_churn: float = 80
    S_tmin: float = 0.05
    S_tmax: float = 50
    S_noise: float = 1.003
    use_dpmpp_solver: bool = True

    # continuous-time family
    noise_schedule: str = 'linear'  # linear / cosine / learned
    clip_sample_denoised: bool = True
    learned_schedule_net_hidden_dim: int = 1024
    learned_noise_schedule_frac_gradient: float = 1.

    min_snr_loss_weight: bool = False
    min_snr_gamma: float = 5

    val_num_sample_steps: int = 32

    n_fold: int = 10
    train_fold: str = '0'

    skip_sample: bool = False
    skip_val: bool = False

    validation_ratio: float = 0.5

    val_realsrv3: bool = False
    val_drealsr: bool = False
    val_realsrv3_scale: int = 4  # only meaningful with val_realsrv3 /
    val_drealsr_scale: int = 4   # val_drealsr, which raise (datasets not
                                 # fetchable here; train/loop.py)

    image_size: int = 128
    crop_size: int = 256
    hr_image_size: int = 256
    lr_image_size: int = 128
    crop_rate: int = 2

    scale_size: int = 256

    crop_size_limit: bool = False

    pixel_shuffle_upsample: bool = True

    batch_size: int = 32

    sample_size: int = 16

    hflip: bool = False
    rotate: bool = False
    shuffle: bool = True

    torch_compile: bool = False  # accepted for YAML compat; no-op on TPU

    seed: int = 71

    amp: bool = False            # inference: accepted for compat (the
                                 # reference's shipped sampler never
                                 # autocasts, model.py:3288-3293 — TPU
                                 # precision is compute_dtype/quantize).
                                 # TRAINING honors it: bf16 compute with
                                 # f32 master params (train/loop.py)
    amp_dtype: str = 'float16'   # accepted for compat; the TPU trainer
                                 # always uses bfloat16 under amp (fp16 has
                                 # no MXU path and would need loss scaling)

    # U-Net
    unet_dim: int = 64
    ddpm_unet_dim_mults: str = '1,2,4,8'
    full_attn: str = 'False,False,False,True'
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = True
    learned_sinusoidal_dim: int = 32

    ema_decay: float = 0.995
    ema_device: str = 'cuda'  # accepted for YAML compat; ignored

    flash_attn: bool = False  # fused-attention toggle (reference Attend
                              # flash kernel) -> Pallas flash attention here

    ckpt_path: str = ''
    load_strict: bool = True

    # optimizer
    optimizer: str = 'adamw'
    lr: float = 1e-4
    min_lr: float = 1e-4
    weight_decay: float = 0.
    momentum: float = 0.9
    nesterov: bool = False
    amsgrad: bool = False
    madgrad_decoupled_decay: bool = True  # AdamW-style decay inside
                                          # optimizer: madgrad
                                          # (train/madgrad.py)

    # scheduler
    epochs: int = 300
    warmup_epochs: int = 0
    warmup_lr_init: float = 1e-6
    plateau_mode: str = 'min'
    factor: float = 0.1
    patience: int = 4
    plateau_eps: float = 1e-8
    scheduler: str = 'cosine'
    cosine_interval_type: str = 'step'

    train_preprocess: str = 'randomcrop'
    valid_preprocess: str = 'centercrop'

    train_trans_mode: str = 'realesrgan'
    valid_trans_mode: str = 'simple'

    usm_sharpener: bool = False

    interpolation: str = 'BICUBIC'

    blur_prob: float = 0.5
    advance_blur_prob: float = 0.5
    gaussian_blur_prob: float = 0.5
    sinc_blur_prob: float = 0.5
    sinc_blur_factor_min: float = 0.9
    sinc_blur_factor_max: float = 1.1
    image_compression_prob: float = 0.5
    quality_lower: int = 50
    quality_upper: int = 100
    noise_prob: float = 0.5
    gauss_noise_prob: float = 0.5
    iso_noise_prob: float = 0.5
    multiplicative_noise_prob: float = 0.5

    train: bool = True   # accepted for compat; ignored — reference run-mode
    test: bool = False   # switches its unreleased driver read; this repo's
    debug: bool = False  # entry points (infer/train/serve) select the mode

    save_validation_sample: bool = False
    save_validation_hr_sample: bool = False

    save_every_epoch: bool = False

    test_target: str = 'best_loss'

    num_workers: int = 4
    device: str = 'cuda'  # accepted for YAML compat; ignored (JAX picks devices)
    pin_memory: bool = True  # accepted for compat; ignored (torch DataLoader
                             # knob — the numpy prefetcher has no pinning)
    model_dir: str = 'models'
    log_dir: str = 'logs'
    print_freq: int = 0

    # ------------------------------------------------------------------
    # TPU-native additions (absent from reference YAMLs; defaults keep
    # reference behavior).
    # ------------------------------------------------------------------
    compute_dtype: str = 'float32'    # float32 / bfloat16 for U-Net compute
    param_dtype: str = 'float32'      # storage dtype of parameters
    quantize: str = 'none'            # 'w8a8' -> int8-MXU U-Net convs
                                      # (inference; nn/quant.py)
    quantize_min_channels: int = 0    # only quantize blocks >= this wide
    quantize_smooth_alpha: float = 0.0  # >0: SmoothQuant per-input-channel
                                      # smoothing with this alpha (quant.py)
    quantize_cal_mode: str = 'max'    # calibration scale estimator: 'max'
                                      # or 'p<pct>' (e.g. 'p99.9'; quant.py
                                      # _cal_amax; exclusive with
                                      # smooth_alpha > 0)
    use_pallas_kernels: bool = False  # round-1 fused Pallas attention /
                                      # GroupNorm+SiLU (opt-in, net-neutral)
    fused_linattn: bool = True        # whole-block Pallas linear attention
                                      # (kernels/linattn_block.py; bf16 TPU
                                      # inference only — trainer and mesh
                                      # paths force the XLA formulation)
    mesh_shape: str = ''              # e.g. '4,2' -> (data, model); '' = all-data
    remat_unet: bool = False          # jax.checkpoint the U-Net stages (training)
    tile_size: int = 256
    tile_stride: int = 0              # 0 = tile_size; smaller values overlap
                                      # the shifted grid (last-write-wins,
                                      # PARITY divergence #3); > tile_size raises
    continuous_sampler: str = 'ancestral'  # | 'ddim' (eta=ddim_eta updates)
                                      # | 'dpmpp' (DPM-Solver++(2M) multistep)
                                      # for the continuous family — additive
                                      # fast-sampling modes (the reference
                                      # ships ancestral only)
    ddim_eta: float = 0.0             # continuous 'ddim' stochasticity:
                                      # 0 = deterministic, 1 = ancestral-
                                      # equivalent posterior variance
    deep_cache_interval: int = 0      # >1: DeepCache-style sampling — the
                                      # U-Net's deep half recomputes only
                                      # every Nth step (per grid parity when
                                      # tiled); continuous family only.
                                      # 0/1 = exact sampling (default)
    deep_cache_depth: int = 2         # U-Net stage where the cached deep
                                      # half starts (1..n_stages-1)
    deep_cache_schedule: str = ''     # non-uniform refresh positions, e.g.
                                      # '0.5x3/0.5x1' = refresh every 3rd
                                      # step in the high-noise half, every
                                      # step in the low-noise half
                                      # (diffusion/base.refresh_mask);
                                      # '' = uniform every interval-th step
    lpips_weights_path: str = ''      # converted VGG16+LPIPS .npz for
                                      # test_target: best_lpips (utils/lpips.py)


def load_config(config_file) -> Config:
    """YAML keys override dataclass defaults; unknown keys are a TypeError.

    Parity: /root/reference/config.py:191-194. One divergence: YAML 1.1
    parses bare scientific notation ('lr: 1e-4' — the SHIPPED reference
    YAML's spelling) as a *string*; the reference never notices because its
    released code never reads lr, but our trainer does, so float/int
    dataclass fields coerce numeric strings after load.
    """
    with open(config_file, 'r') as fp:
        opts = yaml.safe_load(fp)
    conf = Config(**opts)
    for f in dc_fields(Config):
        v = getattr(conf, f.name)
        if isinstance(v, str) and f.type in ('float', 'int', float, int):
            try:
                setattr(conf, f.name, float(v) if f.type in ('float', float)
                        else int(v))
            except ValueError:
                pass  # leave non-numeric strings for downstream validation
    return conf


def config_field_names():
    return [f.name for f in dc_fields(Config)]
