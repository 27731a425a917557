"""Training data pipeline: image folder -> (hr, lr_condition, label) batches.

The reference released no trainer or dataset code; its config implies a
Real-ESRGAN-style degradation pipeline (train_trans_mode: 'realesrgan',
config.py:149-150) over HR crops with hflip/90-degree-rotation augmentation
(config.py:94-95) and a 3-class degradation-conditioning task
'realsr_denoise_sr' (config.py:20-21). This module re-creates that surface:

  class 0 'realsr':  blur -> x4 downscale -> noise -> jpeg -> bicubic up
  class 1 'denoise': additive noise at HR resolution
  class 2 'sr':      clean x4 bicubic down -> bicubic up

The exact recipe was never shipped, so this is a documented re-creation, not
parity. Host-side (PIL/numpy) with a thread prefetcher; the TPU only ever
sees fixed-shape float32 batches.
"""

from __future__ import annotations

import glob
import io
import os
import queue
import threading
from typing import Iterator

import numpy as np

CLASS_REALSR, CLASS_DENOISE, CLASS_SR = 0, 1, 2


def list_images(root: str) -> list:
    exts = ('*.png', '*.jpg', '*.jpeg', '*.bmp', '*.webp')
    files = []
    for e in exts:
        files += glob.glob(os.path.join(root, '**', e), recursive=True)
    return sorted(files)


def _random_crop(img: np.ndarray, size: int, rng: np.random.Generator):
    h, w = img.shape[:2]
    if h < size or w < size:
        # upscale-pad small images to the crop size
        from PIL import Image
        scale = max(size / h, size / w)
        im = Image.fromarray(img).resize(
            (max(size, int(w * scale + 0.5)), max(size, int(h * scale + 0.5))),
            Image.BICUBIC)
        img = np.asarray(im)
        h, w = img.shape[:2]
    y = int(rng.integers(0, h - size + 1))
    x = int(rng.integers(0, w - size + 1))
    return img[y:y + size, x:x + size]


def _augment(img: np.ndarray, rng, hflip: bool, rotate: bool):
    if hflip and rng.random() < 0.5:
        img = img[:, ::-1]
    if rotate:
        img = np.rot90(img, k=int(rng.integers(0, 4)))
    return np.ascontiguousarray(img)


def _jpeg(img: np.ndarray, quality: int) -> np.ndarray:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format='JPEG', quality=quality)
    buf.seek(0)
    return np.asarray(Image.open(buf).convert('RGB'))


def _gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    from srgd_tpu.train import native
    out = native.gaussian_blur(img, sigma)
    if out is not None:
        return out
    from PIL import Image, ImageFilter
    return np.asarray(Image.fromarray(img).filter(
        ImageFilter.GaussianBlur(radius=sigma)))


def _resize(img: np.ndarray, size) -> np.ndarray:
    # size is (W, H) PIL-style
    from srgd_tpu.train import native
    out = native.bicubic_resize(img, size[1], size[0])
    if out is not None:
        return out
    from PIL import Image
    return np.asarray(Image.fromarray(img).resize(size, Image.BICUBIC))


def degrade(hr: np.ndarray, label: int, rng: np.random.Generator,
            scale: int = 4, quality_lower: int = 50, quality_upper: int = 95,
            noise_range=(2.0, 20.0), blur_sigma=(0.2, 2.0)) -> np.ndarray:
    """HR uint8 (S, S, 3) -> degraded condition uint8 (S, S, 3) (already
    bicubic-upscaled back to HR size, as fed to the net)."""
    size = hr.shape[0]
    lr_size = size // scale

    if label == CLASS_SR:
        lr = _resize(hr, (lr_size, lr_size))
        return _resize(lr, (size, size))

    if label == CLASS_DENOISE:
        sigma = rng.uniform(*noise_range)
        noisy = hr.astype(np.float32) + rng.normal(0, sigma, hr.shape)
        return np.clip(noisy, 0, 255).astype(np.uint8)

    # CLASS_REALSR: blur -> down -> noise -> jpeg -> up
    out = hr
    if rng.random() < 0.8:
        out = _gaussian_blur(out, float(rng.uniform(*blur_sigma)))
    out = _resize(out, (lr_size, lr_size))
    if rng.random() < 0.8:
        sigma = rng.uniform(*noise_range) / scale
        out = np.clip(out.astype(np.float32)
                      + rng.normal(0, sigma, out.shape), 0, 255).astype(np.uint8)
    if rng.random() < 0.8:
        out = _jpeg(out, int(rng.integers(quality_lower, quality_upper + 1)))
    return _resize(out, (size, size))


class DegradationDataset:
    """Iterable over (hr, cond, label) float32 [0,1] batches with prefetch."""

    def __init__(self, root: str, crop_size: int = 256, batch_size: int = 16,
                 num_classes: int = 3, hflip: bool = True, rotate: bool = True,
                 seed: int = 0, num_workers: int = 4,
                 quality_lower: int = 50, quality_upper: int = 95):
        self.files = list_images(root)
        if not self.files:
            raise FileNotFoundError(f'no images under {root}')
        self.crop_size = crop_size
        self.batch_size = batch_size
        self.num_classes = num_classes
        self.hflip, self.rotate = hflip, rotate
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.quality = (quality_lower, quality_upper)

    def _sample(self, rng: np.random.Generator):
        from PIL import Image
        path = self.files[int(rng.integers(0, len(self.files)))]
        img = np.asarray(Image.open(path).convert('RGB'))
        hr = _augment(_random_crop(img, self.crop_size, rng), rng,
                      self.hflip, self.rotate)
        label = int(rng.integers(0, self.num_classes))
        cond = degrade(hr, label, rng, quality_lower=self.quality[0],
                       quality_upper=self.quality[1])
        return hr, cond, label

    def _make_batch(self, rng: np.random.Generator):
        hrs, conds, labels = [], [], []
        for _ in range(self.batch_size):
            hr, cond, label = self._sample(rng)
            hrs.append(hr)
            conds.append(cond)
            labels.append(label)
        hr = np.stack(hrs).astype(np.float32) / 255.0
        cond = np.stack(conds).astype(np.float32) / 255.0
        return hr, cond, np.asarray(labels, np.int32)

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.num_workers * 2)
        stop = threading.Event()

        def worker(wid):
            rng = np.random.default_rng(self.seed * 1000 + wid)
            while not stop.is_set():
                batch = self._make_batch(rng)
                try:
                    q.put(batch, timeout=1.0)
                except queue.Full:
                    continue

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()
