"""ctypes loader for the native data-pipeline ops (degrade_native.c).

Builds the shared library on first use with gcc/g++ (cached next to the
source); every consumer falls back to the PIL path when the toolchain or
build is unavailable, so the native layer is a pure accelerator, never a
hard dependency.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger('srgd_tpu.native')

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'degrade_native.c')
_LIB = os.path.join(_HERE, '_degrade_native.so')

_lib = None
_tried = False


def _build() -> bool:
    for cc in ('gcc', 'cc', 'g++'):
        try:
            subprocess.run([cc, '-O3', '-shared', '-fPIC', '-o', _LIB, _SRC,
                            '-lm'], check=True, capture_output=True)
            return True
        except (OSError, subprocess.CalledProcessError) as e:
            logger.debug('native build with %s failed: %s', cc, e)
    return False


def get_lib():
    """Returns the loaded library or None (PIL fallback)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                        < os.path.getmtime(_SRC)):
            if not _build():
                return None
        lib = ctypes.CDLL(_LIB)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.bicubic_resize.argtypes = [u8p] + [ctypes.c_int] * 3 + [u8p] + \
            [ctypes.c_int] * 2
        lib.bicubic_resize.restype = None
        lib.gaussian_blur.argtypes = [u8p] + [ctypes.c_int] * 3 + \
            [ctypes.c_float, u8p]
        lib.gaussian_blur.restype = None
        _lib = lib
    except OSError as e:
        logger.warning('native degrade lib unavailable: %s', e)
    return _lib


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def bicubic_resize(img: np.ndarray, out_h: int, out_w: int):
    """uint8 (H, W, C) -> (out_h, out_w, C); None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty((out_h, out_w, c), np.uint8)
    lib.bicubic_resize(_u8ptr(img), h, w, c, _u8ptr(out), out_h, out_w)
    return out


def gaussian_blur(img: np.ndarray, sigma: float):
    """uint8 (H, W, C) blurred; None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty_like(img)
    lib.gaussian_blur(_u8ptr(img), h, w, c, ctypes.c_float(sigma), _u8ptr(out))
    return out
