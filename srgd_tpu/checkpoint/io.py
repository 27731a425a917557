"""Native checkpoint I/O (orbax), crash-safe.

The reference only loads checkpoints (torch .pth, SURVEY.md section 5.4);
srgd-tpu additionally saves/restores its own training state natively.

``save_params`` never leaves the previous checkpoint in a destroyable
state: orbax's ``force=True`` deletes the existing directory BEFORE the
replacement is finalized, so a kill mid-save (OOM, preemption) loses the
only copy — this destroyed a 30k-step training checkpoint in round 6.
Instead the new state is written to a sibling ``<path>.new`` directory
and swapped in with directory renames; at every instant a complete
checkpoint exists under ``<path>``, ``<path>.new`` or ``<path>.old``,
and ``restore_params`` falls back in that order.
"""

from __future__ import annotations

import logging
import os
import shutil
from typing import Any, Optional

logger = logging.getLogger('srgd_tpu')


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_params(path: str, params: Any, force: bool = True):
    path = os.path.abspath(path)
    if not os.path.exists(path):
        # fresh save: orbax already writes to its own tmp dir + final rename
        _checkpointer().save(path, params, force=force)
        return
    tmp, old = path + '.new', path + '.old'
    for leftover in (tmp, old):        # debris from an earlier crash
        if os.path.exists(leftover):
            shutil.rmtree(leftover)
    _checkpointer().save(tmp, params)  # previous checkpoint still intact
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def copy_checkpoint(src: str, dst: str):
    """Crash-safe filesystem copy of a finished checkpoint directory.

    Orbax checkpoints are self-contained directories, so duplicating one
    (e.g. the best-loss snapshot of the periodic checkpoint just written)
    is a pure file copy — no device_get / re-serialization, which through
    the remote relay costs ~80 s per save for the dim-64 evidence model.
    Same swap discipline as save_params: dst stays complete at any instant.
    """
    src, dst = os.path.abspath(src), os.path.abspath(dst)
    if not os.path.isdir(src):
        raise FileNotFoundError(f'checkpoint {src} does not exist')
    if not os.path.exists(dst):
        tmp = dst + '.new'
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        shutil.copytree(src, tmp)
        os.rename(tmp, dst)
        return
    tmp, old = dst + '.new', dst + '.old'
    for leftover in (tmp, old):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)
    shutil.copytree(src, tmp)
    os.rename(dst, old)
    os.rename(tmp, dst)
    shutil.rmtree(old)


def checkpoint_exists(path: str) -> bool:
    """True if ``restore_params(path)`` has something to restore (including
    the crash-recovery fallbacks)."""
    path = os.path.abspath(path)
    return any(os.path.isdir(path + s) for s in ('', '.new', '.old'))


def restore_params(path: str, template: Optional[Any] = None):
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        # mid-swap crash: a completed .new (or the displaced .old) is valid
        for suffix in ('.new', '.old'):
            if os.path.isdir(path + suffix):
                logger.warning('checkpoint %s missing; restoring from %s',
                               path, path + suffix)
                path = path + suffix
                break
    if template is not None:
        return _checkpointer().restore(path, item=template)
    return _checkpointer().restore(path)
