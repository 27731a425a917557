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
