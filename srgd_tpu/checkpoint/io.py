"""Native checkpoint I/O (orbax).

The reference only loads checkpoints (torch .pth, SURVEY.md section 5.4);
srgd-tpu additionally saves/restores its own training state natively.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_params(path: str, params: Any, force: bool = True):
    path = os.path.abspath(path)
    _checkpointer().save(path, params, force=force)


def restore_params(path: str, template: Optional[Any] = None):
    path = os.path.abspath(path)
    if template is not None:
        import orbax.checkpoint as ocp
        return _checkpointer().restore(path, item=template)
    return _checkpointer().restore(path)
