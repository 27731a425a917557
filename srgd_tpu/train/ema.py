"""EMA shadow parameters.

timm ModelEmaV2 semantics (SURVEY.md section 2.11): ema = decay*ema +
(1-decay)*w. The reference checkpoint stores only the EMA shadow
(model.py:3657-3664), so our trainer keeps the shadow as a plain pytree that
saves/loads through the same checkpoint path.
"""

from __future__ import annotations

import jax


def ema_update(ema_params, params, decay: float):
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                        ema_params, params)
