"""Environment collection for run reproducibility logs.

Role of the reference's collect_env (logged into run meta,
tools/train.py:316-321).
"""

from __future__ import annotations

import platform
import sys
from typing import Dict


def collect_env() -> Dict[str, str]:
    info: Dict[str, str] = {
        "python": sys.version.replace("\n", " "),
        "platform": platform.platform(),
    }
    try:
        import jax

        info["jax"] = jax.__version__
        info["jax_backend"] = jax.default_backend()
        info["devices"] = ", ".join(str(d) for d in jax.devices())
    except Exception as e:  # pragma: no cover
        info["jax"] = f"unavailable ({e})"
    for mod in ("flax", "optax", "numpy"):
        try:
            info[mod] = __import__(mod).__version__
        except Exception:
            info[mod] = "unavailable"
    try:
        import orbax.checkpoint as ocp  # noqa: F401

        info["orbax"] = "available"
    except Exception:
        info["orbax"] = "unavailable"
    return info
