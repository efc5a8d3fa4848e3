"""Parameter checkpointing (orbax).

The reference persists nothing (training state lives in scipy's optimizer,
SURVEY.md §5); for long TPU runs this wraps orbax so a VQE/QAOA optimization
can resume. Gated: orbax is optional at import time.
"""

from __future__ import annotations

import os
from typing import Any, Optional



def _checkpointer():
    try:
        import orbax.checkpoint as ocp
    except Exception as e:  # pragma: no cover
        raise ImportError("orbax-checkpoint is required for checkpointing") from e
    return ocp


def save(path: str, tree: Any) -> None:
    """Save a pytree (params / optimizer state) to ``path``."""
    ocp = _checkpointer()
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def restore(path: str, like: Optional[Any] = None) -> Any:
    """Restore a pytree saved with :func:`save` (``like`` gives structure)."""
    ocp = _checkpointer()
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path, item=like)
        return ckptr.restore(path)
