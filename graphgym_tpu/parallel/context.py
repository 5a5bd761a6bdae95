"""Active-mesh context: lets layers dispatch partitioned (multi-chip)
ops without threading the Mesh through every module signature.

The Trainer activates the mesh around its jitted step calls; layer
code reads it at *trace* time (the first call per batch shape), so the
contextvar never appears inside the compiled program.  No reference
counterpart (the reference is single-process, SURVEY.md §2).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

from jax.sharding import Mesh

_ACTIVE_MESH: contextvars.ContextVar[Optional[Mesh]] = \
    contextvars.ContextVar("graphgym_tpu_active_mesh", default=None)


def active_mesh() -> Optional[Mesh]:
    """The mesh activated by the innermost use_mesh(), or None."""
    return _ACTIVE_MESH.get()


@contextlib.contextmanager
def use_mesh(mesh: Optional[Mesh]):
    """Activate `mesh` for partitioned-op dispatch inside the block."""
    token = _ACTIVE_MESH.set(mesh)
    try:
        yield mesh
    finally:
        _ACTIVE_MESH.reset(token)
