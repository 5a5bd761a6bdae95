"""Multi-host runtime setup (SURVEY.md §5.8 — no reference counterpart;
the communication backend the reference lacks).

On a TPU pod slice each host runs the same program;
``initialize_multihost()`` wires jax.distributed so jax.devices()
spans the slice and the Mesh in parallel.mesh covers all chips (ICI
within a slice; DCN across slices is handled by XLA's collective
scheduling when the mesh's outer axis crosses slice boundaries).

Single-host (and this CI environment) is a no-op.
"""

from __future__ import annotations

import logging
import os
from typing import Optional


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running under a multi-host
    launcher; returns True if a multi-host runtime was set up.

    Arguments default from the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID) or the TPU
    metadata that jax.distributed.initialize() can auto-detect on
    Cloud TPU VMs.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("NUM_PROCESSES")
    process_id = process_id if process_id is not None \
        else _int_env("PROCESS_ID")

    if coordinator_address is None and num_processes is None:
        # Cloud TPU pod slices auto-detect; bare single host no-ops.
        # Only attempt auto-detection when a pod-slice launcher marker
        # is present — a plain single-host run must never block on a
        # coordinator handshake.
        markers = ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
                   "CLOUD_TPU_TASK_ID", "JAX_COORDINATOR_ADDRESS")
        if not any(m in os.environ for m in markers):
            return False
        try:
            jax.distributed.initialize()
            if jax.process_count() > 1:
                logging.info("multi-host runtime: %d processes, "
                             "%d devices", jax.process_count(),
                             jax.device_count())
                return True
        except Exception:
            pass
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    logging.info("multi-host runtime: %d processes, %d devices",
                 jax.process_count(), jax.device_count())
    return True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def local_batch_slice(global_size: int) -> slice:
    """The slice of a globally-sharded leading axis this process should
    feed (per-host data loading for multi-host training)."""
    import jax

    nproc = jax.process_count()
    idx = jax.process_index()
    per, rem = divmod(global_size, nproc)
    # first `rem` processes take one extra row so every row is fed
    start = idx * per + min(idx, rem)
    return slice(start, start + per + (1 if idx < rem else 0))
