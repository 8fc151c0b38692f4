"""Multi-host (multi-process) initialization.

The reference has no distributed execution at all (SURVEY §2.7); this build
is single-host multi-chip first, with multi-host as a thin layer over
``jax.distributed``: every host runs the same analysis script, JAX's
process-global device list then spans all hosts, and the existing
``shard_map`` + ``psum`` kernels scale over DCN-connected slices without
code changes (collectives ride ICI within a slice, DCN across).

Usage (one call near the top of the driver script on every host)::

    from lammps_analysis_tpu.parallel import multihost
    multihost.initialize()           # TPU pods: auto-detected coordinator
    # or explicitly:
    multihost.initialize(coordinator_address="10.0.0.1:1234",
                         num_processes=4, process_id=host_idx)
"""

from __future__ import annotations

import logging
from typing import Optional

log = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize ``jax.distributed`` (no-op if already initialized)."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as err:
        if "already initialized" in str(err):
            log.info("jax.distributed already initialized")
            return
        raise
    log.info(
        "multi-host initialized: process %d/%d, %d global devices",
        jax.process_index(),
        jax.process_count(),
        len(jax.devices()),
    )


def is_multihost() -> bool:
    import jax

    return jax.process_count() > 1
