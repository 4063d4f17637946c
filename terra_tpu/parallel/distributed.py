"""Multi-host runtime: jax.distributed + pod-wide mesh construction.

The reference has no distributed backend at all (SURVEY.md §2 #17: a
single-process thread pool). The TPU build's multi-host story:

  * ``initialize()`` wraps ``jax.distributed.initialize`` (env-driven on
    TPU pods; explicit coordinator for manual launches),
  * ``pod_mesh()`` builds the ('rows', 'samples') mesh over every device
    in the slice — collectives ride ICI within hosts' slices and DCN
    across hosts, orchestrated entirely by XLA,
  * rendering/training then goes through parallel.mesh.render_sharded /
    optim.make_train_step_sharded unchanged: the counter-based RNG keys
    off global pixel ids, so every host computes its shard of the exact
    same image.

Single-host multi-chip and the CPU test mesh use the same code path; nothing
here is pod-specific except initialize().
"""
from __future__ import annotations

import logging
from typing import Optional

import jax

from .mesh import make_mesh

log = logging.getLogger("terra_tpu")


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime (idempotent).

    On TPU pods all arguments come from the environment; pass them
    explicitly for manual multi-process CPU/GPU launches.
    """
    try:
        if coordinator_address is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        log.info(
            "distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except (RuntimeError, ValueError) as e:  # already initialized / single process
        log.debug("distributed.initialize skipped: %s", e)


def pod_mesh(sample_ways: int = 1) -> "jax.sharding.Mesh":
    """('rows', 'samples') mesh over the whole pod: sample_ways devices on
    the sample axis, the rest on pixel rows."""
    n = jax.device_count()
    assert n % sample_ways == 0, (n, sample_ways)
    return make_mesh((n // sample_ways, sample_ways))


def is_coordinator() -> bool:
    return jax.process_index() == 0
