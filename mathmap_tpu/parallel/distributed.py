"""Multi-host initialization — the distributed-comm backend slot.

The reference has NO distributed communication (pthread row-slices only,
SURVEY.md §2.2 comm row [unverified — mount empty, SURVEY.md §0]); this
module provides the TPU-native equivalent wiring: `jax.distributed` for
multi-host pods, with collectives riding ICI intra-pod and DCN across pods
(inserted automatically by XLA from the shardings in parallel/shard.py —
there are no hand-written NCCL/MPI calls to translate).

Single-host (this environment) needs none of this; the mesh helpers use
local devices. On a pod slice:

    from mathmap_tpu.parallel import distributed
    distributed.initialize()            # reads TPU env (coordinator etc.)
    mesh = mesh.make_mesh(frames=2)     # all global devices
"""

from __future__ import annotations


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed for a multi-host render fleet.

    With no arguments, JAX auto-detects the TPU pod environment
    (TPU_WORKER_HOSTNAMES etc.). Idempotent."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as exc:  # already initialized
        # jax raises "distributed.initialize should only be called once."
        msg = str(exc).lower()
        if "already" not in msg and "once" not in msg:
            raise


def is_multihost() -> bool:
    import jax

    return jax.process_count() > 1


def local_slice_of(array):
    """The rows of a fully-sharded global render owned by this process —
    what this host should write to disk (frame-sharded animation outputs
    compose with CLI --resume for restartable multi-host batches)."""
    return [s.data for s in array.addressable_shards]
