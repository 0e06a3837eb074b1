"""Multi-host (multi-process) initialisation over DCN.

The reference is strictly single-GPU (SURVEY.md section 2.3); on TPU pods the
framework scales past one host by running one process per host and forming a
single global device mesh. Host 0 coordinates; `jax.devices()` then spans
every host's chips and `make_mesh()` builds the tiles axis across them, so
the shard_mapped train step's psums ride ICI within a pod slice (DCN is only
involved in the jax.distributed control plane and host-level input work).

Launch one process per host with identical flags plus:
    --dist_coordinator <host0-addr:port> --dist_num_processes <P>
    --dist_process_id <this process's rank>
or rely on the TPU environment auto-detection (no flags on Cloud TPU VMs:
`jax.distributed.initialize()` discovers everything).

Input pipeline across hosts: gsjax shards TILES, not views — every host
trains on the same view each step, so the "data pipeline" contract is that
all processes draw identical view sequences. That holds because train.py
seeds the python RNG identically (`--seed`) and the Trainer consumes it in
lockstep (view + neighbour choice per step); each host reads images from
its own copy/mount of the dataset. Densification is replicated math from a
shared jax PRNG key, so the model state never needs cross-host reshuffling
(the model is replicated; only tile work is partitioned).
"""

from __future__ import annotations


def maybe_init_distributed(args) -> bool:
    """Initialise jax.distributed from CLI flags. Returns True if a multi-
    process runtime was set up. Must run before any other JAX usage."""
    import jax

    coord = getattr(args, "dist_coordinator", "") or ""
    auto = bool(getattr(args, "dist_auto", False))
    if not coord and not auto:
        return False
    if auto:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(getattr(args, "dist_num_processes", 1)),
            process_id=int(getattr(args, "dist_process_id", 0)))
    return True


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    import jax

    return jax.process_index() == 0
