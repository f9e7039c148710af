"""Multi-host (multi-process) initialization — the launcher-side half of the
reference's torch.distributed stack (train_vtoonify_d.py:446-452's
`dist.init_process_group` + env-var rank plumbing, SURVEY.md §2.5/§5.8).

TPU pods normally auto-detect cluster topology, so `initialize()` with no
arguments is the production path. Explicit coordinator/process arguments (or
the standard environment variables below) cover manual launches — e.g. one
process per host behind a scheduler that exports ranks, the moral equivalent
of the reference's `python -m torch.distributed.launch`:

    VTOONIFY_COORDINATOR=host0:9876 VTOONIFY_NUM_PROCESSES=4 \
    VTOONIFY_PROCESS_ID=$RANK vtoonify-train-d --multihost ...

On the CPU platform, cross-process collectives need a transport; we select
gloo so the same code path is testable hermetically (two local processes over
localhost — tests/test_multihost.py drives exactly that).
"""

from __future__ import annotations

import os
from typing import Optional

ENV_COORDINATOR = "VTOONIFY_COORDINATOR"
ENV_NUM_PROCESSES = "VTOONIFY_NUM_PROCESSES"
ENV_PROCESS_ID = "VTOONIFY_PROCESS_ID"


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the JAX distributed runtime for a multi-process job.

    Argument resolution order: explicit args > VTOONIFY_* env vars >
    JAX cluster auto-detection (TPU pod / SLURM / GKE). After this returns,
    `jax.devices()` spans every process and the existing mesh code
    (`parallel.mesh.make_mesh`) works unchanged over DCN+ICI.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        ENV_COORDINATOR)
    if num_processes is None and os.environ.get(ENV_NUM_PROCESSES):
        num_processes = int(os.environ[ENV_NUM_PROCESSES])
    if process_id is None and os.environ.get(ENV_PROCESS_ID):
        process_id = int(os.environ[ENV_PROCESS_ID])

    # CPU has no hardware interconnect; use the gloo TCP transport for
    # cross-process collectives (XLA:CPU's supported backend). Guarded so a
    # TPU job never touches the knob.
    platforms = (jax.config.jax_platforms or
                 os.environ.get("JAX_PLATFORMS", ""))
    if "cpu" in str(platforms).split(","):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif num_processes is not None or process_id is not None:
        raise ValueError(
            "multihost.initialize: num_processes/process_id were given "
            "without a coordinator address — pass --coordinator host:port "
            f"(or set {ENV_COORDINATOR}), or drop the explicit ranks to use "
            "cluster auto-detection")
    else:
        jax.distributed.initialize()
