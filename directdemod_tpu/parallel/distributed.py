"""Multi-host execution helpers.

Each host reads its own byte range of the capture (the `source.read(from, to)`
contract is already range-based, ref source.py:95-118) and contributes its
chunks to a global sharded wave via
`jax.make_array_from_process_local_data`; the same shard_map program as the
single-host path runs unchanged, with halo ppermutes crossing hosts only at
wave boundaries.

CI-testable without a pod: two CPU processes with virtual devices
(tests/test_distributed.py) — the pattern SURVEY §4(d) prescribes.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def initialize(coordinator: str, num_processes: int, process_id: int,
               local_devices: int | None = None) -> None:
    """jax.distributed bring-up (call before any jax use)."""
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_wave(mesh, local_chunks: np.ndarray):
    """Assemble a (total_chunks, L) global array from each process's local
    chunk stack, sharded over the mesh's `time` axis."""
    sharding = NamedSharding(mesh, P("time", None))
    return jax.make_array_from_process_local_data(sharding, local_chunks)
