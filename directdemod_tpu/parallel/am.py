"""Time-sharded blockwise AM envelope.

The reference's AM demod is applied per 240000-sample block with no carried
state (ref decode_noaa.py:644-653), so the blocks are embarrassingly parallel:
shard the block batch over the mesh's `time` axis and run the batched-FFT
Hilbert envelope locally on every device -- zero collectives. The ragged
remainder block (its own FFT length) runs on one device, exactly like the
sequential `ops/am.envelope_blocked`.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import am as am_ops
from ..utils import hostio


@partial(jax.jit, static_argnums=(0,))
def _sharded_envelope(mesh, blocks):
    return jax.shard_map(
        am_ops.envelope, mesh=mesh,
        in_specs=P("time", None), out_specs=P("time", None))(blocks)


def sharded_envelope_blocked(mesh, x: np.ndarray, block: int) -> np.ndarray:
    """ops/am.envelope_blocked over the mesh's `time` axis (host in/out)."""
    ndev = mesh.shape["time"]
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=np.float32)
    nfull = n // block
    out = []
    if nfull:
        rows = np.ascontiguousarray(x[: nfull * block]).reshape(nfull, block)
        pad_rows = (-nfull) % ndev
        if pad_rows:
            # padded with copies of row 0 (all-zero rows would put NaNs
            # through the normalized FFT chain); dropped below
            rows = np.concatenate([rows, np.repeat(rows[:1], pad_rows, 0)])
        blocks = hostio.device_put(
            rows, sharding=NamedSharding(mesh, P("time", None)))
        env = hostio.global_get(_sharded_envelope(mesh, blocks))
        out.append(env[:nfull].reshape(-1))
    rem = n - nfull * block
    if rem:
        out.append(np.asarray(am_ops.envelope(jnp.asarray(x[nfull * block:]))))
    return out[0] if len(out) == 1 else np.concatenate(out)
