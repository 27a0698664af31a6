"""Device-mesh construction for time x channel sharding.

The framework's parallel axes (SURVEY 2.4):
  * `time`    -- sequence/context parallelism: one long IQ capture split into
                 PROC_CHUNKSIZE blocks, blocks sharded across devices, filter
                 tails exchanged as overlap-save halos via `ppermute` over ICI;
  * `channel` -- data parallelism: independent `-f` channels of the same
                 capture (ref main.py:147 processes them sequentially).

The reference's cross-block carries map exactly onto this: FIR/IIR state
becomes a left-neighbor halo, NCO and decimator phases are closed-form in the
global sample index (zero communication).
"""
from __future__ import annotations

import jax


def make_mesh(time: int | None = None, channel: int = 1,
              devices=None) -> jax.sharding.Mesh:
    """Mesh over the available devices, time-major."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if time is None:
        time = n // channel
    if time * channel != n:
        raise ValueError(f"{time}x{channel} mesh needs {time * channel} devices, "
                         f"have {n}")
    return jax.make_mesh((time, channel), ("time", "channel"),
                         devices=devices)


def single_device_mesh() -> jax.sharding.Mesh:
    return jax.make_mesh((1, 1), ("time", "channel"))
