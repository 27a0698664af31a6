"""Multi-chip dry run: compile + execute the full sharded front-end step.

Builds an (time x channel) mesh over `n_devices`, shards a multi-channel
multi-chunk IQ batch over both axes, and runs ONE step of the full pipeline
with its real collectives:

  * `ppermute` over `time`  -- overlap-save halo exchange (filter tails)
  * `psum` over `channel`   -- cross-channel power normalization stat
  * `all_gather` over `time`-- per-chunk sync-candidate merge

This is the shape of the production pod run: channels are data-parallel,
the capture's time axis is sequence-parallel, and all cross-shard state is
either a small halo or closed-form (see parallel/sharded.py).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import design, fir


def dryrun(n_devices: int, chunk_len: int = 4096) -> dict:
    channel = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    time = n_devices // channel
    mesh = jax.make_mesh((time, channel), ("time", "channel"))

    taps = design.blackmanharris(151)
    k = len(taps)
    stride = 34
    halo = k - 1 + stride
    fs = 2048000.0
    freqs = np.asarray([30000.0, -15000.0])[:channel]
    taps_mod = np.stack([
        taps * np.exp(1j * 2 * np.pi * f / fs * np.arange(k)) for f in freqs])
    rots = np.exp(-1j * 2 * np.pi * freqs / fs * stride)

    n_chunks = 2 * time
    m_max = (halo + chunk_len - k) // stride + 1   # VALID strided windows
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((channel, n_chunks, chunk_len))
         + 1j * rng.standard_normal((channel, n_chunks, chunk_len))
         ).astype(np.complex64)

    def shard_body(xl, tapsl, rotl):
        # xl: (1, cl, L) local; halo exchange along time
        ndev_t = time
        tails = xl[:, :, -halo:]
        left_edge = lax.ppermute(
            tails[:, -1], "time", [(i, (i + 1) % ndev_t) for i in range(ndev_t)])
        my_t = lax.axis_index("time")
        first = jnp.where(my_t == 0, jnp.ones_like(left_edge), left_edge)
        prev = jnp.concatenate([first[:, None], tails[:, :-1]], axis=1)
        xh = jnp.concatenate([prev, xl], axis=2)

        def chunk(xrow, w, rot):
            c = fir.conv_valid(xrow, w[::-1], stride=stride)
            prev_c = jnp.concatenate([c[:1], c[:-1]])
            return jnp.angle(c * jnp.conj(prev_c) * rot)

        audio = jax.vmap(lambda ch_x, w, rot: jax.vmap(
            lambda xr: chunk(xr, w, rot))(ch_x))(xh, tapsl, rotl[:, 0])

        # channel-parallel power stat via psum, time all_gather of peak stats
        power = jnp.mean(audio ** 2)
        total_power = lax.psum(power, "channel")
        peaks = jnp.max(jnp.abs(audio), axis=-1)      # (1, cl)
        gathered = lax.all_gather(peaks, "time", axis=1, tiled=True)
        return audio, total_power[None, None], gathered

    step = jax.jit(jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P("channel", "time", None), P("channel", None),
                  P("channel", None)),
        out_specs=(P("channel", "time", None), P("channel", "time"),
                   P("channel", None)),
        check_vma=False))

    xs = jax.device_put(jnp.asarray(x),
                        NamedSharding(mesh, P("channel", "time", None)))
    audio, tp, gathered = step(xs, jnp.asarray(taps_mod, jnp.complex64),
                               jnp.asarray(rots, jnp.complex64)[:, None])
    audio.block_until_ready()
    out = {
        "mesh": dict(mesh.shape),
        "audio_shape": tuple(audio.shape),
        "gathered_shape": tuple(gathered.shape),
        "total_power": float(np.asarray(tp).ravel()[0]),
        "finite": bool(np.all(np.isfinite(np.asarray(audio)))),
    }
    assert out["finite"], "dry run produced non-finite output"
    assert audio.shape == (channel, n_chunks, m_max)
    return out
