"""One-pass multi-channel front-end.

The reference decodes each `-f` channel with a full separate pass over the
capture (ref main.py:147); here N channels share one read: the fused DDC runs
vmapped over a channel axis (per-channel modulated taps/rotations), so IO and
HBM traffic are paid once. This is the single-device form of the mesh's
`channel` axis (parallel/mesh); on a mesh the same batch shards across it.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import PROC_CHUNKSIZE
from ..ops import fir, resample as rs, unpack
from ..utils import hostio
from .frontend import DdcFm


@dataclass(eq=False)
class MultiDdcFm:
    """Vmapped fused DDC(+FM) over channels; bit-compatible per channel with
    DdcFm.

    With `mesh` (an axis named `channel`), the per-channel state is laid out
    over that axis and the SPMD partitioner splits the vmapped step across
    devices -- the mesh form of the reference's sequential per-frequency loop
    (ref main.py:147). The input block is replicated (every channel reads the
    same capture), so the only collective is the initial broadcast.
    """
    fs: int
    freqs: tuple
    taps: np.ndarray
    bw_target: int
    fm: bool = True
    mesh: object = None

    def __post_init__(self):
        self.fes = [DdcFm(self.fs, f, self.taps, self.bw_target, fm=self.fm)
                    for f in self.freqs]
        self.stride = self.fes[0].stride
        self.out_rate = self.fes[0].out_rate
        self.taps_mod = np.stack([fe.taps_mod for fe in self.fes])
        self.rots = np.asarray([fe.rot for fe in self.fes])
        self.hist0 = np.stack([fe.hist0 for fe in self.fes])
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            nch = self.mesh.shape["channel"]
            if len(self.fes) % nch:
                raise ValueError(
                    f"{len(self.fes)} channels not divisible by the mesh's "
                    f"channel axis ({nch})")
            self._chan_sharding = NamedSharding(self.mesh, P("channel", None))

    def _consts(self, dt):
        """Per-channel taps/rotations as device arrays, laid out over the
        mesh's channel axis when sharded (vmap requires every mapped input to
        share the channel layout)."""
        key = jnp.dtype(dt).name
        cache = getattr(self, "_const_cache", None)
        if cache is None:
            cache = self._const_cache = {}
        if key not in cache:
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                tm = hostio.device_put(self.taps_mod, dtype=dt,
                                       sharding=self._chan_sharding)
                rot = hostio.device_put(
                    self.rots, dtype=dt,
                    sharding=NamedSharding(self.mesh, P("channel")))
            else:
                tm = hostio.device_put(self.taps_mod, dtype=dt)
                rot = hostio.device_put(self.rots, dtype=dt)
            cache[key] = (tm, rot)
        return cache[key]

    @partial(jax.jit, static_argnums=(0, 7, 8))
    def _step(self, x, tm, rot, hists, c_prevs, off, out_len: int,
              first: bool):
        if x.dtype == jnp.uint8:
            x = unpack.iq_u8_to_complex(x, jnp.real(hists).dtype)

        def chans(x, tm, hists, c_prevs, rot):
            def one(taps_c, hist_c, cprev_c, rot_c):
                c, h2 = fir.fir_decimate(x, taps_c, hist_c, off, out_len,
                                         self.stride)
                if not self.fm:
                    return c, h2, c[-1:]
                if first:
                    audio = jnp.angle(c[1:] * jnp.conj(c[:-1]) * rot_c)
                else:
                    prev = jnp.concatenate([cprev_c, c[:-1]])
                    audio = jnp.angle(c * jnp.conj(prev) * rot_c)
                return audio, h2, c[-1:]
            return jax.vmap(one)(tm, hists, c_prevs, rot)

        if self.mesh is None:
            return chans(x, tm, hists, c_prevs, rot)
        # each device runs its local channels on the replicated block; no
        # collectives past the input broadcast
        from jax.sharding import PartitionSpec as P
        ch = P("channel", None)
        return jax.shard_map(
            chans, mesh=self.mesh,
            in_specs=(P(), ch, ch, ch, P("channel")),
            out_specs=(ch, ch, ch))(x, tm, hists, c_prevs, rot)

    def init_state(self, dtype=jnp.complex64):
        sh = self._chan_sharding if self.mesh is not None else None
        hist = hostio.device_put(self.hist0, dtype=dtype, sharding=sh)
        c0 = hostio.zeros((len(self.fes), 1), dtype)
        if sh is not None:
            c0 = jax.device_put(c0, sh)
        return (hist, c0)

    def process(self, source, block_size: int = PROC_CHUNKSIZE,
                dtype=jnp.complex64):
        """Returns (audio (n_channels, M), out_rate)."""
        from ..io.feeder import BlockFeeder
        state = self.init_state(dtype)
        outs = []
        repl = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(self.mesh, P())
        with BlockFeeder(source, block_size, dtype=dtype, raw="auto",
                         sharding=repl) as feeder:
            for (s, e, x) in feeder:
                off = rs.decim_phase(s, self.stride)
                out_len = rs.decim_count(e - s, off, self.stride)
                tm, rot = self._consts(
                    x.dtype if x.dtype != jnp.uint8 else dtype)
                y, h2, c2 = self._step(x, tm, rot, state[0], state[1],
                                       jnp.int32(off), out_len, bool(s == 0))
                state = (h2, c2)
                outs.append(hostio.device_get(y))
        return np.concatenate(outs, axis=-1), self.out_rate
