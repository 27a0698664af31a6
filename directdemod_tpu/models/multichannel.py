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
    DdcFm."""
    fs: int
    freqs: tuple
    taps: np.ndarray
    bw_target: int
    fm: bool = True

    def __post_init__(self):
        self.fes = [DdcFm(self.fs, f, self.taps, self.bw_target, fm=self.fm)
                    for f in self.freqs]
        self.stride = self.fes[0].stride
        self.out_rate = self.fes[0].out_rate
        self.taps_mod = np.stack([fe.taps_mod for fe in self.fes])
        self.rots = np.asarray([fe.rot for fe in self.fes])
        self.hist0 = np.stack([fe.hist0 for fe in self.fes])

    @partial(jax.jit, static_argnums=(0, 5, 6))
    def _step(self, x, hists, c_prevs, off, out_len: int, first: bool):
        if x.dtype == jnp.uint8:
            x = unpack.iq_u8_to_complex(x, jnp.real(hists).dtype)
        dt = x.dtype
        tm = jnp.asarray(self.taps_mod, dtype=dt)
        rot = jnp.asarray(self.rots, dtype=dt)

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

    def init_state(self, dtype=jnp.complex64):
        return (hostio.device_put(self.hist0, dtype=dtype),
                jnp.zeros((len(self.fes), 1), dtype=dtype))

    def process(self, source, block_size: int = PROC_CHUNKSIZE,
                dtype=jnp.complex64):
        """Returns (audio (n_channels, M), out_rate)."""
        from ..io.feeder import BlockFeeder
        state = self.init_state(dtype)
        outs = []
        with BlockFeeder(source, block_size, dtype=dtype, raw="auto") as feeder:
            for (s, e, x) in feeder:
                off = rs.decim_phase(s, self.stride)
                out_len = rs.decim_count(e - s, off, self.stride)
                y, h2, c2 = self._step(x, state[0], state[1], jnp.int32(off),
                                       out_len, bool(s == 0))
                state = (h2, c2)
                outs.append(hostio.device_get(y))
        return np.concatenate(outs, axis=-1), self.out_rate
