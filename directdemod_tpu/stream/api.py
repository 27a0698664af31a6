"""Ergonomic chainable stream API.

The user-facing equivalent of the reference's `commSignal` chain
(ref comm.py:15-181, tutorial/3_chunking.py:24-40):

    audio, rate = (Stream(source)
                   .shift(30000)
                   .filter(filters.blackman_harris(151))
                   .bw_limit(60000)
                   .fm_demod()
                   .bw_limit(40960)
                   .run())

Unlike the reference's mutating object + chunker KV store, the chain is a
declarative recipe: `run()` compiles it into one jitted block step with an
explicit state pytree (stream.pipeline) and streams the source through it;
`run_sharded(mesh)` runs the fused front-end across a device mesh when the
chain matches the DDC pattern.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import PROC_CHUNKSIZE
from . import pipeline as pl


class Stream:
    def __init__(self, source, dtype=jnp.complex64):
        self.source = source
        self.dtype = dtype
        self._ops: list[pl.StreamOp] = []

    # ------------------------------------------------------------- chain ops
    def shift(self, freq: float) -> "Stream":
        """Frequency offset (ref comm.offsetFreq)."""
        self._ops.append(pl.Shift(freq))
        return self

    def filter(self, taps_or_filter, zero_phase: bool = False) -> "Stream":
        """FIR taps (array) or an IirFilter (ref comm.filter)."""
        from ..ops.iir import IirFilter
        if isinstance(taps_or_filter, IirFilter):
            self._ops.append(pl.ButterZeroPhase(taps_or_filter) if zero_phase
                             else pl.Butter(taps_or_filter))
        else:
            taps = np.asarray(taps_or_filter)
            self._ops.append(pl.FilterZeroPhase(taps) if zero_phase
                             else pl.Filter(taps))
        return self

    def bw_limit(self, target_rate: int, strict: bool = False) -> "Stream":
        """Decimate (phase-carried) or exact-rate resample (ref comm.bwLim)."""
        self._ops.append(pl.Resample(target_rate) if strict
                         else pl.BwLim(target_rate))
        return self

    def fm_demod(self) -> "Stream":
        self._ops.append(pl.FmDemod())
        return self

    def apply(self, fn) -> "Stream":
        """Any stateless jittable function (ref comm.funcApply)."""
        self._ops.append(pl.Apply(fn))
        return self

    # ------------------------------------------------------------- execution
    def build(self) -> pl.Pipeline:
        return pl.Pipeline(list(self._ops), self.source.sampFreq,
                           dtype=self.dtype)

    def run(self, block_size: int = PROC_CHUNKSIZE) -> tuple[np.ndarray, int]:
        """Stream the whole source; returns (signal, sample_rate)."""
        return self.build().process(self.source, block_size=block_size)

    def run_fused(self, block_size: int = PROC_CHUNKSIZE
                  ) -> tuple[np.ndarray, int]:
        """Fast path when the chain is shift->FIR->bw_limit[->fm_demod]:
        the fused DDC front-end (models.frontend)."""
        fe = self._as_ddc()
        if fe is None:
            return self.run(block_size)
        return fe.process(self.source, block_size=block_size, dtype=self.dtype)

    def run_sharded(self, mesh, block_size: int = PROC_CHUNKSIZE
                    ) -> tuple[np.ndarray, int]:
        """Chunk-parallel execution over a device mesh (parallel.sharded)."""
        fe = self._as_ddc()
        if fe is None:
            raise ValueError("run_sharded requires a shift->FIR->bw_limit"
                             "[->fm_demod] chain")
        from ..parallel.sharded import ShardedDdcFm
        return ShardedDdcFm(fe, mesh).process(self.source, block_size,
                                              dtype=self.dtype)

    def _as_ddc(self):
        from ..models.frontend import DdcFm
        ops = self._ops
        shapes = [type(o) for o in ops]
        if shapes[:3] == [pl.Shift, pl.Filter, pl.BwLim] and \
                shapes[3:] in ([], [pl.FmDemod]):
            return DdcFm(self.source.sampFreq, ops[0].freq, ops[1].taps,
                         ops[2].target, fm=len(ops) == 4)
        return None
