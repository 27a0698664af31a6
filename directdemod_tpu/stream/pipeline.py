"""Functional, jittable stream pipeline.

The reference's mutating `commSignal` op chain + chunker KV store
(ref comm.py:15-181, chunker.py:54-84) becomes a declarative list of pure ops,
compiled into ONE jitted `(state, block, aux) -> (state, block)` step. All
cross-block op state lives in an explicit pytree (FIR history, IIR section
states, FM boundary sample); everything else (NCO phase, decimator phase,
output lengths) is closed-form per-block *metadata* computed on the host from
global sample indices -- which is exactly what makes the stream shardable
across devices with only small halo/state exchange.

Shapes are static per (block length, meta) pair; a run compiles a handful of
step variants (full blocks, the remainder block, first/rest state shapes).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import PROC_CHUNKSIZE
from ..ops import nco, fir, resample as rs, fm as fm_ops, iir as iir_ops
from ..utils import hostio
from . import plan as plan_mod


# --------------------------------------------------------------------------- ops

class StreamOp:
    """One stage of the chain. Subclasses are host-side descriptors; the
    device work happens in `apply` (traced under jit)."""

    #: sampling-rate transform (host, at build time)
    def out_rate(self, fs: int) -> int:
        return fs

    #: (out_start, out_len) given this op's input global start/len (host)
    def out_span(self, start: int, n: int) -> tuple[int, int]:
        return start, n

    def init_state(self, dtype):
        return None

    def host_meta(self, start: int, n: int) -> tuple[Any, Any]:
        """(static_meta, aux_arrays) for the block starting at global `start`."""
        return None, None

    def apply(self, x, state, aux, meta):
        raise NotImplementedError


@dataclass
class Shift(StreamOp):
    """NCO frequency offset (ref comm.py:63-78). Scalar frequency; phase is a
    function of the global sample index (the chunker-KV counter made explicit).
    """
    freq: float
    fs: int = 0            # filled by Pipeline
    anchor_dtype: Any = np.float32

    def host_meta(self, start, n):
        anchors = nco.phase_anchors(self.freq, self.fs, start, n,
                                    dtype=self.anchor_dtype)
        return None, anchors

    def apply(self, x, state, aux, meta):
        if self.freq == 0:
            return x, state
        omega = self.anchor_dtype(-2.0 * np.pi * self.freq / self.fs)
        return nco.mix(x, omega, aux), state


@dataclass
class Filter(StreamOp):
    """Stateful FIR (ref filters.py:53-70 via comm.py:80-92)."""
    taps: np.ndarray

    def init_state(self, dtype):
        return fir.ones_history(len(self.taps), dtype)

    def apply(self, x, state, aux, meta):
        t = jnp.asarray(self.taps, dtype=jnp.float32 if x.dtype in
                        (jnp.float32, jnp.complex64) else jnp.float64)
        y, h = fir.fir_apply(x, t, state)
        return y, h


@dataclass
class FilterZeroPhase(StreamOp):
    """Zero-phase FIR (filtfilt, ref filters.py:73). Stateless; the reference
    only uses it on whole (non-chunked) windows."""
    taps: np.ndarray

    def apply(self, x, state, aux, meta):
        return fir.fir_zero_phase(x, np.asarray(self.taps)), state


@dataclass
class Butter(StreamOp):
    """Stateful Butterworth via block-parallel SOS (ref filters.py:232-273)."""
    filt: iir_ops.IirFilter

    def init_state(self, dtype):
        real = self.filt.initial_state_step(
            jnp.float64 if dtype in (jnp.float64, jnp.complex128) else jnp.float32)
        return real.astype(dtype)   # eager cast on device, not a complex put

    def apply(self, x, state, aux, meta):
        return self.filt.apply(x, state)


@dataclass
class ButterZeroPhase(StreamOp):
    filt: iir_ops.IirFilter

    def apply(self, x, state, aux, meta):
        return self.filt.zero_phase(x), state


@dataclass
class BwLim(StreamOp):
    """Integer-stride decimation with phase continuity (ref comm.py:118-129).

    The carried phase is closed-form in the global input index, so this op is
    stateless on device. Rate bookkeeping keeps the reference's int truncation.
    """
    target: int
    fs: int = 0
    stride: int = 0

    def out_rate(self, fs):
        self.fs = fs
        self.stride, new_rate = rs.decim_params(fs, self.target)
        return new_rate

    def out_span(self, start, n):
        off = rs.decim_phase(start, self.stride)
        cnt = rs.decim_count(n, off, self.stride)
        return -(-start // self.stride), cnt

    def host_meta(self, start, n):
        off = rs.decim_phase(start, self.stride)
        return rs.decim_count(n, off, self.stride), np.int32(off)

    def apply(self, x, state, aux, meta):
        return rs.decimate(x, aux, self.stride, meta), state


@dataclass
class Resample(StreamOp):
    """Per-block exact-rate FFT resample (bwLim strict, ref comm.py:110-116)."""
    target: int
    fs: int = 0
    _cum_in: int = 0
    _cum_out: int = 0

    def out_rate(self, fs):
        self.fs = fs
        return self.target

    def out_span(self, start, n):
        # per-block output count: int(target * n / fs) -- cumulative tracking
        out_n = int(self.target * n / self.fs)
        out_start = self._cum_out if start == self._cum_in else None
        if out_start is None:
            raise RuntimeError("Resample blocks must be processed in order")
        self._cum_in += n
        self._cum_out += out_n
        return out_start, out_n

    def host_meta(self, start, n):
        return int(self.target * n / self.fs), None

    def apply(self, x, state, aux, meta):
        return rs.fft_resample(x, meta), state


@dataclass
class FmDemod(StreamOp):
    """Polar discriminator with boundary-sample carry (ref demod_fm.py:29-51).
    The first block's output is one sample shorter."""

    def out_span(self, start, n):
        return (start - 1, n) if start > 0 else (0, n - 1)

    def host_meta(self, start, n):
        return bool(start > 0), None

    def init_state(self, dtype):
        return hostio.zeros((1,), dtype)

    def apply(self, x, state, aux, meta):
        has_last = meta
        y, last = fm_ops.quad_demod(x, state if has_last else None)
        return y, last


@dataclass
class Apply(StreamOp):
    """funcApply (ref comm.py:132-144) -- any stateless jittable fn."""
    fn: Callable

    def apply(self, x, state, aux, meta):
        return self.fn(x), state


# --------------------------------------------------------------------------- pipeline

class Pipeline:
    """A compiled chain of StreamOps over a chunked source."""

    def __init__(self, ops: Sequence[StreamOp], fs: int, dtype=jnp.complex64):
        self.ops = list(ops)
        self.in_rate = int(fs)
        self.dtype = dtype
        rate = int(fs)
        for op in self.ops:
            if isinstance(op, Shift):
                op.fs = rate
                op.anchor_dtype = (np.float64 if dtype in (jnp.complex128, jnp.float64)
                                   else np.float32)
            rate = op.out_rate(rate)
        self.out_rate = rate
        self._jit_cache: dict = {}

    def reset(self):
        for op in self.ops:
            if isinstance(op, Resample):
                op._cum_in = 0
                op._cum_out = 0

    def init_states(self):
        states = []
        dt = self.dtype
        for op in self.ops:
            states.append(op.init_state(dt))
            # state dtype follows the stream dtype at that point; FM output is real
            if isinstance(op, FmDemod):
                dt = jnp.float64 if dt == jnp.complex128 else jnp.float32
        return states

    def block_metas(self, start: int, n: int):
        """Host metadata for one input block: per-op (meta, aux), spans."""
        metas, auxs = [], []
        s, ln = start, n
        for op in self.ops:
            m, a = op.host_meta(s, ln)
            metas.append(m)
            auxs.append(a)
            s, ln = op.out_span(s, ln)
        return tuple(metas), auxs, ln

    def _step_fn(self, metas):
        key = metas

        def step(x, states, auxs):
            new_states = []
            for op, st, aux, meta in zip(self.ops, states, auxs, metas):
                x, st = op.apply(x, st, aux, meta)
                new_states.append(st)
            return x, new_states

        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(step)
        return self._jit_cache[key]

    def process(self, source, block_size: int = PROC_CHUNKSIZE,
                collect: bool = True, checkpoint_path: str | None = None,
                resume: bool = False):
        """Run the chunk loop over a source (anything with .length/.read).

        Returns (output ndarray | None, out_rate). Mirrors the reference decode
        loops (e.g. ref decode_noaa.py:617-624) with the chunker KV replaced by
        the explicit state pytree. With `checkpoint_path`, the state + position
        are saved after every block; `resume=True` restarts from the saved
        position (already-emitted output is the caller's to keep).
        """
        from . import checkpoint as ckpt
        self.reset()
        states = self.init_states()
        resume_from = 0
        if resume and checkpoint_path is not None:
            states, resume_from, _ = ckpt.restore(checkpoint_path, states)
        outs = []
        for (s, e) in plan_mod.plan_blocks(source.length, block_size):
            if s < resume_from:
                # advance host-side op bookkeeping (strict-resample counters)
                self.block_metas(s, e - s)
                continue
            x = hostio.device_put(source.read(s, e), dtype=self.dtype)
            metas, auxs, _ = self.block_metas(s, e - s)
            step = self._step_fn(metas)
            y, states = step(x, states, auxs)
            if checkpoint_path is not None:
                ckpt.save(checkpoint_path, states, e)
            if collect:
                outs.append(hostio.device_get(y))
        if collect:
            return np.concatenate(outs) if outs else np.empty(0), self.out_rate
        return None, self.out_rate
