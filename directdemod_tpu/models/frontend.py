"""Fused digital down-converter (DDC) front-ends.

The reference's per-chunk chain  `offsetFreq -> FIR -> bwLim -> fm-demod`
(ref decode_noaa.py:623, decode_fm.py:64-68, decode_afsk1200.py:79-94) is
algebraically collapsed here into a single strided convolution:

    u[n] = x[n] e^{-j w n}                (NCO, w = 2 pi f / Fs, n global)
    y[n] = sum_k b[k] u[n-k]              (FIR)
    kept only at n = J m                  (decimation phase 0 at global 0)

        y[J m] = e^{-j w J m} * c[m],  c[m] = sum_k (b[k] e^{j w k}) x[Jm-k]

so modulating the taps once (host fp64) removes the NCO entirely, and the
decimating FIR computes only every J-th output (J ~ 34: a 34x FLOP cut vs the
reference's filter-everything-then-stride).  The FM polar discriminator then
cancels the residual phasors *analytically*:

    angle(y[Jm] conj(y[J(m-1)])) = angle(c[m] conj(c[m-1]) e^{-j w J})

leaving one constant rotation -- the hot path carries no trigonometry at all
and has no long-stream phase-precision problem by construction.

Outputs are bit-compatible with the unfused op pipeline (and hence with the
reference's chunked semantics); parity is enforced in tests/test_frontend.py.
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


@dataclass(eq=False)
class DdcFm:
    """Fused shift+filter+decimate(+FM) front-end over a chunked source.

    Parameters mirror the reference chain: `freq` is the channel offset fed to
    offsetFreq, `taps` the FIR window, `bw_target` the first bwLim target.
    `fm` selects whether the FM discriminator is fused in (noaa/fm paths) or
    the complex decimated stream is returned (afsk path, which FM-demods the
    assembled signal later).
    """
    fs: int
    freq: float
    taps: np.ndarray
    bw_target: int
    fm: bool = True

    def __post_init__(self):
        self.stride, self.out_rate_decim = rs.decim_params(self.fs, self.bw_target)
        k = len(self.taps)
        w = 2.0 * np.pi * float(self.freq) / float(self.fs)
        # modulated taps b~[k] = b[k] e^{+j w k}  (fp64 on host, cast at trace)
        self.taps_mod = (np.asarray(self.taps, dtype=np.float64)
                         * np.exp(1j * w * np.arange(k))).astype(np.complex128)
        # constant discriminator rotation e^{-j w J}
        self.rot = np.exp(-1j * w * self.stride)
        # first-block raw-x history equivalent to the reference's lfilter_zi
        # seed on the NCO'd stream: u_hist = 1  =>  x_hist[m] = e^{+j w m}
        self.hist0 = np.exp(1j * w * np.arange(-(k - 1), 0)).astype(np.complex128)
        self.out_rate = self.out_rate_decim

    # ---------------------------------------------------------------- device step
    @partial(jax.jit, static_argnums=(0, 5, 6))
    def _step(self, x, hist, c_prev, off, out_len: int, first: bool):
        if x.dtype == jnp.uint8:
            # raw interleaved IQ bytes: unpack on device (2 bytes/sample over
            # the host link; the -127.5 subtract fuses into the conv input)
            x = unpack.iq_u8_to_complex(x, jnp.real(hist).dtype)
        dt = x.dtype
        tm = jnp.asarray(self.taps_mod, dtype=dt)
        c, hist2 = fir.fir_decimate(x, tm, hist, off, out_len, self.stride)
        if not self.fm:
            return c, hist2, c[-1:]
        rot = jnp.asarray(self.rot, dtype=dt)
        if first:
            audio = jnp.angle(c[1:] * jnp.conj(c[:-1]) * rot)
        else:
            prev = jnp.concatenate([c_prev, c[:-1]])
            audio = jnp.angle(c * jnp.conj(prev) * rot)
        return audio, hist2, c[-1:]

    # ---------------------------------------------------------------- chunk loop
    def init_state(self, dtype=jnp.complex64):
        hist = hostio.device_put(self.hist0, dtype=dtype)
        return hist, hostio.zeros((1,), dtype)

    def block_out_len(self, start: int, n: int) -> int:
        off = rs.decim_phase(start, self.stride)
        return rs.decim_count(n, off, self.stride)

    def process_block(self, x, state, start: int):
        """One block; `start` is the block's global sample index (host int).

        `off` rides into the jitted step as a traced scalar so the compile
        count stays at ~2 shapes per block size (out_len varies by one),
        not one per decimator phase.
        """
        hist, c_prev = state
        n = int(x.shape[0]) // 2 if x.dtype == jnp.uint8 else int(x.shape[0])
        off = rs.decim_phase(start, self.stride)
        out_len = rs.decim_count(n, off, self.stride)
        y, hist2, c_last = self._step(x, hist, c_prev, jnp.int32(off), out_len,
                                      bool(start == 0))
        return y, (hist2, c_last)

    def process(self, source, block_size: int = PROC_CHUNKSIZE,
                dtype=jnp.complex64, raw: bool | str = "auto",
                backend: str = "xla", pallas_interpret: bool = False):
        """Full chunked run with a double-buffered host feed; returns
        (output ndarray, out_rate). `raw='auto'` feeds raw uint8 bytes and
        unpacks on device when the source supports it (4x less link traffic).

        `backend='pallas_u8'` runs the fused unpack+DDC+FM Pallas kernel
        (ops/pallas_ddc.ddc_fm_pallas_u8) on raw-byte blocks: 2 B/sample of
        HBM read instead of the XLA path's complex64 intermediates. The
        first block goes through the XLA step regardless (its all-ones
        warmup history is not byte-representable); later blocks carry the
        previous block's tail BYTES as the conv history. Requires fm=True
        and a raw-capable source; silently falls back to XLA otherwise."""
        from ..io.feeder import BlockFeeder
        state = self.init_state(dtype)
        outs = []
        use_pallas = backend == "pallas_u8" and self.fm
        raw_hist = None              # device u8 tail, 2*(K-1) bytes
        k = len(self.taps_mod)
        with BlockFeeder(source, block_size, dtype=dtype, raw=raw) as feeder:
            for (s, e, x) in feeder:
                if use_pallas and x.dtype == jnp.uint8 and s > 0 \
                        and raw_hist is not None:
                    n = int(x.shape[0]) // 2
                    off = rs.decim_phase(s, self.stride)
                    out_len = rs.decim_count(n, off, self.stride)
                    y, c_last = _pallas_u8_block(
                        jnp.concatenate([raw_hist, x]),
                        hostio.device_put(self.taps_mod[::-1],
                                          dtype=jnp.complex64),
                        hostio.device_put(self.rot, dtype=jnp.complex64),
                        state[1].astype(jnp.complex64), jnp.int32(off),
                        self.stride, out_len, pallas_interpret)
                    state = (state[0], c_last.astype(dtype))
                else:
                    y, state = self.process_block(x, state, s)
                if use_pallas and x.dtype == jnp.uint8:
                    raw_hist = x[-2 * (k - 1):]
                outs.append(hostio.device_get(y))
        return np.concatenate(outs), self.out_rate


@partial(jax.jit, static_argnums=(5, 6, 7))
def _pallas_u8_block(raw_cat, taps_rev, rot, c_prev, off, stride: int,
                     out_len: int, interpret: bool):
    """One steady-state block through the fused u8 kernel.

    raw_cat = [previous tail bytes (2*(K-1)) | block bytes]; the kept output
    m covers sample off + m*stride of that concatenation -- the same window
    alignment as ops/fir.fir_decimate's `seg`."""
    from ..ops.pallas_ddc import ddc_fm_pallas_u8
    k = taps_rev.shape[0]
    need = 2 * ((out_len - 1) * stride + k)
    seg = jax.lax.dynamic_slice(
        jnp.pad(raw_cat, (0, 2 * stride)), (2 * off,), (need,))
    return ddc_fm_pallas_u8(seg, taps_rev, rot, c_prev, stride, out_len,
                            interpret)
