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
from jax import lax

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

    def __hash__(self):
        # value-based: DdcFm rides as a STATIC jit argument (self in _step /
        # resident_frontend). The default id() hash made every freshly
        # constructed decoder retrace + re-lower every jit graph — measured
        # ~4 s of host time per warm NOAA decode (round-4 bench) even with
        # the persistent compile cache hitting.
        return hash((self.fs, float(self.freq),
                     np.asarray(self.taps).tobytes(), self.bw_target,
                     self.fm))

    def __eq__(self, other):
        return (isinstance(other, DdcFm)
                and self.fs == other.fs and self.freq == other.freq
                and self.bw_target == other.bw_target and self.fm == other.fm
                and np.array_equal(self.taps, other.taps))

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

    @partial(jax.jit, static_argnums=(0, 2, 3, 4))
    def resident_frontend(self, raw, n: int, interpret: bool = False,
                          backend: str = "gemm_u8"):
        """Whole-capture fused front end for a DEVICE-RESIDENT raw-byte
        capture, in ONE dispatch: block 0 (PROC_CHUNKSIZE samples) runs the
        XLA step from the virtual warmup history, the remainder runs as
        PROC_CHUNKSIZE-bounded fused unpack+DDC+FM kernel calls unrolled
        inside the same jit. Per-output windows are the identical 151-tap
        dots the blocked DdcFmStream computes, so the two paths are
        bit-identical; this one exists because over the tunnel every eager
        dispatch costs a ~0.3-1 s RPC round trip and the blocked loop's
        per-block ops dominated the resident wall clock (round-4 bench).
        Peak HBM is bounded per chunk, not by the capture size.

        `backend`: 'gemm_u8' (default) runs the dense byte-matmul lowering
        (ops/ddc_conv, ~45 Gsamp/s on v5e — BENCH_PALLAS_r05) with the
        chunk loop as a lax.scan (one compiled step, ~30x smaller program
        than the unrolled form — see _resident_scan); 'pallas_u8' the
        round-4 Pallas kernel (~3.7 Gsamp/s), statically unrolled.
        Requires fm=True."""
        if backend == "gemm_u8":
            return self._resident_scan(raw, n, True)
        from ..ops.pallas_ddc import ddc_fm_pallas_u8
        from ..ops.ddc_conv import byte_plan, ddc_fm_bytes
        J, k = self.stride, len(self.taps_mod)
        b0 = min(n, PROC_CHUNKSIZE)
        hist = jnp.asarray(self.hist0, jnp.complex64)
        tm = jnp.asarray(self.taps_mod, jnp.complex64)
        rot = jnp.asarray(self.rot, jnp.complex64)
        x0 = unpack.iq_u8_to_complex(lax.slice(raw, (0,), (2 * b0,)),
                                     jnp.float32)
        out_len0 = rs.decim_count(b0, 0, J)
        c, _ = fir.fir_decimate(x0, tm, hist, jnp.int32(0), out_len0, J)
        audios = [jnp.angle(c[1:] * jnp.conj(c[:-1]) * rot)]
        # the remainder runs as PROC_CHUNKSIZE-bounded kernel calls (static
        # unrolled loop): chunking bounds peak HBM (the gemm path's bf16 row
        # copy, the pallas path's 128x-padded outputs) and keeps the two
        # paths block-for-block identical to the file-fed DdcFmStream,
        # c_last recompute included
        plan = (byte_plan(self.taps_mod[::-1], J) if backend == "gemm_u8"
                else None)
        cp = c[-1:]
        pos = b0
        while pos < n:
            e = min(n, pos + PROC_CHUNKSIZE)
            off = rs.decim_phase(pos, J)
            out_len = rs.decim_count(e - pos, off, J)
            raw_cat = lax.slice(raw, (2 * (pos - (k - 1)),), (2 * e,))
            need = 2 * ((out_len - 1) * J + k)
            seg = lax.dynamic_slice(jnp.pad(raw_cat, (0, 2 * J)),
                                    (2 * off,), (need,))
            if backend == "gemm_u8":
                audio_i, cp = ddc_fm_bytes(plan, seg, rot, cp, out_len)
            else:
                audio_i, cp = ddc_fm_pallas_u8(seg, tm[::-1], rot, cp, J,
                                               out_len, interpret)
            audios.append(audio_i)
            pos = e
        return audios[0] if len(audios) == 1 else jnp.concatenate(audios)

    @partial(jax.jit, static_argnums=(0, 2, 3))
    def _resident_scan(self, raw, n: int, fm: bool):
        """Whole-capture resident front end with the chunk loop as ONE
        lax.scan step instead of a statically unrolled loop.

        The unrolled form compiled one program PER CHUNK (a 5-minute capture
        = 31 inlined gemm graphs): ~70-200 s of per-process trace + compile
        + executable load over the tunnel even with the persistent cache
        warm (measured round 5 — the CLI --resident wall). The scan step
        compiles ONCE; chunks use a fixed out_max output count and the
        valid outputs scatter into the global stream, masked so the
        spill-over output (which equals the next chunk's first) never
        collides. Bit-identical windows to the blocked DdcFmStream.

        Byte offsets exceed int32 at 2 B/sample beyond ~1 GB, so chunk
        slicing is two-level: a row slice of the (rows, 128) byte plane,
        then a fine slice — all indices stay < 2^25. Chunks are sized to a
        J multiple so every chunk yields exactly C/J outputs and assembly
        is a reshape — a scatter assembly measured ~150 s at 36M outputs
        (TPU scatters serialize)."""
        from ..ops.ddc_conv import byte_plan
        J, k = self.stride, len(self.taps_mod)
        C = (PROC_CHUNKSIZE // J) * J      # decimation-grid-aligned chunks
        plan = byte_plan(self.taps_mod[::-1], J)
        rot = jnp.asarray(self.rot, jnp.complex64)
        hist = jnp.asarray(self.hist0, jnp.complex64)
        tm = jnp.asarray(self.taps_mod, jnp.complex64)
        total_out = rs.decim_count(n, 0, J)
        out_n = total_out - 1 if fm else total_out
        b0 = min(n, C)
        x0 = unpack.iq_u8_to_complex(lax.slice(raw, (0,), (2 * b0,)),
                                     jnp.float32)
        out_len0 = rs.decim_count(b0, 0, J)
        c0, _ = fir.fir_decimate(x0, tm, hist, jnp.int32(0), out_len0, J)
        head = jnp.angle(c0[1:] * jnp.conj(c0[:-1]) * rot) if fm else c0
        if b0 >= n:
            return head
        n_chunks = -(-(n - b0) // C)
        cnt = C // J                       # outputs per chunk, exactly
        need = 2 * ((cnt - 1) * J + k)
        rows_need = -(-need // 128) + 1
        pad = rows_need * 128 + 2 * C + 256
        rawp = jnp.pad(raw, (0, pad + (-(2 * n + pad)) % 128))
        raw2 = rawp.reshape(-1, 128)

        def step(cp, i):
            pos = jnp.int32(b0) + i * jnp.int32(C)
            # byte start s = 2*(pos - (k-1)) without overflowing i32:
            # pos = 64*ph + pl  =>  s = 128*ph + cc,  cc small
            ph = pos // 64
            pl = pos % 64
            cc = 2 * (pl - jnp.int32(k - 1))
            q = ph + cc // 128
            r = cc % 128
            rows = lax.dynamic_slice(
                raw2, (q, jnp.int32(0)), (rows_need, 128)).reshape(-1)
            seg = lax.dynamic_slice(rows, (r,), (need,))
            re, im = plan.apply_dot(seg, cnt)
            c_arr = lax.complex(re, im)
            if fm:
                prev = jnp.concatenate([cp, c_arr[:-1]])
                vals = jnp.angle(c_arr * jnp.conj(prev) * rot)
            else:
                vals = c_arr
            return c_arr[-1:], vals

        _, vals = lax.scan(step, c0[-1:],
                           jnp.arange(n_chunks, dtype=jnp.int32))
        flat = vals.reshape(-1)[: out_n - head.shape[0]]
        return jnp.concatenate([head.astype(flat.dtype), flat])

    @partial(jax.jit, static_argnums=(0, 2))
    def resident_complex(self, raw_or_x, n: int):
        """Whole-capture fused DDC (no FM) for a device-resident capture,
        inside one traced program: returns the complex decimated stream c
        with the identical per-output windows as the blocked path. Raw u8
        input runs block 0 via the XLA step (the virtual warmup history is
        not byte-representable) and the remainder through the dense
        byte-matmul plan; complex input runs one whole-capture
        fir_decimate. Used by the AFSK fused pipeline (fm=False chain of
        ref decode_afsk1200.py:74-95)."""
        J, k = self.stride, len(self.taps_mod)
        tm = jnp.asarray(self.taps_mod, jnp.complex64)
        hist = jnp.asarray(self.hist0, jnp.complex64)
        if raw_or_x.dtype != jnp.uint8:
            out_len = rs.decim_count(n, 0, J)
            c, _ = fir.fir_decimate(raw_or_x.astype(jnp.complex64), tm, hist,
                                    jnp.int32(0), out_len, J)
            return c
        return self._resident_scan(raw_or_x, n, False)

    def process(self, source, block_size: int = PROC_CHUNKSIZE,
                dtype=jnp.complex64, raw: bool | str = "auto",
                backend: str = "auto", pallas_interpret: bool = False):
        """Full chunked run with a double-buffered host feed; returns
        (output ndarray, out_rate). `raw='auto'` feeds raw uint8 bytes and
        unpacks on device when the source supports it (4x less link traffic).

        `backend` picks the steady-state block kernel — see DdcFmStream."""
        from ..io.feeder import BlockFeeder
        stream = DdcFmStream(self, dtype=dtype, backend=backend,
                             interpret=pallas_interpret)
        outs = []
        with BlockFeeder(source, block_size, dtype=dtype, raw=raw) as feeder:
            for (s, e, x) in feeder:
                outs.append(hostio.device_get(stream.step(x, s)))
        return np.concatenate(outs), self.out_rate


class DdcFmStream:
    """Streaming front-end driver choosing the fastest kernel per block.

    Block 0 (and any non-raw block) runs the XLA `DdcFm._step`; steady-state
    raw-uint8 blocks run a fused unpack+DDC+FM kernel reading 2 B/sample
    from HBM. Two fused backends exist: 'gemm_u8' (ops/ddc_conv — the dense
    byte-matmul lowering, ~45 Gsamp/s on v5e, BENCH_PALLAS_r05) and
    'pallas_u8' (ops/pallas_ddc — the round-4 Pallas kernel, ~3.7 Gsamp/s).

    backend='auto' selects gemm_u8 on the TPU backend when `fm` is set and
    the stream feeds raw bytes; 'xla' forces the polyphase path;
    'pallas_u8' forces the Pallas kernel (interpret=True for CPU tests).
    The first block always takes XLA: its warmup history is the virtual
    all-ones NCO stream (DdcFm.hist0), which is not byte-representable.
    Cross-backend state stays consistent — the conv history for a raw
    stream is derivable from the carried tail BYTES, so an XLA fallback
    mid-stream (e.g. a source that stops yielding raw) stays exact."""

    def __init__(self, fe: "DdcFm", dtype=jnp.complex64,
                 backend: str = "auto", interpret: bool = False):
        import jax as _jax
        if backend == "auto":
            backend = ("gemm_u8"
                       if fe.fm and _jax.default_backend() == "tpu"
                       else "xla")
        self.fe = fe
        self.dtype = dtype
        self.backend = backend
        self.interpret = interpret
        self.state = fe.init_state(dtype)
        self.raw_hist = None          # device u8 tail, 2*(K-1) bytes
        self._taps_rev = None

    def _pallas_consts(self):
        if self._taps_rev is None:
            self._taps_rev = hostio.device_put(
                self.fe.taps_mod[::-1], dtype=jnp.complex64)
            self._rot = hostio.device_put(self.fe.rot, dtype=jnp.complex64)
        return self._taps_rev, self._rot

    def step(self, x, s: int):
        """One block (device array, complex or raw u8) at global sample
        index `s`; returns the device audio/output block."""
        fe = self.fe
        k = len(fe.taps_mod)
        is_u8 = x.dtype == jnp.uint8
        if (self.backend in ("pallas_u8", "gemm_u8") and is_u8 and s > 0
                and self.raw_hist is not None):
            n = int(x.shape[0]) // 2
            off = rs.decim_phase(s, fe.stride)
            out_len = rs.decim_count(n, off, fe.stride)
            taps_rev, rot = self._pallas_consts()
            # ONE dispatch per block: history concat + kernel + tail slice
            # all live inside the jit (each eager device op costs a full
            # RPC round trip over the tunnel)
            if self.backend == "gemm_u8":
                from ..ops.ddc_conv import byte_plan
                y, c_last, tail = _gemm_u8_step(
                    byte_plan(fe.taps_mod[::-1], fe.stride),
                    self.raw_hist, x, rot,
                    self.state[1].astype(jnp.complex64), jnp.int32(off),
                    fe.stride, out_len, k)
            else:
                y, c_last, tail = _pallas_u8_step(
                    self.raw_hist, x, taps_rev, rot,
                    self.state[1].astype(jnp.complex64), jnp.int32(off),
                    fe.stride, out_len, self.interpret)
            # the complex conv history stays DERIVABLE from the raw tail
            # (see class doc); it is materialized lazily only if a later
            # block falls back to the XLA step
            self.state = (None, c_last.astype(self.dtype))
            self.raw_hist = tail
            return y
        if self.state[0] is None:
            # XLA fallback after pallas blocks: rebuild the complex history
            # from the carried tail bytes
            hist = unpack.iq_u8_to_complex(self.raw_hist,
                                           jnp.float32).astype(self.dtype)
            self.state = (hist, self.state[1])
        y, self.state = fe.process_block(x, self.state, s)
        self.raw_hist = x[-2 * (k - 1):] if is_u8 else None
        return y


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


@partial(jax.jit, static_argnums=(6, 7, 8))
def _pallas_u8_step(raw_hist, x_u8, taps_rev, rot, c_prev, off, stride: int,
                    out_len: int, interpret: bool):
    """_pallas_u8_block with the history concatenation and the next tail
    slice fused into the same dispatch; returns (audio, c_last, tail)."""
    k = taps_rev.shape[0]
    raw_cat = jnp.concatenate([raw_hist, x_u8])
    audio, c_last = _pallas_u8_block(raw_cat, taps_rev, rot, c_prev, off,
                                     stride, out_len, interpret)
    return audio, c_last, x_u8[-2 * (k - 1):]


@partial(jax.jit, static_argnums=(0, 6, 7, 8))
def _gemm_u8_step(plan, raw_hist, x_u8, rot, c_prev, off, stride: int,
                  out_len: int, k: int):
    """_pallas_u8_step on the dense byte-matmul backend (ops/ddc_conv):
    identical window contract, identical (audio, c_last, tail) returns."""
    from ..ops.ddc_conv import ddc_fm_bytes
    raw_cat = jnp.concatenate([raw_hist, x_u8])
    need = 2 * ((out_len - 1) * stride + k)
    seg = jax.lax.dynamic_slice(
        jnp.pad(raw_cat, (0, 2 * stride)), (2 * off,), (need,))
    audio, c_last = ddc_fm_bytes(plan, seg, rot, c_prev, out_len)
    return audio, c_last, x_u8[-2 * (k - 1):]
