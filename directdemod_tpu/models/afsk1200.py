"""AFSK1200 / APRS (AX.25) decoder.

Behavioral reference: `decode_afsk1200` (ref decode_afsk1200.py:15-405):
FM front-end -> Butterworth bandpass 700-2700 -> mark/space quadrature
correlator bank -> edge detection -> lookahead peak bit sync -> NRZI decode ->
flag scan -> bit unstuffing -> CRC-16 check -> AX.25 header/payload parse.

TPU design: the reference's O(N*18) nested Python correlator loop
(ref decode_afsk1200.py:129-142) is four 18-tap convolutions on device; edge
detection and bit-boundary peak picking run through ops/peaks' scan-based
detector. Bit-level framing is sparse host work.

Deliberate improvement over the reference: `messages` returns the actually
decoded AX.25 payloads -- the reference prints them but stores a hardcoded
"template: space rocks!" placeholder (ref decode_afsk1200.py:283).
"""
from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .. import constants as K
from ..ops import crc, design, fir, iir, peaks
from ..utils import hostio
from .frontend import DdcFm

log = logging.getLogger(__name__)


@partial(jax.jit, static_argnums=(0, 1, 3, 4, 5, 6, 7))
def _afsk_device_pass(fe: DdcFm, bp, raw_or_x, n: int, spb: int, buf: int,
                      lookahead: int, ev_cap: int, bp_state):
    """The WHOLE AFSK front end + bit-boundary detection in ONE dispatch:
    fused DDC (raw-u8 dense byte-matmul or complex fir_decimate) ->
    whole-signal FM discriminator -> Butterworth bandpass -> 4-correlator
    mark/space energy bank -> edge correlation -> lookahead peak scan with
    on-device event compaction. Returns (packed peak events, device-resident
    bf) — only the sparse event record crosses the link; the NRZI window
    means gather from `bf` in a second small dispatch (_window_means).

    Replaces the round-4 path's per-block complex downloads, host-numpy FM,
    four separate conv dispatches and six full-length peak-scan downloads
    (ref chain: decode_afsk1200.py:74-178)."""
    c = fe.resident_complex(raw_or_x, n)
    rot = jnp.asarray(fe.rot, jnp.complex64)
    audio = jnp.angle(c[1:] * jnp.conj(c[:-1]) * rot).astype(jnp.float32)
    sig, _ = bp.apply(audio, bp_state)
    sig = jnp.real(sig).astype(jnp.float32)
    # mark/space quadrature correlators (kernel timing uses the NOMINAL bw
    # like the reference — ref decode_afsk1200.py:106-143)
    i = np.arange(buf) / float(fe.bw_target)
    kernels = np.stack([np.cos(2 * np.pi * K.AFSK_MARK_HZ * i),
                        np.sin(2 * np.pi * K.AFSK_MARK_HZ * i),
                        np.cos(2 * np.pi * K.AFSK_SPACE_HZ * i),
                        np.sin(2 * np.pi * K.AFSK_SPACE_HZ * i)])
    outs = [fir.conv_valid(sig, jnp.asarray(kern, jnp.float32))
            for kern in kernels]
    mi, mq, si, sq = outs
    n_bf = sig.shape[0]
    n_set = n_bf - buf              # reference leaves the tail at zero
    e = (mi[:n_set] ** 2 + mq[:n_set] ** 2
         - si[:n_set] ** 2 - sq[:n_set] ** 2)
    bf = jnp.concatenate([e, jnp.zeros(n_bf - n_set, e.dtype)])
    # edge detection + lookahead peaks (ref decode_afsk1200.py:151-178)
    edge = np.concatenate([-np.ones(spb // 2), np.ones(spb - spb // 2)])
    changes = fir.correlate_same(jnp.sign(bf),
                                 jnp.asarray(edge, jnp.float32)) / spb
    ev_flat = peaks.lookahead_events_packed(jnp.abs(changes), lookahead,
                                            0.0, ev_cap)
    return ev_flat, bf


@partial(jax.jit, static_argnums=(2,))
def _window_means(bf, starts_hl, spb: int):
    """Mean of bf[s : s+spb] for each start (clipped at the stream end;
    empty windows give 0.0 like the reference's np.mean-of-empty guard,
    ref decode_afsk1200.py:198-205). One dispatch for ALL NRZI baud
    windows."""
    n = bf.shape[0]
    bfp = jnp.pad(bf, (0, spb))
    starts = (starts_hl[0].astype(jnp.int32) * 4096
              + starts_hl[1].astype(jnp.int32))

    def one(s0):
        s0c = jnp.minimum(s0, n)
        w = lax.dynamic_slice(bfp, (s0c,), (spb,))
        k = jnp.clip(n - s0c, 0, spb)
        mask = jnp.arange(spb) < k
        return (jnp.sum(jnp.where(mask, w, 0.0))
                / jnp.maximum(k, 1).astype(bf.dtype))

    return jax.vmap(one)(starts)


@dataclass
class Ax25Frame:
    destination: str
    source: str
    path: str
    control: int | None
    protocol: int | None
    info: str
    start_bit: int


class Afsk1200Decoder:
    """Decode AFSK1200 APRS frames from an IQ source."""

    def __init__(self, sigsrc, offset: float, bw: int | None = None,
                 dtype=jnp.complex64):
        self.src = sigsrc
        self.offset = float(offset)
        self.bw = int(bw) if bw else K.AFSK_DEFAULT_BW
        self.dtype = dtype
        self._frames: list[Ax25Frame] | None = None
        self._useful = 0

    @property
    def useful(self) -> int:
        return self._useful

    # ------------------------------------------------------------- front end
    def _baseband_audio(self) -> tuple[np.ndarray, int]:
        """offsetFreq -> blackman-harris(151) -> bwLim(bw) per chunk, then one
        whole-signal FM demod (ref decode_afsk1200.py:74-95) -- via the fused
        DDC (complex stream; the FM phasors cancel up to a constant rotation).
        """
        fe = DdcFm(self.src.sampFreq, self.offset,
                   design.blackmanharris(151), self.bw, fm=False)
        from ..io.feeder import BlockFeeder
        state = fe.init_state(self.dtype)
        cs = []
        with BlockFeeder(self.src, K.PROC_CHUNKSIZE, dtype=self.dtype) as feeder:
            for (s, e, c_in) in feeder:
                c, state = fe.process_block(c_in, state, s)
                cs.append(hostio.device_get(c))
        c = np.concatenate(cs)
        audio = np.angle(c[1:] * np.conj(c[:-1]) * fe.rot).astype(np.float32)
        return audio, fe.out_rate

    # ------------------------------------------------------------- bit layer
    def _binary_filter(self, sig: np.ndarray) -> np.ndarray:
        """Mark/space quadrature energy difference (ref
        decode_afsk1200.py:106-143): four correlators as device convolutions;
        kernel timing uses the *nominal* bw like the reference, not the
        emergent decimated rate."""
        buf = int(np.round(self.bw / K.AFSK_BAUDRATE))
        i = np.arange(buf) / self.bw
        kernels = np.stack([np.cos(2 * np.pi * K.AFSK_MARK_HZ * i),
                            np.sin(2 * np.pi * K.AFSK_MARK_HZ * i),
                            np.cos(2 * np.pi * K.AFSK_SPACE_HZ * i),
                            np.sin(2 * np.pi * K.AFSK_SPACE_HZ * i)])
        x = jnp.asarray(sig, dtype=jnp.float32)
        # conv_valid(x, k) = sum_j k[j] x[n+j]: exactly the reference's
        # sliding correlation, no tap reversal
        outs = [np.asarray(fir.conv_valid(x, jnp.asarray(k, jnp.float32)))
                for k in kernels]
        mi, mq, si, sq = outs
        bf = np.zeros(len(sig), dtype=np.float64)
        n_set = len(sig) - buf          # reference leaves the tail at zero
        bf[:n_set] = (mi[:n_set] ** 2 + mq[:n_set] ** 2
                      - si[:n_set] ** 2 - sq[:n_set] ** 2)
        return bf

    def _bit_boundaries(self, bf: np.ndarray) -> np.ndarray:
        """Edge correlation + lookahead peaks (ref decode_afsk1200.py:151-178);
        returns the positive-peak sample positions."""
        spb = self.bw // K.AFSK_BAUDRATE
        kernel = np.concatenate([-np.ones(spb // 2), np.ones(spb - spb // 2)])
        changes = np.asarray(fir.correlate_same(
            jnp.asarray(np.sign(bf), jnp.float32),
            jnp.asarray(kernel, jnp.float32))) / spb
        max_peaks, _ = peaks.lookahead_peaks(np.abs(changes),
                                             int(spb * 0.65))
        return np.asarray([p for p, _ in max_peaks], dtype=np.int64)

    def _nrzi_window_starts(self, pk: np.ndarray) -> np.ndarray:
        """Vectorized start positions of every NRZI baud window: each
        inter-peak gap of r bauds contributes windows pk[i] + k*spb,
        k < r (ref decode_afsk1200.py:187-207)."""
        spb = self.bw // K.AFSK_BAUDRATE
        spb_f = self.bw / K.AFSK_BAUDRATE
        reps = np.round(np.diff(pk) / spb_f).astype(np.int64)
        reps = np.maximum(reps, 0)
        tot = int(reps.sum())
        if tot == 0:
            return np.empty(0, np.int64)
        bases = np.repeat(pk[:-1], reps)
        run0 = np.concatenate([[0], np.cumsum(reps[:-1])])
        k = np.arange(tot) - np.repeat(run0, reps)
        return bases + k * spb

    def _nrzi_bits(self, bf: np.ndarray, pk: np.ndarray) -> np.ndarray:
        """Expand inter-peak gaps into repeated NRZI bits by averaging each
        baud window (ref decode_afsk1200.py:187-207). Vectorized: the
        per-bit Python loop of rounds 1-4 cost O(capture) host time."""
        spb = self.bw // K.AFSK_BAUDRATE
        starts = self._nrzi_window_starts(pk)
        n = len(bf)
        ends = np.minimum(starts + spb, n)
        s0 = np.minimum(starts, n)
        cs = np.concatenate([[0.0], np.cumsum(np.asarray(bf, np.float64))])
        cnt = np.maximum(ends - s0, 0)
        vals = np.where(cnt > 0, (cs[ends] - cs[s0]) / np.maximum(cnt, 1),
                        0.0)
        return np.sign(vals)

    # ------------------------------------------------------------- framing
    @staticmethod
    def decode_nrzi(nrzi: np.ndarray) -> np.ndarray:
        """NRZI -> bits: 1 on no transition (ref decode_afsk1200.py:331-352)."""
        nrzi = np.asarray(nrzi)
        out = np.empty(len(nrzi), dtype=np.int64)
        out[0] = 1
        out[1:] = (nrzi[1:] == nrzi[:-1]).astype(np.int64)
        return out

    @staticmethod
    def find_bit_stuffing(bits: np.ndarray) -> np.ndarray:
        """Mark stuffed bits: 1 = stuffed 0 after five 1s, 2 = possible frame
        end (ref decode_afsk1200.py:354-385). Vectorized: the run of
        consecutive ones ending before i is i-1 minus the last zero
        position, so the whole scan is a cummax (the per-bit loop of rounds
        1-4 cost O(capture) host time)."""
        bits = np.asarray(bits)
        n = len(bits)
        if n == 0:
            return np.zeros(0, dtype=np.int64)
        idx = np.arange(n)
        last_zero = np.maximum.accumulate(np.where(bits == 0, idx, -1))
        run_end = idx - last_zero          # consecutive ones ending AT i
        run_before = np.concatenate([[0], run_end[:-1]])
        return np.where(run_before == 5,
                        np.where(bits == 1, 2, 1), 0).astype(np.int64)

    @staticmethod
    def reduce_stuffed_bit(bits, stuffed) -> list:
        """Drop stuffed bits (ref decode_afsk1200.py:387-405)."""
        return [b for b, s in zip(bits, stuffed) if s == 0]

    @staticmethod
    def find_flags(bits: np.ndarray) -> np.ndarray:
        """Positions of the 01111110 frame flag (ref decode_afsk1200.py:219-230),
        vectorized over the bitstream."""
        bits = np.asarray(bits)
        if len(bits) < 8:
            return np.empty(0, dtype=np.int64)
        win = np.lib.stride_tricks.sliding_window_view(bits, 8)
        flag = np.asarray([0, 1, 1, 1, 1, 1, 1, 0])
        return np.flatnonzero(np.all(win == flag, axis=-1))

    @staticmethod
    def parse_ax25(msg_bits) -> Ax25Frame:
        """AX.25 header/payload parse (ref decode_afsk1200.py:291-328):
        bytes are LSB-first on the wire; header runs until a byte with its
        extension (last transmitted) bit set; 7-bit chars in the header."""
        header_chars = []
        payload_chars = []
        in_header = True
        for i in range(0, len(msg_bits) - 7, 8):
            byte = msg_bits[i:i + 8]
            msb_first = "".join(str(int(b)) for b in byte[::-1])
            if in_header:
                header_chars.append(chr(int("0" + msb_first[:7], 2)))
                if msb_first[-1] == "1":
                    in_header = False
            else:
                payload_chars.append(chr(int(msb_first, 2)))
        header = "".join(header_chars)
        payload = "".join(payload_chars)
        return Ax25Frame(
            destination=header[:7], source=header[7:14], path=header[14:],
            control=ord(payload[0]) if len(payload) > 0 else None,
            protocol=ord(payload[1]) if len(payload) > 1 else None,
            info=payload[2:], start_bit=0)

    # ------------------------------------------------------------- top level
    # device-resident capture cap for the fused single-dispatch path;
    # larger captures run the blocked legacy path
    _RESIDENT_MAX_BYTES = 4 << 30

    def _device_inputs(self):
        """(device capture, n) for the fused path, or (None, n): raw bytes
        when the source serves them (2 B/sample over the link), else the
        complex samples."""
        src = self.src
        n = int(src.length)
        if callable(getattr(src, "read_raw_device", None)):
            return src.read_raw_device(0, n), n
        if (callable(getattr(src, "read_raw", None))
                and 2 * n <= self._RESIDENT_MAX_BYTES):
            return hostio.device_put_u8(src.read_raw(0, n)), n
        if 8 * n <= self._RESIDENT_MAX_BYTES:
            return hostio.device_put(src.read(0, n), dtype=jnp.complex64), n
        return None, n

    def get_frames(self) -> list[Ax25Frame]:
        """Run the full decode; returns CRC-valid AX.25 frames."""
        if self._frames is not None:
            return self._frames
        from ..ops import resample as rs
        spb = self.bw // K.AFSK_BAUDRATE
        pk = bf_dev = bf_host = None
        x, n = self._device_inputs()
        if x is not None:
            # fused path: front end + bandpass + correlator bank + edge
            # detection + peak scan in ONE dispatch, one KB-scale download
            fe = DdcFm(self.src.sampFreq, self.offset,
                       design.blackmanharris(151), self.bw, fm=False)
            rate = fe.out_rate
            bp = iir.IirFilter.design_butter(
                rate, K.AFSK_MARK_HZ - 500, K.AFSK_SPACE_HZ + 500,
                order=6, kind="bandpass")
            buf = int(np.round(self.bw / K.AFSK_BAUDRATE))
            n_bf = rs.decim_count(n, 0, fe.stride) - 1
            lookahead = int(spb * 0.65)
            limit = n_bf - lookahead
            if limit > lookahead:
                cap = 4096
                while cap < min(limit, 8 * (n_bf // spb) + 4096):
                    cap *= 2
                cap = min(cap, limit)
                ev_flat, bf_dev = _afsk_device_pass(
                    fe, bp, x, n, spb, buf, lookahead, cap,
                    bp.initial_state_step(jnp.float32))
                got = peaks.unpack_lookahead_events(
                    hostio.device_get(ev_flat), lookahead, n_bf, cap)
                if got is None:
                    log.info("AFSK: peak-event cap overflow; blocked path")
                    bf_dev = None
                else:
                    pk = np.asarray([p for p, _ in got[0]], dtype=np.int64)
                    log.info("AFSK fused: %d samples at %d Hz, %d peaks",
                             n_bf, rate, len(pk))
        if pk is None:
            audio, rate = self._baseband_audio()
            log.info("AFSK: %d samples at %d Hz", len(audio), rate)
            bp = iir.IirFilter.design_butter(
                rate, K.AFSK_MARK_HZ - 500, K.AFSK_SPACE_HZ + 500,
                order=6, kind="bandpass")
            sig = np.asarray(bp.apply(jnp.asarray(audio, jnp.float32),
                                      bp.initial_state_step(jnp.float32))[0])
            bf_host = self._binary_filter(sig)
            pk = self._bit_boundaries(bf_host)
        if len(pk) < 2:
            self._frames = []
            return self._frames
        if bf_dev is not None:
            starts = self._nrzi_window_starts(pk)
            if len(starts) == 0:
                self._frames = []
                return self._frames
            hl = np.stack([(starts // 4096).astype(np.float32),
                           (starts % 4096).astype(np.float32)])
            vals = hostio.device_get(
                _window_means(bf_dev, jnp.asarray(hl), spb))
            nrzi = np.sign(vals)
        else:
            nrzi = self._nrzi_bits(bf_host, pk)
        bits = self.decode_nrzi(nrzi)
        stuffed = self.find_bit_stuffing(bits)
        flags = self.find_flags(bits)
        frames = []
        for fi in range(len(flags) - 1):
            seg = self.reduce_stuffed_bit(
                bits[flags[fi] + 8: flags[fi + 1]],
                stuffed[flags[fi] + 8: flags[fi + 1]])
            msg = seg[:-16]
            if len(seg) % 8 == 0 and len(msg) > 16 * 8:
                sent = "".join(str(int(b)) for b in msg)
                got = "".join(str(int(b)) for b in seg[-16:])
                if crc.fcs_crc16_bits(sent) == got:
                    frame = self.parse_ax25(msg)
                    frame.start_bit = int(flags[fi])
                    frames.append(frame)
                    self._useful = 1
                    log.info("APRS frame at bit %d: %s", flags[fi], frame.info)
        self._frames = frames
        return frames

    def get_msg(self) -> str | None:
        """Last decoded payload (the reference stores only the last frame,
        ref decode_afsk1200.py:281-283 -- but we return the real text)."""
        frames = self.get_frames()
        return frames[-1].info if frames else None
