#!/usr/bin/env python3
"""AFSK1200/APRS decode benchmark on real TPU hardware: the round-5 fused
single-dispatch pipeline on a device-resident raw-u8 capture, vs the
reference's own decode_afsk1200 timed on this same host (short capture,
per-sample extrapolation — its per-sample Python loops run minutes/minute).

    python examples/bench_afsk.py [--dur S]

Prints one JSON line (recorded as BENCH_AFSK_r05.json).
"""
import argparse
import json
import os
import struct
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def _synth(dur_s: float, fs: int, offset_hz: float, n_frames_cap: int = 10_000):
    from test_afsk1200 import make_ax25_frame, stuff_bits, afsk_modulate
    flags = [0, 1, 1, 1, 1, 1, 1, 0]
    one = stuff_bits(make_ax25_frame(info="bench frame payload 0123456789"))
    gap = [1] * 240                      # ~0.2 s of idle marks between frames
    wire = flags * 3
    n_frames = 0
    baud_total = lambda: len(wire) + 90
    while (baud_total() + len(one) + len(flags) * 6 + len(gap)) / 1200.0 \
            < dur_s and n_frames < n_frames_cap:
        wire += one + flags * 3 + gap + flags * 3
        n_frames += 1
    iq = afsk_modulate(wire, fs, offset_hz=offset_hz)
    rng = np.random.default_rng(5)
    iq = iq + 0.02 * (rng.standard_normal(len(iq))
                      + 1j * rng.standard_normal(len(iq))).astype(np.complex64)
    raw = np.empty(2 * len(iq), np.uint8)
    raw[0::2] = np.clip(np.round(iq.real * 100 + 127.5), 0, 255)
    raw[1::2] = np.clip(np.round(iq.imag * 100 + 127.5), 0, 255)
    return raw, n_frames, len(iq) / fs


def _reference_rt(fs: int, offset_hz: float, dur_s: float = 4.0):
    """Time the mounted reference's decode_afsk1200 on a short capture on
    this host; returns (real-time factor, measured seconds, capture s)."""
    import scipy
    import scipy.fftpack
    import scipy.signal
    import scipy.signal.windows as sw
    # compatibility aliases for the reference's old-scipy imports (shims to
    # RUN the mounted reference for a same-host baseline, nothing more)
    scipy.ifft = scipy.fftpack.ifft
    if not hasattr(np, "Inf"):
        np.Inf = np.inf
    for alias, val in (("int", int), ("float", float), ("bool", bool),
                       ("complex", complex), ("object", object)):
        if not hasattr(np, alias):
            setattr(np, alias, val)
    for name in ("blackmanharris", "hamming", "gaussian"):
        if not hasattr(scipy.signal, name):
            setattr(scipy.signal, name, getattr(sw, name))
    sys.path.insert(0, "/root/reference")
    from directdemod import source as ref_source
    from directdemod import decode_afsk1200 as ref_afsk

    raw, n_frames, cap_s = _synth(dur_s, fs, offset_hz)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ref.wav")
        with open(path, "wb") as f:
            data = raw.tobytes()
            f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
            f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, fs,
                                          fs * 2, 2, 8))
            f.write(b"data" + struct.pack("<I", len(data)) + data)
        src = ref_source.IQwav(path)
        t0 = time.perf_counter()
        dec = ref_afsk.decode_afsk1200(src, offset_hz, 22050)
        msg = dec.getMsg
        dt = time.perf_counter() - t0
    return cap_s / dt, dt, cap_s, int(dec.useful)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dur", type=float, default=60.0)
    ap.add_argument("--ref-dur", type=float, default=4.0)
    ap.add_argument("--skip-ref", action="store_true")
    args = ap.parse_args()

    import jax
    from directdemod_tpu.io.sources import DeviceRawSource
    from directdemod_tpu.models.afsk1200 import Afsk1200Decoder

    fs, offset = 2048000, 12000
    raw, n_frames, cap_s = _synth(args.dur, fs, offset)
    dev = jax.devices()[0]

    t0 = time.perf_counter()
    src = DeviceRawSource.from_host_bytes(raw, fs)
    jax.block_until_ready(src._raw)
    upload_s = time.perf_counter() - t0

    dec = Afsk1200Decoder(src, offset)
    t0 = time.perf_counter()
    frames = dec.get_frames()
    warm_s = time.perf_counter() - t0

    times = []
    for _ in range(3):
        dec2 = Afsk1200Decoder(src, offset)
        t0 = time.perf_counter()
        frames = dec2.get_frames()
        times.append(time.perf_counter() - t0)
    dt = min(times)                  # tunnel RPC jitter: best-of-3

    out = {
        "metric": "afsk_decode",
        "unit": "s",
        "device": dev.device_kind,
        "capture_seconds": round(cap_s, 1),
        "capture_samples": len(raw) // 2,
        "frames_expected": n_frames,
        "frames_decoded": len(frames),
        "useful": dec2.useful,
        "one_time_upload_s": round(upload_s, 3),
        "warm_incl_compile_s": round(warm_s, 3),
        "wallclock_s": round(dt, 3),
        "realtime_factor": round(cap_s / dt, 1),
    }
    if not args.skip_ref:
        try:
            ref_rt, ref_dt, ref_cap, ref_useful = _reference_rt(
                fs, offset, args.ref_dur)
            out["reference_same_host"] = {
                "capture_seconds": round(ref_cap, 1),
                "wallclock_s": round(ref_dt, 2),
                "realtime_factor": round(ref_rt, 3),
                "useful": ref_useful,
            }
            out["vs_reference"] = round((cap_s / dt) / ref_rt, 1)
        except Exception as e:
            out["reference_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
