#!/usr/bin/env python3
"""Long-capture NOAA decode: a full-pass-scale synthetic capture decoded
device-resident, where the tunnel's fixed per-dispatch costs amortize and
the real-time factor approaches the chip's compute bound.

    python examples/bench_noaa_long.py [--minutes M]

Also a scale stress test: at >= 5 minutes the envelope line-start indices
pass 2^24, exercising the exact (hi, lo) packing throughout (the round-3
ADVICE float32-quantization hazard).

Prints one JSON line.
"""
import argparse
import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def synth_long_bytes(n_lines: int, fs: int = 2048000,
                     offset_hz: float = 30000.0, dev_hz: float = 17000.0,
                     chunk_s: float = 25.0) -> np.ndarray:
    """Memory-lean APT synthesis straight to interleaved uint8 bytes:
    the FM phase integral is accumulated chunkwise in fp64 (exact
    continuity), so peak RAM stays ~chunk-sized instead of 8 arrays x
    capture-sized."""
    from apt_synth import apt_line_words, WORD_RATE

    rng = np.random.default_rng(0)
    lines = []
    for i in range(n_lines):
        a = np.linspace(30, 220, 1000) + 10 * (i % 3)
        b = np.linspace(220, 30, 1000)
        lines.append(apt_line_words(a, b))
    words = np.concatenate(lines)

    n = int((n_lines * 0.5 + 0.25) * fs)
    out = np.empty(2 * n, dtype=np.uint8)
    phase0 = 0.0
    step = int(chunk_s * fs)
    for s in range(0, n, step):
        e = min(n, s + step)
        t = np.arange(s, e, dtype=np.float64) / fs
        widx = np.minimum((t * WORD_RATE).astype(np.int64), len(words) - 1)
        env = 0.05 + 0.9 * words[widx] / 255.0
        baseband = env * np.cos(2 * np.pi * 2400.0 * t)
        dphi = 2 * np.pi * (offset_hz / fs) + \
            2 * np.pi * dev_hz * baseband / fs
        phase = phase0 + np.cumsum(dphi)
        phase0 = float(phase[-1])
        iq = np.exp(1j * phase)
        noise = 0.05 * (rng.standard_normal(e - s)
                        + 1j * rng.standard_normal(e - s))
        iq = iq + noise
        out[2 * s: 2 * e: 2] = np.clip(
            np.round(iq.real * 90.0 + 127.5), 0, 255).astype(np.uint8)
        out[2 * s + 1: 2 * e: 2] = np.clip(
            np.round(iq.imag * 90.0 + 127.5), 0, 255).astype(np.uint8)
        del t, widx, env, baseband, dphi, phase, iq, noise
        gc.collect()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=5.0)
    ap.add_argument("--cache", type=str, default=None,
                    help="path to cache the synthesized byte capture")
    args = ap.parse_args()

    import jax
    from directdemod_tpu.io.sources import DeviceRawSource
    from directdemod_tpu.models.noaa import NoaaDecoder

    fs = 2048000
    n_lines = int(args.minutes * 60 * 2)
    t0 = time.perf_counter()
    if args.cache and os.path.exists(args.cache):
        raw = np.fromfile(args.cache, dtype=np.uint8)
    else:
        raw = synth_long_bytes(n_lines, fs)
        if args.cache:
            raw.tofile(args.cache)
    synth_s = time.perf_counter() - t0
    capture_s = len(raw) / 2 / fs
    print(json.dumps({"phase": "synth", "seconds": round(synth_s, 1),
                      "capture_seconds": round(capture_s, 1)}),
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    src = DeviceRawSource.from_host_bytes(raw, fs)
    jax.block_until_ready(src._raw)
    upload_s = time.perf_counter() - t0

    # warm (compiles shapes for this capture length)
    dec = NoaaDecoder(src, offset=30000)
    t0 = time.perf_counter()
    useful = dec.useful
    img = dec.get_image()
    warm_s = time.perf_counter() - t0

    dec2 = NoaaDecoder(src, offset=30000)
    t0 = time.perf_counter()
    useful = dec2.useful
    img = dec2.get_image()
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "noaa_long_resident_decode",
        "value": round(dt, 3),
        "unit": "s",
        "capture_seconds": round(capture_s, 1),
        "capture_samples": len(raw) // 2,
        "realtime_factor": round(capture_s / dt, 1),
        "useful": useful,
        "image_shape": list(img.shape),
        "warm_incl_compile_s": round(warm_s, 1),
        "one_time_upload_s": round(upload_s, 1),
        "device": jax.devices()[0].device_kind,
        "stages": dec2.profiler.report(),
    }))


if __name__ == "__main__":
    main()
