"""Shared tutorial helper: ensure an IQ.wav capture exists.

The reference tutorials assume the bundled SDRSharp sample capture (which
its repository ships via git-LFS); these tutorials synthesize a small FM
capture on first run instead so they work out of the box.
"""
import os
import struct

import numpy as np


def ensure_capture(path: str = "IQ.wav", seconds: float = 2.0,
                   fs: int = 2048000, offset_hz: float = 30000.0,
                   tone_hz: float = 1200.0, dev_hz: float = 9000.0) -> str:
    """Synthesize an FM-tone IQ.wav (SDRSharp layout: 2-ch uint8) if absent."""
    if os.path.exists(path):
        return path
    n = int(seconds * fs)
    t = np.arange(n) / fs
    phase = 2 * np.pi * offset_hz * t \
        + (dev_hz / tone_hz) * np.sin(2 * np.pi * tone_hz * t)
    iq = 90.0 * np.exp(1j * phase)
    u8 = np.empty(2 * n, np.uint8)
    u8[0::2] = np.clip(np.round(iq.real + 127.5), 0, 255).astype(np.uint8)
    u8[1::2] = np.clip(np.round(iq.imag + 127.5), 0, 255).astype(np.uint8)
    payload = u8.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(payload)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 2, fs, fs * 2, 2, 8))
        f.write(b"data")
        f.write(struct.pack("<I", len(payload)))
        f.write(payload)
    print(f"synthesized {path} ({seconds:.1f}s FM tone capture)")
    return path
