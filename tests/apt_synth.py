"""Synthetic NOAA APT capture generator for end-to-end tests.

Builds the APT baseband from first principles (2080 words/line at 4160 words/s,
sync trains from constants, luminance -> subcarrier amplitude), AM-modulates
the 2400 Hz subcarrier, FM-modulates onto a channel offset, and emits uint8-
quantized IQ like an SDR capture. Word/sync layout follows the constants the
reference decodes against (ref constants.py:15-17)."""
import numpy as np

from directdemod_tpu import constants as K

FS = 2048000
WORDS_PER_LINE = 2080
WORD_RATE = 4160.0


def apt_line_words(image_a_row, image_b_row):
    """One 2080-word luminance line: [syncA(40) | A content(1000) |
    syncB(40) | B content(1000)], contents centered around the given rows."""
    line = np.empty(WORDS_PER_LINE)
    line[0:40] = np.asarray(K.NOAA_SYNCA) * 233.0 + 11.0
    line[40:1040] = np.resize(image_a_row, 1000)
    line[1040:1080] = np.asarray(K.NOAA_SYNCB) * 233.0 + 11.0
    line[1080:2080] = np.resize(image_b_row, 1000)
    return line


def synthesize(n_lines=8, offset_hz=30000, dev_hz=17000, snr_db=None,
               pattern="gradient", extra_s=0.25, seed=0,
               doppler_hz_per_s=0.0):
    """Returns (uint8-roundtripped complex64 IQ, ground-truth word lines).

    `doppler_hz_per_s`: linear carrier drift, the pass-geometry ramp a real
    LEO capture carries (~10-60 Hz/s at 137 MHz); the FM discriminator maps
    it to a slowly-moving DC bias the decoders must tolerate."""
    rng = np.random.default_rng(seed)
    lines = []
    for i in range(n_lines):
        if pattern == "gradient":
            a = np.linspace(30, 220, 1000) + 10 * (i % 3)
            b = np.linspace(220, 30, 1000)
        else:
            a = rng.uniform(20, 235, 1000)
            b = rng.uniform(20, 235, 1000)
        lines.append(apt_line_words(a, b))
    words = np.concatenate(lines)

    n = int((n_lines * 0.5 + extra_s) * FS)
    t = np.arange(n) / FS
    widx = np.minimum((t * WORD_RATE).astype(np.int64), len(words) - 1)
    lum = words[widx]
    env = 0.05 + 0.9 * lum / 255.0
    baseband = env * np.cos(2 * np.pi * 2400.0 * t)

    phase = 2 * np.pi * offset_hz * t + \
        2 * np.pi * dev_hz * np.cumsum(baseband) / FS
    if doppler_hz_per_s:
        phase = phase + np.pi * doppler_hz_per_s * t * t
    iq = np.exp(1j * phase)
    if snr_db is not None:
        p_noise = 10 ** (-snr_db / 10)
        iq = iq + np.sqrt(p_noise / 2) * (rng.standard_normal(n)
                                          + 1j * rng.standard_normal(n))
    # uint8 quantization round-trip like a real SDR capture
    scale = 90.0
    i8 = np.clip(np.round(iq.real * scale + 127.5), 0, 255)
    q8 = np.clip(np.round(iq.imag * scale + 127.5), 0, 255)
    iq = ((i8 - 127.5) + 1j * (q8 - 127.5)).astype(np.complex64)
    return iq, np.stack(lines)


def synthesize_with_wedge(lines_per_step=3, steps_pre=2, offset_hz=30000,
                          dev_hz=17000, snr_db=25, seed=3):
    """Capture whose pre-sync telemetry strips walk the 8-step calibration
    wedge then drop, driving the reference's color-correction state machine
    to lock (ref decode_noaa.py:371-425)."""
    rng = np.random.default_rng(seed)
    # wedge intensities ~ i*255/8 in luminance units
    wedge = [int(i * 255 / 8) for i in range(1, 9)]
    sequence = [20] * steps_pre + wedge + [10, 10]   # preamble, ramp, drop
    lines = []
    for step_val in sequence:
        for _ in range(lines_per_step):
            a = np.linspace(40, 210, 1000)
            b = np.full(1000, 120.0) + 5 * rng.standard_normal(1000)
            line = apt_line_words(a, b)
            # telemetry strips: the 40 words before each sync carry the wedge
            # (they are read as the strip medians of the *following* line)
            line[2080 - 40:] = step_val          # before next line's syncA
            line[1040 - 40:1040] = step_val      # before syncB
            lines.append(line)
    words = np.concatenate(lines)

    n = int(len(lines) * 0.5 * FS) + int(0.25 * FS)
    t = np.arange(n) / FS
    widx = np.minimum((t * WORD_RATE).astype(np.int64), len(words) - 1)
    env = 0.05 + 0.9 * words[widx] / 255.0
    baseband = env * np.cos(2 * np.pi * 2400.0 * t)
    phase = 2 * np.pi * offset_hz * t + \
        2 * np.pi * dev_hz * np.cumsum(baseband) / FS
    iq = np.exp(1j * phase)
    p_noise = 10 ** (-snr_db / 10)
    iq = iq + np.sqrt(p_noise / 2) * (rng.standard_normal(n)
                                      + 1j * rng.standard_normal(n))
    scale = 90.0
    i8 = np.clip(np.round(iq.real * scale + 127.5), 0, 255)
    q8 = np.clip(np.round(iq.imag * scale + 127.5), 0, 255)
    return ((i8 - 127.5) + 1j * (q8 - 127.5)).astype(np.complex64), np.stack(lines)
