"""IO: wav/dat sources (byte-level contract), sinks, native converter,
Doppler tracker."""
import struct

import numpy as np
import pytest

from directdemod_tpu import constants as K
from directdemod_tpu.io import native, sinks, sources
from directdemod_tpu.models import doppler


def _write_iq_wav(path, iq_u8, rate=2048000):
    payload = iq_u8.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(payload)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 2, rate, rate * 2, 2, 8))
        f.write(b"data")
        f.write(struct.pack("<I", len(payload)))
        f.write(payload)


@pytest.fixture
def iq_bytes(rng):
    return rng.integers(0, 256, size=2 * 5000, dtype=np.uint8)


def test_wav_source_byte_contract(tmp_path, iq_bytes):
    """(I + jQ) - (127.5+127.5j) as complex64 (ref source.py:117-118)."""
    p = str(tmp_path / "a.wav")
    _write_iq_wav(p, iq_bytes, rate=1_024_000)
    src = sources.IQWav(p)
    assert src.sampFreq == 1_024_000
    assert src.sourceType == K.SOURCE_IQWAV
    assert src.length == 5000
    got = src.read(10, 20)
    exp = ((iq_bytes[20:40:2].astype(np.float32) - 127.5)
           + 1j * (iq_bytes[21:40:2].astype(np.float32) - 127.5)).astype(np.complex64)
    assert got.dtype == np.complex64
    assert np.array_equal(got, exp)
    # the raw byte stream stays exposed for the Doppler waterfall
    assert np.array_equal(np.asarray(src.memmap), iq_bytes)


def test_dat_and_wavalt_sources(tmp_path, iq_bytes):
    p = str(tmp_path / "a.dat")
    iq_bytes.tofile(p)
    src = sources.IQDat(p)
    assert src.sampFreq == int(K.IQ_SDRSAMPRATE)
    assert src.sourceType == K.SOURCE_IQDAT
    w = str(tmp_path / "b.wav")
    _write_iq_wav(w, iq_bytes)
    alt = sources.IQWavAlt(w)
    ref = sources.IQWav(w)
    assert np.array_equal(alt.read(0, 100), ref.read(0, 100))


def test_rate_override(tmp_path, iq_bytes):
    p = str(tmp_path / "a.wav")
    _write_iq_wav(p, iq_bytes, rate=1_024_000)
    assert sources.IQWav(p, 2_048_000).sampFreq == 2_048_000


def test_native_converter_matches_numpy(iq_bytes):
    if not native.available():
        pytest.skip("native lib not built")
    out = native.iq_u8_to_c64(iq_bytes)
    f = iq_bytes.astype(np.float32)
    ref = np.empty(len(iq_bytes) // 2, np.complex64)
    ref.real, ref.imag = f[0::2] - 127.5, f[1::2] - 127.5
    assert np.array_equal(out, ref)


def test_wav_sink_roundtrip(tmp_path, rng):
    p = str(tmp_path / "out.wav")
    sig = rng.standard_normal(1000).astype(np.float32)
    sinks.write_wav(p, 20800, sig)
    import scipy.io.wavfile as wf
    rate, data = wf.read(p)
    assert rate == 20800
    assert np.array_equal(data, sig)


def test_csv_sink_reference_format(tmp_path):
    """zip_longest column layout with trailing commas (ref sink.py:98-108)."""
    p = str(tmp_path / "out.csv")
    sinks.write_csv(p, [[1, 2, 3], ["a"]], titles=["x", "y"])
    lines = open(p).read().splitlines()
    assert lines[0] == "x,y,"
    assert lines[1] == "1,a,"
    assert lines[2] == "2,,"


def test_doppler_tracker(rng):
    """A tone offset +5 kHz from the channel center must be tracked."""
    fs = 2048000
    center, chan = 145_865_000, 145_900_000
    true_off = chan - center + 5000       # tone sits 5 kHz above the channel
    n = fs // 2
    t = np.arange(n) / fs
    iq = 0.6 * np.exp(1j * 2 * np.pi * true_off * t) \
        + 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    raw = np.empty(2 * n, np.uint8)
    raw[0::2] = np.clip(np.round(iq.real * 80 + 127), 0, 255)
    raw[1::2] = np.clip(np.round(iq.imag * 80 + 127), 0, 255)
    trk = doppler.DopplerTracker(raw, fs, center, chan, bandwidth=20000)
    shift = trk.correct(0, 2)
    assert abs(shift - 5000) < 600        # within a couple of FFT bins


def test_read_raw_and_device_unpack(tmp_path, iq_bytes):
    """Raw uint8 ingest: read_raw slices bytes; ops/unpack on device matches
    the host byte contract (ref source.py:117-118) exactly."""
    import jax.numpy as jnp
    from directdemod_tpu.ops import unpack

    p = str(tmp_path / "a.dat")
    iq_bytes.tofile(p)
    src = sources.IQDat(p)
    assert unpack.supports_raw(src)
    raw = src.read_raw(10, 20)
    assert raw.dtype == np.uint8 and len(raw) == 20
    got = np.asarray(unpack.iq_u8_to_complex(jnp.asarray(raw)))
    assert np.array_equal(got, src.read(10, 20))
    # windowed source: read_raw honors limit() like read does
    src.limit(100, 200)
    assert np.array_equal(
        np.asarray(unpack.iq_u8_to_complex(jnp.asarray(src.read_raw(0, 50)))),
        src.read(0, 50))
    assert not unpack.supports_raw(sources.ArraySource(np.zeros(4), 1000))


def test_feeder_raw_matches_complex(tmp_path, iq_bytes):
    """BlockFeeder raw mode yields uint8 blocks the DDC unpacks to the same
    audio as the host-unpacked complex feed."""
    import jax.numpy as jnp
    from directdemod_tpu.io.feeder import BlockFeeder
    from directdemod_tpu.models.frontend import DdcFm
    from directdemod_tpu.ops import design

    p = str(tmp_path / "a.dat")
    iq_bytes.tofile(p)
    src = sources.IQDat(p, 20000)
    fe = DdcFm(20000, 300, design.blackmanharris(151), 4000, fm=True)

    outs = {}
    for raw in (False, True):
        state = fe.init_state(jnp.complex64)
        ys = []
        with BlockFeeder(src, 2000, raw=raw) as feeder:
            for (s, e, x) in feeder:
                assert (x.dtype == jnp.uint8) == raw
                y, state = fe.process_block(x, state, s)
                ys.append(np.asarray(y))
        outs[raw] = np.concatenate(ys)
    assert np.allclose(outs[True], outs[False], atol=1e-6)
