"""Chainable Stream API, filter facade, AM-LP demod, median, checkpoint/resume."""
import numpy as np
import pytest
import scipy.signal as ss
import jax.numpy as jnp

from directdemod_tpu import constants as K
from directdemod_tpu.io.sources import ArraySource
from directdemod_tpu.ops import am, filters
from directdemod_tpu.stream import checkpoint
from directdemod_tpu.stream.api import Stream
from directdemod_tpu.stream.plan import plan_blocks
from directdemod_tpu.models.frontend import DdcFm
from directdemod_tpu.ops import design

FS = 2048000


@pytest.fixture(scope="module")
def capture():
    rng = np.random.default_rng(21)
    n = 400_000
    t = np.arange(n) / FS
    x = (np.exp(1j * (2 * np.pi * 30000 * t + 3 * np.sin(2 * np.pi * 700 * t)))
         + 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)))
    return x.astype(np.complex128)


def test_stream_chain_matches_pipeline(capture):
    src = ArraySource(capture, FS)
    audio, rate = (Stream(src, dtype=jnp.complex128)
                   .shift(30000)
                   .filter(filters.blackman_harris(151))
                   .bw_limit(60000)
                   .fm_demod()
                   .run(block_size=150_000))
    fused, rate2 = (Stream(src, dtype=jnp.complex128)
                    .shift(30000)
                    .filter(filters.blackman_harris(151))
                    .bw_limit(60000)
                    .fm_demod()
                    .run_fused(block_size=150_000))
    assert rate == rate2 == 60235
    assert np.max(np.abs(audio - fused)) < 1e-9


def test_stream_butter_and_apply(capture):
    src = ArraySource(capture[:100_000], FS)
    out, rate = (Stream(src, dtype=jnp.complex128)
                 .filter(filters.butter(FS, 60000, n=6, kind=K.FLT_LP))
                 .apply(jnp.abs)
                 .run())
    assert rate == FS and len(out) == 100_000 and np.all(np.isfinite(out))


def test_filters_facade_validation():
    with pytest.raises(ValueError):
        filters.remez(1000, [], [])
    with pytest.raises(ValueError):
        filters.remez(1000, [[0, 600]], [1])
    with pytest.raises(ValueError):
        filters.butter(1000, 100, kind=K.FLT_BP)
    with pytest.raises(ValueError):
        filters.butter(1000, 100, kind=99)


def test_median_filter_matches_scipy(rng):
    x = rng.standard_normal(501)
    for n in (3, 5, 9):
        ours = np.asarray(filters.median_filter(jnp.asarray(x), n))
        ref = ss.medfilt(x, n)
        assert np.allclose(ours, ref, atol=1e-12), n


def test_envelope_lowpass_matches_reference_formula(rng):
    """demod_amFLT == butter-LP of |sig| with the zi seed (ref demod_am.py:35-62)."""
    x = rng.standard_normal(20000) + 1j * rng.standard_normal(20000)
    b, a = ss.butter(6, 1000 / (0.5 * 60000))
    ref, _ = ss.lfilter(b, a, np.abs(x), zi=ss.lfilter_zi(b, a))
    ours, _ = am.envelope_lowpass(jnp.asarray(x), 60000, 1000)
    assert np.max(np.abs(np.asarray(ours) - ref)) < 1e-6


def test_checkpoint_resume_mid_stream(capture, tmp_path):
    src = ArraySource(capture, FS)
    fe = DdcFm(FS, 30000, design.blackmanharris(151), 60000, fm=True)
    blocks = plan_blocks(len(capture), 100_000)

    # full run
    state = fe.init_state(jnp.complex128)
    full = []
    for (s, e) in blocks:
        y, state = fe.process_block(jnp.asarray(src.read(s, e)), state, s)
        full.append(np.asarray(y))
    full = np.concatenate(full)

    # run half, checkpoint, restore into a fresh process-alike, finish
    state = fe.init_state(jnp.complex128)
    out1 = []
    for (s, e) in blocks[:2]:
        y, state = fe.process_block(jnp.asarray(src.read(s, e)), state, s)
        out1.append(np.asarray(y))
    ck = str(tmp_path / "stream.ckpt.npz")
    checkpoint.save(ck, state, blocks[2][0], meta={"decoder": "noaa"})

    st2, pos, meta = checkpoint.restore(ck, fe.init_state(jnp.complex128))
    assert pos == blocks[2][0] and meta["decoder"] == "noaa"
    out2 = []
    for (s, e) in blocks:
        if s < pos:
            continue
        y, st2 = fe.process_block(jnp.asarray(src.read(s, e)), st2, s)
        out2.append(np.asarray(y))
    resumed = np.concatenate(out1 + out2)
    assert np.array_equal(resumed, full)


def test_pipeline_checkpoint_roundtrip(capture, tmp_path):
    from directdemod_tpu.stream.pipeline import Pipeline, Shift, Filter, BwLim, FmDemod
    src = ArraySource(capture, FS)
    pipe = Pipeline([Shift(30000), Filter(filters.blackman_harris(151)),
                     BwLim(60000), FmDemod()], FS, dtype=jnp.complex128)
    full, rate = pipe.process(src, block_size=100_000)
    ck = str(tmp_path / "pipe.ckpt.npz")
    # process two blocks with checkpointing, then resume in a fresh pipeline
    blocks_out, _ = pipe.process(ArraySource(capture[:200_000], FS),
                                 block_size=100_000, checkpoint_path=ck)
    pipe2 = Pipeline([Shift(30000), Filter(filters.blackman_harris(151)),
                      BwLim(60000), FmDemod()], FS, dtype=jnp.complex128)
    rest, _ = pipe2.process(src, block_size=100_000, checkpoint_path=ck,
                            resume=True)
    resumed = np.concatenate([blocks_out, rest])
    assert np.array_equal(resumed, full)


def test_fm_decoder_tone():
    """FmDecoder end-to-end on a synthetic FM tone (the decode_fm chain,
    ref decode_fm.py:61-70): recovered audio peaks at the modulating tone."""
    import numpy as np
    from directdemod_tpu.io.sources import ArraySource
    from directdemod_tpu.models.fm import FmDecoder

    fs, tone, dev = 2048000, 1200.0, 9000.0
    n = fs  # 1 s
    t = np.arange(n) / fs
    ph = 2 * np.pi * 30000 * t + (dev / tone) * np.sin(2 * np.pi * tone * t)
    iq = (90 * np.exp(1j * ph)).astype(np.complex64)
    dec = FmDecoder(ArraySource(iq, fs), offset=30000, bw=60000,
                    audio_freq=15000)
    audio, rate = dec.get_audio()
    assert rate > 0 and len(audio) > rate // 2
    spec = np.abs(np.fft.rfft(audio[rate // 4:]))
    peak = (np.argmax(spec[5:]) + 5) * rate / (len(audio) - rate // 4)
    assert abs(peak - tone) < 30, peak
