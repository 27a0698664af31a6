"""End-to-end NOAA APT decode of a synthesized capture."""
import numpy as np
import pytest
import jax.numpy as jnp

from directdemod_tpu.io.sources import ArraySource
from directdemod_tpu.models import apt
from directdemod_tpu.models.noaa import NoaaDecoder
from tests.apt_synth import synthesize, FS


@pytest.fixture(scope="module")
def decoded():
    iq, truth = synthesize(n_lines=12, snr_db=20)
    src = ArraySource(iq, FS)
    dec = NoaaDecoder(src, 30000, dtype=jnp.complex64)
    return dec, truth


def test_useful_and_sync_spacing(decoded):
    dec, _ = decoded
    assert dec.useful == 1
    sa, sb = dec.get_crude_sync()
    assert len(sa) >= 11 and len(sb) >= 11
    # 0.5 s spacing at the emergent 60235 Hz rate
    da = np.diff(sa)
    assert np.all(np.abs(da - 0.5 * 60235) < 5)
    # B syncs sit ~0.25 s after A syncs
    off = sb[0] - sa[np.searchsorted(sa, sb[0]) - 1]
    assert abs(off - 0.25 * 60235) < 30


def test_image_dimensions_and_content(decoded):
    dec, truth = decoded
    img = dec.get_image()
    assert img.shape[1] == 2080
    assert img.shape[0] >= 10
    # each decoded line's A-channel should correlate strongly with the
    # ground-truth gradient (alignment may shift by a couple of words)
    gt = truth[0][40:1040]
    cors = []
    for r in range(img.shape[0]):
        row = img[r, :1040].astype(np.float64)
        c = np.corrcoef(row[60:1000], gt[60 - 40 + 40:1000])[0, 1]
        cors.append(c)
    assert np.median(cors) > 0.9, cors


def test_image_a_b_split(decoded):
    dec, _ = decoded
    assert dec.image_a.shape[1] == 1040
    assert dec.image_b.shape[1] == 1040


def test_false_color_shape(decoded):
    dec, _ = decoded
    color = dec.get_color()
    assert color.shape == (dec.image_a.shape[0], 1040, 3)
    assert color.dtype == np.uint8


def test_audio_strict_rate(decoded):
    dec, _ = decoded
    audio, rate = dec.get_audio()
    assert rate == 20800
    # duration within 1% of the capture
    assert abs(len(audio) / rate - dec.src.length / FS) < 0.05


def test_accurate_sync(decoded):
    dec, _ = decoded
    out = dec.get_accurate_sync(use_norm_correlate=True)
    da, dda, qa, ta, db, ddb, qb, tb = out
    assert len(da) >= 10
    # accurate syncs spaced 0.5 s at full rate
    assert np.all(np.abs(np.asarray(dda) - 0.5 * FS) < 300)
    # quality values are normalized correlations
    assert np.all(np.asarray(qa) > 0.3)


@pytest.mark.parametrize("csync", [
    [],                                   # no syncs at all
    [12345.0],                            # single sync: no spacing estimate
    [7.0, 7.0, 7.0, 900.0],               # duplicates: modal spacing == 0
    #   (the reference's forward fill never advances -> infinite loop)
])
def test_fill_syncs_degenerate_inputs(csync):
    """Degenerate sync lists (which crash or hang the reference's __fillSync)
    must degrade to a best-effort pass-through so the decode falls back to the
    backup-image path (ref decode_noaa.py:454-456) instead of raising."""
    out = apt.fill_syncs(csync, max_len=100000)
    assert out == sorted(csync)
    # and the image stage consumes the result without raising
    rng = np.random.default_rng(0)
    env = rng.random(60000).astype(np.float64)
    img, ida, idb = apt.assemble_image(
        env, 4160, out, [c + 1040 for c in out], np.asarray(out))
    assert img.ndim == 2


def test_crude_sync_overflow_fallback(decoded, monkeypatch):
    """When candidate count exceeds the in-kernel slot cap, _crude_sync_fused
    must fall back to exact unbounded extraction and produce identical syncs
    (regression: round 3 shipped a NameError on this path, noaa.py:226)."""
    from directdemod_tpu.models import noaa as noaa_mod
    dec, _ = decoded
    sa_ref, sb_ref = dec.get_crude_sync()

    monkeypatch.setattr(noaa_mod, "_sync_cap", lambda n: 8)  # force overflow
    iq, _ = synthesize(n_lines=12, snr_db=20)
    dec2 = NoaaDecoder(ArraySource(iq, FS), 30000, dtype=jnp.complex64)
    sa, sb = dec2.get_crude_sync()
    assert np.array_equal(sa, sa_ref)
    assert np.array_equal(sb, sb_ref)


def test_accurate_sync_fast_path_matches_generic(decoded, monkeypatch):
    """The batched argmax fast path (min_dist >= window) must produce exactly
    the generic grouped-walk results on the same capture."""
    from directdemod_tpu.models import noaa as noaa_mod
    dec, _ = decoded
    fast = dec.get_accurate_sync(use_norm_correlate=True)

    iq, _ = synthesize(n_lines=12, snr_db=20)
    dec2 = NoaaDecoder(ArraySource(iq, FS), 30000, dtype=jnp.complex64)
    # Shrink NOAA_MINPEAKDIST just below the fast-path gate (gate needs
    # v * fs >= 2*width = 118152 -> v >= 0.0577): the generic walk runs,
    # and within a 118k window its grouping still forms one group unless
    # two candidates sit ~the full window apart (not the case here), so
    # the two paths must agree exactly.
    orig = noaa_mod.K.NOAA_MINPEAKDIST
    monkeypatch.setattr(noaa_mod.K, "NOAA_MINPEAKDIST", 0.0576, raising=True)
    generic = dec2.get_accurate_sync(use_norm_correlate=True)
    monkeypatch.setattr(noaa_mod.K, "NOAA_MINPEAKDIST", orig, raising=True)

    assert fast[0] == generic[0]                         # A detections
    assert np.allclose(fast[2], generic[2], rtol=1e-5)   # A quality
    t_f = [x for x in fast[3] if x is not None]
    t_g = [x for x in generic[3] if x is not None]
    assert np.allclose(t_f, t_g, rtol=1e-5)              # A time syncs
    assert fast[4] == generic[4]                         # B detections


def test_accurate_sync_resident_gather(decoded):
    """Resident sources gather accurate-sync windows straight from HBM
    bytes and reduce ALL of them in one dispatch per needle
    (_accurate_fast_resident_all); detections must agree with the
    host-read path on the byte-identical capture to within one sample.
    (Bit-equality is not promised across the two: the scan-wrapped program
    factors its batched FFTs differently enough to move a flat argmax by
    one sample — 0.5 us at full rate; round-5 finding, docs/experiments.md.)
    """
    from directdemod_tpu.io.sources import DeviceRawSource
    dec, _ = decoded
    ref = dec.get_accurate_sync(use_norm_correlate=True)

    iq, _ = synthesize(n_lines=12, snr_db=20)
    raw = np.empty(2 * len(iq), np.uint8)
    raw[0::2] = np.round(iq.real + 127.5).astype(np.uint8)
    raw[1::2] = np.round(iq.imag + 127.5).astype(np.uint8)
    src = DeviceRawSource.from_host_bytes(raw, FS)
    dec2 = NoaaDecoder(src, 30000, dtype=jnp.complex64)
    got = dec2.get_accurate_sync(use_norm_correlate=True)
    for gi, ri in ((0, 0), (4, 4)):                    # detections A/B
        assert len(got[gi]) == len(ref[ri])
        assert np.max(np.abs(np.asarray(got[gi])
                             - np.asarray(ref[ri]))) <= 1
    assert np.allclose(got[2], ref[2], rtol=1e-4)      # quality
