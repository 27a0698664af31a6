"""Direct A/B against the reference implementation (when mounted).

Runs aerospaceresearch/DirectDemod itself (read-only import from
/root/reference) on the same synthetic APT capture and compares crude sync
positions and decoded image lines. Skipped when the reference tree or its
dependencies are absent.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


def _compat_shims():
    """The 2018-era reference targets scipy 1.0 / numpy 1.14; alias the
    few symbols modern versions moved/removed so it can run for the A/B."""
    import scipy
    import scipy.signal as ss
    for name in ("hamming", "blackmanharris", "gaussian"):
        if not hasattr(ss, name):
            setattr(ss, name, getattr(ss.windows, name))
    if not hasattr(scipy, "ifft"):          # peakdetect does `from scipy import fft, ifft`
        scipy.ifft = scipy.fft.ifft
    if not hasattr(np, "Inf"):
        np.Inf = np.inf
    if not hasattr(np, "int"):
        np.int = int


@pytest.fixture(scope="module")
def reference_modules():
    _compat_shims()
    sys.path.insert(0, REF)
    try:
        from directdemod import source as rsource  # noqa: F401
        from directdemod import decode_noaa as rnoaa
    except Exception as e:  # missing optional deps etc.
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REF)
    return rnoaa


class _RefArraySource:
    """Adapter exposing the reference source surface over an array."""

    def __init__(self, arr, fs):
        self._a, self.sampFreq, self.length = arr, fs, len(arr)
        self.memmap = None
        self.sourceType = 0

    def read(self, i, j=None):
        return self._a[i:j if j is not None else i + 1]

    def limitData(self, *a, **k):
        pass


@pytest.mark.slow
def test_noaa_sync_and_image_parity(reference_modules):
    from tests.apt_synth import synthesize, FS
    from directdemod_tpu.io.sources import ArraySource
    from directdemod_tpu.models.noaa import NoaaDecoder

    iq, _ = synthesize(n_lines=12, snr_db=20)

    ours = NoaaDecoder(ArraySource(iq, FS), 30000)
    sa, sb = ours.get_crude_sync()

    sys.path.insert(0, REF)
    try:
        ref_dec = reference_modules.decode_noaa(
            _RefArraySource(iq.astype(np.complex64), FS), 30000)
        ref_sa, ref_sb = ref_dec.getCrudeSync()
        ref_useful = ref_dec.useful
        ref_img = ref_dec.getImage if ref_useful else None
    finally:
        sys.path.remove(REF)

    assert ours.useful == ref_useful == 1
    # sync positions: same count, within a couple of samples
    assert len(sa) == len(ref_sa) and len(sb) == len(ref_sb)
    assert np.max(np.abs(np.asarray(sa) - np.asarray(ref_sa))) <= 2
    assert np.max(np.abs(np.asarray(sb) - np.asarray(ref_sb))) <= 2

    img = ours.get_image()
    ref_img = np.asarray(ref_img)
    assert img.shape == ref_img.shape
    # per-line correlation between the two decoders' images
    cors = [np.corrcoef(img[r].astype(float), ref_img[r].astype(float))[0, 1]
            for r in range(img.shape[0])]
    assert np.median(cors) > 0.98, cors


@pytest.mark.slow
def test_afsk_parity(reference_modules):
    """Both decoders must accept the same synthesized AX.25 frame (the
    reference stores a placeholder message, so compare usefulness)."""
    from tests.test_afsk1200 import make_ax25_frame, stuff_bits, afsk_modulate, FS
    from directdemod_tpu.io.sources import ArraySource
    from directdemod_tpu.models.afsk1200 import Afsk1200Decoder

    flags = [0, 1, 1, 1, 1, 1, 1, 0]
    wire = flags * 3 + stuff_bits(make_ax25_frame(info="parity check")) + flags * 3
    iq = afsk_modulate(wire, FS, offset_hz=12000)

    ours = Afsk1200Decoder(ArraySource(iq, FS), 12000)
    assert ours.get_msg() == "parity check"

    _compat_shims()
    sys.path.insert(0, REF)
    try:
        from directdemod import decode_afsk1200 as rafsk
        ref = rafsk.decode_afsk1200(
            _RefArraySource(iq.astype(np.complex64), FS), 12000, 22050)
        ref.getMsg
        ref_useful = ref.useful
    finally:
        sys.path.remove(REF)
    assert ref_useful == 1 == ours.useful


@pytest.mark.slow
def test_calibrated_image_parity(reference_modules):
    """A capture with a real 8-step wedge drives both calibration state
    machines to lock; the calibrated (slope/intercept) images must agree."""
    from tests.apt_synth import synthesize_with_wedge, FS
    from directdemod_tpu.io.sources import ArraySource
    from directdemod_tpu.models.noaa import NoaaDecoder

    iq, _ = synthesize_with_wedge()
    ours = NoaaDecoder(ArraySource(iq, FS), 30000)
    img = ours.get_image()

    _compat_shims()
    sys.path.insert(0, REF)
    try:
        ref_dec = reference_modules.decode_noaa(
            _RefArraySource(iq.astype(np.complex64), FS), 30000)
        assert ref_dec.useful == 1
        ref_img = np.asarray(ref_dec.getImage)
    finally:
        sys.path.remove(REF)

    assert ours.useful == 1
    assert img.shape == ref_img.shape
    diff = np.abs(img.astype(int) - ref_img.astype(int))
    # calibrated quantization must agree closely line-for-line
    assert np.mean(diff <= 2) > 0.97, float(np.mean(diff <= 2))
