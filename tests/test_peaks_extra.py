"""Peak-detection variants (ops/peaks_extra) vs the reference module and
ground truth.

The reference's `peakdetect_zero_crossing` / `zero_crossings` / `_smooth` /
`peakdetect_spline` / `peakdetect_fft` / `peakdetect_parabola` run under
Python 3 (with numpy/scipy compat shims) and serve as direct oracles; the
sine variants crash upstream on py3 (`zip(...)[0]`, ref peakdetect.py:453),
so they are checked against analytic ground truth instead.
"""
import os
import sys

import numpy as np
import pytest

from directdemod_tpu.ops import peaks_extra as px

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_peakdetect():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    import scipy
    if not hasattr(scipy, "fft") or not callable(getattr(scipy, "ifft", None)):
        scipy.ifft = scipy.fft.ifft
    if not hasattr(np, "Inf"):
        np.Inf = np.inf
    sys.path.insert(0, REF)
    try:
        import matplotlib
        matplotlib.use("Agg")          # the module imports pylab at top level
        from directdemod import peakdetect as ref
    except Exception as e:
        pytest.skip(f"reference peakdetect import failed: {e}")
    finally:
        sys.path.remove(REF)
    ref.fft = scipy.fft.fft            # `from scipy import fft, ifft` binds the
    ref.ifft = scipy.fft.ifft          # module object under modern scipy
    return ref


def _sine(n=2000, periods=8.0, offset=0.0, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0.0, 1.0, n, endpoint=False)
    y = np.sin(2 * np.pi * periods * x) + offset + noise * rng.standard_normal(n)
    return x, y


def test_smooth_matches_reference(ref_peakdetect):
    _, y = _sine(300, 3.0, noise=0.05)
    for win in ("flat", "hanning", "hamming", "bartlett", "blackman"):
        ours = px.smooth(y, 11, win)
        theirs = ref_peakdetect._smooth(y, 11, win)
        np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_zero_crossings_matches_reference(ref_peakdetect):
    _, y = _sine(2000, 8.0, noise=0.02)
    np.testing.assert_array_equal(px.zero_crossings(y),
                                  ref_peakdetect.zero_crossings(y))


def test_zero_crossings_offset_correction(ref_peakdetect):
    # a large DC offset triggers the offset-corrected recursion branch
    _, y = _sine(2000, 8.0, offset=0.9)
    np.testing.assert_array_equal(px.zero_crossings(y),
                                  ref_peakdetect.zero_crossings(y))


def test_peaks_zero_crossing_matches_reference(ref_peakdetect):
    x, y = _sine(2000, 8.0, noise=0.02)
    ours = px.peaks_zero_crossing(y, x)
    theirs = ref_peakdetect.peakdetect_zero_crossing(y, x)
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o, dtype=float),
                                   np.asarray(t, dtype=float), atol=1e-12)


def test_peaks_fft_matches_reference(ref_peakdetect):
    # peakdetect_fft is py3-broken upstream AFTER computing its peaks (float &
    # int at ref peakdetect.py:335), so the oracle is the same math built from
    # the reference's own pieces (zero_crossings + mid-spectrum pad +
    # peakdetect, ref peakdetect.py:300-330)
    x, y = _sine(1200, 5.0)
    with pytest.raises(TypeError):
        ref_peakdetect.peakdetect_fft(y, x)

    zc = ref_peakdetect.zero_crossings(y, window_len=11)
    last = -1 - (1 - len(zc) & 1)
    seg = list(np.fft.fft(y[zc[0]:zc[last]]))
    n = int(np.log(len(seg) * 20) / np.log(2)) + 1
    padded = seg[:len(seg) // 2] + [0] * (2 ** n - len(seg)) + seg[len(seg) // 2:]
    sf = len(padded) / float(len(seg))
    yi = np.fft.ifft(padded).real * sf
    xi = np.linspace(x[zc[0]], x[zc[last]], len(yi))
    theirs = ref_peakdetect.peakdetect(yi, xi, 500,
                                       delta=abs(np.diff(y).max() * 2))

    ours = px.peaks_fft(y, x)
    for o, t in zip(ours, theirs):
        o, t = np.asarray(o, dtype=float), np.asarray(t, dtype=float)
        assert o.shape == t.shape
        # positions agree to the interpolated grid; values to fp noise
        np.testing.assert_allclose(o[:, 0], t[:, 0], atol=1e-3)
        np.testing.assert_allclose(o[:, 1], t[:, 1], atol=1e-6)


def test_peaks_parabola_matches_reference(ref_peakdetect):
    x, y = _sine(2000, 8.0)
    ours = px.peaks_parabola(y, x)
    theirs = [list(m) for m in ref_peakdetect.peakdetect_parabola(y, x)]
    for o, t in zip(ours, theirs):
        o, t = np.asarray(o, dtype=float), np.asarray(t, dtype=float)
        assert o.shape == t.shape
        np.testing.assert_allclose(o, t, atol=1e-6)


def test_peaks_spline_matches_reference(ref_peakdetect):
    x, y = _sine(1000, 4.0)
    ours = px.peaks_spline(y, x)
    theirs = ref_peakdetect.peakdetect_spline(y, x)
    for o, t in zip(ours, theirs):
        o, t = np.asarray(o, dtype=float), np.asarray(t, dtype=float)
        assert o.shape == t.shape
        np.testing.assert_allclose(o, t, atol=1e-8)


def test_cspline_coeffs_match_scipy():
    from scipy.signal import cspline1d
    rng = np.random.default_rng(1)
    y = rng.standard_normal(257)
    import jax.numpy as jnp
    ours = np.asarray(px._cspline_coeffs(jnp.asarray(y)))
    np.testing.assert_allclose(ours, cspline1d(y), atol=1e-9)


@pytest.mark.parametrize("locked", [False, True])
def test_peaks_sine_ground_truth(locked):
    # reference's sine variants are py3-broken; validate against the analytic
    # peak positions/amplitude of a clean offset sine instead
    periods, offset = 6.0, 0.35
    x, y = _sine(3000, periods, offset=offset)
    fn = px.peaks_sine_locked if locked else px.peaks_sine
    max_p, min_p = (fn(y, x, 31) if locked else fn(y, x, 31, False))

    true_max = (np.arange(periods) + 0.25) / periods
    true_min = (np.arange(periods) + 0.75) / periods
    got_max = np.sort([p[0] for p in max_p])
    got_min = np.sort([p[0] for p in min_p])
    # interior peaks (the zero-crossing binning drops edge peaks)
    for t in true_max[1:-1]:
        assert np.min(np.abs(got_max - t)) < 2e-3
    for t in true_min[1:-1]:
        assert np.min(np.abs(got_min - t)) < 2e-3
    np.testing.assert_allclose([p[1] for p in max_p], 1.0 + offset, atol=5e-3)
    np.testing.assert_allclose([p[1] for p in min_p], -1.0 + offset, atol=5e-3)


def test_sine_upstream_is_py3_broken(ref_peakdetect):
    # documents why the sine variants have no direct oracle
    x, y = _sine(2000, 8.0)
    with pytest.raises(TypeError):
        ref_peakdetect.peakdetect_sine(y, x)
