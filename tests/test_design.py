"""Filter design vs SciPy golden values (the reference's designers:
ref filters.py:95-314)."""
import numpy as np
import pytest
import scipy.signal as ss

from directdemod_tpu.ops import design


@pytest.mark.parametrize("n", [7, 151, 492])
def test_windows_match_scipy(n):
    assert np.allclose(design.blackmanharris(n), ss.windows.blackmanharris(n), atol=1e-12)
    assert np.allclose(design.hamming(n), ss.windows.hamming(n), atol=1e-12)


def test_gaussian_window():
    assert np.allclose(design.gaussian(33, 4.5), ss.windows.gaussian(33, 4.5), atol=1e-12)


def test_rolling_average():
    assert np.allclose(design.rolling_average(3), [1 / 3] * 3)


@pytest.mark.parametrize("args", [
    (6, 60000 / (0.5 * 2048000), "lowpass"),
    (6, 0.3, "highpass"),
    (6, [400 / (0.5 * 60235), 4400 / (0.5 * 60235)], "bandpass"),
    (6, [0.1, 0.4], "bandstop"),
])
def test_butter_matches_scipy(args):
    b1, a1 = design.butter(*args)
    b2, a2 = ss.butter(*args)
    assert np.allclose(b1, b2, rtol=1e-8, atol=1e-14)
    assert np.allclose(a1, a2, rtol=1e-8, atol=1e-14)


def test_butter_sos_response_matches_scipy_sos():
    """Compare against scipy's own SOS design (the flat-polynomial form is too
    ill-conditioned at narrow wn to serve as the golden value)."""
    for args in [(6, 0.006836, "lowpass"),
                 (6, [400 / (0.5 * 60235), 4400 / (0.5 * 60235)], "bandpass")]:
        sos = design.butter_sos(*args)
        sos_ref = ss.butter(*args, output="sos")
        w, h1 = ss.sosfreqz(sos, worN=2048)
        _, h2 = ss.sosfreqz(sos_ref, worN=2048)
        assert np.max(np.abs(h1 - h2)) < 1e-9


def test_lfilter_zi_matches_scipy():
    cases = [(ss.windows.blackmanharris(11), [1.0]),
             ss.butter(6, 0.1),
             ss.butter(6, [0.1, 0.3], "bandpass")]
    for b, a in cases:
        assert np.allclose(design.lfilter_zi(b, a), ss.lfilter_zi(b, a), rtol=1e-7)


def test_step_history_equivalence(rng):
    """The reference seeds filters with raw lfilter_zi (ref filters.py:45);
    for a FIR that equals an all-ones input history."""
    b = ss.windows.blackmanharris(151)
    x = rng.standard_normal(1000)
    y1, _ = ss.lfilter(b, [1.0], x, zi=ss.lfilter_zi(b, [1.0]))
    y2 = np.convolve(np.concatenate([np.ones(150), x]), b)[150:150 + 1000]
    assert np.allclose(y1, y2, atol=1e-10)


def test_remez_close_to_scipy():
    h1 = design.remez(129, [0, 100, 400, 500, 600, 700], [0, 1, 0.5], fs=2000)
    h2 = ss.remez(129, [0, 100, 400, 500, 600, 700], [0, 1, 0.5], fs=2000)
    _, H1 = ss.freqz(h1, worN=4096)
    _, H2 = ss.freqz(h2, worN=4096)
    assert np.max(np.abs(np.abs(H1) - np.abs(H2))) < 5e-3


def test_lfiltic_matches_scipy(rng):
    b, a = ss.butter(4, 0.2)
    y, x = rng.standard_normal(3), rng.standard_normal(3)
    assert np.allclose(design.lfiltic(b, a, y, x), ss.lfiltic(b, a, y, x), atol=1e-12)
