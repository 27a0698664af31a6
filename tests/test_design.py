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


@pytest.mark.parametrize("spec", [
    # (numtaps, bands, desired, fs) — all well-posed: taps matched to the
    # transition widths so both designers converge to the true equiripple optimum
    (43, [0, 100, 400, 500, 600, 700], [0, 1, 0.5], 2000),
    (65, [0, 0.15, 0.2, 0.5], [1, 0], 1.0),
    (128, [0, 0.18, 0.22, 0.5], [1, 0], 1.0),   # ref's even default ntaps=128
    (101, [0, 0.08, 0.12, 0.28, 0.32, 0.5], [0, 1, 0], 1.0),
    (73, [0, 0.1, 0.15, 0.35, 0.4, 0.5], [1, 0.5, 1], 1.0),
])
def test_remez_close_to_scipy(spec):
    """Native PM exchange vs scipy on well-posed specs (ref filters.py:279-314).

    Comparison is restricted to in-band frequencies: outside the specified
    bands the response is unconstrained don't-care where two equally-optimal
    equiripple solutions legitimately differ (e.g. above a last band that
    stops short of Nyquist)."""
    n, bands, desired, fs = spec
    h1 = design._remez_pm(n, bands, desired, fs=fs)
    h2 = ss.remez(n, bands, desired, fs=fs)
    nb = np.asarray(bands, dtype=np.float64) / fs
    for i in range(len(desired)):
        f = np.linspace(nb[2 * i], nb[2 * i + 1], 512)
        e = np.exp(-2j * np.pi * np.outer(f, np.arange(n)))
        assert np.max(np.abs(np.abs(e @ h1) - np.abs(e @ h2))) < 5e-3


def test_remez_degenerate_overparameterized_spec():
    """129 taps over bands occupying 15% of Nyquist: the equiripple delta is
    below fp64, every PM exchange diverges — scipy.signal.remez silently
    returns coefficients with max|H| ~ 1e32 here. Our remez must detect the
    divergence (both native and scipy are band-spec-validated) and return a
    usable regularized least-squares design instead."""
    spec = (129, [0, 100, 400, 500, 600, 700], [0, 1, 0.5])
    h = design.remez(*spec, fs=2000)
    assert np.all(np.isfinite(h))
    assert design._band_spec_ok(h, spec[1], spec[2], 2000)
    _, H = ss.freqz(h, worN=8192)
    assert np.max(np.abs(H)) < 1.1  # no transition-band blowup
    bands = np.asarray(spec[1]) / 2000
    for i, g in enumerate(spec[2]):
        f = np.linspace(bands[2 * i], bands[2 * i + 1], 256)
        resp = np.abs(np.exp(-2j * np.pi * np.outer(f, np.arange(129))) @ h)
        assert np.max(np.abs(resp - g)) < 5e-3


def test_lfiltic_matches_scipy(rng):
    b, a = ss.butter(4, 0.2)
    y, x = rng.standard_normal(3), rng.standard_normal(3)
    assert np.allclose(design.lfiltic(b, a, y, x), ss.lfiltic(b, a, y, x), atol=1e-12)
