"""Host-side filter design (pure NumPy, float64).

Tap design happens once at pipeline-build time on the host; the resulting
coefficients are baked as constants into the jitted TPU kernels. Everything here
is implemented from the textbook formulas in plain NumPy so the framework has no
hard SciPy dependency on the compute path; tests cross-check against SciPy.

Behavioral reference: `/root/reference/directdemod/filters.py:95-314` (window
taps, Butterworth design, Remez) and SciPy's `lfilter_zi` contract
(`filters.py:45` uses the steady-state-of-a-unit-step initial condition).
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "blackmanharris", "hamming", "gaussian", "rolling_average",
    "butter", "remez", "lfilter_zi", "lfiltic", "step_history_equivalent",
]


# --------------------------------------------------------------------------- windows

def _cosine_window(n: int, coeffs) -> np.ndarray:
    """Generalized symmetric cosine window: sum_k (-1)^k a_k cos(2 pi k t)."""
    if n == 1:
        return np.ones(1)
    t = np.arange(n, dtype=np.float64) / (n - 1)
    w = np.zeros(n, dtype=np.float64)
    for k, a in enumerate(coeffs):
        w += ((-1) ** k) * a * np.cos(2.0 * np.pi * k * t)
    return w


def blackmanharris(n: int) -> np.ndarray:
    """4-term Blackman-Harris window (matches scipy.signal.windows.blackmanharris)."""
    return _cosine_window(n, (0.35875, 0.48829, 0.14128, 0.01168))


def hamming(n: int) -> np.ndarray:
    """Hamming window (matches scipy.signal.windows.hamming, sym=True)."""
    return _cosine_window(n, (0.54, 0.46))


def gaussian(n: int, sigma: float) -> np.ndarray:
    """Gaussian window centered on (n-1)/2 (matches scipy.signal.windows.gaussian)."""
    k = np.arange(n, dtype=np.float64) - (n - 1) / 2.0
    return np.exp(-0.5 * (k / float(sigma)) ** 2)


def rolling_average(n: int) -> np.ndarray:
    """Boxcar taps 1/n (ref filters.py:114)."""
    return np.full(n, 1.0 / n, dtype=np.float64)


# --------------------------------------------------------------------------- Butterworth

def _butter_analog_poles(order: int) -> np.ndarray:
    """Poles of the normalized analog Butterworth prototype (cutoff 1 rad/s)."""
    k = np.arange(1, order + 1)
    theta = np.pi * (2 * k - 1) / (2 * order) + np.pi / 2
    return np.exp(1j * theta)


def _poly_from_roots(roots: np.ndarray) -> np.ndarray:
    p = np.array([1.0 + 0j])
    for r in roots:
        p = np.convolve(p, np.array([1.0, -r]))
    return p


def butter(order: int, wn, btype: str = "lowpass") -> tuple[np.ndarray, np.ndarray]:
    """Digital Butterworth (b, a) via bilinear transform of the analog prototype.

    `wn` is the cutoff normalized to Nyquist (scalar for lowpass/highpass, a pair
    for bandpass/bandstop), matching scipy.signal.butter's convention and the
    usage at ref filters.py:262-269.
    """
    zd, pd, kd = butter_zpk(order, wn, btype)
    b = np.real(_poly_from_roots(zd)) * kd
    a = np.real(_poly_from_roots(pd))
    return b, a


def butter_zpk(order: int, wn, btype: str = "lowpass"):
    """Digital Butterworth zeros/poles/gain (for well-conditioned SOS)."""
    fs = 2.0
    warped = 2.0 * fs * np.tan(np.pi * np.asarray(wn, dtype=np.float64) / fs)

    poles = _butter_analog_poles(order)
    zeros = np.array([], dtype=complex)
    gain = 1.0  # prototype gain: prod(-poles) = 1 for Butterworth

    if btype in ("lowpass", "low", "lp"):
        w0 = float(warped)
        zeros_t, poles_t = zeros, poles * w0
        gain_t = gain * w0 ** order
    elif btype in ("highpass", "high", "hp"):
        w0 = float(warped)
        zeros_t = np.zeros(order, dtype=complex)
        poles_t = w0 / poles
        # lp2hp gain: k * prod(-z)/prod(-p); Butterworth prototype has prod(-p)=1
        gain_t = gain / np.real(np.prod(-poles))
    elif btype in ("bandpass", "bp"):
        w1, w2 = float(warped[0]), float(warped[1])
        bw, w0 = w2 - w1, np.sqrt(w1 * w2)
        disc = np.sqrt((poles * bw / 2) ** 2 - w0 ** 2 + 0j)
        poles_t = np.concatenate([poles * bw / 2 + disc, poles * bw / 2 - disc])
        zeros_t = np.zeros(order, dtype=complex)
        gain_t = gain * bw ** order
    elif btype in ("bandstop", "bs"):
        w1, w2 = float(warped[0]), float(warped[1])
        bw, w0 = w2 - w1, np.sqrt(w1 * w2)
        inv = bw / 2 / poles
        disc = np.sqrt(inv ** 2 - w0 ** 2 + 0j)
        poles_t = np.concatenate([inv + disc, inv - disc])
        zeros_t = np.concatenate([1j * w0 * np.ones(order), -1j * w0 * np.ones(order)])
        gain_t = gain
    else:
        raise ValueError(f"unknown btype {btype!r}")

    # bilinear transform s -> 2*fs*(z-1)/(z+1)
    fs2 = 2.0 * fs
    zd = (fs2 + zeros_t) / (fs2 - zeros_t) if zeros_t.size else np.array([], dtype=complex)
    pd = (fs2 + poles_t) / (fs2 - poles_t)
    # zeros at infinity map to z = -1
    n_inf = len(pd) - len(zd)
    zd = np.concatenate([zd, -np.ones(n_inf, dtype=complex)])
    kd = gain_t * np.real(np.prod(fs2 - zeros_t) / np.prod(fs2 - poles_t))
    return zd, pd, kd


def butter_sos(order: int, wn, btype: str = "lowpass") -> np.ndarray:
    """Digital Butterworth as second-order sections, shape (ns, 6).

    Conjugate pole pairs are matched with zero pairs; the overall gain rides on
    the first section. Cascading these is numerically far better conditioned
    than the flat (b, a) polynomial -- powers of a high-order narrowband
    companion matrix overflow even in fp64, biquads never do.
    """
    z, p, k = butter_zpk(order, wn, btype)
    # sort poles: nearest the unit circle first (process hardest sections first)
    p = np.asarray(sorted(p, key=lambda x: -np.abs(x)))
    z = np.asarray(sorted(z, key=lambda x: -np.abs(x)))

    def take_pair(arr):
        """Pop a conjugate (or two real) root pair from arr."""
        if len(arr) == 0:
            return np.array([], dtype=complex), arr
        r = arr[0]
        rest = list(arr[1:])
        if abs(r.imag) > 1e-12:
            # find the conjugate
            j = int(np.argmin(np.abs(np.asarray(rest) - np.conj(r))))
            pair = np.array([r, rest.pop(j)])
        elif rest:
            # pair two reals
            reals = [i for i, q in enumerate(rest) if abs(q.imag) <= 1e-12]
            j = reals[0] if reals else 0
            pair = np.array([r, rest.pop(j)])
        else:
            pair = np.array([r])
        return pair, np.asarray(rest)

    sections = []
    pz, zz = p, z
    while len(pz):
        pp, pz = take_pair(pz)
        zp, zz = take_pair(zz)
        bs = np.real(_poly_from_roots(zp))
        as_ = np.real(_poly_from_roots(pp))
        bs = np.pad(bs, (0, 3 - len(bs)))
        as_ = np.pad(as_, (0, 3 - len(as_)))
        sections.append(np.concatenate([bs, as_]))
    sos = np.asarray(sections, dtype=np.float64)
    sos[0, :3] *= k
    return sos


# --------------------------------------------------------------------------- Remez

def remez(numtaps: int, bands, desired, fs: float = 1.0,
          weight=None, maxiter: int = 250) -> np.ndarray:
    """Multiband equiripple FIR design (type-I linear phase).

    Same calling convention as the subset of scipy.signal.remez used at ref
    filters.py:314 (`remez(ntaps, flat_band_edges_hz, gains, Hz=Fs)`).
    Tries our Parks-McClellan exchange; if it fails to converge (or produces a
    filter violating the band spec) falls back to SciPy's remez when available,
    then to a weighted least-squares multiband design.
    """
    try:
        h = _remez_pm(numtaps, bands, desired, fs=fs, weight=weight, maxiter=maxiter)
        if np.all(np.isfinite(h)) and _band_spec_ok(h, bands, desired, fs):
            return h
    except Exception:
        pass
    try:
        import scipy.signal as _ss
        return _ss.remez(numtaps, bands, desired, weight=weight, fs=fs)
    except Exception:
        return _firls_multiband(numtaps, bands, desired, fs=fs, weight=weight)


def _band_spec_ok(h, bands, desired, fs, tol: float = 0.15) -> bool:
    """Sanity check: response within `tol` of the target across each band."""
    bands = np.asarray(bands, dtype=np.float64) / fs
    desired = np.asarray(desired, dtype=np.float64)
    for i, gain in enumerate(desired):
        f = np.linspace(bands[2 * i], bands[2 * i + 1], 64)
        n = np.arange(len(h))
        resp = np.abs(np.exp(-2j * np.pi * np.outer(f, n)) @ h)
        if np.max(np.abs(resp - gain)) > tol * max(1.0, np.max(np.abs(desired))):
            return False
    return True


def _firls_multiband(numtaps: int, bands, desired, fs: float = 1.0,
                     weight=None) -> np.ndarray:
    """Weighted least-squares type-I multiband FIR (fallback when PM diverges)."""
    bands = np.asarray(bands, dtype=np.float64) / fs
    desired = np.asarray(desired, dtype=np.float64)
    nb = len(desired)
    weight = np.ones(nb) if weight is None else np.asarray(weight, dtype=np.float64)
    m = (numtaps - 1) // 2
    fgrid, dgrid, wgrid = [], [], []
    for i in range(nb):
        f = np.linspace(bands[2 * i], bands[2 * i + 1], max(16 * m // nb, 32))
        fgrid.append(f)
        dgrid.append(np.full(len(f), desired[i]))
        wgrid.append(np.full(len(f), weight[i]))
    f = np.concatenate(fgrid)
    dsp = np.concatenate(dgrid)
    w = np.sqrt(np.concatenate(wgrid))
    basis = np.cos(2 * np.pi * np.outer(f, np.arange(m + 1)))
    coef, *_ = np.linalg.lstsq(basis * w[:, None], dsp * w, rcond=None)
    h = np.zeros(numtaps)
    h[m] = coef[0]
    h[m + 1:] = coef[1:] / 2.0
    h[:m] = coef[1:][::-1] / 2.0
    return h


def _remez_pm(numtaps: int, bands, desired, fs: float = 1.0,
              weight=None, maxiter: int = 250) -> np.ndarray:
    """Parks-McClellan exchange on the cosine basis."""
    bands = np.asarray(bands, dtype=np.float64) / fs  # -> [0, 0.5]
    desired = np.asarray(desired, dtype=np.float64)
    nb = len(desired)
    if weight is None:
        weight = np.ones(nb)
    weight = np.asarray(weight, dtype=np.float64)

    if numtaps % 2 == 0:
        raise NotImplementedError("even numtaps (type-II) not supported; use odd")
    r = (numtaps - 1) // 2 + 1          # number of cosine basis functions
    next_ = r + 1                        # number of extremal frequencies

    # dense frequency grid restricted to the bands; each band gets points
    # proportional to its width with a healthy floor so extremals can breathe
    grid_density = 20
    total_width = sum(bands[2 * i + 1] - bands[2 * i] for i in range(nb))
    grid = []
    band_of = []
    for i in range(nb):
        f0, f1 = bands[2 * i], bands[2 * i + 1]
        npts = max(int(np.ceil((f1 - f0) / max(total_width, 1e-12)
                               * 2 * r * grid_density)), 4 * r // nb, 16)
        g = np.linspace(f0, f1, npts)
        grid.append(g)
        band_of.append(np.full(npts, i))
    grid = np.concatenate(grid)
    band_of = np.concatenate(band_of)
    des = desired[band_of]
    wt = weight[band_of]
    ng = len(grid)

    # initial extremal guess: spread per band proportional to its point count
    counts = np.bincount(band_of, minlength=nb)
    alloc = np.maximum(np.round(counts / ng * next_).astype(int), 2)
    while alloc.sum() > next_:
        alloc[np.argmax(alloc)] -= 1
    while alloc.sum() < next_:
        alloc[np.argmax(counts - alloc)] += 1
    ext_list = []
    base = 0
    for i in range(nb):
        ext_list.append(np.round(np.linspace(base, base + counts[i] - 1,
                                             alloc[i])).astype(int))
        base += counts[i]
    ext = np.unique(np.concatenate(ext_list))[:next_]
    if len(ext) < next_:
        extra = np.setdiff1d(np.arange(ng), ext)[: next_ - len(ext)]
        ext = np.sort(np.concatenate([ext, extra]))

    x_grid = np.cos(2 * np.pi * grid)

    def _interp_error(ext_idx):
        # Solve for delta and the barycentric interpolant on the extremal set.
        xe = x_grid[ext_idx]
        # barycentric weights, computed in log space (a common scale factor on d
        # cancels in every ratio below, so normalize by the mean log magnitude)
        logd = np.zeros(next_)
        sgn = np.ones(next_)
        for k in range(next_):
            diff = xe[k] - np.delete(xe, k)
            logd[k] = -np.sum(np.log(np.abs(diff)))
            sgn[k] = np.prod(np.sign(diff))
        d = sgn * np.exp(logd - np.mean(logd))
        sign = (-1.0) ** np.arange(next_)
        de = des[ext_idx]
        we = wt[ext_idx]
        delta = np.sum(d * de) / np.sum(d * sign / we)
        ce = de - sign * delta / we       # target values of the cosine poly at extremals
        # barycentric evaluation on full grid
        num = np.zeros(ng)
        den = np.zeros(ng)
        exact = np.full(ng, -1, dtype=int)
        for k in range(next_):
            dx = x_grid - xe[k]
            hit = np.abs(dx) < 1e-14
            exact[hit] = k
            dx[hit] = 1.0
            t = d[k] / dx
            num += t * ce[k]
            den += t
        a_eval = num / den
        a_eval[exact >= 0] = ce[exact[exact >= 0]]
        err = wt * (des - a_eval)
        return delta, err, ce, xe, d

    last_delta = None
    for _ in range(maxiter):
        delta, err, ce, xe, d = _interp_error(ext)
        # find new extremals: local maxima of |err| plus band edges
        cand = [0]
        s = np.sign(err)
        for i in range(1, ng - 1):
            if (np.abs(err[i]) >= np.abs(err[i - 1])) and (np.abs(err[i]) > np.abs(err[i + 1])):
                cand.append(i)
        cand.append(ng - 1)
        # also include exact band-edge indices (transitions in band_of)
        edges = np.flatnonzero(np.diff(band_of) != 0)
        cand.extend(edges.tolist())
        cand.extend((edges + 1).tolist())
        cand = np.unique(np.asarray(cand))
        # keep candidates sorted by frequency and prune to alternating set of size next_
        cand = cand[np.argsort(np.abs(err[cand]))[::-1]]
        cand = np.sort(cand[: 4 * next_])
        # enforce sign alternation, keeping the larger |err| of same-sign neighbors
        kept = []
        for i in cand:
            if not kept:
                kept.append(i)
            elif np.sign(err[i]) == np.sign(err[kept[-1]]):
                if np.abs(err[i]) > np.abs(err[kept[-1]]):
                    kept[-1] = i
            else:
                kept.append(i)
        while len(kept) > next_:
            # drop the smaller of the two outermost extremals
            if np.abs(err[kept[0]]) < np.abs(err[kept[-1]]):
                kept.pop(0)
            else:
                kept.pop()
        if len(kept) < next_:
            break  # degenerate; keep previous extremals
        new_ext = np.asarray(kept)
        if last_delta is not None and np.array_equal(new_ext, ext):
            break
        if last_delta is not None and abs(abs(delta) - abs(last_delta)) < 1e-13 * abs(delta):
            ext = new_ext
            break
        ext, last_delta = new_ext, delta

    # Final impulse response: A(f) is a degree-(r-1) cosine polynomial, so it is
    # determined exactly by its values at the numtaps DFT frequencies. Sample the
    # barycentric interpolant at k/numtaps and reconstruct via the type-I IDFT.
    delta, err, ce, xe, d = _interp_error(ext)
    m = (numtaps - 1) // 2
    fk = np.arange(m + 1) / float(numtaps)
    xk = np.cos(2 * np.pi * fk)
    num = np.zeros(len(xk))
    den = np.zeros(len(xk))
    exact = np.full(len(xk), -1, dtype=int)
    for k in range(len(xe)):
        dx = xk - xe[k]
        hit = np.abs(dx) < 1e-13
        exact[hit] = k
        dx[hit] = 1.0
        t = d[k] / dx
        num += t * ce[k]
        den += t
    avals = num / den
    avals[exact >= 0] = ce[exact[exact >= 0]]
    # h[M + n] = (1/N) * (A_0 + 2 sum_k A_k cos(2 pi k n / N)), n = -M..M
    n_idx = np.arange(numtaps) - m
    cosmat = np.cos(2 * np.pi * np.outer(n_idx, np.arange(1, m + 1)) / numtaps)
    h = (avals[0] + 2.0 * cosmat @ avals[1:]) / numtaps
    return h


# --------------------------------------------------------------------------- initial conditions

def lfilter_zi(b, a) -> np.ndarray:
    """Steady-state direct-form-II-transposed state for a unit-step input.

    Matches scipy.signal.lfilter_zi. The reference seeds every stateful filter
    with this (ref filters.py:45), i.e. the first chunk behaves as if all past
    inputs were 1.0 -- see `step_history_equivalent`.
    """
    b = np.atleast_1d(np.asarray(b, dtype=np.float64))
    a = np.atleast_1d(np.asarray(a, dtype=np.float64))
    while len(a) > 1 and a[0] == 0.0:
        a = a[1:]
    if a[0] != 1.0:
        b = b / a[0]
        a = a / a[0]
    n = max(len(a), len(b))
    a = np.pad(a, (0, n - len(a)))
    b = np.pad(b, (0, n - len(b)))
    # companion-form state update: zi = A @ zi + B with x = 1, y = steady output
    A = np.zeros((n - 1, n - 1))
    A[:, 0] = -a[1:]
    A[:-1, 1:] = np.eye(n - 2)
    B = b[1:] - a[1:] * b[0]
    zi = np.linalg.solve(np.eye(n - 1) - A, B)
    return zi


def lfiltic(b, a, y, x=None) -> np.ndarray:
    """Initial DF2T state from past outputs y and past inputs x (scipy-compatible)."""
    b = np.atleast_1d(np.asarray(b, dtype=np.float64))
    a = np.atleast_1d(np.asarray(a, dtype=np.float64))
    n = max(len(a), len(b))
    a = np.pad(a, (0, n - len(a)))
    b = np.pad(b, (0, n - len(b)))
    m = n - 1
    y = np.asarray(y)[:m]
    x = np.zeros(0) if x is None else np.asarray(x)[:m]
    zi = np.zeros(m, dtype=np.result_type(y.dtype, np.float64))
    for i in range(m):
        for k in range(i + 1, n):
            if k - i - 1 < len(x):
                zi[i] += b[k] * x[k - i - 1]
            if k - i - 1 < len(y):
                zi[i] -= a[k] * y[k - i - 1]
    return zi


def step_history_equivalent(ntaps: int) -> np.ndarray:
    """The FIR input-history vector equivalent to seeding with lfilter_zi.

    For a pure FIR (a=[1]) the lfilter_zi state equals cumulative tail sums of b,
    which is exactly the state produced by an all-ones past input. The stream
    runtime therefore initializes FIR history buffers to 1.0 (+0j) to reproduce
    ref filters.py:45's first-chunk transient bit-for-bit.
    """
    return np.ones(ntaps - 1, dtype=np.float64)
