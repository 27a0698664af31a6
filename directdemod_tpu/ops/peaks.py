"""Peak detection and grouping for sync search.

Behavioral references:
  * APT sync peak selection (ref decode_noaa.py:712-751): top-k based adaptive
    threshold, then min-distance grouping keeping the max of each group.
  * `peakdetect` lookahead max/min alternation (ref peakdetect.py:141-254,
    the vendored billauer algorithm; only this entry point is used in-tree,
    by decode_afsk1200.py:170).

Device does the dense work (correlation, thresholds, rolling-window maxima);
the inherently sequential grouping walks run on the host over the *sparse*
candidate lists, which are thousands of elements, not tens of millions.
"""
from __future__ import annotations

import logging

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..utils import hostio

log = logging.getLogger(__name__)

# Compacted-candidate cap: a healthy APT sync correlation yields ~2 candidates
# per second of capture, so 2^18 covers ~36 h; the cap binding means the
# adaptive threshold collapsed (e.g. pure noise) and candidates were DROPPED.
CANDIDATE_CAP = 1 << 18


def top_k_exact(x: jnp.ndarray, k: int, block: int = 4096) -> jnp.ndarray:
    """Exact top-k values of the last axis, two-stage.

    `lax.top_k` over a multi-million-element axis lowers to one enormous
    sort on TPU (~seconds at 1.8M); splitting into `block`-wide rows, taking
    per-row top-k (batched small sorts), and reducing the k*rows survivors
    is exact — the global top-k is a subset of the per-block top-k — and
    orders of magnitude faster. Falls back to plain top_k for short inputs."""
    n = x.shape[-1]
    if n <= 4 * block or k >= block:
        return lax.top_k(x, k)[0]
    nb = n // block
    head = x[..., : nb * block].reshape(x.shape[:-1] + (nb, block))
    cand = lax.top_k(head, k)[0].reshape(x.shape[:-1] + (nb * k,))
    tail = x[..., nb * block:]
    if tail.shape[-1]:
        cand = jnp.concatenate([cand, tail], axis=-1)
    return lax.top_k(cand, k)[0]


def adaptive_threshold(cor: jnp.ndarray, samp_rate: float,
                       wiggle: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The reference's peak-height floor (ref decode_noaa.py:713-723):
    mean of the top-k values, pulled down by `wiggle` times the top-to-bottom
    spread, with k = int(2 * duration_seconds) + 2. Returns (threshold, k)."""
    n = cor.shape[0]
    k = int(2 * (n / samp_rate)) + 2
    top = top_k_exact(cor, k)
    bot = -top_k_exact(-cor, k)
    avg_top = jnp.sum(top) / k
    avg_bot = jnp.sum(bot) / k
    return avg_top - wiggle * (avg_top - avg_bot), k


def candidates_above(cor: jnp.ndarray, threshold: jnp.ndarray,
                     cap: int = CANDIDATE_CAP) -> tuple[np.ndarray, np.ndarray]:
    """Host-side (index, value) pairs where cor > threshold, in index order.

    The mask reduction runs on device; indices come back compacted to at most
    `cap` entries (a 2-per-second sync signal leaves candidates sparse). When
    the cap binds — a noise capture whose adaptive threshold collapsed — the
    tail of the candidate list is dropped and a warning is logged."""
    n = cor.shape[0]
    cap = min(cap, n)
    mask = cor > threshold
    # count first (one scalar down), then compact to the next power of two
    # >= count: a healthy capture downloads ~64 candidates, not the full cap
    # buffer (2^18 entries, megabytes over the tunnel link)
    total = int(hostio.device_get(jnp.sum(mask.astype(jnp.int32))))
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0)
    if total > cap:
        log.warning(
            "sync candidate cap bound: %d above-threshold samples, "
            "keeping the first %d — threshold likely collapsed "
            "(noise-only capture?)", total, cap)
    size = min(cap, 1 << (min(total, cap) - 1).bit_length())
    idx = jnp.nonzero(mask, size=size, fill_value=-1)[0]
    # gather the values with the indices still on device: no int re-upload,
    # one f32 download (fill slots gather cor[-1], dropped by the mask below)
    vals_dev = cor[idx]
    idx_np = hostio.device_get(idx)      # int download: must ride the shim
    vals_np = hostio.device_get(vals_dev)
    keep = idx_np >= 0
    return idx_np[keep], vals_np[keep]


def group_peaks(indices: np.ndarray, values: np.ndarray,
                min_dist: float) -> np.ndarray:
    """Min-distance grouping keeping the maximum of each run
    (ref decode_noaa.py:731-746). Host walk over the sparse candidate list."""
    best_idx = None
    best_val = None
    out = []
    for i, v in zip(indices, values):
        if best_idx is not None and (i - best_idx) >= min_dist:
            out.append(best_idx)
            best_idx, best_val = None, None
        if best_val is None or best_val < v:
            best_idx, best_val = i, v
    out.append(best_idx)
    return np.sort(np.asarray([o for o in out if o is not None]))


def find_sync_peaks(cor: jnp.ndarray, samp_rate: float, needle_len: int,
                    wiggle: float, min_dist_s: float) -> np.ndarray:
    """Full APT peak pipeline; returns sync *start* indices
    (peak centers shifted back by needle_len//2, ref decode_noaa.py:749)."""
    thr, _ = adaptive_threshold(cor, samp_rate, wiggle)
    idx, vals = candidates_above(cor, thr)
    if len(idx) == 0:
        return np.empty(0, dtype=np.int64)
    peaks = group_peaks(idx, vals, min_dist_s * samp_rate)
    return np.sort(peaks - needle_len // 2)


def host_find_sync_peaks(cor: np.ndarray, samp_rate: float, needle_len: int,
                         wiggle: float, min_dist_s: float) -> np.ndarray:
    """find_sync_peaks computed entirely on the HOST for an already-downloaded
    correlation row (the accurate-sync walk iterates many short windows; an
    eager device call per row costs an RPC round trip over the tunnel).
    Identical semantics: exact top-k adaptive threshold, candidates in index
    order, min-distance grouping."""
    cor = np.asarray(cor)
    n = len(cor)
    k = int(2 * (n / samp_rate)) + 2
    if k >= n:
        top = np.sort(cor)[::-1][:k]
        bot = np.sort(cor)[:k]
    else:
        top = np.partition(cor, n - k)[n - k:]
        bot = np.partition(cor, k - 1)[:k]
    avg_top = float(np.sum(top) / k)
    avg_bot = float(np.sum(bot) / k)
    thr = avg_top - wiggle * (avg_top - avg_bot)
    idx = np.flatnonzero(cor > thr)
    if len(idx) == 0:
        return np.empty(0, dtype=np.int64)
    grouped = group_peaks(idx, cor[idx], min_dist_s * samp_rate)
    return np.sort(grouped - needle_len // 2)


# --------------------------------------------------------------------- lookahead peaks

@jax.jit
def _lookahead_scan(y, fwd_max, fwd_min, delta):
    """Exact device replay of the alternating max/min walk
    (ref peakdetect.py:196-241). Emits per-index fire events."""
    idx = jnp.arange(y.shape[0], dtype=jnp.int32)

    def body(carry, inp):
        mx, mn, mxpos, mnpos = carry
        yi, fmax, fmin, i = inp
        upd_mx = yi > mx
        mx = jnp.where(upd_mx, yi, mx)
        mxpos = jnp.where(upd_mx, i, mxpos)
        upd_mn = yi < mn
        mn = jnp.where(upd_mn, yi, mn)
        mnpos = jnp.where(upd_mn, i, mnpos)

        fire_max = (yi < mx - delta) & jnp.isfinite(mx) & (fmax < mx)
        # on a max fire the reference `continue`s past the min branch
        fire_min = (~fire_max) & (yi > mn + delta) & jnp.isfinite(mn) & (fmin > mn)

        out = (fire_max, mxpos, mx, fire_min, mnpos, mn)
        mx2 = jnp.where(fire_max, jnp.inf, jnp.where(fire_min, -jnp.inf, mx))
        mn2 = jnp.where(fire_max, jnp.inf, jnp.where(fire_min, -jnp.inf, mn))
        return (mx2, mn2, mxpos, mnpos), out

    init = (jnp.float32(-jnp.inf).astype(y.dtype),
            jnp.float32(jnp.inf).astype(y.dtype),
            jnp.int32(0), jnp.int32(0))
    _, outs = lax.scan(body, init, (y, fwd_max, fwd_min, idx))
    return outs


def _forward_window_extrema(y: jnp.ndarray, w: int):
    """fwd_max[i] = max(y[i:i+w]), fwd_min[i] = min(y[i:i+w]) for the valid
    range i < len(y)-w+1 (the walk never consults beyond it)."""
    mx = lax.reduce_window(y, -jnp.inf, lax.max, (w,), (1,), "VALID")
    mn = lax.reduce_window(y, jnp.inf, lax.min, (w,), (1,), "VALID")
    return mx, mn


def lookahead_peaks(y, lookahead: int, delta: float = 0.0
                    ) -> tuple[list, list]:
    """Alternating max/min peak picking with lookahead confirmation, matching
    `peakdetect` (ref peakdetect.py:141-254; the only variant used in-tree,
    by decode_afsk1200.py:170). Returns (max_peaks, min_peaks) as
    [index, value] pairs.

    The walk runs as a `lax.scan` with precomputed rolling-window extrema;
    fire events compact on the host, including the first-hit pop and the
    end-of-signal break semantics.
    """
    y = jnp.asarray(y)
    n = y.shape[0]
    if lookahead < 1:
        raise ValueError("lookahead must be >= 1")
    if n <= lookahead:
        return [], []
    fwd_max, fwd_min = _forward_window_extrema(y, lookahead)
    limit = n - lookahead          # reference iterates y[:-lookahead]
    outs = _lookahead_scan(y[:limit], fwd_max[:limit], fwd_min[:limit],
                           jnp.asarray(delta, dtype=y.dtype))
    f_max, mxpos, mxval, f_min, mnpos, mnval = (
        hostio.device_get(o) for o in outs)   # bool/int outs ride the shim

    events = []
    for i in np.flatnonzero(f_max | f_min):
        if f_max[i]:
            events.append((i, True, int(mxpos[i]), float(mxval[i])))
        else:
            events.append((i, False, int(mnpos[i]), float(mnval[i])))
        if i + lookahead >= n:      # reference breaks after this append
            break

    max_peaks = [[p, v] for (_, is_max, p, v) in events if is_max]
    min_peaks = [[p, v] for (_, is_max, p, v) in events if not is_max]
    if events:
        if events[0][1]:
            max_peaks.pop(0)
        else:
            min_peaks.pop(0)
    return max_peaks, min_peaks
