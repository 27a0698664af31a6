"""Scalar-core Pallas lookahead walk vs the dense lax.scan walk, in
interpreter mode (compiled-mode A/B runs on hardware via
examples/bench_afsk.py; exactness there was additionally pinned on a
31k-event stress input, BENCH_AFSK_r05.json notes)."""
import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from directdemod_tpu.ops import peaks


def _stress_y(n, seed=0):
    rng = np.random.default_rng(seed)
    bf = np.sign(np.sin(np.arange(n) / 9.0) + 0.3 * rng.standard_normal(n))
    k = np.concatenate([-np.ones(9), np.ones(9)])
    return np.abs(np.convolve(bf, k, "same") / 18).astype(np.float32)


def test_pallas_walk_matches_dense_scan():
    n, lookahead, cap = 6144, 11, 4096
    y = jnp.asarray(_stress_y(n))
    with pltpu.force_tpu_interpret_mode():
        flat = np.asarray(peaks._lookahead_events_pallas(
            y, lookahead, 0.0, cap))
    got = peaks.unpack_lookahead_events(flat, lookahead, n, cap)
    want = peaks._lookahead_peaks_dense(y, lookahead, 0.0)
    assert got is not None
    assert got[0] == want[0]
    assert got[1] == want[1]
    assert len(got[0]) > 50          # the stress input actually fires


def test_pallas_walk_overflow_reports():
    n, lookahead, cap = 6144, 11, 8    # tiny cap: must flag, not truncate
    y = jnp.asarray(_stress_y(n, seed=1))
    with pltpu.force_tpu_interpret_mode():
        flat = np.asarray(peaks._lookahead_events_pallas(
            y, lookahead, 0.0, cap))
    assert peaks.unpack_lookahead_events(flat, lookahead, n, cap) is None
