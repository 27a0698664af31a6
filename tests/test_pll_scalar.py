"""Scalar-core BPSK symbol scan vs the lax.scan reference, interpret mode.

The two are the same arithmetic statements, but XLA fuses FMAs differently
across program contexts (the D12 class of docs/experiments.md), so phases
agree to ~2e-6 rad rather than bitwise; the Costas loop self-corrects, so
the drift stays bounded. Sample indices and minsync events must be EXACT
(timing and the AGC path are FMA-stable, and decisions carry margin)."""
import numpy as np
import jax.numpy as jnp

from directdemod_tpu import constants as K
from directdemod_tpu.ops.pll import (PskParams, initial_state,
                                     pack_symbol_outs, symbol_scan,
                                     unpack_symbol_outs)
from directdemod_tpu.ops.pll_scalar import bpsk_symbol_scan_packed

FS = 2048000


def _params():
    return PskParams(fs=FS, sym_rate=K.FUNCUBE_SYMRATE, qpsk=False,
                     agc_mean0=180.0, agc_gain_cap=20.0,
                     costas_bw=0.05235833333 * 6, minsync_thresh=120.0)


def _bpsk_stream(n, seed=0):
    """Filtered-baseband-like BPSK with the funcube sync planted."""
    rng = np.random.default_rng(seed)
    sync = np.asarray([int(c) for c in K.FUNCUBE_SYNC_BITS])
    n_bits = n // int(FS / 1200) + 40
    bits = rng.integers(0, 2, n_bits)
    bits[40:73] = sync
    t = np.arange(n)
    bit_idx = np.clip((t / (FS / 1200)).astype(np.int64), 0, n_bits - 1)
    bb = (bits[bit_idx] * 2 - 1) * 90.0
    x = bb * np.exp(1j * 2 * np.pi * 180.0 * t / FS)
    x = x + 2.0 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    return x.astype(np.complex64)


def test_scalar_scan_matches_lax_scan_bitwise():
    p = _params()
    sync12 = np.repeat(np.asarray([int(c) for c in K.FUNCUBE_SYNC_BITS]),
                       10).astype(np.float32)
    n = 300_000
    x = jnp.asarray(_bpsk_stream(n))

    state = initial_state(p, len(sync12))
    _, outs = symbol_scan(p, x, state, jnp.asarray(sync12),
                          jnp.asarray(sync12))
    ref = np.asarray(pack_symbol_outs(outs))
    rv, ra, rp, rc, rm, _ = unpack_symbol_outs(ref)

    got = np.asarray(bpsk_symbol_scan_packed(
        p, x, len(sync12), jnp.asarray(sync12), True))
    gv, ga, gp, gc, gm, _ = unpack_symbol_outs(got)

    assert rv.sum() == gv.sum() > 1000
    assert np.array_equal(ra[rv], ga[gv])          # sample indices exact
    assert np.max(np.abs(rp[rv] - gp[gv])) < 1e-5  # bounded FMA-context drift
    assert np.array_equal(rm[rv], gm[gv])          # minsync flags exact
    assert rm[rv].sum() >= 1                       # the planted sync fired
    assert np.all(gc[gv] == 0)


def test_scalar_scan_noise_only():
    p = _params()
    sync12 = np.repeat(np.asarray([int(c) for c in K.FUNCUBE_SYNC_BITS]),
                       10).astype(np.float32)
    rng = np.random.default_rng(9)
    n = 120_000
    x = jnp.asarray((rng.standard_normal(n) + 1j * rng.standard_normal(n))
                    .astype(np.complex64) * 30.0)
    state = initial_state(p, len(sync12))
    _, outs = symbol_scan(p, x, state, jnp.asarray(sync12),
                          jnp.asarray(sync12))
    rv, ra, rp, rc, rm, _ = unpack_symbol_outs(
        np.asarray(pack_symbol_outs(outs)))
    gv, ga, gp, gc, gm, _ = unpack_symbol_outs(np.asarray(
        bpsk_symbol_scan_packed(p, x, len(sync12), jnp.asarray(sync12),
                                True)))
    assert np.array_equal(ra[rv], ga[gv])
    assert np.max(np.abs(rp[rv] - gp[gv])) < 1e-5
    assert np.array_equal(rm[rv], gm[gv])
