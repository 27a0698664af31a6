"""BPSK carrier/timing recovery on the TPU scalar core.

`ops/pll.symbol_scan` advances AGC + Costas + Gardner one symbol at a time;
as a `lax.scan` each step costs ~11 us on v5e (two dynamic-slice gathers,
a rolling-buffer compare, tiny vector ops — all overhead for what is ~80
scalar operations of real work). This module runs the identical recurrence
as scalar SMEM arithmetic inside a Pallas `fori_loop` (the technique of
ops/peaks._pk_kernel, docs/experiments.md D3).

The exact factorization that makes this possible (BPSK only): the minsync
rolling-buffer compare reads the hard-decision stream but — for BPSK —
feeds NOTHING back into the recurrence (`last_min` gates only the QPSK
buffer pause, ref decode_funcube.py:277-294 vs decode_meteorm2.py:293-312).
So the kernel emits (a_idx, phase, decision-bit) per symbol and the minsync
distances become a vectorized binary correlation over the decision stream,
computed afterwards in XLA:

    sum_i |buf - sync| = sum(bits window) + sum(sync) - 2 * corr(bits, sync)

Exactness: every arithmetic statement mirrors symbol_scan's step in the
same operation order and f32 types; the quantized-tanh lookup rides as a
256-entry table built by the same `jnp.tanh` the scan uses, so
interpret-mode outputs are bit-identical (pinned in tests/test_pll_scalar).
On hardware the scalar core's cos/sin may differ from the VPU's by ulps —
the same accepted tolerance class as the segment-parallel mode's re-lock
transients, checked by sync-agreement tests.

Output layout: symbols emit into fixed per-chunk slots; invalid slots carry
valid=0, so the packed tensor drops into every existing consumer
(psk_sync._events_and_table, unpack_symbol_outs) without a compaction
scatter (D6: TPU scatters serialize).

STATUS — EXPERIMENTAL, NOT IN PRODUCTION (docs/experiments.md D15): on
real v5e the kernel measured 51 us/symbol — 4x SLOWER than the lax.scan —
because the scalar core executes ~one statement per 100-250 ns
(loop-overhead-bound; microbenched per-op: arith 136, sqrt 195, cos 248,
mod 193 ns/iter) and this body is ~80 dependent statements. The technique
wins only for tiny bodies like the 12-op peak walk (ops/peaks._pk_kernel,
37x). Hardware transcendentals also differ from the VPU's enough to move
symbol indices (minsync events still agreed in the A/B); interpret-mode
agreement vs symbol_scan stays pinned by tests/test_pll_scalar.py, and the
BPSK factorization documented here (minsync as a post-hoc binary
correlation) remains valid for any future lowering.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pll import PskParams, _alpha_beta
from . import fir

# samples per kernel chunk (SMEM-resident, two planes + next-chunk halo)
_CHUNK = 2048


def _slots(p: PskParams) -> int:
    return int(_CHUNK / p.symbol_period) + 3


def _scan_kernel(xr0_ref, xr1_ref, xi0_ref, xi1_ref, lut_ref, cst_ref,
                 n_ref, out_ref, stf, sti):
    """One chunk: process every symbol whose ANCHOR (previous A sample)
    lies in [t*C, (t+1)*C). B/A samples reach at most T+2 past the anchor,
    always inside the resident pair of chunks.

    cst layout: [T, alpha_unlocked, beta_unlocked, alpha_locked,
    beta_locked, agc_mean0, agc_gain_cap, half_T];
    stf: [timing, gb_r, gb_i, gc_r, gc_i, dc_r, dc_i, agc_mean, phase,
    freq, pll_mean]; sti: [anchor, locked]."""
    t = pl.program_id(0)
    c = xr0_ref.shape[2]
    slots = (out_ref.shape[2] - 1) // 4

    @pl.when(t == 0)
    def _():
        for k in range(11):
            stf[k] = 0.0
        stf[7] = cst_ref[5]          # agc_mean0
        stf[9] = 0.001               # freq
        stf[10] = 1.0                # pll_mean
        sti[0] = 0                   # anchor
        sti[1] = 0                   # locked

    out_ref[0, 0, 0] = 0.0
    n = n_ref[0]
    T = cst_ref[0]
    halfT = cst_ref[7]
    cap = cst_ref[6]
    lo_chunk = t * c
    hi_chunk = lo_chunk + c

    def rd(ref0, ref1, gi):
        li = gi - lo_chunk
        in0 = li < c
        a = jnp.where(in0, li, 0)
        b = jnp.where(in0, 0, li - c)
        return jnp.where(in0, ref0[0, 0, a], ref1[0, 0, b])

    def hyp(x):
        xi = jnp.floor(x + 128.0)
        xi = jnp.clip(xi, 0.0, 255.0)
        v = lut_ref[0, xi.astype(jnp.int32)]
        return jnp.where(x > 127.0, 1.0, jnp.where(x < -128.0, -1.0, v))

    def body(_, cnt):
        anchor = sti[0]
        timing = stf[0]
        m_b = jnp.ceil(halfT - timing).astype(jnp.int32)
        m_a = jnp.ceil(T - timing).astype(jnp.int32)
        idx_b = anchor + m_b
        idx_a = anchor + m_a
        run = (anchor < hi_chunk) & (idx_a < n) & (cnt < slots)

        @pl.when(run)
        def _():
            xbr = rd(xr0_ref, xr1_ref, idx_b)
            xbi = rd(xi0_ref, xi1_ref, idx_b)
            xar = rd(xr0_ref, xr1_ref, idx_a)
            xai = rd(xi0_ref, xi1_ref, idx_a)

            # ---- B event AGC (ref decode_funcube.py:22-35)
            dc_r = (stf[5] * (1024.0 * 1024.0 - 1.0) + xbr) \
                / (1024.0 * 1024.0)
            dc_i = (stf[6] * (1024.0 * 1024.0 - 1.0) + xbi) \
                / (1024.0 * 1024.0)
            vr = xbr - dc_r
            vi = xbi - dc_i
            # hypot == XLA's complex abs bit-for-bit (naive sqrt differs
            # in the last ulp and the recurrence amplifies it)
            mean1 = (stf[7] * (65536.0 - 1.0)
                     + jnp.hypot(vr, vi)) / 65536.0
            g = 180.0 / mean1
            g = jnp.where(g > cap, cap, g)
            gb_r = vr * g
            gb_i = vi * g

            # ---- A event AGC
            dc_r2 = (dc_r * (1024.0 * 1024.0 - 1.0) + xar) \
                / (1024.0 * 1024.0)
            dc_i2 = (dc_i * (1024.0 * 1024.0 - 1.0) + xai) \
                / (1024.0 * 1024.0)
            wr = xar - dc_r2
            wi = xai - dc_i2
            mean2 = (mean1 * (65536.0 - 1.0)
                     + jnp.hypot(wr, wi)) / 65536.0
            g2 = 180.0 / mean2
            g2 = jnp.where(g2 > cap, cap, g2)
            ga_r = wr * g2
            ga_i = wi * g2

            # ---- Gardner (ref decode_funcube.py:264-274)
            resync = (ga_i - stf[4]) * gb_i
            timing_a = (timing + m_a.astype(jnp.float32) - T
                        + resync * T / 2000000.0)

            # ---- Costas (ref decode_funcube.py:60-81)
            phase = stf[8]
            cr = jnp.cos(phase)
            sr = -jnp.sin(phase)
            corr_r = ga_r * cr - ga_i * sr
            corr_i = ga_r * sr + ga_i * cr
            err = corr_i * hyp(corr_r) / 255.0
            pm2 = (stf[10] * 39999.0 + jnp.abs(err)) / 40000.0
            err_c = jnp.clip(err, -1.0, 1.0)
            locked = sti[1] > 0
            alpha = jnp.where(locked, cst_ref[3], cst_ref[1])
            beta = jnp.where(locked, cst_ref[4], cst_ref[2])
            raw = phase + stf[9] + alpha * err_c
            two_pi = jnp.float32(2.0 * np.pi)
            phase2 = jnp.sign(raw) * jnp.mod(jnp.abs(raw), two_pi)
            freq2 = stf[9] + beta * err_c
            locked2 = jnp.where(~locked & (pm2 < 0.2), 1,
                                jnp.where(locked & (pm2 > 0.5), 0,
                                          sti[1]))

            # ---- emit: [a_hi, a_lo, phase_out, bit]
            base = 1 + 4 * cnt
            out_ref[0, 0, base] = (idx_a // 4096).astype(jnp.float32)
            out_ref[0, 0, base + 1] = (idx_a % 4096).astype(jnp.float32)
            out_ref[0, 0, base + 2] = phase
            out_ref[0, 0, base + 3] = jnp.where(corr_r <= 0.0, 0.0, 1.0)

            stf[0] = timing_a
            stf[1] = gb_r
            stf[2] = gb_i
            stf[3] = ga_r
            stf[4] = ga_i
            stf[5] = dc_r2
            stf[6] = dc_i2
            stf[7] = mean2
            stf[8] = phase2
            stf[9] = freq2
            stf[10] = pm2
            sti[0] = idx_a
            sti[1] = locked2

        return cnt + run.astype(jnp.int32)

    cnt = lax.fori_loop(0, slots, body, jnp.int32(0))
    out_ref[0, 0, 0] = cnt.astype(jnp.float32)


@partial(jax.jit, static_argnums=(0, 3))
def bpsk_scan_scalar(p: PskParams, xr, xi, interpret: bool = False):
    """Run the scalar-core scan over the whole filtered stream (f32 re/im
    planes); returns the (T_n, 1, 1+4*slots) f32 out blocks."""
    n = xr.shape[0]
    c = _CHUNK
    t_n = -(-n // c)
    slots = _slots(p)

    def prep(a):
        return jnp.pad(a, (0, (t_n + 1) * c - n)).reshape(t_n + 1, 1, c)

    xrp, xip = prep(xr), prep(xi)
    al_u, be_u = _alpha_beta(p, jnp.bool_(False))
    al_l, be_l = _alpha_beta(p, jnp.bool_(True))
    cst = jnp.stack([
        jnp.float32(p.symbol_period), al_u.astype(jnp.float32),
        be_u.astype(jnp.float32), al_l.astype(jnp.float32),
        be_l.astype(jnp.float32), jnp.float32(p.agc_mean0),
        jnp.float32(p.agc_gain_cap), jnp.float32(p.symbol_period / 2.0)])
    n_arr = jnp.asarray([n], jnp.int32)

    out = pl.pallas_call(
        _scan_kernel,
        grid=(t_n,),
        in_specs=[
            pl.BlockSpec((1, 1, c), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, c), lambda t: (t + 1, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, c), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, c), lambda t: (t + 1, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1 + 4 * slots), lambda t: (t, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((t_n, 1, 1 + 4 * slots), jnp.float32),
        scratch_shapes=[pltpu.SMEM((11,), jnp.float32),
                        pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(xrp, xrp, xip, xip,
      jnp.tanh(jnp.arange(-128.0, 128.0, dtype=jnp.float32))[None, :],
      cst, n_arr)
    return out


@partial(jax.jit, static_argnums=(0, 2, 4))
def bpsk_symbol_scan_packed(p: PskParams, x, sync_len: int, sync,
                            interpret: bool = False):
    """Whole-capture BPSK symbol scan -> the pack_symbol_outs tensor
    (slot-padded: invalid slots carry valid=0; symbol order is preserved,
    so psk_sync._events_and_table and unpack_symbol_outs consume it
    unchanged).

    Minsync is the vectorized binary correlation described in the module
    docstring, evaluated on the compacted decision stream and gathered back
    into the padded slots."""
    xr = jnp.real(x).astype(jnp.float32)
    xi = jnp.imag(x).astype(jnp.float32)
    out = bpsk_scan_scalar(p, xr, xi, interpret)
    t_n = int(out.shape[0])
    slots = _slots(p)
    blocks = out[:, 0, :]
    counts = blocks[:, 0].astype(jnp.int32)                  # (t_n,)
    rows = blocks[:, 1:].reshape(t_n, slots, 4)
    kk = jnp.arange(slots, dtype=jnp.int32)[None, :]
    valid = kk < counts[:, None]                             # (t_n, slots)
    # unwritten slots hold uninitialized SMEM garbage — zero them so the
    # packed fields stay parseable (valid=0 already masks them logically)
    rows = jnp.where(valid[..., None], rows, 0.0)

    # compacted symbol index of padded slot (c, s): cum[c] + s
    cum = jnp.cumsum(counts) - counts
    n_sym = jnp.sum(counts)

    # ---- minsync on the COMPACTED decision stream (order-preserving
    # gather: compact index m lives in chunk searchsorted(cum, m)).
    total = t_n * slots
    m = jnp.arange(total, dtype=jnp.int32)
    ch = jnp.clip(jnp.searchsorted(cum, m, side="right").astype(jnp.int32)
                  - 1, 0, t_n - 1)
    sl = jnp.clip(m - cum[ch], 0, slots - 1)
    bits = rows[ch, sl, 3]                                   # (total,)
    sy = jnp.asarray(sync, jnp.float32)
    ones = jnp.ones(sync_len, jnp.float32)
    bp = jnp.concatenate([jnp.zeros(sync_len - 1, jnp.float32), bits])
    wsum = fir.conv_valid(bp, ones)                          # (total,)
    corr = fir.conv_valid(bp, sy)
    dist = jnp.abs(jnp.abs(wsum + jnp.sum(sy) - 2.0 * corr)
                   - jnp.float32(sync_len / 2.0))
    k_idx = m
    full = (k_idx + 1) >= sync_len
    is_min_c = full & (dist > jnp.float32(p.minsync_thresh)) \
        & (m < n_sym)

    # gather minsync back into padded slots
    flat_idx = cum[:, None] + kk                             # (t_n, slots)
    is_min = is_min_c[jnp.clip(flat_idx, 0, total - 1)] & valid

    flags = (valid.astype(jnp.float32)
             + 2.0 * is_min.astype(jnp.float32))
    packed = jnp.stack([flags * 32768.0 + rows[..., 0],
                        rows[..., 1], rows[..., 2]], axis=-1)
    return packed.reshape(total, 3)
