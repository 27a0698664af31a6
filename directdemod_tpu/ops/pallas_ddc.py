"""Pallas TPU kernel: fused DDC + FM discriminator.

Computes, in one pass over VMEM tiles,

    c[m]     = sum_i w[i] x[J*m + i]           (reversed modulated taps)
    audio[m] = angle(c[m] * conj(c[m-1]) * rot)

i.e. the whole `offsetFreq -> FIR -> bwLim -> fm` chain of the reference (see
models/frontend.py for the algebra). The input is pre-swizzled into polyphase
lanes `lanes[r, a] = x[a*J + r]` (one XLA reshape), so tile `t` needs lane
columns [t*TILE, t*TILE + TILE + Q] -- an *overlapping* window, expressed as
two aligned TILE-wide blocks (t and t+1) stitched in VMEM. Q small matmuls per
component run on the MXU; c[m-1] carries across tiles in an output block that
revisits the same VMEM buffer every grid step (the TPU grid is sequential).

The XLA lowering of the same chain (ops/fir._rconv_polyphase) is already
HBM-bandwidth-bound, so this kernel is a parity backend + fusion playground,
not a speedup claim; tests pin it to the stream numerics in interpreter mode.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE = 512          # outputs per grid step


def _kernel(lr0_ref, lr1_ref, li0_ref, li1_ref, wr_ref, wi_ref, rot_ref,
            cprev_ref, outr_ref, outi_ref, carry_ref):
    """One tile. lr0/lr1 (J, TILE): current + next lane blocks (halo);
    wr/wi (Q, J) polyphase taps; rot/cprev (1, 2); outr/outi (1, TILE) the
    re/im of d = c[m] conj(c[m-1]) rot (Mosaic has no atan2 primitive, so
    the final angle runs in XLA on the decimated output);
    carry (1, 2) revisited across the sequential grid."""
    t = pl.program_id(0)
    q = wr_ref.shape[0]

    @pl.when(t == 0)
    def _():
        # full-slice copy: Mosaic rejects scalar stores to VMEM
        carry_ref[:, :] = cprev_ref[:, :]

    lr = jnp.concatenate([lr0_ref[:, :], lr1_ref[:, :]], axis=1)
    li = jnp.concatenate([li0_ref[:, :], li1_ref[:, :]], axis=1)

    cr = jnp.zeros((1, TILE), dtype=jnp.float32)
    ci = jnp.zeros((1, TILE), dtype=jnp.float32)
    for qq in range(q):
        sr = lr[:, qq:qq + TILE]
        si = li[:, qq:qq + TILE]
        wr = wr_ref[qq:qq + 1, :]
        wi = wi_ref[qq:qq + 1, :]
        # HIGHEST: the MXU's default bf16 passes lose ~8 mantissa bits,
        # measured 0.137 rad audio error vs fp64 on hardware; f32-accurate
        # (6-pass) matmul restores parity and the kernel stays HBM-bound
        dot = partial(jnp.dot, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        cr = cr + dot(wr, sr) - dot(wi, si)
        ci = ci + dot(wr, si) + dot(wi, sr)

    prev_r = jnp.concatenate([carry_ref[0:1, 0:1], cr[:, :TILE - 1]], axis=1)
    prev_i = jnp.concatenate([carry_ref[0:1, 1:2], ci[:, :TILE - 1]], axis=1)

    # d = c[m] * conj(c[m-1]) * rot ; the angle runs outside the kernel
    pr = cr * prev_r + ci * prev_i
    pi = ci * prev_r - cr * prev_i
    rr = rot_ref[0:1, 0:1]
    ri = rot_ref[0:1, 1:2]
    outr_ref[:, :] = pr * rr - pi * ri
    outi_ref[:, :] = pr * ri + pi * rr

    carry_ref[:, :] = jnp.concatenate(
        [cr[0:1, TILE - 1:TILE], ci[0:1, TILE - 1:TILE]], axis=1)


@partial(jax.jit, static_argnums=(4, 5, 6))
def ddc_fm_pallas(x, taps_rev, rot, c_prev, stride: int, out_len: int,
                  interpret: bool = False):
    """Fused DDC+FM via the Pallas kernel.

    x: complex (n,) input segment positioned so output m covers
    x[m*J .. m*J + K - 1]; `taps_rev` are the reversed modulated taps
    (conv layout, complex); `c_prev` the previous kept conv output (complex
    scalar array shape (1,)); returns (audio (out_len,) f32, c_last (1,) c64).
    """
    j = stride
    k = taps_rev.shape[0]
    q = -(-k // j)
    n_tiles = -(-out_len // TILE)

    rows = (n_tiles + 1) * TILE
    need = rows * j
    xp = jnp.pad(x, (0, max(0, need - x.shape[0])))[:need]
    lanes = xp.reshape(rows, j).T
    lr = jnp.real(lanes).astype(jnp.float32)
    li = jnp.imag(lanes).astype(jnp.float32)

    wpad = jnp.pad(taps_rev, (0, q * j - k))
    w2 = wpad.reshape(q, j)
    wr = jnp.real(w2).astype(jnp.float32)
    wi = jnp.imag(w2).astype(jnp.float32)
    rot2 = jnp.stack([jnp.real(rot), jnp.imag(rot)]).reshape(1, 2) \
        .astype(jnp.float32)
    cp2 = jnp.stack([jnp.real(c_prev[0]), jnp.imag(c_prev[0])]).reshape(1, 2) \
        .astype(jnp.float32)

    out = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((lanes.shape[0], TILE), lambda t: (0, t)),
            pl.BlockSpec((lanes.shape[0], TILE), lambda t: (0, t + 1)),
            pl.BlockSpec((lanes.shape[0], TILE), lambda t: (0, t)),
            pl.BlockSpec((lanes.shape[0], TILE), lambda t: (0, t + 1)),
            pl.BlockSpec((q, j), lambda t: (0, 0)),
            pl.BlockSpec((q, j), lambda t: (0, 0)),
            pl.BlockSpec((1, 2), lambda t: (0, 0)),
            pl.BlockSpec((1, 2), lambda t: (0, 0)),
        ],
        out_specs=(
            # single-row layout: Mosaic requires the 2nd-to-last block dim to
            # divide by 8 OR equal the array dim — (1, TILE) over a
            # (1, n_tiles*TILE) array satisfies the "equal" arm, whereas the
            # earlier (n_tiles, TILE) array did not lower on real hardware
            pl.BlockSpec((1, TILE), lambda t: (0, t)),
            pl.BlockSpec((1, TILE), lambda t: (0, t)),
            pl.BlockSpec((1, 2), lambda t: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_tiles * TILE), jnp.float32),
            jax.ShapeDtypeStruct((1, n_tiles * TILE), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ),
        interpret=interpret,
    )(lr, lr, li, li, wr, wi, rot2, cp2)
    out_r, out_i, carry = out
    audio = jnp.arctan2(out_i.reshape(-1)[:out_len],
                        out_r.reshape(-1)[:out_len])
    c_last = (carry[0, 0] + 1j * carry[0, 1]).reshape(1).astype(x.dtype)
    return audio, c_last


# ----------------------------------------------------------- raw-uint8 variant

def _kernel_u8(b0_ref, b1_ref, u_ref, off_ref, rot_ref, cprev_ref,
               outr_ref, outi_ref, carry_ref):
    """Fused unpack + DDC + FM from RAW interleaved uint8 bytes.

    b0/b1: (TILE, 2J) byte blocks t and t+1 (halo rows); u: (q, 2J, 2)
    interleaved taps; off/rot/cprev: (1, 2); out: (TILE, 1);
    carry: (1, 2) revisited across the sequential grid.

    Output row m of tile t is c[M] = sum_n w[n] (x[M*J+n] - 127.5(1+1j))
    with M = t*TILE + m. On the interleaved byte rows this is

        c = sum_qq  B[qq + m, :] @ U[qq] - 127.5 * sum(U)

    where U[qq, 2k+0, :] = (Re w, Im w)[qq*J*... ] and U[qq, 2k+1, :] =
    (-Im w, Re w)... -- built host-side in ddc_fm_pallas_u8. The byte->f32
    convert happens in VMEM (VPU), so HBM traffic is 2 bytes/sample instead
    of the 8 of a complex64 read (plus the lane-transpose copies of the
    complex kernel): the chain becomes ingest-roofline-bound.
    """
    t = pl.program_id(0)
    q = u_ref.shape[0]

    @pl.when(t == 0)
    def _():
        # full-slice copy: Mosaic rejects scalar stores to VMEM
        carry_ref[:, :] = cprev_ref[:, :]

    # Mosaic can't cast u8 -> f32 directly; hop through int32
    b = jnp.concatenate([b0_ref[:, :], b1_ref[:, :]], axis=0) \
        .astype(jnp.int32).astype(jnp.float32)     # (2*TILE, 2J)

    c = jnp.zeros((TILE, 2), dtype=jnp.float32)
    for qq in range(q):
        # HIGHEST precision: see _kernel (bf16 default loses the byte LSBs)
        c = c + jnp.dot(b[qq:qq + TILE, :], u_ref[qq],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    cr = c[:, 0:1] - off_ref[0:1, 0:1]              # (TILE, 1)
    ci = c[:, 1:2] - off_ref[0:1, 1:2]

    prev_r = jnp.concatenate([carry_ref[0:1, 0:1], cr[:TILE - 1, :]], axis=0)
    prev_i = jnp.concatenate([carry_ref[0:1, 1:2], ci[:TILE - 1, :]], axis=0)

    pr = cr * prev_r + ci * prev_i
    pi = ci * prev_r - cr * prev_i
    rr = rot_ref[0:1, 0:1]
    ri = rot_ref[0:1, 1:2]
    outr_ref[:, :] = pr * rr - pi * ri        # angle runs in XLA outside
    outi_ref[:, :] = pr * ri + pi * rr

    carry_ref[:, :] = jnp.concatenate(
        [cr[TILE - 1:TILE, :], ci[TILE - 1:TILE, :]], axis=1)


@partial(jax.jit, static_argnums=(4, 5, 6))
def ddc_fm_pallas_u8(raw, taps_rev, rot, c_prev, stride: int, out_len: int,
                     interpret: bool = False):
    """Fused unpack+DDC+FM from raw interleaved uint8 (the byte contract of
    ref source.py:117-118): output m covers complex samples
    x[m*J .. m*J+K-1], i.e. bytes raw[2*m*J .. 2*(m*J+K)-1].

    raw: uint8 (n,) with n >= 2*(out_len*J + K); taps_rev: complex (K,)
    reversed modulated taps; rot: complex scalar; c_prev: complex (1,).
    Returns (audio (out_len,) f32, c_last (1,) c64).
    """
    j = stride
    k = taps_rev.shape[0]
    q = -(-k // j)
    n_tiles = -(-out_len // TILE)

    # the halo block covers every in-block shift: the deepest access is row
    # (n_tiles-1)*TILE + (TILE-1) + (q-1) < (n_tiles+1)*TILE for q <= TILE
    rows = (n_tiles + 1) * TILE
    need = rows * 2 * j
    rp = jnp.pad(raw, (0, max(0, need - raw.shape[0])))[:need]
    b = rp.reshape(rows, 2 * j)              # free reshape: NO transpose

    # interleaved taps: row 2i (I byte) contributes (Re w_n, Im w_n),
    # row 2i+1 (Q byte) contributes (-Im w_n, Re w_n), n = qq*J + i
    wpad = jnp.pad(taps_rev, (0, q * j - k))
    w2 = wpad.reshape(q, j)
    u = jnp.stack([
        jnp.stack([jnp.real(w2), jnp.imag(w2)], axis=-1),      # even bytes
        jnp.stack([-jnp.imag(w2), jnp.real(w2)], axis=-1),     # odd bytes
    ], axis=2).reshape(q, 2 * j, 2).astype(jnp.float32)
    # constant offset: 127.5 * (sum Re w - sum Im w, sum Im w + sum Re w)
    sr = jnp.sum(jnp.real(wpad))
    si = jnp.sum(jnp.imag(wpad))
    off = (127.5 * jnp.stack([sr - si, si + sr])).reshape(1, 2) \
        .astype(jnp.float32)
    rot2 = jnp.stack([jnp.real(rot), jnp.imag(rot)]).reshape(1, 2) \
        .astype(jnp.float32)
    cp2 = jnp.stack([jnp.real(c_prev[0]), jnp.imag(c_prev[0])]) \
        .reshape(1, 2).astype(jnp.float32)

    out = pl.pallas_call(
        _kernel_u8,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, 2 * j), lambda t: (t, 0)),
            pl.BlockSpec((TILE, 2 * j), lambda t: (t + 1, 0)),
            pl.BlockSpec((q, 2 * j, 2), lambda t: (0, 0, 0)),
            pl.BlockSpec((1, 2), lambda t: (0, 0)),
            pl.BlockSpec((1, 2), lambda t: (0, 0)),
            pl.BlockSpec((1, 2), lambda t: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((TILE, 1), lambda t: (t, 0)),
            pl.BlockSpec((TILE, 1), lambda t: (t, 0)),
            pl.BlockSpec((1, 2), lambda t: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles * TILE, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * TILE, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ),
        interpret=interpret,
    )(b, b, u, off, rot2, cp2)
    out_r, out_i, carry = out
    audio = jnp.arctan2(out_i.reshape(-1)[:out_len],
                        out_r.reshape(-1)[:out_len])
    # streaming carry = conv output at the last KEPT index. The in-kernel
    # carry sits at the tile grid's final row (n_tiles*TILE - 1), which is
    # past out_len whenever out_len is not a TILE multiple, so recompute it
    # with one K-length dot (negligible next to the main pass).
    del carry
    seg = jax.lax.dynamic_slice(
        rp, (2 * (out_len - 1) * j,), (2 * k,)).astype(jnp.float32) - 127.5
    xb = jax.lax.complex(seg[0::2], seg[1::2])
    c_last = jnp.dot(taps_rev.astype(jnp.complex64), xb).reshape(1)
    return audio, c_last
