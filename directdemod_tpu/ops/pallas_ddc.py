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
            cprev_ref, out_ref, carry_ref):
    """One tile. lr0/lr1 (J, TILE): current + next lane blocks (halo);
    wr/wi (Q, J) polyphase taps; rot/cprev (1, 2); out (1, TILE);
    carry (1, 2) revisited across the sequential grid."""
    t = pl.program_id(0)
    q = wr_ref.shape[0]

    @pl.when(t == 0)
    def _():
        carry_ref[0, 0] = cprev_ref[0, 0]
        carry_ref[0, 1] = cprev_ref[0, 1]

    lr = jnp.concatenate([lr0_ref[:, :], lr1_ref[:, :]], axis=1)
    li = jnp.concatenate([li0_ref[:, :], li1_ref[:, :]], axis=1)

    cr = jnp.zeros((1, TILE), dtype=jnp.float32)
    ci = jnp.zeros((1, TILE), dtype=jnp.float32)
    for qq in range(q):
        sr = lr[:, qq:qq + TILE]
        si = li[:, qq:qq + TILE]
        wr = wr_ref[qq:qq + 1, :]
        wi = wi_ref[qq:qq + 1, :]
        cr = cr + jnp.dot(wr, sr, preferred_element_type=jnp.float32) \
                - jnp.dot(wi, si, preferred_element_type=jnp.float32)
        ci = ci + jnp.dot(wr, si, preferred_element_type=jnp.float32) \
                + jnp.dot(wi, sr, preferred_element_type=jnp.float32)

    prev_r = jnp.concatenate([carry_ref[0:1, 0:1], cr[:, :TILE - 1]], axis=1)
    prev_i = jnp.concatenate([carry_ref[0:1, 1:2], ci[:, :TILE - 1]], axis=1)

    # d = c[m] * conj(c[m-1]) * rot ; audio = atan2(Im d, Re d)
    pr = cr * prev_r + ci * prev_i
    pi = ci * prev_r - cr * prev_i
    rr = rot_ref[0, 0]
    ri = rot_ref[0, 1]
    dr = pr * rr - pi * ri
    di = pr * ri + pi * rr
    out_ref[0, :] = jnp.arctan2(di, dr)[0, :]

    carry_ref[0, 0] = cr[0, TILE - 1]
    carry_ref[0, 1] = ci[0, TILE - 1]


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

    out, carry = pl.pallas_call(
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
            pl.BlockSpec((1, TILE), lambda t: (t, 0)),
            pl.BlockSpec((1, 2), lambda t: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, TILE), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ),
        interpret=interpret,
    )(lr, lr, li, li, wr, wi, rot2, cp2)
    audio = out.reshape(-1)[:out_len]
    c_last = (carry[0, 0] + 1j * carry[0, 1]).reshape(1).astype(x.dtype)
    return audio, c_last
