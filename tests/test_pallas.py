"""Pallas fused DDC+FM kernel vs the stream reference numerics (interpret
mode; compiled mode exercised on real TPU by bench/verify)."""
import numpy as np
import jax.numpy as jnp

from directdemod_tpu.models.frontend import DdcFm
from directdemod_tpu.ops import design
from directdemod_tpu.ops.pallas_ddc import ddc_fm_pallas, TILE


def test_pallas_ddc_matches_frontend(rng):
    fs, freq, bw = 2048000, 30000, 60000
    fe = DdcFm(fs, freq, design.blackmanharris(151), bw, fm=True)
    j, k = fe.stride, len(fe.taps)
    out_len = 4 * TILE
    n = out_len * j + k
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n))

    # reference: conv c then discriminator, matching the fused stream math
    w = np.asarray(fe.taps_mod)[::-1]
    c = np.asarray([np.dot(w, x[m * j:m * j + k]) for m in range(out_len)])
    c_prev = np.asarray([1.0 + 0j])
    prev = np.concatenate([c_prev, c[:-1]])
    ref = np.angle(c * np.conj(prev) * fe.rot)

    audio, c_last = ddc_fm_pallas(
        jnp.asarray(x, jnp.complex64), jnp.asarray(w, jnp.complex64),
        jnp.asarray(fe.rot, jnp.complex64), jnp.asarray(c_prev, jnp.complex64),
        j, out_len, True)
    audio = np.asarray(audio)
    assert audio.shape == (out_len,)
    err = np.max(np.abs(audio - ref))
    assert err < 2e-4, err            # fp32 kernel vs fp64 reference
    assert abs(complex(np.asarray(c_last)[0]) - c[-1]) < 1e-2


def test_pallas_ddc_u8_matches_frontend(rng):
    """Raw-uint8 fused kernel (unpack+DDC+FM in one pass) vs the fp64
    dot-product reference on the byte contract of ref source.py:117-118."""
    from directdemod_tpu.ops.pallas_ddc import ddc_fm_pallas_u8

    fs, freq, bw = 2048000, 30000, 60000
    fe = DdcFm(fs, freq, design.blackmanharris(151), bw, fm=True)
    j, k = fe.stride, len(fe.taps)
    out_len = 3 * TILE + 17                   # exercise the ragged tail
    n = out_len * j + k
    raw = rng.integers(0, 256, 2 * n).astype(np.uint8)
    x = (raw[0::2].astype(np.float64) - 127.5) \
        + 1j * (raw[1::2].astype(np.float64) - 127.5)

    w = np.asarray(fe.taps_mod)[::-1]
    c = np.asarray([np.dot(w, x[m * j:m * j + k]) for m in range(out_len)])
    c_prev = np.asarray([1.0 + 0j])
    prev = np.concatenate([c_prev, c[:-1]])
    ref = np.angle(c * np.conj(prev) * fe.rot)

    audio, c_last = ddc_fm_pallas_u8(
        jnp.asarray(raw), jnp.asarray(w, jnp.complex64),
        jnp.asarray(fe.rot, jnp.complex64), jnp.asarray(c_prev, jnp.complex64),
        j, out_len, True)
    audio = np.asarray(audio)
    assert audio.shape == (out_len,)
    err = np.max(np.abs(audio - ref))
    assert err < 5e-4, err                    # fp32 kernel vs fp64 reference
    assert abs(complex(np.asarray(c_last)[0]) - c[-1]) < 1e-1


def test_pallas_u8_backend_matches_xla_stream(tmp_path, rng):
    """Production DdcFm.process with backend='pallas_u8' vs the XLA path on a
    multi-block raw .dat stream (chunk-boundary byte-history carry included).
    Angle outputs are fp32 in both; tolerance is distributional because the
    polar discriminator amplifies rounding where |c| is tiny."""
    from directdemod_tpu.io.sources import IQDat

    n = 700_000
    raw = rng.integers(0, 256, 2 * n).astype(np.uint8)
    p = tmp_path / "c.dat"
    raw.tofile(p)
    src = IQDat(str(p), 2048000)
    fe = DdcFm(2048000, 30000, design.blackmanharris(151), 60000, fm=True)
    a1, r1 = fe.process(src, block_size=200_000)
    a2, r2 = fe.process(src, block_size=200_000, backend="pallas_u8",
                        pallas_interpret=True)
    assert r1 == r2 and len(a1) == len(a2)
    d = np.abs(a1 - a2)
    assert np.percentile(d, 99.9) < 1e-4
    assert d.max() < 2e-2


def test_ddcfm_stream_mixed_backend_state(rng):
    """DdcFmStream: pallas-u8 steady blocks followed by an XLA fallback
    block must carry exact state across the backend switch (the complex
    conv history is refreshed from the raw tail bytes)."""
    from directdemod_tpu.models.frontend import DdcFmStream
    from directdemod_tpu.ops import unpack

    n_blk, blocks = 150_000, 3
    raw = rng.integers(0, 256, 2 * n_blk * blocks).astype(np.uint8)
    fe = DdcFm(2048000, 30000, design.blackmanharris(151), 60000, fm=True)

    # all-XLA reference
    ref_stream = DdcFmStream(fe, backend="xla")
    ref = [np.asarray(ref_stream.step(
        jnp.asarray(raw[2 * i * n_blk: 2 * (i + 1) * n_blk]), i * n_blk))
        for i in range(blocks)]

    got_stream = DdcFmStream(fe, backend="pallas_u8", interpret=True)
    got = []
    for i in range(blocks):
        seg = raw[2 * i * n_blk: 2 * (i + 1) * n_blk]
        if i == 2:   # complex block: forces the XLA fallback mid-stream
            x = unpack.iq_u8_to_complex(jnp.asarray(seg), jnp.float32)
        else:
            x = jnp.asarray(seg)
        got.append(np.asarray(got_stream.step(x, i * n_blk)))

    for r, g in zip(ref, got):
        d = np.abs(r - g)
        assert np.percentile(d, 99.9) < 1e-4
        assert d.max() < 2e-2


def test_resident_frontend_matches_blocked_stream(rng):
    """DdcFm.resident_frontend (one-dispatch XLA-block0 + whole-remainder
    Pallas call) vs the blocked DdcFmStream on the same raw capture: the
    per-output windows are identical dots, so outputs must agree to fp32."""
    from directdemod_tpu.models.frontend import DdcFmStream

    n = 420_000
    raw_np = rng.integers(0, 256, 2 * n).astype(np.uint8)
    fe = DdcFm(2048000, 30000, design.blackmanharris(151), 60000, fm=True)

    # blocked reference with pallas steady blocks (interpret mode on CPU)
    stream = DdcFmStream(fe, backend="pallas_u8", interpret=True)
    blk = 150_000
    ref = np.concatenate([
        np.asarray(stream.step(jnp.asarray(raw_np[2 * s: 2 * min(s + blk, n)]),
                               s))
        for s in range(0, n, blk)])

    # small block 0 so the pallas arm is exercised (production uses 20M)
    got = np.asarray(_resident_small(fe, raw_np, n, b0=150_000))
    assert got.shape == ref.shape
    d = np.abs(got - ref)
    assert np.percentile(d, 99.9) < 1e-4
    assert d.max() < 2e-2


def _resident_small(fe, raw_np, n, b0):
    """resident_frontend's exact body with a small block 0 (the production
    constant is 20M, larger than any CPU test capture)."""
    from jax import lax
    from directdemod_tpu.ops import fir as fir_ops
    from directdemod_tpu.ops import resample as rs
    from directdemod_tpu.ops import unpack
    from directdemod_tpu.ops.pallas_ddc import ddc_fm_pallas_u8

    raw = jnp.asarray(raw_np)
    J, k = fe.stride, len(fe.taps_mod)
    hist = jnp.asarray(fe.hist0, jnp.complex64)
    tm = jnp.asarray(fe.taps_mod, jnp.complex64)
    rot = jnp.asarray(fe.rot, jnp.complex64)
    x0 = unpack.iq_u8_to_complex(lax.slice(raw, (0,), (2 * b0,)), jnp.float32)
    out_len0 = rs.decim_count(b0, 0, J)
    c, _ = fir_ops.fir_decimate(x0, tm, hist, jnp.int32(0), out_len0, J)
    audio0 = jnp.angle(c[1:] * jnp.conj(c[:-1]) * rot)
    off1 = rs.decim_phase(b0, J)
    out_len1 = rs.decim_count(n - b0, off1, J)
    raw_cat = lax.slice(raw, (2 * (b0 - (k - 1)),), (2 * n,))
    need = 2 * ((out_len1 - 1) * J + k)
    seg = lax.dynamic_slice(jnp.pad(raw_cat, (0, 2 * J)), (2 * off1,),
                            (need,))
    audio1, _ = ddc_fm_pallas_u8(seg, tm[::-1], rot, c[-1:], J, out_len1,
                                 True)
    return jnp.concatenate([audio0, audio1])
