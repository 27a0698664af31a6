"""Dense byte-matmul DDC backend (ops/ddc_conv) vs fp64 oracle, the Pallas
u8 kernel, and the production stream paths. Compiled-mode throughput is
exercised on real TPU by examples/bench_kernel_variants.py."""
import numpy as np
import jax.numpy as jnp

from directdemod_tpu.models.frontend import DdcFm, DdcFmStream
from directdemod_tpu.ops import design
from directdemod_tpu.ops.ddc_conv import byte_plan, ddc_bytes, ddc_fm_bytes


def _fe():
    return DdcFm(2048000, 30000, design.blackmanharris(151), 60000, fm=True)


def _ref_c(fe, raw, out_len):
    x = (raw[0::2].astype(np.float64) - 127.5) \
        + 1j * (raw[1::2].astype(np.float64) - 127.5)
    w = np.asarray(fe.taps_mod)[::-1]
    j, k = fe.stride, len(fe.taps)
    return np.asarray([np.dot(w, x[m * j:m * j + k]) for m in range(out_len)])


def test_byte_plan_geometry():
    fe = _fe()
    plan = byte_plan(fe.taps_mod[::-1], fe.stride)
    # J=34: lcm(68,128)=2176 -> 32 outputs / 17 rows per group, 19-row window
    assert (plan.G, plan.P, plan.W) == (32, 17, 19)
    assert plan.parts[0].shape == (19, 128, 64)


def test_dot_and_conv_match_oracle(rng):
    fe = _fe()
    j, k = fe.stride, len(fe.taps)
    out_len = 517                              # ragged (not a group multiple)
    raw = rng.integers(0, 256, 2 * ((out_len - 1) * j + k) + 32) \
        .astype(np.uint8)
    plan = byte_plan(fe.taps_mod[::-1], j)
    ref = plan.oracle(raw, out_len)
    assert np.max(np.abs(ref - _ref_c(fe, raw, out_len))) < 1e-9

    for mode in ("dot", "conv"):
        (re, im), c_last = ddc_bytes(plan, jnp.asarray(raw),
                                     jnp.zeros(1, jnp.complex64),
                                     out_len, mode)
        c = np.asarray(re) + 1j * np.asarray(im)
        scale = np.max(np.abs(ref))
        assert np.max(np.abs(c - ref)) / scale < 5e-6, mode
        assert abs(complex(np.asarray(c_last)[0]) - ref[-1]) / scale < 5e-6


def test_nsplit_precision_ladder(rng):
    """bf16 residual splits: bytes are exact in bf16, so nsplit parts give
    ~2^-8/−16/−24 relative tap accuracy (the round-5 precision experiment,
    docs/experiments.md)."""
    fe = _fe()
    j, k = fe.stride, len(fe.taps)
    out_len = 256
    raw = rng.integers(0, 256, 2 * ((out_len - 1) * j + k)).astype(np.uint8)
    ref = byte_plan(fe.taps_mod[::-1], j).oracle(raw, out_len)
    scale = np.max(np.abs(ref))
    errs = []
    for ns in (1, 2, 3):
        plan = byte_plan(fe.taps_mod[::-1], j, nsplit=ns)
        (re, im), _ = ddc_bytes(plan, jnp.asarray(raw),
                                jnp.zeros(1, jnp.complex64), out_len, "dot")
        errs.append(np.max(np.abs(np.asarray(re) + 1j * np.asarray(im) - ref))
                    / scale)
    assert errs[0] < 3e-2 and errs[1] < 3e-4 and errs[2] < 5e-6
    assert errs[2] < errs[1] < errs[0]


def test_fm_wrapper_matches_pallas_u8(rng):
    from directdemod_tpu.ops.pallas_ddc import ddc_fm_pallas_u8

    fe = _fe()
    j, k = fe.stride, len(fe.taps)
    out_len = 700
    raw = rng.integers(0, 256, 2 * ((out_len - 1) * j + k)).astype(np.uint8)
    cp = np.asarray([1.0 + 0.5j], np.complex64)
    rot = np.complex64(fe.rot)
    plan = byte_plan(fe.taps_mod[::-1], j)
    a1, c1 = ddc_fm_bytes(plan, jnp.asarray(raw), jnp.asarray(rot),
                          jnp.asarray(cp), out_len)
    a2, c2 = ddc_fm_pallas_u8(
        jnp.asarray(raw), jnp.asarray(fe.taps_mod[::-1], jnp.complex64),
        jnp.asarray(rot), jnp.asarray(cp), j, out_len, True)
    d = np.abs(np.asarray(a1) - np.asarray(a2))
    assert np.percentile(d, 99.9) < 1e-4
    assert d.max() < 2e-2


def test_gemm_u8_stream_backend_matches_xla(rng):
    """DdcFmStream backend='gemm_u8' (the TPU default) vs the XLA path over
    multiple raw blocks — chunk-boundary byte-history carry included."""
    n_blk, blocks = 150_000, 3
    raw = rng.integers(0, 256, 2 * n_blk * blocks).astype(np.uint8)
    fe = _fe()

    ref_stream = DdcFmStream(fe, backend="xla")
    got_stream = DdcFmStream(fe, backend="gemm_u8")
    for i in range(blocks):
        seg = jnp.asarray(raw[2 * i * n_blk: 2 * (i + 1) * n_blk])
        r = np.asarray(ref_stream.step(seg, i * n_blk))
        g = np.asarray(got_stream.step(seg, i * n_blk))
        d = np.abs(r - g)
        assert np.percentile(d, 99.9) < 1e-4
        assert d.max() < 2e-2


def test_resident_frontend_gemm_matches_blocked(rng):
    """resident_frontend backend='gemm_u8' (the default) vs the blocked
    gemm stream on the same raw capture."""
    n = 420_000
    raw_np = rng.integers(0, 256, 2 * n).astype(np.uint8)
    fe = _fe()

    stream = DdcFmStream(fe, backend="gemm_u8")
    blk = 150_000
    ref = np.concatenate([
        np.asarray(stream.step(jnp.asarray(raw_np[2 * s: 2 * min(s + blk, n)]),
                               s))
        for s in range(0, n, blk)])
    got = np.asarray(fe.resident_frontend(jnp.asarray(raw_np), n))
    assert got.shape == ref.shape
    d = np.abs(got - ref)
    assert np.percentile(d, 99.9) < 1e-4
    assert d.max() < 2e-2


def test_odd_stride_plan(rng):
    """A stride whose 2J shares only a factor 2 with 128 (J=25 -> G=64)
    exercises the general group geometry."""
    j = 25
    taps = design.blackmanharris(101)
    w = 2.0 * np.pi * 12000.0 / 1_000_000.0
    taps_mod = (taps * np.exp(1j * w * np.arange(101)))[::-1]
    plan = byte_plan(taps_mod, j)
    assert plan.G == 64 and plan.P == 25
    out_len = 201
    raw = rng.integers(0, 256, 2 * ((out_len - 1) * j + 101) + 7) \
        .astype(np.uint8)
    ref = plan.oracle(raw, out_len)
    (re, im), _ = ddc_bytes(plan, jnp.asarray(raw),
                            jnp.zeros(1, jnp.complex64), out_len, "dot")
    c = np.asarray(re) + 1j * np.asarray(im)
    assert np.max(np.abs(c - ref)) / np.max(np.abs(ref)) < 5e-6
