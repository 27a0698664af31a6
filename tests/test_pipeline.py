"""Stream pipeline: chunked == reference-semantics oracle == fused front-end.

The oracle below re-implements the reference's chunk-loop numeric contract
(ref decode_noaa.py:617-624 / decode_fm.py:61-70: offsetFreq with carried
counter, stateful lfilter, phase-carried decimation, FM boundary sample,
per-chunk strict resample) directly with SciPy, and everything must agree.
"""
import numpy as np
import scipy.signal as ss
import jax.numpy as jnp

from directdemod_tpu.stream.pipeline import (Pipeline, Shift, Filter, BwLim,
                                             FmDemod, Resample, Butter)
from directdemod_tpu.stream.plan import plan_blocks
from directdemod_tpu.models.frontend import DdcFm
from directdemod_tpu.ops import design, iir
from directdemod_tpu.io.sources import ArraySource

FS = 2048000
N = 500000 + 12345
CH = 170000


def _capture(rng):
    t = np.arange(N) / FS
    msg = np.cumsum(np.sin(2 * np.pi * 1000 * t)) / FS
    x = (np.exp(1j * (2 * np.pi * 30000 * t + 2 * np.pi * 20000 * msg))
         + 0.05 * (rng.standard_normal(N) + 1j * rng.standard_normal(N)))
    return x.astype(np.complex128)


def _oracle(x, strict):
    taps = design.blackmanharris(151)
    zi = ss.lfilter_zi(taps, [1.0]).astype(complex)
    freq_ctr = off_a = off_b = 0
    fm_last = None
    outs = []
    for s, e in plan_blocks(len(x), CH):
        sig = x[s:e].copy()
        n = len(sig)
        sig *= np.exp(-1j * 2 * np.pi * 30000 * np.arange(freq_ctr, freq_ctr + n) / FS)
        freq_ctr += n
        sig, zi = ss.lfilter(taps, [1.0], sig, zi=zi)
        J = int(FS / 60000)
        sig2 = sig[off_a::J]
        off_a = (J - (len(sig) - off_a) % J) % J
        fs2 = int(FS / J)
        prod = sig2[1:] * np.conj(sig2[:-1])
        if fm_last is None:
            out = np.angle(prod)
        else:
            out = np.angle(np.concatenate([[sig2[0] * np.conj(fm_last)], prod]))
        fm_last = sig2[-1]
        if strict:
            out = ss.resample(out, int(20800 * len(out) / fs2))
            rate = 20800
        else:
            J2 = int(fs2 / 40960)
            out2 = out[off_b::J2]
            off_b = (J2 - (len(out) - off_b) % J2) % J2
            out, rate = out2, int(fs2 / J2)
        outs.append(out)
    return np.concatenate(outs), rate


def test_plan_blocks_matches_reference_chunker():
    """ref chunker.py:30-45 split rules, including exact-multiple lengths."""
    assert plan_blocks(100, 40) == [(0, 40), (40, 80), (80, 100)]
    assert plan_blocks(80, 40) == [(0, 40), (40, 80)]
    assert plan_blocks(30, 40) == [(0, 30)]
    assert plan_blocks(41, 40) == [(0, 40), (40, 41)]


def test_crude_chain_matches_oracle(rng):
    x = _capture(rng)
    ref, ref_rate = _oracle(x, strict=False)
    pipe = Pipeline([Shift(30000), Filter(design.blackmanharris(151)),
                     BwLim(60000), FmDemod(), BwLim(40960)], FS, dtype=jnp.complex128)
    ours, rate = pipe.process(ArraySource(x, FS), block_size=CH)
    assert rate == ref_rate == 60235  # int-stride arithmetic, not 40960
    assert len(ours) == len(ref)
    assert np.max(np.abs(ours - ref)) < 1e-9


def test_audio_chain_strict_resample_matches_oracle(rng):
    x = _capture(rng)
    ref, ref_rate = _oracle(x, strict=True)
    pipe = Pipeline([Shift(30000), Filter(design.blackmanharris(151)),
                     BwLim(60000), FmDemod(), Resample(20800)], FS, dtype=jnp.complex128)
    ours, rate = pipe.process(ArraySource(x, FS), block_size=CH)
    assert rate == ref_rate and len(ours) == len(ref)
    assert np.max(np.abs(ours - ref)) < 1e-9


def test_fused_frontend_matches_pipeline(rng):
    x = _capture(rng)
    src = ArraySource(x, FS)
    pipe = Pipeline([Shift(30000), Filter(design.blackmanharris(151)),
                     BwLim(60000), FmDemod()], FS, dtype=jnp.complex128)
    ref, rrate = pipe.process(src, block_size=CH)
    fe = DdcFm(FS, 30000, design.blackmanharris(151), 60000, fm=True)
    ours, orate = fe.process(src, block_size=CH, dtype=jnp.complex128)
    assert rrate == orate and len(ref) == len(ours)
    assert np.max(np.abs(ours - ref)) < 1e-9


def test_fused_frontend_fp32_snr(rng):
    x = _capture(rng)
    src = ArraySource(x, FS)
    pipe = Pipeline([Shift(30000), Filter(design.blackmanharris(151)),
                     BwLim(60000), FmDemod()], FS, dtype=jnp.complex128)
    ref, _ = pipe.process(src, block_size=CH)
    fe = DdcFm(FS, 30000, design.blackmanharris(151), 60000, fm=True)
    ours, _ = fe.process(src, block_size=CH, dtype=jnp.complex64)
    err = ours.astype(np.float64) - ref
    snr = 10 * np.log10(np.mean(ref ** 2) / np.mean(err ** 2))
    assert snr > 90


def test_butter_stage_in_pipeline(rng):
    """Chunked Butterworth with carried SOS state (funcube LP chain shape)."""
    x = _capture(rng)[:200000]
    f = iir.IirFilter.design_butter(FS, 60000, order=6, kind="lowpass")
    pipe = Pipeline([Shift(30000), Butter(f)], FS, dtype=jnp.complex128)
    ours, _ = pipe.process(ArraySource(x, FS), block_size=77777)
    b, a = f.ba()
    ref_in = x * np.exp(-1j * 2 * np.pi * 30000 * np.arange(len(x)) / FS)
    ref, _ = ss.lfilter(b, a, ref_in, zi=ss.lfilter_zi(b, a).astype(complex))
    assert np.max(np.abs(ours - ref)) / np.max(np.abs(ref)) < 1e-5
