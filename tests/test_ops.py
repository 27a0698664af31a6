"""Device DSP ops vs SciPy golden values (fp64 exactness + fp32 SNR)."""
import numpy as np
import pytest
import scipy.signal as ss
import jax.numpy as jnp

from directdemod_tpu.ops import am, correlate as C, fir, fm, iir, nco, resample
from directdemod_tpu import constants as K


def _cplx(rng, n):
    return rng.standard_normal(n) + 1j * rng.standard_normal(n)


class TestFir:
    def test_stateful_chunked_matches_lfilter(self, rng):
        b = ss.windows.blackmanharris(151)
        x = _cplx(rng, 5000)
        zi = ss.lfilter_zi(b, [1.0]).astype(complex)
        y1, zf = ss.lfilter(b, [1.0], x[:2000], zi=zi)
        y2, _ = ss.lfilter(b, [1.0], x[2000:], zi=zf)
        ref = np.concatenate([y1, y2])
        h = fir.ones_history(151, jnp.complex128)
        a1, h2 = fir.fir_apply(jnp.array(x[:2000]), jnp.array(b), h)
        a2, _ = fir.fir_apply(jnp.array(x[2000:]), jnp.array(b), h2)
        assert np.max(np.abs(np.concatenate([np.array(a1), np.array(a2)]) - ref)) < 1e-12

    @pytest.mark.parametrize("off", [0, 17])
    def test_decimate_fused_equals_stride_pick(self, rng, off):
        b = ss.windows.blackmanharris(151)
        x = _cplx(rng, 5000)
        full, _ = fir.fir_apply(jnp.array(x), jnp.array(b), fir.ones_history(151, jnp.complex128))
        out_len = resample.decim_count(5000, off, 34)
        dec, _ = fir.fir_decimate(jnp.array(x), jnp.array(b),
                                  fir.ones_history(151, jnp.complex128), off, out_len, 34)
        # polyphase summation order differs from the direct conv by fp rounding
        assert np.max(np.abs(np.array(dec) - np.array(full)[off::34])) < 1e-12

    def test_zero_phase_matches_filtfilt(self, rng):
        b = ss.windows.blackmanharris(151)
        x = rng.standard_normal(5000)
        assert np.max(np.abs(np.array(fir.fir_zero_phase(jnp.array(x), b))
                             - ss.filtfilt(b, [1.0], x))) < 1e-10

    @pytest.mark.parametrize("k", [5, 6, 151, 560])
    def test_convolve_same(self, rng, k):
        x, w = rng.standard_normal(3000), rng.standard_normal(k)
        assert np.max(np.abs(np.array(fir.convolve_same(jnp.array(x), jnp.array(w)))
                             - np.convolve(x, w, mode="same"))) < 1e-11


class TestIir:
    def test_butter_lp_complex_chunked(self, rng):
        f = iir.IirFilter.design_butter(2048000, 7000, order=6, kind="lowpass", block=1024)
        b, a = f.ba()
        x = _cplx(rng, 50000)
        zi = ss.lfilter_zi(b, a).astype(complex)
        y1, zf = ss.lfilter(b, a, x[:23000], zi=zi)
        y2, _ = ss.lfilter(b, a, x[23000:], zi=zf)
        ref = np.concatenate([y1, y2])
        z = f.initial_state_step(jnp.complex128)
        o1, z2 = f.apply(jnp.array(x[:23000]), z)
        o2, _ = f.apply(jnp.array(x[23000:]), z2)
        ours = np.concatenate([np.array(o1), np.array(o2)])
        # flat-form lfilter is itself ill-conditioned at this wn; bound rel err
        assert np.max(np.abs(ours - ref)) / np.max(np.abs(ref)) < 1e-4

    def test_butter_bp_real(self, rng):
        f = iir.IirFilter.design_butter(22050, 700, 2700, order=6, kind="bandpass", block=512)
        b, a = f.ba()
        x = rng.standard_normal(30000)
        ref, _ = ss.lfilter(b, a, x, zi=ss.lfilter_zi(b, a))
        o, _ = f.apply(jnp.array(x), f.initial_state_step(jnp.float64))
        assert np.max(np.abs(np.array(o) - ref)) < 1e-6

    def test_zero_phase_matches_filtfilt(self, rng):
        f = iir.IirFilter.design_butter(60235, 400, 4400, order=6, kind="bandpass", block=2048)
        b, a = f.ba()
        x = rng.standard_normal(60000)
        ref = ss.filtfilt(b, a, x)
        o = np.array(f.zero_phase(jnp.array(x)))
        assert np.max(np.abs(o - ref)) / np.max(np.abs(ref)) < 1e-3


class TestFm:
    def test_quad_demod_chunked(self, rng):
        x = _cplx(rng, 4000)
        ref = np.angle(x[1:] * np.conj(x[:-1]))
        y1, l1 = fm.quad_demod(jnp.array(x[:1500]), None)
        y2, _ = fm.quad_demod(jnp.array(x[1500:]), l1)
        assert np.max(np.abs(np.concatenate([np.array(y1), np.array(y2)]) - ref)) < 1e-12

    def test_angle_diff_chunked(self, rng):
        x = _cplx(rng, 4000)
        ref = np.diff(np.unwrap(np.angle(x)))
        y1, a1 = fm.angle_diff_demod(jnp.array(x[:1500]), None)
        y2, _ = fm.angle_diff_demod(jnp.array(x[1500:]), a1)
        assert np.max(np.abs(np.concatenate([np.array(y1), np.array(y2)]) - ref)) < 1e-12


class TestAm:
    @pytest.mark.parametrize("n", [2400, 2401])
    def test_envelope(self, rng, n):
        x = rng.standard_normal(n)
        assert np.max(np.abs(np.array(am.envelope(jnp.array(x)))
                             - np.abs(ss.hilbert(x)))) < 1e-12

    def test_envelope_blocked_matches_reference_chunking(self, rng):
        x = rng.standard_normal(10000)
        ref = np.concatenate([np.abs(ss.hilbert(x[i:i + 2400]))
                              for i in range(0, 10000, 2400)])
        assert np.max(np.abs(np.array(am.envelope_blocked(jnp.array(x), 2400)) - ref)) < 1e-12


class TestResample:
    @pytest.mark.parametrize("n,num", [(1000, 640), (1000, 641), (1001, 640),
                                       (999, 1501), (1000, 1500), (15058, 14560)])
    def test_matches_scipy(self, rng, n, num):
        x = rng.standard_normal(n)
        assert np.max(np.abs(np.array(resample.fft_resample(jnp.array(x), num))
                             - ss.resample(x, num))) < 1e-12
        xc = _cplx(rng, n)
        assert np.max(np.abs(np.array(resample.fft_resample(jnp.array(xc), num))
                             - ss.resample(xc, num))) < 1e-12

    def test_decim_phase_closed_form(self):
        """Closed form == the reference's chained carry (ref comm.py:122-125)."""
        J = 34
        lens = [200000, 200000, 123457]
        off_chain, start = 0, 0
        for ln in lens:
            assert resample.decim_phase(start, J) == off_chain
            off_chain = (J - (ln - off_chain) % J) % J
            start += ln


class TestCorrelate:
    @pytest.mark.parametrize("k", [18, 559, 560])
    def test_correlate_same(self, rng, k):
        x, w = rng.standard_normal(5000), rng.standard_normal(k)
        assert np.max(np.abs(np.array(C.correlate_same(jnp.array(x), jnp.array(w)))
                             - ss.correlate(x, w, mode="same"))) < 1e-11

    def test_norm_correlate_formula(self, rng):
        """ref decode_noaa.py:659-675."""
        x = rng.standard_normal(5000)
        needle = C.apt_needle(K.NOAA_SYNCA, 60235, K.NOAA_T, True)
        assert len(needle) == 40 * round(60235 * K.NOAA_T)
        cor = ss.correlate(x, needle, mode="same")
        sums = np.convolve(x * x, [1] * len(needle), mode="same")
        ref = cor / (sums * np.sum(needle * needle)) ** 0.5
        ours = np.array(C.norm_correlate(jnp.array(x), jnp.array(needle)))
        assert np.max(np.abs(ref - ours)) < 1e-10

    def test_norm_correlate_multi_matches_single(self, rng):
        """The fused A+B pass must equal two independent norm_correlate
        calls (it shares the haystack FFT and the energy term)."""
        x = rng.standard_normal(5000)
        na = C.apt_needle(K.NOAA_SYNCA, 60235, K.NOAA_T, True)
        nb = C.apt_needle(K.NOAA_SYNCB, 60235, K.NOAA_T, True)
        fused = np.array(C.norm_correlate_multi(
            jnp.array(x), jnp.array(np.stack([na, nb]))))
        for row, needle in zip(fused, (na, nb)):
            single = np.array(C.norm_correlate(jnp.array(x), jnp.array(needle)))
            assert np.max(np.abs(row - single)) < 1e-10


class TestNco:
    def test_long_stream_phase(self, rng):
        fs, f, start, n = 2048000, 30000, 123456789, 40000
        x = _cplx(rng, n)
        ref = x * np.exp(-1j * 2 * np.pi * f * np.arange(start, start + n) / fs)
        anc = nco.phase_anchors(f, fs, start, n, dtype=np.float64)
        ours = np.array(nco.mix(jnp.array(x), -2 * np.pi * f / fs, jnp.array(anc)))
        assert np.max(np.abs(ours - ref)) < 1e-7

    def test_fp32_anchored_accuracy(self, rng):
        fs, f, start, n = 2048000, 30000, 2_000_000_000, 40000
        x = _cplx(rng, n).astype(np.complex64)
        ref = x * np.exp(-1j * 2 * np.pi * f * np.arange(start, start + n) / fs)
        anc = nco.phase_anchors(f, fs, start, n, dtype=np.float32)
        ours = np.array(nco.mix(jnp.array(x), np.float32(-2 * np.pi * f / fs),
                                jnp.array(anc)))
        err = np.abs(ours - ref)
        assert np.max(err) < 2e-3  # ~ -60 dB even at sample index 2e9


class TestFftOverlapSave:
    def test_long_kernel_matches_direct(self, rng):
        from directdemod_tpu.ops.fir import _rconv_fft, _rconv_direct
        import jax.numpy as jnp
        x = rng.standard_normal(50000)
        w = rng.standard_normal(2048)
        a = np.asarray(_rconv_fft(jnp.asarray(x), jnp.asarray(w)))
        b = np.asarray(_rconv_direct(jnp.asarray(x), jnp.asarray(w)))
        assert a.shape == b.shape
        assert np.max(np.abs(a - b)) < 1e-9


class TestPeakCandidates:
    """candidates_above: count-sized compaction + device-side value gather
    (the host walk of ref decode_noaa.py:725-746 consumes these pairs)."""

    def test_matches_numpy_nonzero(self, rng):
        from directdemod_tpu.ops import peaks
        cor = jnp.asarray(rng.standard_normal(5000).astype(np.float32))
        thr = jnp.float32(1.5)
        idx, vals = peaks.candidates_above(cor, thr)
        ref = np.nonzero(np.asarray(cor) > 1.5)[0]
        assert np.array_equal(idx, ref)
        assert np.allclose(vals, np.asarray(cor)[ref])

    def test_empty(self, rng):
        from directdemod_tpu.ops import peaks
        cor = jnp.asarray(rng.standard_normal(1000).astype(np.float32))
        idx, vals = peaks.candidates_above(cor, jnp.float32(1e9))
        assert len(idx) == 0 and len(vals) == 0

    def test_cap_binding_keeps_first(self, rng, caplog):
        from directdemod_tpu.ops import peaks
        cor = jnp.asarray(np.ones(1000, np.float32))
        with caplog.at_level("WARNING"):
            idx, vals = peaks.candidates_above(cor, jnp.float32(0.5), cap=16)
        assert np.array_equal(idx, np.arange(16))
        assert any("cap bound" in r.message for r in caplog.records)


class TestPeaksHostTwin:
    def test_host_find_sync_peaks_matches_device(self, rng):
        """host_find_sync_peaks == find_sync_peaks on assorted rows (incl.
        tiny rows where k >= n, flat rows, and dense-candidate rows)."""
        import jax.numpy as jnp
        from directdemod_tpu.ops import peaks

        rate = 60235.0
        cases = []
        base = rng.standard_normal(120000).astype(np.float32) * 0.1
        for pos in (5000, 60000, 110000):
            row = base.copy()
            row[pos:pos + 300] += np.linspace(0.5, 1.5, 300)
            cases.append(row)
        cases.append(rng.standard_normal(400).astype(np.float32))  # k >= n/150
        cases.append(np.zeros(5000, np.float32))                   # flat
        for row in cases:
            a = peaks.find_sync_peaks(jnp.asarray(row), rate, 560, 0.25, 0.45)
            b = peaks.host_find_sync_peaks(row, rate, 560, 0.25, 0.45)
            np.testing.assert_array_equal(np.asarray(a), b)
