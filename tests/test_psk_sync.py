"""Funcube / Meteor-M2 frame-sync detection, end-to-end on synthesized PSK."""
import numpy as np
import pytest
import jax.numpy as jnp

from directdemod_tpu import constants as K
from directdemod_tpu.io.sources import ArraySource
from directdemod_tpu.models.funcube import FuncubeDecoder, _SYNC as FC_SYNC
from directdemod_tpu.models.meteorm2 import MeteorM2Decoder, _SYNC as MM_SYNC

FS = 2048000


def _bpsk_capture(frame_times, dur_s, offset_hz=5000.0, carrier_err=200.0,
                  seed=0):
    """1200 bps BPSK (bits spread to 10 symbols at 12 ksym/s) with the funcube
    sync word at the given frame times."""
    rng = np.random.default_rng(seed)
    n_bits = int(dur_s * 1200) + 40
    bits = rng.integers(0, 2, n_bits)
    for ft in frame_times:
        p = int(ft * 1200)
        bits[p:p + 33] = FC_SYNC
    n = int(dur_s * FS)
    t = np.arange(n)
    bit_idx = np.clip((t / (FS / 1200)).astype(np.int64), 0, n_bits - 1)
    bb = (bits[bit_idx] * 2 - 1) * 90.0
    x = bb * np.exp(1j * 2 * np.pi * (offset_hz + carrier_err) * t / FS)
    return x.astype(np.complex64)


def _qpsk_capture(frame_times, dur_s, offset_hz=4000.0, carrier_err=100.0,
                  seed=1):
    """72 ksym/s QPSK with the meteor sync pattern on the I rail at frames."""
    rng = np.random.default_rng(seed)
    n_sym = int(dur_s * K.METEOR_SYMRATE) + 200
    bi = rng.integers(0, 2, n_sym)
    bq = rng.integers(0, 2, n_sym)
    for ft in frame_times:
        p = int(ft * K.METEOR_SYMRATE)
        # meteor hard-decisions interleave Re,Im per symbol: the 120-entry
        # sync covers 60 symbols (I and Q alternating)
        entries = MM_SYNC
        for k in range(60):
            bi[p + k] = entries[2 * k]
            bq[p + k] = entries[2 * k + 1]
    n = int(dur_s * FS)
    t = np.arange(n)
    sym_idx = np.clip((t / (FS / K.METEOR_SYMRATE)).astype(np.int64), 0, n_sym - 1)
    x = ((bi[sym_idx] * 2 - 1) + 1j * (bq[sym_idx] * 2 - 1)) * 64.0
    x = x * np.exp(1j * 2 * np.pi * (offset_hz + carrier_err) * t / FS)
    return x.astype(np.complex64)


@pytest.mark.slow
def test_funcube_end_to_end():
    spacing = K.FUNCUBE_FRAME_SPACING_S
    cap = _bpsk_capture([2.0, 2.0 + spacing], dur_s=2.0 + spacing + 1.2)
    dec = FuncubeDecoder(ArraySource(cap, FS), 5000)
    syncs = dec.get_syncs()
    assert dec.useful == 1
    # two frames detected; the reference drops the first (ref decode_funcube.py:304)
    assert len(syncs) == 1
    # the returned sync should sit near the second frame
    expected = (2.0 + spacing) * FS
    assert abs(syncs[0] - expected) < 0.3 * FS


@pytest.mark.slow
def test_meteor_end_to_end():
    spacing = K.METEOR_FRAME_SPACING_S
    frames = [0.5 + i * spacing for i in range(5)]
    cap = _qpsk_capture(frames, dur_s=1.4)
    dec = MeteorM2Decoder(ArraySource(cap, FS), 4000)
    syncs = dec.get_syncs()
    assert dec.useful == 1
    assert len(syncs) >= 2
    d = np.diff([s for s in syncs])
    # spacing close to 0.11 s for at least one pair
    assert np.min(np.abs(d - spacing * FS)) < 0.05 * FS


def test_segment_parallel_scan_agrees_after_warmup():
    """Block-parallel PLL (per-shard scan + warmup halo, SURVEY 2.4's scaling
    strategy) reproduces the sequential scan's hard decisions, modulo the
    BPSK sign ambiguity each segment may lock into (which the sync detector
    is invariant to by construction)."""
    import jax.numpy as jnp
    from directdemod_tpu.ops.pll import (PskParams, initial_state,
                                         symbol_scan, symbol_scan_segments)
    p = PskParams(fs=FS, sym_rate=12000, qpsk=False, agc_mean0=180.0,
                  agc_gain_cap=20.0, costas_bw=0.05235833333 * 6,
                  minsync_thresh=120.0)
    rng = np.random.default_rng(0)
    n = 2_000_000
    nsym = int(n / (FS / 12000)) + 2
    bits = rng.integers(0, 2, nsym) * 2 - 1
    sym_idx = (np.arange(n) / (FS / 12000)).astype(int)
    x = (bits[np.clip(sym_idx, 0, nsym - 1)] * 90.0
         * np.exp(1j * 2 * np.pi * 250 * np.arange(n) / FS)).astype(np.complex64)
    sync = jnp.zeros(330, jnp.float32)

    _, outs = symbol_scan(p, jnp.asarray(x), initial_state(p, 330), sync, sync)
    v = np.asarray(outs.valid)
    seq_idx = np.asarray(outs.a_idx)[v]
    seq_bits = np.asarray(outs.corrected)[v].real > 0

    outs2, owned = symbol_scan_segments(p, jnp.asarray(x), sync, sync, 4,
                                        warmup_symbols=1500)
    ow, ai2 = np.asarray(owned), np.asarray(outs2.a_idx)
    cb2 = np.asarray(outs2.corrected).real > 0
    total_owned = 0
    for si in range(4):
        m = ow[si]
        pairs = []
        for a, b in zip(ai2[si][m], cb2[si][m]):
            j = np.clip(np.searchsorted(seq_idx, a), 1, len(seq_idx) - 1)
            best = j if abs(int(seq_idx[j]) - a) <= abs(int(seq_idx[j - 1]) - a) else j - 1
            if abs(int(seq_idx[best]) - int(a)) <= 3:
                pairs.append(seq_bits[best] == b)
        agr = float(np.mean(pairs))
        total_owned += len(pairs)
        assert max(agr, 1 - agr) > 0.995, (si, agr)
    assert total_owned > 0.95 * len(seq_idx)


def test_funcube_doppler_corrected(tmp_path):
    """--freqshift path: the waterfall tracker measures the channel's true
    offset error and the slew-limited ramp feeds the NCO
    (ref decode_funcube.py:204-228 + sandbox/frequency_shift.py)."""
    from directdemod_tpu.io.sources import IQDat

    spacing = K.FUNCUBE_FRAME_SPACING_S
    err = 3000.0                       # uncompensated Doppler error
    cap = _bpsk_capture([1.5, 1.5 + spacing], dur_s=1.5 + spacing + 1.0,
                        offset_hz=5000.0, carrier_err=err)
    raw = np.empty(2 * len(cap), np.uint8)
    raw[0::2] = np.clip(np.round(cap.real + 127.5), 0, 255)
    raw[1::2] = np.clip(np.round(cap.imag + 127.5), 0, 255)
    p = str(tmp_path / "fc.dat")
    raw.tofile(p)
    src = IQDat(p, FS)

    center, chan = 145_865_000, 145_870_000   # chan-center=5000 = nominal offset
    dec = FuncubeDecoder(src, 5000, center_frequency=center, signal_freq=chan,
                         corrfreq=True)
    syncs = dec.get_syncs()
    assert dec.useful == 1
    assert len(syncs) >= 1


@pytest.mark.slow
def test_funcube_small_blocks_cross_chunk():
    """Force tiny stream blocks so the scan state, minsync clusters and the
    max-sync correlation window all cross chunk boundaries; sync results must
    stay equivalent to the single-chunk run (the reference's own per-chunk
    NCO-phase restart means bit-identity is not expected, only detection)."""
    spacing = K.FUNCUBE_FRAME_SPACING_S
    cap = _bpsk_capture([1.2, 1.2 + spacing], dur_s=1.2 + spacing + 1.0,
                        offset_hz=0.0, carrier_err=150.0)
    big = FuncubeDecoder(ArraySource(cap, FS), 0)
    syncs_big = big.get_syncs()
    small = FuncubeDecoder(ArraySource(cap, FS), 0, block_size=1_000_000)
    syncs_small = small.get_syncs()
    assert big.useful == 1 and small.useful == 1
    assert len(syncs_big) == len(syncs_small) == 1
    assert abs(syncs_big[0] - syncs_small[0]) < 0.01 * FS


@pytest.mark.slow
def test_funcube_segment_parallel_matches_sequential():
    """Segment-parallel PLL wired into the decoder (n_segments>1): same sync
    detections as the sequential scan on the e2e fixture, within the re-lock
    tolerance the reference accepts at chunk boundaries."""
    spacing = K.FUNCUBE_FRAME_SPACING_S
    cap = _bpsk_capture([2.0, 2.0 + spacing], dur_s=2.0 + spacing + 1.2)
    seq = FuncubeDecoder(ArraySource(cap, FS), 5000)
    syncs_seq = seq.get_syncs()
    par = FuncubeDecoder(ArraySource(cap, FS), 5000, n_segments=4)
    syncs_par = par.get_syncs()
    assert seq.useful == 1 and par.useful == 1
    assert len(syncs_par) == len(syncs_seq) == 1
    assert abs(syncs_par[0] - syncs_seq[0]) < 0.01 * FS


@pytest.mark.slow
def test_meteor_segment_parallel_on_mesh():
    """Meteor QPSK with the segment axis sharded over an 8-device `time`
    mesh: detections agree with the sequential scan."""
    import jax
    spacing = K.METEOR_FRAME_SPACING_S
    frames = [0.5 + i * spacing for i in range(5)]
    cap = _qpsk_capture(frames, dur_s=1.4)
    seq = MeteorM2Decoder(ArraySource(cap, FS), 4000)
    syncs_seq = seq.get_syncs()
    mesh = jax.make_mesh((8,), ("time",))
    par = MeteorM2Decoder(ArraySource(cap, FS), 4000, mesh=mesh)
    syncs_par = par.get_syncs()
    assert seq.useful == 1 and par.useful == 1
    assert len(syncs_par) >= 2
    # every sequential sync has a parallel counterpart nearby
    for s0 in syncs_seq:
        assert min(abs(s0 - s1) for s1 in syncs_par) < 0.02 * FS


# --------------------------------------------------------------- arming window
# Unit tests of the max-sync replay state machine against a literal
# simulation of the reference's per-sample buffering loop
# (ref decode_funcube.py:235-262), including the arming-window END clause
# (`not ctr > lastMin + 5.2*12000` at ref decode_funcube.py:241): a trigger
# that fires after the window closed correlates the STALE armed buffer plus
# the fresh countdown samples, reported as maxBuffStart + argmax.

def _reference_buffer_oracle(vals, sym_samples, trigger_ctrs, needle,
                             cap, arm_pre, arm_end):
    """Per-sample replica of ref decode_funcube.py:235-300's buffering/
    countdown/correlation state machine (identity PLL phase)."""
    maxResBuff, maxBuffStart, retain, lastMin, ctr = [], 0, -1, None, 0
    sym_at = {s: j for j, s in enumerate(sym_samples)}
    syncs = []
    for n in range(len(vals)):
        if (lastMin is not None
                and (ctr > lastMin + arm_pre or retain != -1)
                and not ctr > lastMin + arm_end):
            if len(maxResBuff) == 0:
                maxBuffStart = n
            maxResBuff.append(vals[n])
        if retain == -1:
            if len(maxResBuff) > cap:
                maxBuffStart += 1
                maxResBuff.pop(0)
        elif retain == 0:
            retain -= 1
            corr = np.abs(np.correlate(maxResBuff, needle, mode="same"))
            syncs.append(float(maxBuffStart + np.argmax(corr)))
            maxResBuff = []
        else:
            retain -= 1
        if n in sym_at:
            ctr += 1
            if ctr in trigger_ctrs:
                lastMin = ctr
                retain = cap
    return syncs


def _make_replay_detector(needle, cap, arm_pre, arm_end):
    from directdemod_tpu.models.psk_sync import PskSyncDetector, _SyncConfig
    det = object.__new__(PskSyncDetector)
    det.cfg = _SyncConfig(
        sym_sync=np.zeros(4), sym_sync_alt=np.zeros(4), needles=[needle],
        entries_per_sample=1, cap_entries=cap, arm_pre_syms=arm_pre,
        arm_end_syms=arm_end, frame_spacing=1e9, spacing_tol=1.0)
    det._consumed, det._open, det._prev_lm, det._stale = 0, None, None, None
    return det


def _arming_fixture(trigger_ctrs, n=700, seed=7):
    rng = np.random.default_rng(seed)
    needle = (rng.integers(0, 2, 8) * 256 - 128).astype(np.float64)
    cap, arm_pre, arm_end = 16, 20, 30
    sym_samples = np.arange(3, n, 4)             # ctr becomes j+1 at sample
    v = rng.integers(-3, 4, n).astype(np.float64)
    # plant the needle inside lastMin=41's armed window (samples
    # a[61]+1 .. a[71], sliding cap keeps the last 16) so argmax can land in
    # the stale region
    v[sym_samples[71] - 10: sym_samples[71] - 2] = needle
    vals = v
    stream = (2.0 * v).astype(np.complex64)       # _lim(real/2) == v
    minsyncs = [(c, int(sym_samples[c - 1])) for c in sorted(trigger_ctrs)]
    a_idx = np.asarray(sym_samples, dtype=np.int64)
    phases = np.zeros(len(sym_samples))
    chosens = np.zeros(len(sym_samples), dtype=np.int64)
    return needle, cap, arm_pre, arm_end, sym_samples, vals, stream, \
        minsyncs, a_idx, phases, chosens


@pytest.mark.parametrize("trigger_ctrs", [
    {41, 76},     # 2nd trigger PAST the arming end (41 + 30): stale replay
    {41, 66},     # 2nd trigger inside the armed window: contiguous replay
    {41, 76, 78},  # past-end trigger with a retrigger inside the countdown
])
def test_maxsync_replay_matches_reference_buffer_oracle(trigger_ctrs):
    (needle, cap, arm_pre, arm_end, sym_samples, vals, stream,
     minsyncs, a_idx, phases, chosens) = _arming_fixture(trigger_ctrs)
    want = _reference_buffer_oracle(vals, sym_samples, trigger_ctrs, needle,
                                    cap, arm_pre, arm_end)
    det = _make_replay_detector(needle, cap, arm_pre, arm_end)
    got = det._drain_corr_jobs(minsyncs, [a_idx], [phases], [chosens],
                               stream, 0, len(stream), [], final=True)
    assert got == want


def test_maxsync_replay_stale_across_chunk_boundary():
    """Arming window of lastMin=41 closes in chunk 1; the past-end trigger
    arrives in chunk 2 — the stale buffer must be snapshotted at the chunk
    boundary before the retained tail slides past it."""
    trigger_ctrs = {41, 76}
    (needle, cap, arm_pre, arm_end, sym_samples, vals, stream,
     minsyncs, a_idx, phases, chosens) = _arming_fixture(trigger_ctrs)
    want = _reference_buffer_oracle(vals, sym_samples, trigger_ctrs, needle,
                                    cap, arm_pre, arm_end)
    det = _make_replay_detector(needle, cap, arm_pre, arm_end)
    # split right after the arming window closes (sample of ctr boundary 71)
    split = int(sym_samples[71]) + 5
    max_win = 2 * cap + 8                       # get_syncs retention policy
    n_sym1 = int(np.searchsorted(sym_samples, split))
    ms1 = [m for m in minsyncs if m[0] <= n_sym1]
    got = det._drain_corr_jobs(ms1, [a_idx[:n_sym1]], [phases[:n_sym1]],
                               [chosens[:n_sym1]], stream[:split], 0, split,
                               [], final=False)
    tail_start = split - min(split, max_win)
    tail = stream[tail_start:split]
    stream2 = np.concatenate([tail, stream[split:]])
    got = det._drain_corr_jobs(minsyncs, [a_idx], [phases], [chosens],
                               stream2, tail_start, len(stream), got,
                               final=True)
    assert got == want


@pytest.mark.slow
def test_sparse_pass2_matches_dense(monkeypatch):
    """The round-5 sparse pass 2 (event compaction + span gathers) must
    produce identical syncs to the dense full-tensor download, BPSK and
    QPSK, sequential and segmented."""
    from directdemod_tpu.models import psk_sync as ps

    spacing = K.FUNCUBE_FRAME_SPACING_S
    cap = _bpsk_capture([2.0, 2.0 + spacing], dur_s=2.0 + spacing + 1.2)
    frames_m = [0.5 + i * K.METEOR_FRAME_SPACING_S for i in range(5)]
    cap_m = _qpsk_capture(frames_m, dur_s=1.4)

    cases = [
        (FuncubeDecoder, cap, 5000, dict()),
        (FuncubeDecoder, cap, 5000, dict(n_segments=4)),
        (MeteorM2Decoder, cap_m, 4000, dict()),
        (MeteorM2Decoder, cap_m, 4000, dict(n_segments=4)),
    ]
    orig = ps.PskSyncDetector._sparse_pass2_inputs
    for cls, c, off, kw in cases:
        sparse_calls = []

        def spy(self, packed, use_owned, _orig=orig):
            r = _orig(self, packed, use_owned)
            sparse_calls.append(r is not None)
            return r

        monkeypatch.setattr(ps.PskSyncDetector, "_sparse_pass2_inputs", spy)
        d1 = cls(ArraySource(c, FS), off, **kw)
        s1 = d1.get_syncs()
        # dense: force the fallback
        monkeypatch.setattr(ps.PskSyncDetector, "_sparse_pass2_inputs",
                            lambda self, packed, use_owned: None)
        d2 = cls(ArraySource(c, FS), off, **kw)
        s2 = d2.get_syncs()
        assert sparse_calls == [True], (cls.__name__, kw)
        assert s1 == s2, (cls.__name__, kw)
        assert d1.useful == d2.useful


def test_sparse_symbols_coverage_error():
    """_SparseSymbols must refuse (not silently mis-answer) lookups outside
    its gathered spans."""
    from directdemod_tpu.models.psk_sync import (_SparseSymbols,
                                                 _CoverageError)
    a = np.arange(10, 110, 10)
    ph = np.linspace(0, 1, 10)
    ch = np.zeros(10, np.int64)
    # spans cover symbols 0-4 and 7-9 of 10; symbols 5,6 missing
    v = _SparseSymbols([(0, a[:5], ph[:5], ch[:5]),
                        (7, a[7:], ph[7:], ch[7:])], 10)
    assert v.sym_sample(3) == 40
    assert v.sym_sample(8) == 90
    assert v.sym_sample(12) is None
    with pytest.raises(_CoverageError):
        v.sym_sample(5)
    # phase at sample 45: pred is symbol 3 (a=40), next in span -> determined
    assert np.allclose(v.phase_at(np.asarray([45])), ph[3])
    # phase at 65: true pred is symbol 5 (missing) -> must raise
    with pytest.raises(_CoverageError):
        v.phase_at(np.asarray([65]))
    # phase at 5: before symbol 0, span starts at 0 -> determined as none
    assert v.phase_at(np.asarray([5]))[0] == 0.0
    # phase at 105: pred is the global last symbol -> determined
    assert np.allclose(v.phase_at(np.asarray([105])), ph[9])
