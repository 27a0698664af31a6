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
