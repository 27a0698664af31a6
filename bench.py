#!/usr/bin/env python3
"""Headline benchmark: IQ Msamples/s/chip through the filter + FM-demod chain.

Measures the fused DDC+FM front-end (offsetFreq -> blackman-harris(151) ->
decimate-by-34 -> polar discriminator; the chain of ref decode_noaa.py:623 /
decode_fm.py:64-68) in steady state on one chip, on full 20M-sample stream
blocks, and compares against the reference's NumPy/SciPy implementation of the
same chain timed on this same host (`vs_baseline` = ours / reference).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import contextlib
import json
import signal
import sys
import time

import numpy as np


@contextlib.contextmanager
def watchdog(seconds: int, what: str):
    """Raise TimeoutError if the block runs too long — the tunnel's remote
    compile service can wedge indefinitely, and a hang here would stall the
    whole bench run (the driver runs this file uninterruptibly at round end).
    SIGALRM-based: main thread only, which is where bench runs."""
    def _fire(signum, frame):
        raise TimeoutError(f"{what} exceeded {seconds}s (tunnel wedged?)")
    old = signal.signal(signal.SIGALRM, _fire)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _reference_chain_msamps(n: int = 2_000_000) -> float:
    """The reference's own ops (scipy lfilter etc.) timed on this host."""
    import scipy.signal as ss
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    taps = ss.windows.blackmanharris(151)
    zi = ss.lfilter_zi(taps, [1.0]).astype(complex)
    fs = 2048000

    def run():
        sig = x * np.exp(-1j * 2 * np.pi * 30000 * np.arange(n) / fs)
        sig, _ = ss.lfilter(taps, [1.0], sig, zi=zi)
        sig = sig[::34]
        return np.angle(sig[1:] * np.conj(sig[:-1]))

    run()                              # warm caches
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    return n / dt / 1e6


def _feed_chain_msamps(n: int = 200_000_000, block: int = 20_000_000) -> float:
    """File -> host -> device -> audio throughput: the full ingest path with
    raw uint8 upload and on-device unpack (ops/unpack), on a real .dat capture.
    Includes disk read, host->device transfer, compute, and audio download."""
    import os
    import tempfile

    import jax.numpy as jnp
    from directdemod_tpu.io.sources import IQDat
    from directdemod_tpu.models.frontend import DdcFm
    from directdemod_tpu.ops import design

    rng = np.random.default_rng(1)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "cap.dat")
        with open(path, "wb") as f:
            chunk = rng.integers(0, 256, size=2 * block, dtype=np.uint8)
            for _ in range(n // block):
                f.write(chunk.tobytes())
        src = IQDat(path, 2048000)
        fe = DdcFm(2048000, 30000, design.blackmanharris(151), 60000, fm=True)
        fe.process(src, block, dtype=jnp.complex64)      # warm jits + page cache
        t0 = time.perf_counter()
        audio, _ = fe.process(src, block, dtype=jnp.complex64)
        dt = time.perf_counter() - t0
        assert len(audio) > 0
    return n / dt / 1e6


def _tpu_chain_msamps(block: int = 20_000_000, k1: int = 4, k2: int = 16
                      ) -> tuple[float, float, float, str, dict]:
    """Steady-state device-resident throughput of the production front-end.

    Timing method (round 4): `block_until_ready` over the axon tunnel is NOT
    a reliable barrier (measured: a 10-block chain "finished" far above the
    HBM roofline), so every timed region ends with a device->host download
    of a scalar reduction of the final output, and the per-block cost is
    the SLOPE between a short and a long chain (cancels fixed RPC latency).
    Returns (gemm_u8_msps, pallas_u8_msps, xla_msps, device_kind, roofline)
    — the dense byte-matmul gemm_u8 path (ops/ddc_conv) is the production
    steady-state backend (models/frontend.DdcFmStream) since round 5; the
    round-4 Pallas kernel and the XLA polyphase ride along for comparison.
    `roofline` quantifies the winner against the v5e HBM ingest bound and
    reports both algorithmic and MXU-dispatched FLOP rates (VERDICT r04 #1:
    the gap must be visible in artifacts)."""
    import jax
    import jax.numpy as jnp
    from directdemod_tpu.models.frontend import DdcFm, _pallas_u8_block
    from directdemod_tpu.ops import design
    from directdemod_tpu.ops.ddc_conv import byte_plan, ddc_fm_bytes
    from directdemod_tpu.utils import hostio

    dev = jax.devices()[0]
    fe = DdcFm(2048000, 30000, design.blackmanharris(151), 60000, fm=True)
    rng = np.random.default_rng(0)
    x = hostio.device_put((rng.standard_normal(block)
                           + 1j * rng.standard_normal(block))
                          .astype(np.complex64))
    # + history-tail bytes: _pallas_u8_block expects [tail | block] layout
    raw = hostio.device_put_u8(
        rng.integers(0, 256, 2 * (block + 256)).astype(np.uint8))

    def slope_msps(chain):
        def timed(k):
            t0 = time.perf_counter()
            s = chain(k)
            float(hostio.device_get(s))        # the barrier
            return time.perf_counter() - t0
        timed(1)                               # warm every jit shape
        t1 = min(timed(k1) for _ in range(2))
        t2 = min(timed(k2) for _ in range(2))
        return block / max((t2 - t1) / (k2 - k1), 1e-9) / 1e6

    state0 = fe.init_state(jnp.complex64)

    def chain_xla(k):
        state, start, y = state0, 4 * block, None
        for _ in range(k):
            y, state = fe.process_block(x, state, start)
            start += block
        return jnp.sum(y)

    taps_rev = hostio.device_put(fe.taps_mod[::-1], dtype=jnp.complex64)
    rot = hostio.device_put(fe.rot, dtype=jnp.complex64)
    out_len = block // fe.stride
    cp0 = hostio.zeros(1, jnp.complex64)

    def chain_pallas(k):
        cp, audio = cp0, None
        for _ in range(k):
            audio, cp = _pallas_u8_block(raw, taps_rev, rot, cp,
                                         jnp.int32(0), fe.stride, out_len,
                                         False)
        return jnp.sum(audio)

    plan = byte_plan(fe.taps_mod[::-1], fe.stride)
    rot_np = np.complex64(fe.rot)
    run_gemm = jax.jit(lambda rr, cp: ddc_fm_bytes(
        plan, rr, rot_np, cp, out_len))

    def chain_gemm(k):
        cp, audio = cp0, None
        for _ in range(k):
            audio, cp = run_gemm(raw, cp)
        return jnp.sum(audio)

    gemm = slope_msps(chain_gemm)
    # roofline accounting for the production (gemm_u8) path on v5e:
    #   ingest        2 B/sample raw-u8 HBM read (819 GB/s spec bound)
    #   algorithmic   8*K/J real FLOP per input sample (complex 151-tap dot
    #                 per kept output)
    #   mxu           what the structured GEMM actually dispatches:
    #                 2 * W*128 * 2 MACs per output * nsplit passes
    k_taps, j = len(fe.taps_mod), fe.stride
    alg_flops = gemm * 1e6 * 8.0 * k_taps / j
    mxu_flops = (gemm * 1e6 / j) * (2.0 * plan.W * 128 * 2) * plan.nsplit
    roofline = {
        "hbm_ingest_gb_s": round(gemm * 2 / 1e3, 1),
        "pct_of_hbm_roofline_819gbs": round(gemm * 2 / 1e3 / 819 * 100, 1),
        "algorithmic_gflop_s": round(alg_flops / 1e9, 1),
        "mxu_dispatched_gflop_s": round(mxu_flops / 1e9, 1),
        "pct_of_mxu_bf16_197tflops": round(mxu_flops / 197e12 * 100, 1),
    }
    return gemm, slope_msps(chain_pallas), slope_msps(chain_xla), \
        dev.device_kind, roofline


def _link_mb_s(mb: int = 64) -> tuple[float, float]:
    """Host->device and device->host bandwidth of the tunnel link, measured
    with the same uint8-as-u32 shim the production feed uses. This is the
    quantity that bounds every feed-inclusive number in this environment
    (~15-20 MB/s on the dev tunnel vs GB/s for a production host link)."""
    import jax.numpy as jnp
    from directdemod_tpu.utils import hostio
    raw = np.random.default_rng(3).integers(
        0, 256, mb << 20, dtype=np.uint8)
    up = hostio.device_put_u8(raw[: 1 << 20])          # warm the jits
    np.asarray(up.astype(jnp.float32)[:8])
    t0 = time.perf_counter()
    dev = hostio.device_put_u8(raw)
    dev.block_until_ready()
    up_s = time.perf_counter() - t0
    f32 = dev[: (mb << 20) // 4].astype(jnp.float32)
    f32.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(f32)
    down_s = time.perf_counter() - t0
    return mb / up_s, mb / down_s


def _last_recorded_feed():
    """Most recent non-null feed-inclusive number from committed artifacts
    (BENCH_FRONTEND_r*.json / BENCH_r*.json), used as a stale fallback when
    the live measurement dies on a wedged tunnel."""
    import glob
    import os
    here = os.path.dirname(os.path.abspath(__file__))
    cands = sorted(glob.glob(os.path.join(here, "BENCH_FRONTEND_r*.json"))
                   + glob.glob(os.path.join(here, "BENCH_r*.json")),
                   key=os.path.getmtime, reverse=True)
    for path in cands:
        try:
            with open(path) as f:
                doc = json.load(f)
            doc = doc.get("parsed", doc)
            v = doc.get("feed_inclusive_msamples_per_s")
            if v:
                return float(v)
        except Exception:
            continue
    return None


def main() -> int:
    last_err = None
    value = pallas_value = xla_value = device = roofline = None
    for attempt in range(3):           # the dev tunnel wedges transiently
        try:
            with watchdog(900, "device chain bench"):
                (value, pallas_value, xla_value, device,
                 roofline) = _tpu_chain_msamps()
            break
        except Exception as e:
            last_err = e
            time.sleep(45)
    if value is None:
        print(json.dumps({"metric": "iq_chain_throughput", "value": 0.0,
                          "unit": "Msamples/s/chip", "vs_baseline": 0.0,
                          "error": f"{type(last_err).__name__}: {last_err}"}))
        return 1
    try:
        ref = _reference_chain_msamps()
    except Exception:
        ref = float("nan")
    # feed-inclusive: bounded retries at shrinking sizes, then carry the
    # last recorded artifact's number forward as stale rather than nulling
    # the field (round 3's driver run wedged here and shipped a null)
    feed = feed_err = None
    feed_stale = False
    for n_try in (200_000_000, 50_000_000):
        try:
            with watchdog(600, f"feed-inclusive bench ({n_try // 10**6}M)"):
                feed = _feed_chain_msamps(n=n_try)
            feed_err = None
            break
        except Exception as e:
            feed_err = f"{type(e).__name__}: {e}"
            time.sleep(30)
    if feed is None:
        feed = _last_recorded_feed()
        feed_stale = feed is not None
    try:
        with watchdog(300, "link bandwidth"):
            link_up, link_down = _link_mb_s()
    except Exception:
        link_up = link_down = None
    out = {
        "metric": "iq_chain_throughput",
        "value": round(value, 1),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(value / ref, 1) if ref == ref else None,
        "device": device,
        # `value` times device-resident blocks (per-chip compute); the feed-
        # inclusive number below covers file -> device -> audio end to end.
        # Since round 4 the timing is slope-based through a download barrier
        # (block_until_ready is not a reliable barrier over the tunnel);
        # since round 5 `value` is the production gemm_u8 steady-state
        # backend (dense byte-matmul, ops/ddc_conv); the round-4 Pallas
        # kernel and the XLA polyphase lowering ride along for comparison.
        "measures": ("device-resident 20M-sample blocks, steady state, "
                     "gemm_u8 backend, slope-timed w/ download barrier"),
        "pallas_u8_msamples_per_s": (round(pallas_value, 1)
                                     if pallas_value else None),
        "xla_polyphase_msamples_per_s": (round(xla_value, 1)
                                         if xla_value else None),
        **(roofline or {}),
        "feed_inclusive_msamples_per_s": round(feed, 1) if feed else None,
        # the environment bound on any feed-inclusive number (2 B/sample)
        "link_upload_mb_s": round(link_up, 1) if link_up else None,
        "link_download_mb_s": round(link_down, 1) if link_down else None,
        # single-core NumPy/SciPy chain timed on this same host
        "reference_msamples_per_s_same_host_1core_scipy": (
            round(ref, 1) if ref == ref else None),
        # front-end chain only — NOT the full NOAA decode (that claim's only
        # legitimate source is the noaa_e2e artifact's realtime_factor)
        "frontend_realtime_factor_at_2048ksps": round(value / 2.048, 1),
    }
    if feed_err is not None:
        out["feed_error"] = feed_err
    if feed_stale:
        out["feed_inclusive_stale"] = True   # carried from a prior artifact
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
