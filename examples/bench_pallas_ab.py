#!/usr/bin/env python3
"""A/B the Pallas fused DDC+FM kernel against the XLA polyphase lowering on
real TPU hardware: same device, same 20M-sample block, numerics + throughput.

    python examples/bench_pallas_ab.py [--block N]

Timing method: over the axon tunnel `block_until_ready` is NOT a reliable
barrier (measured: a 10x20M Pallas chain "finished" in 0.4 ms, far above the
HBM roofline). Every timed region therefore ends with a device->host download
of a scalar reduction of the final output — the download cannot complete
before the chained compute does — and the per-iteration cost comes from the
SLOPE between a short and a long chain, cancelling the fixed RPC latency.

Prints one JSON line with both throughputs, the ratio, and the max absolute
audio difference (the two backends compute the identical chain of
ref decode_noaa.py:623 / decode_fm.py:64-68).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=20_000_000)
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=16)
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode kernel (CPU smoke test only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from directdemod_tpu.models.frontend import DdcFm
    from directdemod_tpu.ops import design
    from directdemod_tpu.ops.pallas_ddc import ddc_fm_pallas, ddc_fm_pallas_u8
    from directdemod_tpu.utils import hostio

    dev = jax.devices()[0]
    fs, off, bw = 2048000, 30000, 60000
    fe = DdcFm(fs, off, design.blackmanharris(151), bw, fm=True)
    rng = np.random.default_rng(0)
    block = args.block
    x = hostio.device_put((rng.standard_normal(block)
                           + 1j * rng.standard_normal(block))
                          .astype(np.complex64))

    def slope_msps(chain, k1=args.k1, k2=args.k2):
        """chain(k) runs k chained iterations and returns a scalar device
        array; per-block seconds = slope between the two chain lengths,
        each timed through a scalar download barrier."""
        def timed(k):
            t0 = time.perf_counter()
            s = chain(k)
            float(hostio.device_get(s))        # the barrier
            return time.perf_counter() - t0
        timed(1)                               # warm every jit shape
        t1 = min(timed(k1) for _ in range(2))
        t2 = min(timed(k2) for _ in range(2))
        per_block = max((t2 - t1) / (k2 - k1), 1e-9)
        return block / per_block / 1e6

    # ---- XLA polyphase path (the production lowering)
    state0 = fe.init_state(jnp.complex64)

    def chain_xla(k):
        state, start = state0, 0
        y = None
        for _ in range(k):
            y, state = fe.process_block(x, state, start)
            start += block
        return jnp.sum(y)

    xla_msps = slope_msps(chain_xla)

    # ---- Pallas kernel on the identical segment/taps/rotation
    # taps/rot stay HOST numpy: jit bakes closed-over numpy values into the
    # executable without a transfer, whereas a closed-over *device* complex
    # array must be downloaded at trace time (UNIMPLEMENTED over the tunnel)
    stride = fe.stride
    out_len = block // stride
    taps_rev = np.asarray(fe.taps_mod[::-1], dtype=np.complex64)
    rot = np.complex64(fe.rot)
    c_prev0 = hostio.zeros(1, jnp.complex64)

    run = jax.jit(lambda xx, cp: ddc_fm_pallas(
        xx, taps_rev, rot, cp, stride, out_len, args.interpret))

    def chain_pallas(k):
        cp, audio = c_prev0, None
        for _ in range(k):
            audio, cp = run(x, cp)
        return jnp.sum(audio)

    pallas_msps = slope_msps(chain_pallas)

    # ---- raw-uint8 fused kernel: unpack+DDC+FM reading 2 B/sample from HBM
    raw = hostio.device_put_u8(
        rng.integers(0, 256, 2 * block).astype(np.uint8))
    run_u8 = jax.jit(lambda rr, cp: ddc_fm_pallas_u8(
        rr, taps_rev, rot, cp, stride, out_len, args.interpret))

    def chain_u8(k):
        cp, audio = c_prev0, None
        for _ in range(k):
            audio, cp = run_u8(raw, cp)
        return jnp.sum(audio)

    u8_msps = slope_msps(chain_u8)

    # ---- numerics: compiled kernel vs the direct fp64 dot-product reference
    # on a short segment (the alignment contract of tests/test_pallas.py, here
    # in COMPILED mode on the real chip rather than interpret mode)
    from directdemod_tpu.ops.pallas_ddc import TILE
    out_small = 4 * TILE
    k = len(fe.taps_mod)
    xs = np.asarray(rng.standard_normal(out_small * stride + k)
                    + 1j * rng.standard_normal(out_small * stride + k))
    w = np.asarray(fe.taps_mod)[::-1]
    c = np.asarray([np.dot(w, xs[m * stride:m * stride + k])
                    for m in range(out_small)])
    prev = np.concatenate([[1.0 + 0j], c[:-1]])
    ref = np.angle(c * np.conj(prev) * np.asarray(fe.rot))
    run_small = jax.jit(lambda a, c: ddc_fm_pallas(
        a, jnp.asarray(taps_rev), jnp.asarray(rot), c,
        stride, out_small, args.interpret))
    audio_small, _ = run_small(
        hostio.device_put(xs, dtype=jnp.complex64),
        hostio.device_put(np.asarray([1.0 + 0j]), dtype=jnp.complex64))
    maxdiff = float(np.max(np.abs(
        hostio.device_get(audio_small) - ref)))

    print(json.dumps({
        "metric": "pallas_vs_xla_ddc_fm",
        "unit": "Msamples/s/chip",
        "device": dev.device_kind,
        "block": block,
        "timing": "slope between %d- and %d-block chains, download barrier"
                  % (args.k1, args.k2),
        "xla_msamples_per_s": round(xla_msps, 1),
        "pallas_msamples_per_s": round(pallas_msps, 1),
        "pallas_over_xla": round(pallas_msps / xla_msps, 3),
        "pallas_u8_msamples_per_s": round(u8_msps, 1),
        "pallas_u8_over_xla": round(u8_msps / xla_msps, 3),
        "max_abs_audio_diff_vs_fp64": maxdiff,
    }))


if __name__ == "__main__":
    main()
