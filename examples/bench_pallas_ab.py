#!/usr/bin/env python3
"""A/B the Pallas fused DDC+FM kernel against the XLA polyphase lowering on
real TPU hardware: same device, same 20M-sample block, numerics + throughput.

    python examples/bench_pallas_ab.py [--block N] [--iters K]

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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode kernel (CPU smoke test only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from directdemod_tpu.models.frontend import DdcFm
    from directdemod_tpu.ops import design
    from directdemod_tpu.ops.pallas_ddc import ddc_fm_pallas, ddc_fm_pallas_u8

    dev = jax.devices()[0]
    fs, off, bw = 2048000, 30000, 60000
    fe = DdcFm(fs, off, design.blackmanharris(151), bw, fm=True)
    rng = np.random.default_rng(0)
    from directdemod_tpu.utils import hostio as _hostio
    block = args.block
    x = _hostio.device_put((rng.standard_normal(block)
                            + 1j * rng.standard_normal(block))
                           .astype(np.complex64))

    # ---- XLA polyphase path (the production lowering)
    state = fe.init_state(jnp.complex64)
    start = 0
    for _ in range(3):
        y_xla, state = fe.process_block(x, state, start)
        start += block
    y_xla.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        y_xla, state = fe.process_block(x, state, start)
        start += block
    y_xla.block_until_ready()
    xla_msps = block * args.iters / (time.perf_counter() - t0) / 1e6

    # ---- Pallas kernel on the identical segment/taps/rotation
    # taps/rot stay HOST numpy: jit bakes closed-over numpy values into the
    # executable without a transfer, whereas a closed-over *device* complex
    # array must be downloaded at trace time (UNIMPLEMENTED over the tunnel)
    from directdemod_tpu.utils import hostio
    stride = fe.stride
    out_len = block // stride
    taps_rev = np.asarray(fe.taps_mod[::-1], dtype=np.complex64)
    rot = np.complex64(fe.rot)
    c_prev = hostio.zeros(1, jnp.complex64)

    run = jax.jit(lambda xx, cp: ddc_fm_pallas(
        xx, taps_rev, rot, cp, stride, out_len, args.interpret))
    audio_p, c_last = run(x, c_prev)
    audio_p.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        audio_p, c_last = run(x, c_last)
    audio_p.block_until_ready()
    pallas_msps = block * args.iters / (time.perf_counter() - t0) / 1e6

    # ---- raw-uint8 fused kernel: unpack+DDC+FM reading 2 B/sample from HBM
    raw = jnp.asarray(rng.integers(0, 256, 2 * block).astype(np.uint8))
    run_u8 = jax.jit(lambda rr, cp: ddc_fm_pallas_u8(
        rr, taps_rev, rot, cp, stride, out_len, args.interpret))
    audio_u, c_u = run_u8(raw, c_prev)
    audio_u.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        audio_u, c_u = run_u8(raw, c_u)
    audio_u.block_until_ready()
    u8_msps = block * args.iters / (time.perf_counter() - t0) / 1e6

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
    maxdiff = float(np.max(np.abs(np.asarray(audio_small) - ref)))

    print(json.dumps({
        "metric": "pallas_vs_xla_ddc_fm",
        "unit": "Msamples/s/chip",
        "device": dev.device_kind,
        "block": block,
        "xla_msamples_per_s": round(xla_msps, 1),
        "pallas_msamples_per_s": round(pallas_msps, 1),
        "pallas_over_xla": round(pallas_msps / xla_msps, 3),
        "pallas_u8_msamples_per_s": round(u8_msps, 1),
        "pallas_u8_over_xla": round(u8_msps / xla_msps, 3),
        "max_abs_audio_diff_steady": maxdiff,
    }))


if __name__ == "__main__":
    main()
