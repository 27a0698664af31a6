#!/usr/bin/env python3
"""Round-5 kernel shoot-out on real TPU hardware: the round-4 Pallas u8
fused DDC+FM kernel vs the dense-matmul byte-domain lowering
(ops/ddc_conv.BytePlan) in its dot and conv forms at nsplit 1/2/3.

    python examples/bench_kernel_variants.py [--block N]

Timing: slope between short and long chained runs, each ended by a scalar
download barrier (see examples/bench_pallas_ab.py for why block_until_ready
is not a barrier over the axon tunnel).  Prints one JSON line including
bytes/s and the fraction of the v5e HBM ingest roofline.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

HBM_GBPS = 819.0        # v5e HBM bandwidth (public spec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=20_000_000)
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from directdemod_tpu.models.frontend import DdcFm
    from directdemod_tpu.ops import design
    from directdemod_tpu.ops.pallas_ddc import ddc_fm_pallas_u8
    from directdemod_tpu.ops.ddc_conv import byte_plan, ddc_fm_bytes
    from directdemod_tpu.utils import hostio

    dev = jax.devices()[0]
    fs, off, bw = 2048000, 30000, 60000
    fe = DdcFm(fs, off, design.blackmanharris(151), bw, fm=True)
    rng = np.random.default_rng(0)
    block = args.block
    stride = fe.stride
    out_len = block // stride
    taps_rev = np.asarray(fe.taps_mod[::-1], dtype=np.complex128)
    rot = np.complex64(fe.rot)
    c_prev0 = hostio.zeros(1, jnp.complex64)
    raw = hostio.device_put_u8(
        rng.integers(0, 256, 2 * block).astype(np.uint8))

    def slope_msps(chain, k1=args.k1, k2=args.k2):
        def timed(k):
            t0 = time.perf_counter()
            s = chain(k)
            float(hostio.device_get(s))
            return time.perf_counter() - t0
        timed(1)
        t1 = min(timed(k1) for _ in range(2))
        t2 = min(timed(k2) for _ in range(2))
        per_block = max((t2 - t1) / (k2 - k1), 1e-9)
        return block / per_block / 1e6

    results = {}

    # ---- round-4 Pallas u8 kernel (the incumbent)
    run_u8 = jax.jit(lambda rr, cp: ddc_fm_pallas_u8(
        rr, np.asarray(taps_rev, np.complex64), rot, cp, stride, out_len,
        False))

    def chain_u8(k):
        cp, audio = c_prev0, None
        for _ in range(k):
            audio, cp = run_u8(raw, cp)
        return jnp.sum(audio)

    results["pallas_u8"] = slope_msps(chain_u8)

    # ---- dense byte-matmul lowerings
    for mode in ("dot", "conv"):
        for ns in (3, 2, 1):
            plan = byte_plan(taps_rev, stride, nsplit=ns)
            run = jax.jit(lambda rr, cp, p=plan, m=mode: ddc_fm_bytes(
                p, rr, rot, cp, out_len, m))

            def chain(k, run=run):
                cp, audio = c_prev0, None
                for _ in range(k):
                    audio, cp = run(raw, cp)
                return jnp.sum(audio)

            results[f"{mode}_ns{ns}"] = slope_msps(chain)

    # ---- numerics of the winner vs fp64 on a short compiled segment
    plan3 = byte_plan(taps_rev, stride, nsplit=3)
    small = 4096
    seg = np.asarray(rng.integers(0, 256, 2 * ((small - 1) * stride + 151)),
                     dtype=np.uint8)
    ref = plan3.oracle(seg, small)
    prev = np.concatenate([[0j], ref[:-1]])
    aref = np.angle(ref * np.conj(prev) * rot)
    run_small = jax.jit(lambda rr, cp: ddc_fm_bytes(
        plan3, rr, rot, cp, small, "dot"))
    a, _ = run_small(hostio.device_put_u8(seg), c_prev0)
    maxdiff = float(np.max(np.abs(hostio.device_get(a)[1:] - aref[1:])))

    best = max(results, key=results.get)
    out = {
        "metric": "ddc_kernel_variants",
        "unit": "Msamples/s/chip",
        "device": dev.device_kind,
        "block": block,
        "timing": "slope between %d- and %d-block chains, download barrier"
                  % (args.k1, args.k2),
        **{k: round(v, 1) for k, v in results.items()},
        "best": best,
        "best_hbm_ingest_gb_s": round(results[best] * 2 / 1e3, 2),
        "best_pct_of_hbm_roofline": round(
            results[best] * 2 / 1e3 / HBM_GBPS * 100, 2),
        "dot_ns3_max_abs_audio_diff_vs_fp64": maxdiff,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
