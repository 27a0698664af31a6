#!/usr/bin/env python3
"""Multi-host scaling evidence without a pod: run the PRODUCTION sharded
program on a virtual device mesh (correctness + per-stage wall times), and
evaluate the analytic communication/compute model of docs/scaling.md at the
round-5 measured single-chip rates — the artifact a real pod run would
validate against.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/bench_multihost.py [--devices 8]

Emits one JSON object (recorded as SCALING_MODEL_r05.json):
  * the comm-bytes table of every cross-shard exchange in the production
    decode (halo ppermutes, threshold all_gathers, IIR state correction),
    derived from the program constants, not estimated;
  * predicted parallel efficiency vs device count for single-host ICI and
    for the 2-host case where one halo hop per wave crosses DCN
    (BASELINE.md target: >=80 % at 2 hosts);
  * the virtual-mesh dryrun result (stage wall times are CPU-emulation
    numbers — the model uses the measured TPU rates instead).
"""
import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# round-5 measured single-chip rates (committed artifacts)
R_FRONTEND = 39.3e9        # samp/s, gemm_u8 device-resident (BENCH_r05)
R_FE_SYNC = 560e6          # samp/s, fused frontend+sync capture rate
                           # (BENCH_NOAA_LONG r05 5-min run)
SYM_SCAN_US = 11.0         # us per sequential PLL symbol step (BENCH_PLL;
                           # 60 s capture: 7.8 s / 720k symbols)

FS = 2048000
TAPS = 151


def comm_table(chunk: int):
    """Cross-shard traffic per wave of the production decode, from the
    program constants (parallel/sharded.py, parallel/correlate.py,
    parallel/iir.py)."""
    from directdemod_tpu.ops import resample as rs
    j, _ = rs.decim_params(FS, 60000)
    halo = TAPS - 1 + j
    crude_rate = int(FS / j)
    needle_len = int(crude_rate * (1.0 / 4160) * 40 * 2)   # A+B needles
    dur_s = chunk / FS
    topk = int(2 * dur_s) + 2
    return {
        "frontend_halo_ppermute_bytes": halo * 8,
        "sync_needle_halo_bytes": needle_len * 4,
        "sync_threshold_allgather_bytes_per_shard": topk * 4 * 2,
        "iir_state_allgather_bytes_per_shard": 3 * 2 * 8,
        "pll_segment_comm_bytes": 0,
        "chunk_samples": chunk,
        "note": ("per WAVE of T chunks; ppermutes are neighbor-pairwise "
                 "(at most ONE pair crosses a host boundary on DCN), "
                 "all_gathers are KB-scale"),
    }


def efficiency(n_dev: int, chunk: int, two_host: bool,
               ici_lat_s: float, ici_bw: float,
               dcn_lat_s: float, dcn_bw: float) -> dict:
    """Predicted parallel efficiency of the sequence-parallel front end +
    sync stage: E = t_compute / (t_compute + t_comm), with the compute at
    the measured fused frontend+sync capture rate (the conservative,
    whole-stage number) and comm = the per-wave halo exchange. The PLL
    segment axis has NO comm; its efficiency is the warmup-halo overlap."""
    ct = comm_table(chunk)
    t_c = chunk / R_FE_SYNC
    halo_b = (ct["frontend_halo_ppermute_bytes"]
              + ct["sync_needle_halo_bytes"])
    t_ici = ici_lat_s + halo_b / ici_bw
    t_dcn = dcn_lat_s + halo_b / dcn_bw
    # collectives: all shards' hops overlap; the slowest link gates the wave
    t_comm = t_dcn if two_host else t_ici
    e_fe = t_c / (t_c + t_comm)
    # PLL segment axis: overlap = warmup re-lock halo
    from directdemod_tpu import constants as K
    warm = 2000 * (FS / K.FUNCUBE_SYMRATE)
    e_pll = chunk / (chunk + warm)
    return {
        "n_devices": n_dev,
        "two_host": two_host,
        "chunk_samples": chunk,
        "frontend_sync_efficiency": round(e_fe, 4),
        "pll_segment_efficiency": round(e_pll, 4),
        "wave_compute_s": round(t_c, 6),
        "wave_comm_s": round(t_comm, 7),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=20_000_000)
    ap.add_argument("--ici-gbs", type=float, default=100.0,
                    help="effective per-link ICI bandwidth (v5e spec is "
                         "higher; model is insensitive at KB halos)")
    ap.add_argument("--ici-lat-us", type=float, default=2.0)
    ap.add_argument("--dcn-gbs", type=float, default=25.0)
    ap.add_argument("--dcn-lat-us", type=float, default=50.0)
    ap.add_argument("--skip-dryrun", action="store_true")
    args = ap.parse_args()

    preds = []
    for n in (2, 4, 8, 16):
        preds.append(efficiency(n, args.chunk, False,
                                args.ici_lat_us * 1e-6, args.ici_gbs * 1e9,
                                args.dcn_lat_us * 1e-6, args.dcn_gbs * 1e9))
    two_host = efficiency(8, args.chunk, True,
                          args.ici_lat_us * 1e-6, args.ici_gbs * 1e9,
                          args.dcn_lat_us * 1e-6, args.dcn_gbs * 1e9)
    # sensitivity: how small may the per-device wave chunk get before the
    # 2-host efficiency target is missed?
    lo = None
    for c in (1_000_000, 2_000_000, 4_000_000, 8_000_000, 20_000_000):
        e = efficiency(8, c, True, args.ici_lat_us * 1e-6,
                       args.ici_gbs * 1e9, args.dcn_lat_us * 1e-6,
                       args.dcn_gbs * 1e9)
        if e["frontend_sync_efficiency"] >= 0.8 and lo is None:
            lo = c

    out = {
        "metric": "multihost_scaling_model",
        "model_inputs": {
            "frontend_sync_rate_msamples_per_s": R_FE_SYNC / 1e6,
            "frontend_only_rate_msamples_per_s": R_FRONTEND / 1e6,
            "pll_symbol_step_us": SYM_SCAN_US,
            "ici_gbs": args.ici_gbs, "ici_lat_us": args.ici_lat_us,
            "dcn_gbs": args.dcn_gbs, "dcn_lat_us": args.dcn_lat_us,
        },
        "comm_table": comm_table(args.chunk),
        "predicted": preds,
        "predicted_two_host_8dev": two_host,
        "min_chunk_for_80pct_two_host": lo,
        "baseline_target": ">=80% efficiency at 2 hosts (BASELINE.md)",
    }

    if not args.skip_dryrun:
        import jax
        jax.config.update("jax_platforms", "cpu")
        from directdemod_tpu.parallel.dryrun import dryrun
        info = dryrun(min(args.devices, len(jax.devices())))
        out["virtual_mesh_dryrun"] = {
            "mesh": str(info["mesh"]),
            "frontend_err": float(info["frontend_err"]),
            "stage_seconds_cpu_emulation": info.get("stage_seconds", {}),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
