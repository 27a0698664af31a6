"""Sharded sync correlation: normalized cross-correlation over a time-sharded
stream with needle halos, and a distributed adaptive threshold.

This parallelizes the NOAA sync search (ref decode_noaa.py:659-767) across the
mesh `time` axis: each shard owns a contiguous span of the envelope, exchanges
half-needle halos with both neighbors over ICI (`ppermute`), computes the
normalized correlation locally, and contributes its top-k candidates to a
global `all_gather` for the adaptive peak threshold -- the collective pattern
SURVEY §5.8 prescribes (halos for convolution, all_gather for sync lists).
"""
from __future__ import annotations

import logging
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import correlate as corr_ops
from ..utils import hostio

log = logging.getLogger(__name__)


@partial(jax.jit, static_argnums=(0, 3))
def _sharded_corr(mesh, x_sharded, needle, k_top: int):
    ndev = mesh.shape["time"]
    k = needle.shape[0]
    halo = k // 2 + 1

    def body(local, nd):
        loc = local.reshape(-1)
        n = loc.shape[0]
        left_out = loc[:halo]
        right_out = loc[-halo:]
        fwd = [(i, (i + 1) % ndev) for i in range(ndev)]
        bwd = [(i, (i - 1) % ndev) for i in range(ndev)]
        from_left = lax.ppermute(right_out, "time", fwd)   # left nbr's tail
        from_right = lax.ppermute(left_out, "time", bwd)   # right nbr's head
        pos = lax.axis_index("time")
        zeros = jnp.zeros_like(from_left)
        lpad = jnp.where(pos == 0, zeros, from_left)
        rpad = jnp.where(pos == ndev - 1, jnp.zeros_like(from_right), from_right)
        ext = jnp.concatenate([lpad, loc, rpad])
        cor_ext = corr_ops.norm_correlate(ext, nd)
        cor = cor_ext[halo:halo + n]
        # global adaptive threshold: per-shard top/bottom k, gathered
        top = lax.all_gather(lax.top_k(cor, k_top)[0], "time", tiled=True)
        bot = lax.all_gather(-lax.top_k(-cor, k_top)[0], "time", tiled=True)
        g_top = lax.top_k(top, k_top)[0]
        g_bot = -lax.top_k(-bot, k_top)[0]
        return cor, g_top[None], g_bot[None]

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("time"), P(None)),
        out_specs=(P("time"), P("time"), P("time")),
        check_vma=False)(x_sharded, needle)


def sharded_find_sync_peaks(mesh, x: np.ndarray, needle: np.ndarray,
                            samp_rate: float, wiggle: float,
                            min_dist_s: float) -> np.ndarray:
    """Drop-in sharded version of ops/peaks.find_sync_peaks over `mesh`'s
    `time` axis. Pads the signal to the device count; returns global sync
    start indices."""
    from ..ops import peaks as peaks_ops

    ndev = mesh.shape["time"]
    n = len(x)
    per = -(-n // ndev)
    xp = np.pad(np.asarray(x, np.float32), (0, per * ndev - n))
    xs = jax.device_put(xp, NamedSharding(mesh, P("time")))
    k_top = int(2 * (n / samp_rate)) + 2
    cor_sh, g_top, g_bot = _sharded_corr(
        mesh, xs, jnp.asarray(needle, jnp.float32), k_top)
    # threshold from the globally-gathered extremes (same formula as
    # ops/peaks.adaptive_threshold)
    g_top = hostio.global_get(g_top)[0]
    g_bot = hostio.global_get(g_bot)[0]
    avg_top = float(np.sum(g_top) / k_top)
    avg_bot = float(np.sum(g_bot) / k_top)
    thr = avg_top - wiggle * (avg_top - avg_bot)
    cor = hostio.global_get(cor_sh).reshape(-1)[:n]
    idx = np.flatnonzero(cor > thr)
    if len(idx) > peaks_ops.CANDIDATE_CAP:
        # same bound (and warning) as the sequential ops/peaks path, so the
        # two paths behave identically on threshold-collapse captures
        log.warning(
            "sync candidate cap bound: %d above-threshold samples, keeping "
            "the first %d — threshold likely collapsed (noise-only capture?)",
            len(idx), peaks_ops.CANDIDATE_CAP)
        idx = idx[:peaks_ops.CANDIDATE_CAP]
    if len(idx) == 0:
        return np.empty(0, dtype=np.int64)
    grouped = peaks_ops.group_peaks(idx, cor[idx], min_dist_s * samp_rate)
    return np.sort(grouped - len(needle) // 2)
