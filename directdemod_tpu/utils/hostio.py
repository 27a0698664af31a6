"""Host<->device transfer shims.

The axon TPU tunnel (single-chip dev attach) can only transfer float32 and
32-bit-word buffers; complex64, int32, int8/uint8 and bool transfers raise
UNIMPLEMENTED (measured), and one failed transfer poisons the client session.
On-device *compute* in those dtypes is fine. So every boundary crossing goes
through float32/uint32:

  * complex: interleaved/stacked float32 views, (re)combined in a jitted
    kernel on the device side;
  * uint8: rides as a uint32 view, bitcast back on device;
  * integers: exact (hi, lo) float32 pair with hi = v // 4096, lo = v % 4096
    (both exact in f32 for |v| < 2^36 -- sample indices in a 36 h capture);
  * bool: a 0/1 float32 array.

On CPU (tests) the shims pass straight through. The detour costs one extra
device-side copy, negligible against the transfer itself.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _needs_shim() -> bool:
    return jax.default_backend() == "tpu"


@jax.jit
def _combine_planes(re, im):
    return lax.complex(re, im)


@partial(jax.jit, static_argnums=(0, 1))
def _zeros_jit(shape, dtype):
    return jnp.zeros(shape, dtype)


@partial(jax.jit, static_argnums=(0, 1))
def _ones_jit(shape, dtype):
    return jnp.ones(shape, dtype)


def zeros(shape, dtype):
    """Complex-safe jnp.zeros. An EAGER complex fill ships the complex scalar
    literal host->device, which the tunnel rejects — sometimes raising
    UNIMPLEMENTED directly, sometimes poisoning the session so every later
    transfer fails (measured both ways). Jitting bakes the constant into the
    executable; real dtypes pass straight through."""
    dt = jnp.dtype(dtype)
    if jnp.issubdtype(dt, jnp.complexfloating):
        shape = tuple(shape) if isinstance(shape, (tuple, list)) else (int(shape),)
        return _zeros_jit(shape, dt)
    return jnp.zeros(shape, dt)


def ones(shape, dtype):
    """Complex-safe jnp.ones (see `zeros`)."""
    dt = jnp.dtype(dtype)
    if jnp.issubdtype(dt, jnp.complexfloating):
        shape = tuple(shape) if isinstance(shape, (tuple, list)) else (int(shape),)
        return _ones_jit(shape, dt)
    return jnp.ones(shape, dt)


@jax.jit
def _pack_c64(c):
    return jnp.stack([jnp.real(c), jnp.imag(c)])


def device_put(x: np.ndarray, dtype=None, sharding=None):
    """Boundary-safe jnp.asarray for arrays of any shape (complex or real).

    The complex path uploads two *contiguous* float32 planes (real, imag)
    and combines them in a jitted `lax.complex` on device. An earlier
    formulation uploaded one interleaved f32 view and deinterleaved with a
    stride-2 slice; on the tunnel that poisoned the session — every
    subsequent device->host transfer (even plain float32) then raised
    UNIMPLEMENTED. Plane-wise uploads avoid the strided gather entirely
    (diagnosed by bisection round 3; see STATUS.md)."""
    x = np.asarray(x)
    want = jnp.dtype(dtype) if dtype is not None else x.dtype
    if _needs_shim() and np.issubdtype(want, np.complexfloating):
        xc = x.astype(np.complex64) if x.dtype != np.complex64 else x
        re = np.ascontiguousarray(xc.real)
        im = np.ascontiguousarray(xc.imag)
        if sharding is not None:
            red = jax.device_put(re, sharding)
            imd = jax.device_put(im, sharding)
            return jax.jit(lax.complex, out_shardings=sharding)(red, imd)
        return _combine_planes(jnp.asarray(re), jnp.asarray(im))
    arr = jnp.asarray(x, dtype=dtype)
    return jax.device_put(arr, sharding) if sharding is not None else arr


def _u32_to_u8(words, n: int):
    u8 = lax.bitcast_convert_type(words, jnp.uint8)   # (..., W, 4)
    return u8.reshape(u8.shape[:-2] + (-1,))[..., :n]


# Per-dispatch cap on the u32->u8 bitcast: its (W, 4) u8 intermediate gets
# a (..,128)-tiled layout on TPU, i.e. a 32x padded transient (measured: a
# 1.23 GB capture's conversion tried to allocate 39 GB). Chunking bounds
# the transient to ~2 GB; small buffers keep the single-dispatch path.
_U8_CONVERT_CHUNK = 64 * (1 << 20)


@partial(jax.jit, static_argnums=(2,))
def _u32_to_u8_slice(words, off_w, n_bytes: int):
    # off_w rides TRACED so equal-size chunks share one compiled program
    # (static offsets compiled ~19 fresh programs for a 1.23 GB capture —
    # ADVICE r04); only the chunk size stays static
    return _u32_to_u8(lax.dynamic_slice(words, (off_w,),
                                        (n_bytes // 4,)), n_bytes)


def device_put_u8(raw: np.ndarray, sharding=None):
    """Upload a uint8 byte buffer (last axis = bytes); over the tunnel (which
    rejects 8-bit transfers like it rejects complex64) the bytes ride as a
    uint32 view and are bitcast back on device -- link traffic stays
    1 byte/byte. Buffers beyond _U8_CONVERT_CHUNK convert in chunks."""
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    if not _needs_shim():
        arr = jnp.asarray(raw)
        return jax.device_put(arr, sharding) if sharding is not None else arr
    n = raw.shape[-1]
    pad = (-n) % 4
    if pad:
        raw = np.concatenate([raw, np.zeros(raw.shape[:-1] + (pad,), np.uint8)],
                             axis=-1)
    words = raw.view(np.uint32)
    if sharding is not None:
        wd = jax.device_put(words, sharding)
        return jax.jit(_u32_to_u8, static_argnums=(1,),
                       out_shardings=sharding)(wd, n)
    if raw.ndim == 1 and raw.shape[0] > _U8_CONVERT_CHUNK:
        wd = jnp.asarray(words)
        parts = []
        for off in range(0, raw.shape[0], _U8_CONVERT_CHUNK):
            nb = min(_U8_CONVERT_CHUNK, raw.shape[0] - off)
            parts.append(_u32_to_u8_slice(wd, jnp.int32(off // 4), nb))
        out = jnp.concatenate(parts)
        return out[:n] if out.shape[0] != n else out
    return jax.jit(_u32_to_u8, static_argnums=(1,))(jnp.asarray(words), n)


@jax.jit
def _pack_int(x):
    """Exact (hi, lo) float32 split: v = hi*4096 + lo with lo in [0, 4096).

    Both parts are integers below 2^24 for any int32, so each is exact in
    float32; the pair reassembles any |v| < 2^36 losslessly."""
    hi = jnp.floor_divide(x, 4096).astype(jnp.float32)
    lo = jnp.remainder(x, 4096).astype(jnp.float32)
    return hi, lo


def global_get(y) -> np.ndarray:
    """device_get that also works on cross-process sharded arrays: when the
    current process does not hold every shard (a multi-host mesh), the
    global value is assembled with a process_allgather collective instead
    of np.asarray (which raises on non-addressable arrays). Single-process
    arrays take the plain device_get path untouched."""
    if isinstance(y, np.ndarray):
        return y
    if getattr(y, "is_fully_addressable", True):
        return device_get(y)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(y, tiled=True))


def device_get(y) -> np.ndarray:
    """Boundary-safe np.asarray for device arrays (any shape/dtype).

    The tunnel rejects complex64, integer, and bool DOWNLOADS exactly like it
    rejects those uploads (measured: np.asarray of an int32 device array
    raises UNIMPLEMENTED — the round-2 NOAA-e2e failure mode), so every
    non-float dtype detours through float32 on device."""
    if isinstance(y, np.ndarray):
        return y
    if _needs_shim():
        if jnp.iscomplexobj(y):
            packed = np.asarray(_pack_c64(y))
            return (packed[0] + 1j * packed[1]).astype(np.complex64)
        if jnp.issubdtype(y.dtype, jnp.bool_):
            return np.asarray(y.astype(jnp.float32)) != 0.0
        if jnp.issubdtype(y.dtype, jnp.integer):
            want = np.dtype(y.dtype)
            hi, lo = _pack_int(y)
            out = (np.asarray(hi).astype(np.int64) * 4096
                   + np.asarray(lo).astype(np.int64))
            return out.astype(want)
    return np.asarray(y)
