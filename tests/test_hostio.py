"""Boundary-transfer shims (utils/hostio): the axon tunnel only moves f32 and
32-bit-word buffers, so complex/int/bool cross the boundary as f32 detours.
On CPU the shims pass through; these tests force the shim path via
monkeypatching `_needs_shim` so the detour math is CI-covered."""
import numpy as np
import jax.numpy as jnp
import pytest

from directdemod_tpu.utils import hostio


@pytest.fixture
def shimmed(monkeypatch):
    monkeypatch.setattr(hostio, "_needs_shim", lambda: True)


def test_device_put_complex_shim(shimmed, rng):
    x = (rng.standard_normal(513) + 1j * rng.standard_normal(513)).astype(np.complex64)
    d = hostio.device_put(x, dtype=jnp.complex64)
    assert np.array_equal(np.asarray(d), x)


def test_device_put_u8_shim(shimmed, rng):
    for n in (4000, 4001, 4002, 4003):       # all pad residues
        raw = rng.integers(0, 256, n, dtype=np.uint8)
        d = hostio.device_put_u8(raw)
        assert d.dtype == jnp.uint8 and np.array_equal(np.asarray(d), raw)


def test_device_get_complex_shim(shimmed, rng):
    x = (rng.standard_normal(257) + 1j * rng.standard_normal(257)).astype(np.complex64)
    out = hostio.device_get(jnp.asarray(x))
    assert out.dtype == np.complex64 and np.array_equal(out, x)


def test_device_get_int_shim_exact(shimmed, rng):
    """The (hi, lo) float32 split must be bit-exact for any int32, including
    negatives and the extremes (sync sample indices are int32)."""
    vals = np.concatenate([
        rng.integers(-2**31, 2**31 - 1, 4096),
        [0, 1, -1, 4095, 4096, -4096, 2**31 - 1, -2**31, 2**24, -2**24]],
    ).astype(np.int32)
    out = hostio.device_get(jnp.asarray(vals))
    assert out.dtype == np.int32 and np.array_equal(out, vals)


def test_device_get_bool_shim(shimmed, rng):
    m = rng.random(1000) > 0.5
    out = hostio.device_get(jnp.asarray(m))
    assert out.dtype == np.bool_ and np.array_equal(out, m)


def test_device_get_float_passthrough(shimmed, rng):
    x = rng.standard_normal(100).astype(np.float32)
    assert np.array_equal(hostio.device_get(jnp.asarray(x)), x)


def test_device_put_complex_2d_shim(shimmed, rng):
    """The planar upload must preserve arbitrary shapes (the accurate-sync
    window batches are 2-D)."""
    x = (rng.standard_normal((7, 129))
         + 1j * rng.standard_normal((7, 129))).astype(np.complex64)
    d = hostio.device_put(x, dtype=jnp.complex64)
    assert d.shape == x.shape and np.array_equal(np.asarray(d), x)


def test_device_put_complex128_coerces(shimmed, rng):
    x = (rng.standard_normal(64) + 1j * rng.standard_normal(64))
    d = hostio.device_put(x, dtype=jnp.complex64)
    assert np.allclose(np.asarray(d), x.astype(np.complex64))


def test_device_put_complex_sharded(shimmed, rng):
    """Plane-wise upload with a mesh sharding: both planes carry the spec and
    the combined complex array lands with the requested sharding."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from directdemod_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(time=len(jax.devices()))
    x = (rng.standard_normal((8, 32))
         + 1j * rng.standard_normal((8, 32))).astype(np.complex64)
    sh = NamedSharding(mesh, P("time", None))
    d = hostio.device_put(x, dtype=jnp.complex64, sharding=sh)
    assert np.array_equal(np.asarray(d), x)
    assert d.sharding.is_equivalent_to(sh, x.ndim)


def test_global_get_single_process_passthrough():
    """global_get == device_get for fully-addressable arrays (the
    multi-process allgather path is exercised by test_distributed)."""
    import jax.numpy as jnp
    from directdemod_tpu.utils import hostio
    x = jnp.arange(8, dtype=jnp.float32)
    np.testing.assert_array_equal(hostio.global_get(x), np.arange(8.0))
    a = np.arange(4.0)
    assert hostio.global_get(a) is a


def test_device_put_u8_chunked_conversion(monkeypatch):
    """Large buffers convert u32->u8 in chunks (the single-dispatch bitcast's
    (N,4) intermediate is 32x padded on TPU; a 1.23GB capture OOMed 16GB of
    HBM before chunking). Forced-shim path, odd length."""
    from directdemod_tpu.utils import hostio
    monkeypatch.setattr(hostio, "_needs_shim", lambda: True)
    monkeypatch.setattr(hostio, "_U8_CONVERT_CHUNK", 1 << 20)
    raw = np.arange(3_000_005, dtype=np.int64).astype(np.uint8)
    got = np.asarray(hostio.device_put_u8(raw))
    np.testing.assert_array_equal(got, raw)
