"""directdemod-tpu: TPU-native software-radio framework.

See README.md for the architecture map. The compute path is JAX/XLA; the
behavioral reference is aerospaceresearch/DirectDemod.
"""
import os as _os

# Persistent XLA compilation cache: remote TPU compile (the axon tunnel) can
# take minutes per kernel under load; caching makes reruns instant. Opt out
# with JAX_COMPILATION_CACHE_DIR="".
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    _cache = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                           "..", ".jax_cache")
    try:
        _os.makedirs(_cache, exist_ok=True)
        _os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache
        _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    except OSError:
        pass

__version__ = "1.0.0"
