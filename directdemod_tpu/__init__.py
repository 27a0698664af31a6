"""directdemod-tpu: TPU-native software-radio framework.

See README.md for the architecture map. The compute path is JAX/XLA; the
behavioral reference is aerospaceresearch/DirectDemod.
"""
import os as _os

# Persistent XLA compilation cache: remote TPU compile (the axon tunnel) can
# take minutes per kernel under load; caching makes reruns instant. Opt out
# with JAX_COMPILATION_CACHE_DIR="". The env var alone is NOT honored by this
# jax version (the cache stays "disabled/not initialized"), so set the config
# explicitly.
if _os.environ.get("JAX_COMPILATION_CACHE_DIR") != "":
    _cache = _os.environ.get("JAX_COMPILATION_CACHE_DIR") or _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "..", ".jax_cache")
    try:
        _os.makedirs(_cache, exist_ok=True)
        _os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache
        import jax as _jax
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, Exception):
        pass

__version__ = "1.0.0"
