"""FM demodulation.

Behavioral reference: `demod_fm.demod` (ref demod_fm.py:29-51, polar
discriminator ``angle(s[n] * conj(s[n-1]))`` with the last sample carried
across blocks so chunked == unchunked) and `demod_fmAD` (ref demod_fm.py:74-96,
``diff(unwrap(angle(s)))``).

The unwrap+diff composition is computed in closed form (wrap each first
difference into (-pi, pi] with numpy's boundary convention), avoiding the
sequential unwrap scan entirely.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def quad_demod(x: jnp.ndarray, last: jnp.ndarray | None
               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Polar discriminator. `last` is the previous block's final sample, or
    None on the first block (output is then one sample shorter, matching
    ref demod_fm.py:43-45)."""
    prod = x[1:] * jnp.conj(x[:-1])
    if last is not None:
        first = (x[:1] * jnp.conj(last)).reshape(1)
        prod = jnp.concatenate([first, prod])
    return jnp.angle(prod), x[-1:]


def _wrapped_diff(d: jnp.ndarray) -> jnp.ndarray:
    """diff-of-unwrapped == wrap(diff) with np.unwrap's tie rule: a jump of
    exactly -pi with positive raw diff maps to +pi."""
    two_pi = 2.0 * np.pi
    w = jnp.mod(d + np.pi, two_pi) - np.pi
    return jnp.where((w == -np.pi) & (d > 0), np.pi, w)


def angle_diff_demod(x: jnp.ndarray, last_angle: jnp.ndarray | None
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Angle-differentiation FM demod (ref demod_fm.py:85-94)."""
    ang = jnp.angle(x)
    d = jnp.diff(ang)
    if last_angle is not None:
        d = jnp.concatenate([(ang[:1] - last_angle).reshape(1), d])
    return _wrapped_diff(d), ang[-1:]
