"""Iteratively reweighted least squares with Huber weights.

Parity surface: /root/reference/tadataka/irls.py (vendored-statsmodels IRLS:
MAD scale, HuberT psi/weights, reweighted lstsq loop).  Fixed iteration count
under ``lax.fori_loop``; the normal-equation solve replaces lstsq.
"""

from functools import partial

import jax
import jax.numpy as jnp

HUBER_T = 1.345
MAD_SCALE = 0.6745  # statsmodels normalizes MAD by this


def _median(x):
    return jnp.median(x)


def mad_scale(r):
    return _median(jnp.abs(r - _median(r))) / MAD_SCALE


def huber_weights(z, t=HUBER_T):
    az = jnp.abs(z)
    return jnp.where(az <= t, 1.0, t / jnp.maximum(az, 1e-12))


def _wlstsq(X, y, w):
    Xw = X * w[:, None]
    A = Xw.T @ X
    b = Xw.T @ y
    d = X.shape[1]
    return jnp.linalg.solve(A + 1e-10 * jnp.eye(d, dtype=X.dtype), b)


@partial(jax.jit, static_argnames=("max_iter",))
def irls_fit(X, y, max_iter=30):
    """Robust linear regression y ~ X @ params."""
    params = _wlstsq(X, y, jnp.ones_like(y))

    def body(_, params):
        r = y - X @ params
        scale = mad_scale(r)
        safe = jnp.maximum(scale, 1e-12)
        w = huber_weights(r / safe)
        w = jnp.where(scale <= 0.0, jnp.ones_like(w), w)
        return _wlstsq(X, y, w)

    return jax.lax.fori_loop(0, max_iter, body, params)
