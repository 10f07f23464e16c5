"""Gaussian product fusion of inverse-depth hypotheses.

Parity surface: /root/reference/src/semi_dense/fusion.rs:3-9.
"""

import jax.numpy as jnp


def fusion(mu1, mu2, var1, var2):
    v = var1 + var2
    mu = (mu1 * var2 + mu2 * var1) / v
    var = (var1 * var2) / v
    return mu, var


def fusion_maps(mu1, mu2, var1, var2):
    """Elementwise over whole maps (fusion_arrays in the reference)."""
    return fusion(mu1, mu2, var1, var2)


def are_statistically_same(inv_depth1, inv_depth2, variance1, variance2,
                           factor=2.0):
    """2-sigma compatibility both ways (stat.rs:5-25)."""
    ds = (inv_depth1 - inv_depth2) ** 2
    fs = factor * factor
    return jnp.logical_and(ds <= fs * variance1, ds <= fs * variance2)
