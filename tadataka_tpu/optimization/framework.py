"""Generic nonlinear least-squares mini-framework.

Parity surface: /root/reference/tadataka/optimization/ — Function /
Residual / Error / Robustifier / GaussNewtonUpdater / Optimizer
abstractions.  The reference differentiates with ``autograd``; here
Jacobians and robustifier gradients come from jax AD, and the optimizer
loop is jit-compatible when the pieces are.

This module is standalone (the VO paths use their dedicated solvers, same
as the reference, SURVEY.md L115).
"""

import jax
import jax.numpy as jnp


class Function:
    def compute(self, x):
        raise NotImplementedError()


class BaseResidual(Function):
    """r(theta) = y - f(theta)."""

    def __init__(self, y, transformer):
        self.y = y
        self.transformer = transformer

    def compute(self, theta):
        return self.y - self.transformer.compute(theta)


class BaseRobustifier:
    def robustify(self, x):
        raise NotImplementedError()

    def grad(self, x):
        return jax.vmap(jax.grad(lambda v: self.robustify(v)))(x)

    def weights(self, x):
        """rho'(x) / x with a zero-safe guard."""
        g = self.grad(x)
        safe = jnp.where(x == 0, 1.0, x)
        return jnp.where(x == 0, 0.0, g / safe)


class SquaredRobustifier(BaseRobustifier):
    def robustify(self, x):
        return x ** 2


class GemanMcClureRobustifier(BaseRobustifier):
    def __init__(self, sigma=0.1):
        self.v = sigma ** 2

    def robustify(self, x):
        u = x ** 2
        return u / (u + self.v)


class SumRobustifiedNormError(Function):
    def __init__(self, robustifier):
        self.robustifier = robustifier

    def compute(self, residuals):
        norms = jnp.linalg.norm(jnp.atleast_2d(residuals), axis=1)
        return jnp.sum(jax.vmap(self.robustifier.robustify)(norms))


class GaussNewtonUpdater:
    """delta = lstsq(J, r) with the Jacobian from jax AD
    (the reference used autograd, updaters.py:7-37)."""

    def __init__(self, residual, robustifier=None):
        self.residual = residual
        self.robustifier = robustifier

    def flattened_residual(self, theta):
        return jnp.ravel(self.residual.compute(theta))

    def jacobian(self, theta):
        return jax.jacfwd(self.flattened_residual)(theta)

    def compute(self, theta):
        r = self.flattened_residual(theta)
        J = self.jacobian(theta).reshape(r.shape[0], theta.shape[0])
        return jnp.linalg.lstsq(J, r)[0]


class Optimizer:
    """Error-decrease descent loop (optimizers.py:21-39), without the
    per-iteration prints."""

    def __init__(self, updater, residual, error):
        self.updater = updater
        self.residual = residual
        self.error = error

    def calc_error(self, theta):
        return self.error.compute(self.residual.compute(theta))

    def optimize(self, initial_theta, max_iter=200):
        theta = initial_theta
        last_error = jnp.inf
        for _ in range(max_iter):
            d = self.updater.compute(theta)
            current_error = self.calc_error(theta)
            if float(current_error) >= float(last_error):
                return theta
            theta = theta - d
            last_error = current_error
        return theta
