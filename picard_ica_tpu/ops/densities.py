"""Density (nonlinearity) plugins for ICA.

TPU-first design: each density is a small frozen dataclass whose
methods are pure ``jnp`` elementwise functions. Because instances are
hashable and compared by value, a density can be passed as a *static*
argument to ``jax.jit`` — dispatch happens at trace time and the
elementwise math fuses freely into surrounding XLA/Pallas kernels.

Behavioral parity with the reference (src/density.rs):
  * Tanh — log-lik ``|y| + log(1 + exp(-2a|y|))/a`` (density.rs:50-56),
    score ``tanh(a*y)``, derivative ``a*(1 - tanh^2)`` (density.rs:58-63).
  * Exp  — log-lik ``-exp(-a*y^2/2)/a`` (density.rs:91-94), score
    ``y*exp(-a*y^2/2)``, derivative ``(1-a*y^2)*exp(-a*y^2/2)``
    (density.rs:96-103).
  * Cube — log-lik ``y^4/4``, score ``y^3``, derivative ``3*y^2``
    (density.rs:122-130).
"""

from __future__ import annotations

import dataclasses
from typing import Protocol, Tuple, runtime_checkable

import jax.numpy as jnp


def _expm1(t):
    """``exp(t) - 1`` usable inside Pallas TPU kernels.

    Mosaic has no lowering for the expm1 primitive, and a plain
    ``exp(t) - 1`` loses all relative accuracy for the tiny |t| the
    line-search delta produces near convergence. For f32, an 8-term
    Horner Taylor below |t| < 0.5 keeps relative error ~1e-8
    (f32-grade); above that threshold the direct form is safe. f64
    (CPU conformance) keeps the exact primitive.
    """
    if t.dtype == jnp.float64:
        return jnp.expm1(t)
    p = t * (1.0 + t * (1.0 / 2 + t * (1.0 / 6 + t * (1.0 / 24 + t * (
        1.0 / 120 + t * (1.0 / 720 + t * (1.0 / 5040 + t * (1.0 / 40320))))))))
    return jnp.where(jnp.abs(t) < 0.5, p, jnp.exp(t) - 1.0)


@runtime_checkable
class Density(Protocol):
    """Protocol for density plugins (reference trait: density.rs:14-22)."""

    def log_lik(self, y):
        """Elementwise log-likelihood, same shape as ``y``."""
        ...

    def score_and_der(self, y) -> Tuple:
        """Return ``(score, score_derivative)``, each shaped like ``y``."""
        ...

    def score_der_loglik(self, y) -> Tuple:
        """Return ``(score, score_derivative, log_lik)`` in one pass.

        Used by the fused hot-loop kernels; implementations share the
        transcendental subexpressions (one exp instead of two for
        tanh/exp densities) — on TPU the VPU transcendentals are a
        significant slice of the per-iteration time at large T.
        """
        ...

    def log_lik_delta(self, y_old, dy):
        """``log_lik(y_old + dy) - log_lik(y_old)`` WITHOUT cancellation.

        Evaluated as an analytic function of (y_old, dy) so the result's
        error is relative to |dy| rather than to |log_lik| — the direct
        subtraction leaves ~eps-of-log_lik noise per element, which is
        what floors the line search's accept test near convergence
        (true per-step decreases fall below it long before tol=1e-7).
        """
        ...


@dataclasses.dataclass(frozen=True)
class Tanh:
    """Hyperbolic-tangent density (default; super-Gaussian sources)."""

    alpha: float = 1.0

    def log_lik(self, y):
        a = self.alpha
        abs_y = jnp.abs(y)
        # Numerically stable form: exp argument is always <= 0.
        return abs_y + jnp.log1p(jnp.exp(-2.0 * a * abs_y)) / a

    def score_and_der(self, y):
        a = self.alpha
        score = jnp.tanh(a * y)
        return score, a * (1.0 - score * score)

    def score_der_loglik(self, y):
        # Share e = exp(-2a|y|) between tanh and log1p:
        #   tanh(a*y) = sign(y) * (1 - e) / (1 + e)
        #   log_lik   = |y| + log1p(e) / a
        a = self.alpha
        abs_y = jnp.abs(y)
        e = jnp.exp(-2.0 * a * abs_y)
        t = (1.0 - e) / (1.0 + e)
        score = jnp.sign(y) * t
        return score, a * (1.0 - t * t), abs_y + jnp.log1p(e) / a

    def log_lik_delta(self, y_old, dy):
        # With d_abs = |y_old + dy| - |y_old| (computed exactly as
        # sign(y_old) * dy when no sign crossing; directly — both
        # operands tiny — when there is one):
        #   ll(a) - ll(b) = d_abs + [log1p(e_a) - log1p(e_b)] / alpha
        # and log1p(e_a) - log1p(e_b) = log1p(e_b*expm1(-2a*d_abs)/(1+e_b)).
        a = self.alpha
        y_new = y_old + dy
        abs_old = jnp.abs(y_old)
        crossing = jnp.abs(y_old) <= jnp.abs(dy)
        d_abs = jnp.where(crossing, jnp.abs(y_new) - abs_old,
                          jnp.sign(y_old) * dy)
        e_b = jnp.exp(-2.0 * a * abs_old)
        num = e_b * _expm1(-2.0 * a * d_abs)
        return d_abs + jnp.log1p(num / (1.0 + e_b)) / a


@dataclasses.dataclass(frozen=True)
class Exp:
    """Gaussian-kernel ("exp") density for heavy-tailed sources."""

    alpha: float = 1.0

    def log_lik(self, y):
        a = self.alpha
        return -jnp.exp(-a * y * y / 2.0) / a

    def score_and_der(self, y):
        a = self.alpha
        y_sq = y * y
        k = jnp.exp(-a / 2.0 * y_sq)
        return y * k, (1.0 - a * y_sq) * k

    def score_der_loglik(self, y):
        a = self.alpha
        y_sq = y * y
        k = jnp.exp(-a / 2.0 * y_sq)  # shared between all three outputs
        return y * k, (1.0 - a * y_sq) * k, -k / a

    def log_lik_delta(self, y_old, dy):
        # ll(a) - ll(b) = [e^{-a b^2/2} - e^{-a a^2/2}] / alpha
        #              = -e^{-a b^2/2} * expm1(-a*(2 y_old + dy)*dy/2) / alpha
        # using a^2 - b^2 = (2 y_old + dy) * dy (no cancellation).
        a = self.alpha
        k_b = jnp.exp(-a / 2.0 * y_old * y_old)
        return -k_b * _expm1(-a / 2.0 * (2.0 * y_old + dy) * dy) / a


@dataclasses.dataclass(frozen=True)
class Cube:
    """Cubic density for sub-Gaussian (e.g. uniform) sources."""

    def log_lik(self, y):
        y2 = y * y
        return y2 * y2 / 4.0

    def score_and_der(self, y):
        return y * y * y, 3.0 * y * y

    def score_der_loglik(self, y):
        y2 = y * y
        return y2 * y, 3.0 * y2, y2 * y2 / 4.0

    def log_lik_delta(self, y_old, dy):
        # (a^4 - b^4)/4 = (a^2 + b^2)(a + b) dy / 4 — exact factoring.
        y_new = y_old + dy
        return (y_new * y_new + y_old * y_old) * (y_new + y_old) * dy / 4.0


class DensityType:
    """Constructor namespace matching the reference enum's helpers
    (density.rs:152-175). In Python the density *instances* are the
    dispatch mechanism, so this is sugar only."""

    Tanh = Tanh
    Exp = Exp
    Cube = Cube

    @staticmethod
    def tanh() -> Tanh:
        return Tanh()

    @staticmethod
    def tanh_with_alpha(alpha: float) -> Tanh:
        return Tanh(alpha)

    @staticmethod
    def exp() -> Exp:
        return Exp()

    @staticmethod
    def exp_with_alpha(alpha: float) -> Exp:
        return Exp(alpha)

    @staticmethod
    def cube() -> Cube:
        return Cube()


def default_density() -> Tanh:
    """Default density (reference: density.rs:146-150)."""
    return Tanh()
