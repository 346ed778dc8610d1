"""Augmented-Lagrangian constrained optimizer.

Rebuild of ``/root/reference/g3py/libs/lagrange.py``: minimize f(x) subject
to box constraints a <= g_i(x) <= b via quadratic penalties with
multiplier/penalty update rules, an outer loop around
``scipy.optimize.minimize``.  Constraints may be scalar- or vector-valued
(one multiplier per component, matching the reference's general case,
lagrange.py:6-161).  Standalone utility, not referenced by the process
stack (same status as in the reference).
"""

import numpy as np
import scipy.optimize as sp_optimize

__all__ = ["LagrangianConstraint", "LagrangianMultiplier"]


class LagrangianConstraint:
    """One inequality band a <= g(x) <= b with per-component multiplier
    state (reference lagrange.py:6-161).  ``g`` may return a scalar or a
    vector; ``lower``/``upper`` broadcast against its output."""

    def __init__(self, g, lower=None, upper=None, mu=1.0, lam=0.0):
        self.g = g
        self.lower = None if lower is None else np.asarray(lower, np.float64)
        self.upper = None if upper is None else np.asarray(upper, np.float64)
        self.mu = float(mu)      # penalty weight
        self._lam0 = float(lam)
        self.lam_lower = None    # sized on first evaluation
        self.lam_upper = None

    def _eval(self, x):
        v = np.asarray(self.g(x), dtype=np.float64).ravel()
        if self.lam_lower is None:
            self.lam_lower = np.full_like(v, self._lam0)
            self.lam_upper = np.full_like(v, self._lam0)
        return v

    def violation(self, x):
        v = self._eval(x)
        viol = np.zeros_like(v)
        if self.lower is not None:
            viol = np.maximum(viol, self.lower - v)
        if self.upper is not None:
            viol = np.maximum(viol, v - self.upper)
        return float(viol.max()) if viol.size else 0.0

    def penalty(self, x):
        """Augmented-Lagrangian penalty term for this constraint."""
        v = self._eval(x)
        total = 0.0
        if self.lower is not None:
            d = self.lower - v  # positive when violated
            term = np.maximum(0.0, self.lam_lower + self.mu * d)
            total += float(np.sum(term**2 - self.lam_lower**2)) / (2 * self.mu)
        if self.upper is not None:
            d = v - self.upper
            term = np.maximum(0.0, self.lam_upper + self.mu * d)
            total += float(np.sum(term**2 - self.lam_upper**2)) / (2 * self.mu)
        return total

    def update(self, x, grow=10.0, tol_improve=0.25, last_violation=None):
        """Multiplier update + penalty growth when progress stalls
        (reference lagrange.py:96-161)."""
        v = self._eval(x)
        if self.lower is not None:
            d = self.lower - v
            self.lam_lower = np.maximum(0.0, self.lam_lower + self.mu * d)
        if self.upper is not None:
            d = v - self.upper
            self.lam_upper = np.maximum(0.0, self.lam_upper + self.mu * d)
        viol = self.violation(x)
        if last_violation is not None and viol > tol_improve * last_violation:
            self.mu *= grow
        return viol


class LagrangianMultiplier:
    """Outer augmented-Lagrangian loop (reference lagrange.py:164-296)."""

    def __init__(self, f, constraints=(), jac=None):
        self.f = f
        self.constraints = list(constraints)
        self.jac = jac

    def lagrangian(self, x):
        total = float(np.asarray(self.f(x)).ravel()[0])
        for c in self.constraints:
            total += c.penalty(x)
        return total

    def minimize(self, x0, outer_iters=20, tol=1e-6, method="L-BFGS-B",
                 bounds=None, disp=False, **kwargs):
        x = np.asarray(x0, dtype=np.float64)
        last_violations = [None] * len(self.constraints)
        result = None
        for it in range(outer_iters):
            result = sp_optimize.minimize(self.lagrangian, x, jac=self.jac,
                                          method=method, bounds=bounds, **kwargs)
            x = result.x
            violations = []
            for i, c in enumerate(self.constraints):
                violations.append(c.update(x, last_violation=last_violations[i]))
            last_violations = violations
            max_v = max(violations) if violations else 0.0
            if disp:
                print(f"outer {it}: f={self.f(x):.6g} max_violation={max_v:.3g}")
            if max_v < tol:
                break
        return result
