"""Augmented-Lagrangian constrained optimizer.

Rebuild of ``/root/reference/g3py/libs/lagrange.py``: minimize f(x) subject
to box constraints a <= g_i(x) <= b via quadratic penalties with
multiplier/penalty update rules, an outer loop around
``scipy.optimize.minimize``.  Standalone utility, not referenced by the
process stack (same status as in the reference).
"""

import numpy as np
import scipy.optimize as sp_optimize

__all__ = ["LagrangianConstraint", "LagrangianMultiplier"]


class LagrangianConstraint:
    """One inequality band a <= g(x) <= b with multiplier state
    (reference lagrange.py:6-161)."""

    def __init__(self, g, lower=None, upper=None, mu=1.0, lam=0.0):
        self.g = g
        self.lower = lower
        self.upper = upper
        self.mu = float(mu)      # penalty weight
        self.lam_lower = float(lam)
        self.lam_upper = float(lam)

    def violation(self, x):
        v = float(np.asarray(self.g(x)).ravel()[0])
        viol = 0.0
        if self.lower is not None:
            viol = max(viol, self.lower - v)
        if self.upper is not None:
            viol = max(viol, v - self.upper)
        return viol

    def penalty(self, x):
        """Augmented-Lagrangian penalty term for this constraint."""
        v = np.asarray(self.g(x)).ravel()[0]
        total = 0.0
        if self.lower is not None:
            d = self.lower - v  # positive when violated
            term = max(0.0, self.lam_lower + self.mu * d)
            total += (term**2 - self.lam_lower**2) / (2 * self.mu)
        if self.upper is not None:
            d = v - self.upper
            term = max(0.0, self.lam_upper + self.mu * d)
            total += (term**2 - self.lam_upper**2) / (2 * self.mu)
        return total

    def update(self, x, grow=10.0, tol_improve=0.25, last_violation=None):
        """Multiplier update + penalty growth when progress stalls
        (reference lagrange.py:96-161)."""
        v = np.asarray(self.g(x)).ravel()[0]
        if self.lower is not None:
            d = self.lower - v
            self.lam_lower = max(0.0, self.lam_lower + self.mu * d)
        if self.upper is not None:
            d = v - self.upper
            self.lam_upper = max(0.0, self.lam_upper + self.mu * d)
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
