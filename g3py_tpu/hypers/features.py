"""Deep kernel learning: a trainable MLP feature extractor composed with
any base kernel from the zoo (Wilson, Hu, Salakhutdinov & Xing, AISTATS
2016).  Not present in the reference (its only neural construct is the
arcsine ``NN`` kernel, /root/reference/g3py/processes/hypers/kernels.py:
340-360); included because a TPU-native framework should put the MXU to
work on the representation too — the feature matmuls batch over all N
rows at once and fuse into the gram build.

Design notes (TPU-first):

* the extractor is a plain tanh/relu MLP whose weight matrices are
  ordinary array-valued hypers (``Param`` with ``shape=(d_i, d_{i+1})``,
  flat priors), so ``find_MAP`` / ``sample_hypers`` / ``fit_svgp`` train
  them jointly with the kernel hypers through the one flat
  unconstrained vector — no second optimizer, no separate framework;
* ``cov(params, x1, x2)`` pushes both row sets through the extractor and
  delegates to the base kernel in feature space, so every downstream
  consumer (exact GP, SGPR/SVGP inducing algebra, predictors, pathwise
  sampling via the base kernel's RFF) works unchanged;
* deterministic LeCun-style weight init in ``default_hypers`` (fixed
  seed), then the base kernel's own data-driven defaults are computed
  *on the initial features*, so lengthscales start calibrated to the
  feature spread instead of the raw inputs.
"""

import numpy as np
import jax.numpy as jnp

from . import Flat, Hypers, hval, is_param, slice_dims
from ..config import settings
from .kernels import Kernel, SE

__all__ = ["DeepKernel"]

_ACTIVATIONS = {
    "tanh": jnp.tanh,
    "relu": lambda h: jnp.maximum(h, 0.0),
    "softplus": lambda h: jnp.logaddexp(h, 0.0),
    "elu": lambda h: jnp.where(h > 0.0, h, jnp.expm1(h)),
}


class DeepKernel(Kernel):
    """``k(x, x') = base(phi_w(x), phi_w(x'))`` with ``phi_w`` a trainable
    MLP (deep kernel learning).

    Parameters
    ----------
    base : Kernel class or instance
        Kernel applied in feature space.  A class (e.g. ``g3.SE``) is
        instantiated over the feature width; an instance has its dims
        re-checked against the feature width.
    x : array / int / dims spec, optional
        Input spec, exactly as for any kernel (sets the active input
        columns the extractor sees).
    widths : tuple of int
        Layer output widths; the last entry is the feature dimension.
        Hidden layers get ``activation``; the output layer is linear.
    activation : str
        One of ``tanh`` (default), ``relu``, ``softplus``, ``elu``.
    """

    def __init__(self, base=SE, x=None, widths=(32, 32, 2),
                 activation="tanh", name=None):
        if activation not in _ACTIVATIONS:
            raise ValueError(
                f"activation {activation!r} not in {sorted(_ACTIVATIONS)}")
        self.widths = tuple(int(w) for w in widths)
        if not self.widths:
            raise ValueError("widths must name at least the feature dim")
        self.activation = activation
        self.act = _ACTIVATIONS[activation]
        if isinstance(base, type):
            base = base(self.widths[-1])
        self.base = base
        self.w = None
        self.b = None
        # Kernel.__init__ would build a metric; the extractor replaces it.
        self.metric = None
        self.var = None
        Hypers.__init__(self, x, name)

    # -- dims / hypers --------------------------------------------------------
    def _d_in(self):
        if isinstance(self.dims, np.ndarray):
            return int(self.dims.size)
        if isinstance(self.shape, tuple):
            return int(np.prod(self.shape))
        if self.shape is None:
            raise ValueError(
                "DeepKernel needs an input spec before check_hypers: pass "
                "x at construction or let the model call check_dims first")
        return int(self.shape)

    def check_dims(self, x=None):
        Hypers.check_dims(self, x)
        self.base.check_dims(int(self.widths[-1]))

    def check_hypers(self, parent=""):
        if self.w is None:
            sizes = (self._d_in(),) + self.widths
            self.w = [
                self._param(None, f"{parent}{self.name}_w{i}", Flat(),
                            shape=(sizes[i], sizes[i + 1]))
                for i in range(len(self.widths))
            ]
            self.b = [
                self._param(None, f"{parent}{self.name}_b{i}", Flat(),
                            shape=(sizes[i + 1],))
                for i in range(len(self.widths))
            ]
        self.base.check_hypers(parent + self.name + "_")
        self.hypers += self.base.hypers

    # -- defaults -------------------------------------------------------------
    def _init_weights(self, d_in):
        """Deterministic LeCun-normal init (seeded so defaults reproduce)."""
        rng = np.random.default_rng(20160216)  # Wilson et al. submission id
        sizes = (d_in,) + self.widths
        ws = [
            (rng.standard_normal((sizes[i], sizes[i + 1]))
             / np.sqrt(sizes[i])).astype(settings.floatx)
            for i in range(len(self.widths))
        ]
        bs = [np.zeros((sizes[i + 1],), settings.floatx)
              for i in range(len(self.widths))]
        return ws, bs

    def _np_features(self, ws, bs, x):
        h = np.asarray(x, dtype=settings.floatx)
        if h.ndim == 1:
            h = h[:, None]
        for i, (w, b) in enumerate(zip(ws, bs)):
            h = h @ w + b
            if i < len(ws) - 1:
                h = np.asarray(
                    self.act(jnp.asarray(h)), dtype=settings.floatx)
        return h

    def default_hypers_dims(self, x=None, y=None):
        # Kernel's override walks (var, metric) which the extractor
        # replaces; restore the generic slice-then-default walk.
        return Hypers.default_hypers_dims(self, x, y)

    def default_hypers(self, x=None, y=None):
        """x arrives already sliced to this kernel's active dims (the
        ``default_hypers_dims`` contract, hypers/__init__.py)."""
        out = {}
        x = np.asarray(x, dtype=settings.floatx)
        if x.ndim == 1:
            x = x[:, None]
        ws, bs = self._init_weights(x.shape[1])
        if self.w is not None and is_param(self.w[0]):
            for p, v in zip(self.w, ws):
                out[p] = v
            for p, v in zip(self.b, bs):
                out[p] = v
        feats = self._np_features(ws, bs, x)
        out.update(self.base.default_hypers_dims(feats, y))
        return out

    # -- forward --------------------------------------------------------------
    def features(self, params, x):
        """phi_w(x): (n, d_in-sliced) -> (n, widths[-1])."""
        h = slice_dims(jnp.asarray(x, settings.dtype), self.dims)
        last = len(self.w) - 1
        for i, (wp, bp) in enumerate(zip(self.w, self.b)):
            h = jnp.matmul(h, hval(wp, params),
                           precision=settings.matmul_precision)
            h = h + hval(bp, params)
            if i < last:
                h = self.act(h)
        return h

    def cov(self, params, x1, x2=None):
        f1 = self.features(params, x1)
        f2 = None if x2 is None else self.features(params, x2)
        return self.base.cov(params, f1, f2)

    def input_sensitivity(self, params):
        """Back-propagate the base kernel's feature sensitivities through
        the absolute weights: s_in = |W_1| ... |W_L| s_feat."""
        s = jnp.asarray(self.base.input_sensitivity(params),
                        settings.dtype) * jnp.ones((self.widths[-1],),
                                                   settings.dtype)
        for wp in reversed(self.w):
            s = jnp.matmul(jnp.abs(hval(wp, params)), s,
                           precision=settings.matmul_precision)
        return s

    def has_potential(self):
        return (getattr(self, "potential", None) is not None
                or self.base.has_potential())

    def potential_logp(self, params):
        own = Hypers.potential_logp(self, params)
        inner = self.base.potential_logp(params)
        if own is None:
            return inner
        if inner is None:
            return own
        return own + inner

    def __str__(self):
        return (f"DeepKernel[{self.widths}:{self.activation} -> "
                f"{self.base}]")

    __repr__ = __str__
