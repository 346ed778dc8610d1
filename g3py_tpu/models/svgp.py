"""Non-conjugate sparse variational GP: q(u) as first-class parameters.

No reference counterpart — the reference handles non-Gaussian data only
through deterministic warping (reference gaussian.py:115-174), which can
reshape marginals but cannot express heavy-tailed observation NOISE or
discrete targets.  :class:`SparseVariationalProcess` is the standard
modern answer (Hensman, Matthews & Ghahramani, "Scalable Variational
Gaussian Process Classification", AISTATS 2015), built to this
framework's pure-function design:

The whitened variational posterior q(w) = N(qm, Lq Lq') over the inducing
values u = loc(z) + Luu w is carried in ORDINARY MODEL PARAMETERS (a
:class:`VariationalQ` component registers ``qm`` and ``ql``), and
``loglike`` IS the uncollapsed evidence lower bound

    sum_i E_{q(f_i)}[log p(y_i | f_i)] - KL(q(w) || N(0, I)),

a deterministic function of (hypers, q) — so the ENTIRE existing machinery
works unchanged: ``find_MAP`` maximizes the ELBO jointly over hypers and
q (the variational E and M steps fused into one L-BFGS), ``sample_hypers``
targets the bound-augmented posterior, ``scores``/``Experiment`` compare
ELBOs, and ``predict`` reads q straight out of the params dict.

The likelihood is a :class:`~g3py_tpu.models.likelihoods.Likelihood`
component; its parameters (noise scale, Student-t dof) are hypers too.
With :class:`~g3py_tpu.models.likelihoods.GaussianLik` the trained SVP
reproduces the SGPR collapsed optimum (tested); with
:class:`StudentTLik`/:class:`BernoulliLik` it delivers robust regression
and probit classification at O(n m^2) — capabilities the reference had
no path to at any cost.

Semantics of the moment statistics (``noise`` flag):

* ``location`` / ``kernel_diag``: latent f moments (prior or posterior).
* ``mean``: predictive E[y] (for Bernoulli this is the class
  probability; for symmetric noise it equals the latent mean).
* ``variance``/``std``: latent Var[f] with ``noise=False``, full
  predictive Var[y] with ``noise=True``.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from ..config import settings
from ..hypers import Hypers, Flat, hval
from ..hypers.kernels import KernelNoise
from ..hypers.means import Zero
from ..ops.guards import to_num, to_cov, to_bounded
from ..ops.linalg import safe_cholesky, solve_lower_triangular
from .elliptical import _contains_kernel_noise
from .gaussian import GUARD
from .likelihoods import (LOG2PI, GaussianLik, Likelihood, StudentTLik,
                          BernoulliLik, PoissonLik, OrdinalLik,
                          CategoricalLik, HeteroscedasticLik)
from .sparse import (make_inducing, signal_kernel_diag,
                     _sharded_data_layout, _sharded_draw_factory)
from .stochastic import StochasticProcess, zero32

__all__ = ["VariationalQ", "VariationalQHeads", "SparseVariationalProcess",
           "SVP", "MulticlassSVP", "HeteroscedasticSVP"]


class VariationalQ(Hypers):
    """The whitened variational posterior q(w) = N(qm, Lq Lq') as a
    hyper-bearing component: ``qm`` is the (m,) mean, ``ql`` an (m, m)
    matrix whose strict lower triangle is Lq's and whose diagonal is
    log diag Lq (so the default all-zeros gives q = N(0, I) = the prior
    and KL = 0).  Flat priors: the ELBO's KL term is their regularizer."""

    def __init__(self, m, name=None):
        self.m = int(m)
        self.qm = None
        self.ql = None
        super().__init__(name=name if name is not None else "Q")

    def check_hypers(self, parent=""):
        if self.qm is None:
            self.qm = self._param(None, parent + self.name + "_qm",
                                  prior=Flat(), shape=(self.m,))
        if self.ql is None:
            self.ql = self._param(None, parent + self.name + "_ql",
                                  prior=Flat(), shape=(self.m, self.m))

    def default_hypers(self, x=None, y=None):
        return {self.qm: np.zeros((self.m,), settings.floatx),
                self.ql: np.zeros((self.m, self.m), settings.floatx)}

    def factors(self, params):
        """(qm, Lq) with Lq = tril(ql, -1) + diag(exp(diag(ql)))."""
        qm = jnp.asarray(hval(self.qm, params), settings.dtype)
        ql = jnp.asarray(hval(self.ql, params), settings.dtype)
        lq = jnp.tril(ql, -1) + jnp.diag(jnp.exp(jnp.diagonal(ql)))
        return qm, lq

    def kl(self, params):
        """KL(q(w) || N(0, I)) = (|qm|^2 + |Lq|_F^2 - 2 sum log diag - m)/2."""
        qm, lq = self.factors(params)
        ld = jnp.diagonal(jnp.asarray(hval(self.ql, params), settings.dtype))
        return 0.5 * (jnp.dot(qm, qm) + jnp.sum(lq * lq)
                      - 2.0 * jnp.sum(ld) - self.m)


class VariationalQHeads(VariationalQ):
    """``heads`` independent whitened variational posteriors sharing one
    inducing set: ``qm`` is (heads, m), ``ql`` (heads, m, m), each head's
    Lq built exactly like :class:`VariationalQ` (strict lower triangle +
    exp diagonal; all-zeros default = prior, KL = 0).  Used by
    :class:`MulticlassSVP` for the C per-class latent GPs."""

    def __init__(self, m, heads, name=None):
        self.heads = int(heads)
        super().__init__(m, name=name)

    def check_hypers(self, parent=""):
        if self.qm is None:
            self.qm = self._param(None, parent + self.name + "_qm",
                                  prior=Flat(), shape=(self.heads, self.m))
        if self.ql is None:
            self.ql = self._param(None, parent + self.name + "_ql",
                                  prior=Flat(),
                                  shape=(self.heads, self.m, self.m))

    def default_hypers(self, x=None, y=None):
        return {self.qm: np.zeros((self.heads, self.m), settings.floatx),
                self.ql: np.zeros((self.heads, self.m, self.m),
                                  settings.floatx)}

    def factors(self, params):
        """(qm (heads, m), Lq (heads, m, m))."""
        qm = jnp.asarray(hval(self.qm, params), settings.dtype)
        ql = jnp.asarray(hval(self.ql, params), settings.dtype)
        dg = jnp.diagonal(ql, axis1=-2, axis2=-1)
        lq = jnp.tril(ql, -1) + (jnp.eye(self.m, dtype=settings.dtype)
                                 * jnp.exp(dg)[..., None, :])
        return qm, lq

    def kl(self, params):
        """Sum over heads of KL(q_c(w) || N(0, I))."""
        qm, lq = self.factors(params)
        dg = jnp.diagonal(jnp.asarray(hval(self.ql, params), settings.dtype),
                          axis1=-2, axis2=-1)
        return 0.5 * (jnp.sum(qm * qm) + jnp.sum(lq * lq)
                      - 2.0 * jnp.sum(dg) - self.m * self.heads)


class SparseVariationalProcess(StochasticProcess):
    """Sparse variational GP with an arbitrary elementwise likelihood.

    >>> svp = g3.SVP(space=x, kernel=g3.SE(x),
    ...              likelihood=g3.StudentTLik(), inducing=32)
    >>> svp.observed(x, y)
    >>> params, losses = svp.fit_svgp(batch_size=1024, steps=2000)
    >>> pred = svp.predict(params)     # E[y], latent bands

    Training guidance: ``fit_svgp`` (Adam over hypers AND q — q already
    lives in the param vector) is the recommended trainer; the
    (hypers, q) coupling is badly conditioned for L-BFGS from a cold
    start, so use ``find_MAP`` only to polish an Adam solution (measured:
    Adam 3000 full-batch steps reaches the collapsed optimum to ~3 nats
    in seconds where cold L-BFGS stalls tens of nats short).

    The signal kernel must be noise-free (observation noise lives in the
    likelihood); ``inducing`` follows the sparse family's conventions
    (int -> k-means default, array -> explicit, trainable by default).
    """

    def __init__(self, space=None, location=None, kernel=None,
                 likelihood: Likelihood = None, inducing=32,
                 learn_inducing=True, *args, **kwargs):
        self.f_location = location if location is not None else Zero()
        self.f_kernel = kernel
        self.f_likelihood = (likelihood if likelihood is not None
                             else GaussianLik())
        self.f_inducing = make_inducing(inducing, learn_inducing)
        self.f_q = self._make_q(self.f_inducing.m)
        if kernel is not None and (_contains_kernel_noise(kernel)
                                   or isinstance(kernel, KernelNoise)):
            raise ValueError(
                "SparseVariationalProcess takes a noise-free signal kernel "
                "— observation noise belongs to the likelihood component")
        kwargs["space"] = space
        if "name" not in kwargs:
            kwargs["name"] = "SVP"
        super().__init__(*args, **kwargs)

    def _make_q(self, m):
        """Variational-posterior component factory (subclass hook)."""
        return VariationalQ(m)

    # -- registration ---------------------------------------------------------
    def _components(self):
        return [self.f_location, self.f_kernel, self.f_inducing, self.f_q,
                self.f_likelihood]

    def _check_hypers(self):
        for comp in (self.f_location, self.f_kernel, self.f_inducing):
            comp.check_dims(self.inputs)
        for comp in self._components():
            comp.check_hypers(self.name + "_")

    def default_hypers(self):
        out = {}
        for comp in self._components():
            # dims-aware walk: composite kernels (KernelSum/KernelProd)
            # only merge children via default_hypers_dims
            # (kernels.py:281-285) — calling default_hypers on them
            # raises, and the registry's fallback would silently drop
            # ALL data-driven defaults (k-means inducing points, var(y))
            out.update(comp.default_hypers_dims(self.inputs, self.outputs))
        return out

    def observed(self, inputs=None, outputs=None, order=None, index=None,
                 hidden=None):
        out = super().observed(inputs=inputs, outputs=outputs, order=order,
                               index=index, hidden=hidden)
        self.f_inducing.resolve(self._inputs)
        self.f_likelihood.check_targets(self._outputs)
        return out

    # -- core math ------------------------------------------------------------
    def _kernel_diag_only(self, params, x):
        return signal_kernel_diag(self.f_kernel, params, x)

    def _latent(self, params, xq, want_cov=False):
        """Latent q(f) moments at xq: (mf, varf[, covf]) from the whitened
        q through v = Luu^{-1} K(z, xq)."""
        z = self.f_inducing.value(params)
        kuu = to_cov(self.f_kernel.cov(params, z))
        luu = safe_cholesky(kuu)
        v = solve_lower_triangular(luu, to_num(self.f_kernel.cov(params, z,
                                                                 xq)))
        qm, lq = self.f_q.factors(params)
        mf = self.f_location(params, xq) + jnp.matmul(
            v.T, qm, precision=settings.matmul_precision)
        lv = jnp.matmul(lq.T, v, precision=settings.matmul_precision)
        if want_cov:
            kss = to_cov(self.f_kernel.cov(params, xq))
            covf = (kss
                    - jnp.matmul(v.T, v,
                                 precision=settings.matmul_precision)
                    + jnp.matmul(lv.T, lv,
                                 precision=settings.matmul_precision))
            return mf, jnp.diagonal(covf), covf
        kdiag = self._kernel_diag_only(params, xq)
        varf = to_bounded(kdiag - jnp.sum(v * v, axis=0), zero32) \
            + jnp.sum(lv * lv, axis=0)
        return mf, varf

    # -- the bound ------------------------------------------------------------
    def _ell(self, params, xb, yb, w=None):
        """Expected log-likelihood sum over a batch of rows (the ELBO data
        term; subclass hook — LMC redefines it with per-row output
        mixing).  ``w`` is an optional per-row weight vector (the sharded
        trainer's padding mask)."""
        mf, varf = self._latent(params, xb)
        e = self.f_likelihood.expected_logp(params, yb, mf, varf)
        if w is not None:
            e = e * w
        return jnp.sum(e)

    def th_loglike_fn(self):
        """The uncollapsed ELBO (this process's ``loglike``): a true lower
        bound on log p(y | hypers), tight as q approaches the exact
        posterior.  Guarded like every logp in the library (non-finite ->
        -1e30 with zero gradient)."""

        def fn(params, space, inputs, outputs):
            ell = self._ell(params, inputs, outputs)
            elbo = ell - self.f_q.kl(params)
            bad = ~jnp.isfinite(elbo)
            return jnp.where(bad, GUARD, to_num(elbo, nan=GUARD,
                                                neginf=GUARD))

        return fn

    # -- moment statistics ----------------------------------------------------
    def th_location(self, prior=False, noise=False):
        if prior:
            def fn(params, space, inputs, outputs, vector):
                return self.f_location(params, space)
        else:
            def fn(params, space, inputs, outputs, vector):
                return self._latent(params, space)[0]
        return fn

    def th_kernel_diag(self, prior=False, noise=False):
        if prior:
            def fn(params, space, inputs, outputs, vector):
                return to_bounded(self._kernel_diag_only(params, space),
                                  zero32)
        else:
            def fn(params, space, inputs, outputs, vector):
                return self._latent(params, space)[1]
        return fn

    def th_mean(self, prior=False, noise=False, simulations=None):
        lik = self.f_likelihood

        def fn(params, space, inputs, outputs, vector):
            if prior:
                mf = self.f_location(params, space)
                varf = to_bounded(self._kernel_diag_only(params, space),
                                  zero32)
            else:
                mf, varf = self._latent(params, space)
            return lik.predictive_moments(params, mf, varf)[0]

        return fn

    def th_median(self, prior=False, noise=False, simulations=None):
        # mean == median only for symmetric conditionals
        if isinstance(self.f_likelihood,
                      (BernoulliLik, PoissonLik, OrdinalLik)):
            return None
        return self.th_mean(prior=prior, noise=noise)

    def th_variance(self, prior=False, noise=False, simulations=None):
        lik = self.f_likelihood

        def fn(params, space, inputs, outputs, vector):
            if prior:
                mf = self.f_location(params, space)
                varf = to_bounded(self._kernel_diag_only(params, space),
                                  zero32)
            else:
                mf, varf = self._latent(params, space)
            if noise:
                return lik.predictive_moments(params, mf, varf)[1]
            return varf

        return fn

    def th_covariance(self, prior=False, noise=False):
        lik = self.f_likelihood
        if noise and type(lik).noise_var is Likelihood.noise_var:
            raise ValueError(
                f"{type(lik).__name__} has no additive-noise "
                "decomposition, so a noisy predictive COVARIANCE has no "
                "closed form (the diagonal is available via "
                "variance(noise=True); joint draws via sampler)")

        def fn(params, space, inputs, outputs, vector):
            if prior:
                covf = to_cov(self.f_kernel.cov(params, space))
            else:
                covf = self._latent(params, space, want_cov=True)[2]
            if noise:
                nv = lik.noise_var(params)
                covf = covf + nv * jnp.eye(jnp.shape(covf)[0],
                                           dtype=settings.dtype)
            return covf

        return fn

    def th_logpredictive(self, prior=False, noise=False):
        """log E_{q(f*)}[p(y* | f*)] per query point (Gauss-Hermite
        log-sum-exp), summed — the NLPD numerator the scores use."""
        lik = self.f_likelihood

        def fn(params, space, inputs, outputs, vector):
            if prior:
                mf = self.f_location(params, space)
                varf = to_bounded(self._kernel_diag_only(params, space),
                                  zero32)
            else:
                mf, varf = self._latent(params, space)
            f, w = lik._grid(mf, varf)
            lp = lik.logp_elem(params, jnp.asarray(vector)[None, :], f)
            per = logsumexp(lp, axis=0, b=jnp.maximum(w, 1e-30)[:, None])
            return jnp.sum(per)

        return fn

    _dispatch_methods = dict(
        StochasticProcess._dispatch_methods,
        location="th_location",
        kernel_diag="th_kernel_diag",
    )

    # -- serving ---------------------------------------------------------------
    def posterior_state(self, params=None):
        """The variational family has NO n-sized posterior factorization —
        every statistic is O(m^2) from (z, q(u)) which already live in the
        params — so the serving state is empty: ``predictor()`` /
        ``Predictor.export`` bake the params and stream the statistics
        (and exported artifacts carry only the m-sized arrays)."""
        return {}

    # -- classification conveniences -------------------------------------------
    def predict_proba(self, params=None, space=None, prior=False):
        """Predictive class-probability matrix (n, C), for likelihoods
        whose class probabilities are analytic under Gaussian q(f):
        :class:`BernoulliLik` (columns [P(y=0), P(y=1)]) and
        :class:`OrdinalLik` (C ordered levels).  Mirrors
        :meth:`MulticlassSVP.predict_proba`."""
        lik = self.f_likelihood
        if params is None:
            params = self.params
        if space is None:
            space = self.space
        mf = np.asarray(self.location(params, space, prior=prior))
        varf = np.asarray(self.kernel_diag(params, space, prior=prior))
        if isinstance(lik, BernoulliLik):
            p1 = np.asarray(lik.predictive_moments(params, mf, varf)[0])
            return np.stack([1.0 - p1, p1], axis=-1)
        if isinstance(lik, OrdinalLik):
            pj = {k: np.asarray(v) for k, v in params.items()}
            return np.asarray(lik.probs(pj, mf, varf))
        raise ValueError(
            "predict_proba needs a classification likelihood with "
            "analytic class probabilities (Bernoulli/Ordinal), got "
            f"{type(lik).__name__}")

    def predict_class(self, params=None, space=None, prior=False):
        """argmax-probability class labels (n,) int."""
        return np.argmax(self.predict_proba(params, space, prior=prior),
                         axis=-1)

    def predictor(self, params=None):
        """Serving wrapper (models/predictor.py): baked params, fused
        statistic bundles, AOT ``export``.  No factorization to reuse here
        (everything is m-sized already) — the win is dispatch amortization
        and the model-free serving artifact."""
        from .predictor import Predictor

        return Predictor(self, params)

    # -- host-side sampling / quantiles ---------------------------------------
    def sampler(self, params=None, space=None, inputs=None, outputs=None,
                samples=1, prior=False, noise=False, rng=None):
        """Draw y samples: f ~ q(f) elementwise, then y | f through the
        likelihood (numpy host-side, like the dense samplers)."""
        from scipy import stats

        if params is None:
            params = self.params
        if space is None:
            space = self.space
        mf = np.asarray(self.location(params, space, inputs, outputs,
                                      prior=prior))
        sdf = np.sqrt(np.maximum(np.asarray(
            self.kernel_diag(params, space, inputs, outputs, prior=prior)),
            0.0))
        if rng is None:
            rng = np.random.default_rng(0)
        f = mf[:, None] + sdf[:, None] * rng.standard_normal(
            (len(mf), samples)).astype(settings.floatx)
        if not noise:
            return f
        from .likelihoods import sample_conditional

        return sample_conditional(self.f_likelihood, params, f, rng)

    def quantiler(self, params=None, space=None, inputs=None, outputs=None,
                  q=0.975, prior=False, noise=False, simulations=None):
        """Predictive quantiles: analytic normal for the Gaussian
        likelihood, Monte-Carlo through the likelihood otherwise."""
        from scipy import stats

        if params is None:
            params = self.params
        if space is None:
            space = self.space
        if isinstance(self.f_likelihood, GaussianLik) or not noise:
            mu = np.asarray(self.location(params, space, inputs, outputs,
                                          prior=prior))
            var = np.asarray(self.kernel_diag(params, space, inputs,
                                              outputs, prior=prior))
            if noise:
                pj = {k: np.asarray(v) for k, v in params.items()}
                var = var + float(np.maximum(
                    hval(self.f_likelihood.var, pj), 1e-10))
            out = stats.norm.ppf(q, loc=mu, scale=np.sqrt(
                np.maximum(var, 1e-12)))
            if isinstance(self.f_likelihood, BernoulliLik):
                # monotone probit: quantiles of the class probability
                # Phi(f) are Phi(latent quantiles) exactly
                out = stats.norm.cdf(out)
            elif isinstance(self.f_likelihood, PoissonLik):
                # monotone log link: quantiles of the rate exp(f)
                out = np.exp(np.clip(out, -30, 30))
            return out
        draws = self.sampler(params, space, inputs, outputs, samples=500,
                             prior=prior, noise=True,
                             rng=np.random.default_rng(7))
        return np.quantile(draws, q, axis=1)

    # -- minibatch training ---------------------------------------------------
    def fit_svgp(self, batch_size=1024, steps=2000, lr=1e-2, start=None,
                 key=0, display=True, mesh=None):
        """Minibatch Adam on the bound over ALL parameters (hypers AND q —
        q already lives in the param vector).  Step cost O(|B| m^2),
        independent of n; same scan-under-jit shape as the conjugate
        family's trainer (models/sparse.py fit_svgp).

        ``mesh=`` (int device count or a ``jax.sharding.Mesh``) shards the
        rows data-parallel like the conjugate family: per-device batch
        shards, one psum per step for the loss and gradients (the
        non-conjugate bound has no closed-form natural-gradient step, so
        the sharded mode is Adam-only)."""
        import optax

        if mesh is not None:
            return self._fit_svgp_sharded(mesh, batch_size=batch_size,
                                          steps=steps, lr=lr, start=start,
                                          key=key, display=display)

        reg = self.active
        if start is None:
            start = self.params_default
        u0 = jnp.asarray(reg.dict_to_array(start))
        x_all = jnp.asarray(self._inputs)
        y_all = jnp.asarray(self._outputs)
        n = x_all.shape[0]
        bs = int(min(batch_size, n))
        prior_pure = self._logp_pure(prior=True)
        vec0 = jnp.zeros(0, dtype=settings.dtype)
        scale = n / bs

        def neg_elbo(u, idx):
            p = reg.array_to_dict_jax(u)
            xb = x_all[idx]
            yb = y_all[idx]
            ell = self._ell(p, xb, yb)
            elbo = (scale * ell - self.f_q.kl(p)
                    + prior_pure(p, xb, xb, yb, vec0))
            return -to_num(elbo, nan=GUARD, posinf=GUARD, neginf=GUARD)

        if bs >= n:
            def draw(kk):
                return jnp.arange(n)
        else:
            def draw(kk):
                return jax.random.randint(kk, (bs,), 0, n)

        opt = optax.adam(lr)

        @jax.jit
        def run(u, opt_state, k):
            def step(carry, kk):
                uu, st = carry
                loss, g = jax.value_and_grad(neg_elbo)(uu, draw(kk))
                updates, st = opt.update(g, st, uu)
                uu = optax.apply_updates(uu, updates)
                return (uu, st), loss

            keys = jax.random.split(k, steps)
            (u, opt_state), losses = jax.lax.scan(step, (u, opt_state),
                                                  keys)
            return u, losses

        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        u, losses = run(u0, opt.init(u0), key)
        losses = np.asarray(losses)
        if display:
            print(f"SVP fit_svgp: {steps} steps, -elbo {losses[0]:.1f} -> "
                  f"{losses[-1]:.1f} (batch {bs}, n {n})")
        params = reg.array_to_dict(np.asarray(u, settings.floatx))
        return params, losses

    def _fit_svgp_sharded(self, mesh, batch_size=1024, steps=2000, lr=1e-2,
                          start=None, key=0, display=True):
        """Data-parallel SVP training: the non-conjugate analogue of
        models/sparse.py ``_fit_svgp_sharded`` — rows sharded over the
        mesh, per-device minibatch shards (row-masked full batch when
        ``batch_size >= n``), loss/gradients psum-combined so the update
        is exactly the single-device estimator on the concatenated
        batch."""
        import optax
        from jax import lax
        from jax.sharding import PartitionSpec as P

        reg = self.active
        if start is None:
            start = self.params_default
        u0 = jnp.asarray(reg.dict_to_array(start))
        mesh, axis, ndev, nloc, xp, yp = _sharded_data_layout(
            mesh, np.asarray(self._inputs), np.asarray(self._outputs))
        n = self._inputs.shape[0]

        bs = int(min(batch_size, n))
        bs_local = max(bs // ndev, 1)
        full_batch = bs >= n
        prior_pure = self._logp_pure(prior=True)
        vec0 = jnp.zeros(0, dtype=settings.dtype)

        def local_neg_elbo(u, x_loc, y_loc, idx, w, scale_l):
            p = reg.array_to_dict_jax(u)
            xb = x_loc[idx]
            yb = y_loc[idx]
            ell = self._ell(p, xb, yb, w=w)
            share = (scale_l * ell
                     + (prior_pure(p, xb, xb, yb, vec0)
                        - self.f_q.kl(p)) / ndev)
            return -to_num(share, nan=GUARD, posinf=GUARD, neginf=GUARD)

        opt = optax.adam(lr)
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)

        draw = _sharded_draw_factory(nloc, bs_local, full_batch)

        def body(x_loc, y_loc, u, k):
            i = lax.axis_index(axis)
            n_valid = jnp.clip(n - i * nloc, 0, nloc)

            def step(carry, kk):
                uu, st = carry
                idx, w, scale_l = draw(kk, i, n_valid)
                loss_l, g_l = jax.value_and_grad(local_neg_elbo)(
                    uu, x_loc, y_loc, idx, w, scale_l)
                loss = lax.psum(loss_l, axis)
                g = lax.psum(g_l, axis)
                updates, st = opt.update(g, st, uu)
                uu = optax.apply_updates(uu, updates)
                return (uu, st), loss

            keys = jax.random.split(k, steps)
            (uu, _st), losses = lax.scan(step, (u, opt.init(u)), keys)
            return uu, losses

        run = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P()),
            out_specs=(P(), P()), check_vma=False))
        u, losses = run(jnp.asarray(xp, settings.dtype),
                        jnp.asarray(yp, settings.dtype), u0, key)
        losses = np.asarray(losses)
        if display:
            print(f"SVP fit_svgp[{ndev}-dev {axis}]: {steps} steps, -elbo "
                  f"{losses[0]:.1f} -> {losses[-1]:.1f} "
                  f"(global batch {bs}, n {n})")
        params = reg.array_to_dict(np.asarray(u, settings.floatx))
        return params, losses


def _whitened_head_moments(kernel, kdiag_fn, params, z, xq, qm, lq,
                           want_cov=False):
    """ZERO-MEAN whitened-head q(f) moments for H latent GPs sharing one
    kernel and inducing set: mf (n, H), varf (n, H) [, covf (H, n, n)].
    One Kuu Cholesky + one cross-solve; per-head work is batched matmuls
    over the heads axis.  Shared by :class:`_MultiHeadLatent` (softmax /
    heteroscedastic heads, which add their location) and LMCSVP's
    shared-kernel branch (location is added post-mixing there) — the
    numerically sensitive algebra lives ONCE."""
    kuu = to_cov(kernel.cov(params, z))
    luu = safe_cholesky(kuu)
    v = solve_lower_triangular(luu, to_num(kernel.cov(params, z, xq)))
    mf = jnp.einsum("mn,cm->nc", v, qm,
                    precision=settings.matmul_precision)
    lv = jnp.einsum("cji,jn->cin", lq, v,
                    precision=settings.matmul_precision)
    if want_cov:
        kss = to_cov(kernel.cov(params, xq))
        base = kss - jnp.matmul(v.T, v,
                                precision=settings.matmul_precision)
        covf = base[None, :, :] + jnp.einsum(
            "cin,cip->cnp", lv, lv, precision=settings.matmul_precision)
        return mf, jnp.diagonal(covf, axis1=-2, axis2=-1).T, covf
    kdiag = kdiag_fn(params, xq)
    base = to_bounded(kdiag - jnp.sum(v * v, axis=0), zero32)
    varf = base[:, None] + jnp.sum(lv * lv, axis=1).T
    return mf, varf


class _MultiHeadLatent:
    """Shared algebra for SVP variants with ``n_heads`` latent GPs over
    ONE kernel and inducing set (softmax classification, heteroscedastic
    regression): the Kuu Cholesky and whitened cross-solve are computed
    once per batch, per-head work is batched matmuls over the heads axis,
    and q(u) is :class:`VariationalQHeads`."""

    n_heads = None  # subclasses set before StochasticProcess.__init__

    def _make_q(self, m):
        return VariationalQHeads(m, self.n_heads)

    def _latent(self, params, xq, want_cov=False):
        """Per-head latent q(f) moments at xq: mf (n, H), varf (n, H)
        [, covf (H, n, n)]."""
        z = self.f_inducing.value(params)
        qm, lq = self.f_q.factors(params)          # (H, m), (H, m, m)
        out = _whitened_head_moments(self.f_kernel, self._kernel_diag_only,
                                     params, z, xq, qm, lq,
                                     want_cov=want_cov)
        loc = self.f_location(params, xq)
        if want_cov:
            mf, varf, covf = out
            return loc[:, None] + mf, varf, covf
        mf, varf = out
        return loc[:, None] + mf, varf

    def _moments(self, params, space, prior):
        """(mf, varf) both (n, H); the prior is the same scalar GP prior
        broadcast per head (shared kernel, independent heads)."""
        if prior:
            mf0 = self.f_location(params, space)
            var0 = to_bounded(self._kernel_diag_only(params, space), zero32)
            shp = (jnp.shape(mf0)[0], self.n_heads)
            return (jnp.broadcast_to(mf0[:, None], shp),
                    jnp.broadcast_to(var0[:, None], shp))
        return self._latent(params, space)

    def th_location(self, prior=False, noise=False):
        def fn(params, space, inputs, outputs, vector):
            return self._moments(params, space, prior)[0]
        return fn

    def th_kernel_diag(self, prior=False, noise=False):
        def fn(params, space, inputs, outputs, vector):
            return self._moments(params, space, prior)[1]
        return fn


class MulticlassSVP(_MultiHeadLatent, SparseVariationalProcess):
    """Sparse variational softmax classification over C classes.

    >>> svc = g3.MulticlassSVP(space=x, kernel=g3.SE(x), classes=3,
    ...                        inducing=32)
    >>> svc.observed(x, y)                       # y in {0, 1, 2}
    >>> params, losses = svc.fit_svgp(batch_size=512, steps=2000)
    >>> probs = svc.predict_proba(params)        # (n, 3), rows sum to 1
    >>> labels = svc.predict_class(params)

    One latent GP per class sharing the kernel hypers and inducing set
    (the standard shared-hyper softmax GP classifier); the variational
    posterior is C independent whitened heads (:class:`VariationalQHeads`),
    so the per-minibatch latent cost is ONE shared Kuu Cholesky + ONE
    shared whitened cross-solve, with the per-class work pure batched
    matmuls — MXU-shaped, no per-class loop.  The ELBO data term is the
    analytic Jensen softmax bound (see
    :class:`~g3py_tpu.models.likelihoods.CategoricalLik`), deterministic
    like every other loglike in the library, so ``fit_svgp``,
    ``find_MAP`` polish, ``sample_hypers`` and the sharded data-parallel
    trainer all work unchanged.

    Statistics carry a trailing class axis: ``location``/``kernel_diag``
    are latent per-class moments (n, C); ``mean`` is the predictive class
    probability matrix (n, C); ``variance(noise=True)`` its Bernoulli
    variances.  No reference counterpart at any cost (the reference has
    no classification)."""

    def __init__(self, space=None, location=None, kernel=None, classes=3,
                 inducing=32, learn_inducing=True, *args, **kwargs):
        self.n_classes = self.n_heads = int(classes)
        if "name" not in kwargs:
            kwargs["name"] = "SVC"
        super().__init__(space=space, location=location, kernel=kernel,
                         likelihood=CategoricalLik(classes),
                         inducing=inducing, learn_inducing=learn_inducing,
                         *args, **kwargs)

    # -- moment statistics (trailing class axis) ------------------------------
    def th_mean(self, prior=False, noise=False, simulations=None):
        lik = self.f_likelihood

        def fn(params, space, inputs, outputs, vector):
            mf, varf = self._moments(params, space, prior)
            return lik.probs(params, mf, varf)

        return fn

    def th_median(self, prior=False, noise=False, simulations=None):
        return None

    def th_variance(self, prior=False, noise=False, simulations=None):
        lik = self.f_likelihood

        def fn(params, space, inputs, outputs, vector):
            mf, varf = self._moments(params, space, prior)
            if noise:
                return lik.predictive_moments(params, mf, varf)[1]
            return varf

        return fn

    def th_covariance(self, prior=False, noise=False):
        if noise:
            raise ValueError(
                "categorical observations have no additive-noise covariance"
                "; the class-probability variances are available via "
                "variance(noise=True)")

        def fn(params, space, inputs, outputs, vector):
            if prior:
                covf = to_cov(self.f_kernel.cov(params, space))
                return jnp.broadcast_to(
                    covf[None, :, :],
                    (self.n_classes,) + tuple(jnp.shape(covf)))
            return self._latent(params, space, want_cov=True)[2]

        return fn

    def th_logpredictive(self, prior=False, noise=False):
        """sum_i log E_q[softmax(f_i)_{y_i}] — fixed-CRN MC through the
        softmax (the scalar family's Gauss-Hermite grid is 1-D only)."""
        lik = self.f_likelihood

        def fn(params, space, inputs, outputs, vector):
            mf, varf = self._moments(params, space, prior)
            return jnp.sum(lik.log_predictive(params, vector, mf, varf))

        return fn

    # -- prediction conveniences ----------------------------------------------
    def predict_proba(self, params=None, space=None, prior=False):
        """Predictive class probabilities (n, C); rows sum to 1."""
        if params is None:
            params = self.params
        if space is None:
            space = self.space
        return np.asarray(self.mean(params, space, prior=prior))

    def predict_class(self, params=None, space=None, prior=False):
        """argmax-probability class labels (n,)."""
        return np.argmax(self.predict_proba(params, space, prior=prior),
                         axis=-1)

    # -- host-side sampling ----------------------------------------------------
    def sampler(self, params=None, space=None, inputs=None, outputs=None,
                samples=1, prior=False, noise=False, rng=None):
        """``noise=False``: latent f draws (n, C, samples) from the
        mean-field q.  ``noise=True``: sampled class labels (n, samples)
        through the softmax."""
        if params is None:
            params = self.params
        if space is None:
            space = self.space
        if rng is None:
            rng = np.random.default_rng(0)
        mf = np.asarray(self.location(params, space, inputs, outputs,
                                      prior=prior))
        sd = np.sqrt(np.maximum(np.asarray(
            self.kernel_diag(params, space, inputs, outputs, prior=prior)),
            0.0))
        f = (mf[:, :, None] + sd[:, :, None]
             * rng.standard_normal(mf.shape + (samples,)).astype(
                 settings.floatx))
        if not noise:
            return f
        e = np.exp(f - f.max(axis=1, keepdims=True))
        cum = np.cumsum(e / e.sum(axis=1, keepdims=True), axis=1)
        u = rng.uniform(size=(f.shape[0], 1, samples))
        # compare against the C-1 interior boundaries only: the f32
        # cumsum's last entry can land just below 1, and u > cum over all
        # C entries would then emit the out-of-range label C
        labels = (u > cum[:, :-1, :]).sum(axis=1)
        return labels.astype(settings.floatx)

    def quantiler(self, params=None, space=None, inputs=None, outputs=None,
                  q=0.975, prior=False, noise=False, simulations=None):
        """Per-class probability quantiles (n, C): MC through the softmax
        (no monotone scalar push-through exists — each class probability
        depends on ALL latent heads)."""
        f = self.sampler(params, space, inputs, outputs, samples=400,
                         prior=prior, noise=False,
                         rng=np.random.default_rng(7))
        e = np.exp(f - f.max(axis=1, keepdims=True))
        p = e / e.sum(axis=1, keepdims=True)
        return np.quantile(p, q, axis=-1)

    # -- classification scores -------------------------------------------------
    def scores(self, params=None, space=None, hidden=None, inputs=None,
               outputs=None, logp=False, logpred=False, bias=True,
               variance=False, median=False, *args, **kwargs):
        """Classification metric set replacing the regression one:
        ``_accuracy`` / ``_brier`` (bias), ``_nlpd`` (logpred), and the
        usual ``_logp``/``_loglike``/``_logprior`` (logp).  ``variance``
        adds the mean predictive class-probability variance."""
        from ..utils import DictObj

        if hidden is None:
            hidden = self.hidden
        if hidden is None:
            hidden = self.outputs
        if space is None:
            space = self.space
        y = np.asarray(hidden).astype(np.int64)
        probs = self.predict_proba(params, space)
        out = DictObj()
        if bias:
            out["_accuracy"] = float(np.mean(np.argmax(probs, -1) == y))
            onehot = np.eye(probs.shape[1], dtype=np.float64)[y]
            out["_brier"] = float(np.mean(np.sum((probs - onehot) ** 2, -1)))
        if variance:
            out["_mean_prob_var"] = float(np.mean(
                np.asarray(self.variance(params, space, inputs, outputs,
                                         noise=True))))
        if logp:
            out["_logp"] = self.logp(params)
            out["_loglike"] = self.loglike(params)
            out["_logprior"] = self.logp(params, prior=True)
        if logpred:
            out["_nlpd"] = -float(
                self.logpredictive(params, space, inputs, outputs,
                                   vector=np.asarray(y,
                                                     settings.floatx))) \
                / len(y)
        return out


class HeteroscedasticSVP(_MultiHeadLatent, SparseVariationalProcess):
    """Sparse variational heteroscedastic regression: the observation
    noise is itself a GP.

    >>> het = g3.HeteroscedasticSVP(space=x, kernel=g3.SE(x), inducing=32)
    >>> het.observed(x, y)                 # y with input-dependent scatter
    >>> params, _ = het.fit_svgp(batch_size=1024, steps=3000)
    >>> het.mean(params, xq)               # predictive mean (n,)
    >>> het.variance(params, xq, noise=True)   # signal + LOCAL noise
    >>> het.noise_field(params, xq)        # the learned noise-variance map

    Two latent heads over one kernel/inducing set (:class:`_MultiHeadLatent`):
    f1 is the signal, f2 the log-noise shape, and the likelihood's
    trainable bias sets the noise level — y ~ N(f1, exp(f2 + b)).  The
    ELBO data term is fully analytic
    (:class:`~g3py_tpu.models.likelihoods.HeteroscedasticLik`), so
    training is exactly the SVP machinery: ``fit_svgp`` (optionally
    ``mesh=`` data-parallel), ``find_MAP`` polish, ``sample_hypers``.
    Scalar statistics (mean/variance/median + regression ``scores``) keep
    the ordinary (n,) shapes — unlike the reference, whose only noise
    knob is one scalar kernel hyper (reference kernels.py WN/KernelNoise),
    this resolves WHERE the data is noisy."""

    n_heads = 2

    def __init__(self, space=None, location=None, kernel=None, inducing=32,
                 learn_inducing=True, *args, **kwargs):
        if "name" not in kwargs:
            kwargs["name"] = "HET"
        super().__init__(space=space, location=location, kernel=kernel,
                         likelihood=HeteroscedasticLik(),
                         inducing=inducing, learn_inducing=learn_inducing,
                         *args, **kwargs)

    # -- scalar moment statistics ---------------------------------------------
    def th_mean(self, prior=False, noise=False, simulations=None):
        lik = self.f_likelihood

        def fn(params, space, inputs, outputs, vector):
            mf, varf = self._moments(params, space, prior)
            return lik.predictive_moments(params, mf, varf)[0]

        return fn

    def th_median(self, prior=False, noise=False, simulations=None):
        # gaussian conditional: the predictive is symmetric around m1
        return self.th_mean(prior=prior, noise=noise)

    def th_variance(self, prior=False, noise=False, simulations=None):
        lik = self.f_likelihood

        def fn(params, space, inputs, outputs, vector):
            mf, varf = self._moments(params, space, prior)
            if noise:
                return lik.predictive_moments(params, mf, varf)[1]
            return varf[:, 0]

        return fn

    def th_covariance(self, prior=False, noise=False):
        lik = self.f_likelihood

        def fn(params, space, inputs, outputs, vector):
            if prior:
                covf = to_cov(self.f_kernel.cov(params, space))
                if not noise:
                    return covf
                mf, varf = self._moments(params, space, True)
            else:
                mf, varf, covs = self._latent(params, space, want_cov=True)
                covf = covs[0]
            if noise:
                nv = lik.noise_mean(params, mf, varf)
                covf = covf + jnp.diag(nv)
            return covf

        return fn

    def th_logpredictive(self, prior=False, noise=False):
        """sum_i log E_q[N(y_i; f1, exp(f2+b))]: conditional on f2 the f1
        integral is analytic (N(y; m1, v1 + exp(g))), leaving ONE
        Gauss-Hermite quadrature over the log-noise head."""
        lik = self.f_likelihood

        def fn(params, space, inputs, outputs, vector):
            mf, varf = self._moments(params, space, prior)
            m1, m2, v1, v2 = lik._split(mf, varf, params)
            g, w = lik._grid(m2, v2)           # (deg, n), (deg,)
            tot = v1[None, :] + jnp.exp(jnp.clip(g, -30.0, 30.0))
            y = jnp.asarray(vector, settings.dtype)[None, :]
            lp = (-0.5 * (LOG2PI + jnp.log(tot))
                  - 0.5 * (y - m1[None, :]) ** 2 / tot)
            per = logsumexp(lp, axis=0, b=jnp.maximum(w, 1e-30)[:, None])
            return jnp.sum(per)

        return fn

    # -- the learned noise field ----------------------------------------------
    def noise_field(self, params=None, space=None, prior=False):
        """Predictive noise-VARIANCE map E[exp(f2 + b)] at the query
        points (n,) — the quantity this model family exists to resolve."""
        if params is None:
            params = self.params
        if space is None:
            space = self.space
        lik = self.f_likelihood
        mf = np.asarray(self.location(params, space, prior=prior))
        vf = np.asarray(self.kernel_diag(params, space, prior=prior))
        pj = {k: jnp.asarray(np.asarray(v)) for k, v in
              self.filter_params(params).items()}
        return np.asarray(lik.noise_mean(pj, jnp.asarray(mf),
                                         jnp.asarray(vf)))

    # -- host-side sampling / quantiles ---------------------------------------
    def sampler(self, params=None, space=None, inputs=None, outputs=None,
                samples=1, prior=False, noise=False, rng=None):
        """(n, samples) y draws: f heads from the mean-field q, then
        y = f1 + exp((f2+b)/2) xi for ``noise=True`` (``noise=False``
        returns the signal head draws)."""
        if params is None:
            params = self.params
        if space is None:
            space = self.space
        if rng is None:
            rng = np.random.default_rng(0)
        mf = np.asarray(self.location(params, space, inputs, outputs,
                                      prior=prior))
        sd = np.sqrt(np.maximum(np.asarray(
            self.kernel_diag(params, space, inputs, outputs, prior=prior)),
            0.0))
        f = (mf[:, :, None] + sd[:, :, None]
             * rng.standard_normal(mf.shape + (samples,)).astype(
                 settings.floatx))
        if not noise:
            return f[:, 0, :]
        pj = {k: np.asarray(v) for k, v in params.items()}
        b = float(np.asarray(hval(self.f_likelihood.bias, pj)))
        s = np.exp(np.clip(0.5 * (f[:, 1, :] + b), -15.0, 15.0))
        return (f[:, 0, :] + s * rng.standard_normal(s.shape).astype(
            settings.floatx))

    def quantiler(self, params=None, space=None, inputs=None, outputs=None,
                  q=0.975, prior=False, noise=False, simulations=None):
        """Monte-Carlo predictive quantiles through the scale mixture."""
        draws = self.sampler(params, space, inputs, outputs, samples=500,
                             prior=prior, noise=noise,
                             rng=np.random.default_rng(7))
        return np.quantile(draws, q, axis=-1)


SVP = SparseVariationalProcess
