"""GridGP: exact GP inference on Cartesian-product grids in O(sum n_i^3).

The TPU-native scaling answer for GRIDDED multi-dimensional data —
images, environmental rasters, dense space-time lattices.  When the
inputs form a full grid ``X = axes_1 x ... x axes_D`` and the kernel is
separable across axes, ``k(x, x') = prod_i k_i(x_i, x'_i)``, the gram is
the Kronecker product of the per-axis grams and EXACT inference costs
``O(sum_i n_i^3)`` eigendecompositions plus MXU-shaped tensor
contractions (Saatci 2011) — a 256 x 256 grid (N = 65,536) or a
100 x 100 x 100 lattice (N = 1e6) train exactly where the reference's
dense O(N^3) gram (reference kernels.py:51-75) is beyond any hardware.
No approximation: on any grid small enough to check, the NLL and
posterior equal the dense product-kernel GP to float32 rounding
(tested against the dense oracle).

>>> gp = g3.GridGP(axes=[t, x], kernel=[g3.MAT32(t), g3.SE(x)])
>>> gp.observed(gp.space, y.ravel())        # rows in meshgrid 'ij' order
>>> params = gp.find_MAP()                  # exact marginal likelihood
>>> gp.predict(params, space=queries)       # arbitrary off-grid rows

The marginal likelihood rides :func:`~g3py_tpu.ops.kron.kron_gp_nll`
(a ``custom_vjp`` primitive with an analytic, eigh-free backward — the
standard eigh VJP divides by eigenvalue gaps and explodes on the
clustered near-zero spectra smooth kernel grams have).  The full model
API follows: ``find_MAP`` / ``sample_hypers`` / ``scores`` /
``Experiment`` / ``predictor()`` serving, and the simulation-based
joint ``sampler`` draws exact posterior field samples by Matheron's
rule on a per-axis-augmented grid.

INCOMPLETE grids (missing cells — cloud-masked rasters, dead sensors)
are supported: the observed block of the Kronecker gram is no longer
eigen-diagonalizable, but its MATVEC still is (scatter -> per-axis
contractions -> gather), so the NLL/posterior route to the repo's
matrix-free stack (``ops/kron.masked_kron_nll``: pivoted-Cholesky
Woodbury preconditioner, PCG quadratic form, SLQ logdet, BBMM
stochastic-trace gradients — the same estimator family as
``nll_iterative``; knobs via ``masked_rank`` / ``masked_cg_iters`` /
``masked_probes`` / ``masked_lanczos``).  Just pass the observed
subset of rows to ``observed()``.

Observation noise is a :class:`~g3py_tpu.hypers.kernels.KernelNoise`
hyper named like the dense ``GP(noisy=True)`` wrapper so param dicts
transfer verbatim (elliptical.py:74 convention).  Statistics semantics
match :class:`~g3py_tpu.models.statespace.StateSpaceGP`: ``location`` /
``mean`` the posterior latent mean, ``variance`` the latent marginal
(``noise=True`` adds observation noise), ``logpredictive`` the diagonal
predictive density; full query-pair ``covariance`` is available (it is
an (M, M) object assembled by chunked Khatri-Rao contractions).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..config import settings
from ..hypers import hval
from ..hypers.kernels import KernelNoise
from ..hypers.means import Zero
from ..ops.guards import to_num
from ..ops.kron import (kron_eigs, kron_dinv, kron_apply, kron_gp_nll,
                        cross_mean, cross_var, cross_cov, LOG2PI,
                        masked_kron_nll, masked_cross_solve)
from .gaussian import GUARD
from .stochastic import StochasticProcess, zero32

__all__ = ["GridGP", "grid_rows"]


def grid_rows(axes):
    """(N, D) rows of the Cartesian product of 1-D ``axes`` in
    ``meshgrid(indexing='ij')`` raveling order."""
    axes = [np.asarray(a, settings.floatx).reshape(-1) for a in axes]
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.stack([m.ravel() for m in mesh], axis=1)


class GridGP(StochasticProcess):
    """Exact separable-kernel GP on a Cartesian grid via Kronecker
    eigendecomposition (module docstring)."""

    def __init__(self, space=None, location=None, kernel=None, axes=None,
                 masked_rank=64, masked_cg_iters=150, masked_probes=8,
                 masked_lanczos=25, masked_seed=0, *args, **kwargs):
        if kernel is None or not isinstance(kernel, (list, tuple)):
            raise ValueError(
                "GridGP takes kernel=[k_1, ..., k_D], one separable "
                "factor per grid axis")
        self.f_kernels = tuple(kernel)
        # matrix-free knobs for INCOMPLETE grids (missing cells): see
        # th_loglike_fn's masked branch
        self._masked = dict(rank=int(masked_rank),
                            cg_iters=int(masked_cg_iters),
                            probes=int(masked_probes),
                            lanczos_iters=int(masked_lanczos),
                            seed=int(masked_seed))
        self.f_location = location if location is not None else Zero()
        # name matches the dense GP(noisy=True) wrapper (elliptical.py:74)
        self.f_noise = KernelNoise(name="Noise")
        if axes is not None:
            self._axes = [np.asarray(a, settings.floatx).reshape(-1, 1)
                          for a in axes]
            if len(self._axes) != len(self.f_kernels):
                raise ValueError(
                    f"{len(self.f_kernels)} kernels for "
                    f"{len(self._axes)} axes")
            if space is None:
                n_cells = int(np.prod([a.shape[0] for a in self._axes]))
                if n_cells > (1 << 22):
                    # materializing all N rows is O(N) host memory and
                    # wall (6.4 GB / ~260 s at N=537M on a 1-core box —
                    # the measured cause of the round-4 multichip dryrun
                    # timeout).  A deterministic strided subsample serves
                    # the same roles (dims checks, data-driven hyper
                    # defaults, plotting hints); the exact grid geometry
                    # lives in self._axes.
                    shp = tuple(a.shape[0] for a in self._axes)
                    flat = np.linspace(0, n_cells - 1, 1 << 14,
                                       dtype=np.int64)
                    idx = np.unravel_index(flat, shp)
                    space = np.stack(
                        [self._axes[i][idx[i], 0]
                         for i in range(len(self._axes))], axis=1)
                else:
                    space = grid_rows([a[:, 0] for a in self._axes])
        else:
            self._axes = None   # inferred at observed()
        kwargs["space"] = space
        if "name" not in kwargs:
            kwargs["name"] = "GridGP"
        super().__init__(*args, **kwargs)

    # -- registration ----------------------------------------------------------
    def _components(self):
        return [self.f_location] + list(self.f_kernels) + [self.f_noise]

    def _check_hypers(self):
        self.f_location.check_dims(self.inputs)
        axes = self._axes_for_hypers()
        for k, a in zip(self.f_kernels, axes):
            k.check_dims(a)
        for comp in self._components():
            comp.check_hypers(self.name + "_")

    def _axes_for_hypers(self):
        if self._axes is not None:
            return self._axes
        x = np.asarray(self.inputs)
        return [np.unique(x[:, i]).reshape(-1, 1)
                for i in range(x.shape[1])]

    def default_hypers(self):
        out = {}
        out.update(self.f_location.default_hypers_dims(self.inputs,
                                                       self.outputs))
        for k, a in zip(self.f_kernels, self._axes_for_hypers()):
            out.update(k.default_hypers_dims(a, self.outputs))
        out.update(self.f_noise.default_hypers_dims(self.inputs,
                                                    self.outputs))
        return out

    # -- grid bookkeeping --------------------------------------------------------
    def observed(self, inputs=None, outputs=None, order=None, index=None,
                 hidden=None):
        out = super().observed(inputs=inputs, outputs=outputs, order=order,
                               index=index, hidden=hidden)
        x = np.asarray(self._inputs, settings.floatx)
        if x.ndim != 2 or x.shape[1] != len(self.f_kernels):
            raise ValueError(
                f"GridGP with {len(self.f_kernels)} kernels expects "
                f"(N, {len(self.f_kernels)}) rows, got {x.shape}")
        if self._axes is None:
            self._axes = [np.unique(x[:, i]).reshape(-1, 1)
                          for i in range(x.shape[1])]
        shape = tuple(a.shape[0] for a in self._axes)
        n = int(np.prod(shape))
        if x.shape[0] > n:
            raise ValueError(
                f"inputs are not a complete grid: {x.shape[0]} rows vs "
                f"prod(axis sizes) = {n} (duplicate rows?)")
        pos = np.ravel_multi_index(self._multi_index_np(x), shape)
        if len(np.unique(pos)) != x.shape[0]:
            raise ValueError(
                "duplicate or off-axis rows after per-column matching")
        # rows < n is ALLOWED: missing cells route the NLL/posterior to
        # the matrix-free masked-Kronecker path (ops/kron.masked_kron_nll)
        return out

    def _multi_index_np(self, x):
        """Host-side per-column axis indices (validation only)."""
        idx = []
        for i, a in enumerate(self._axes):
            j = np.searchsorted(a[:, 0], x[:, i])
            j = np.clip(j, 0, a.shape[0] - 1)
            if not np.allclose(a[j, 0], x[:, i], rtol=0, atol=1e-5):
                raise ValueError(
                    f"column {i} has values off the grid axis")
            idx.append(j)
        return tuple(idx)

    def _grid_shape(self):
        return tuple(a.shape[0] for a in self._axes)

    def _multi_index(self, x):
        """Traced per-column axis indices (inside jit; the axes are
        baked constants)."""
        idx = []
        for i, a in enumerate(self._axes):
            ax = jnp.asarray(a[:, 0], settings.dtype)
            j = jnp.clip(jnp.searchsorted(ax, x[:, i]), 0, a.shape[0] - 1)
            # nearest-match guard: searchsorted returns the right
            # insertion point, which for an exact grid value may sit one
            # past it under f32 rounding
            jm = jnp.clip(j - 1, 0, a.shape[0] - 1)
            pick_lo = (jnp.abs(ax[jm] - x[:, i])
                       <= jnp.abs(ax[j] - x[:, i]))
            idx.append(jnp.where(pick_lo, jm, j))
        return tuple(idx)

    def _y_tensor(self, params, inputs, outputs):
        """Residualized observations scattered into (n_1, ..., n_D)."""
        x = jnp.asarray(inputs, settings.dtype)
        yres = (jnp.asarray(outputs, settings.dtype)
                - self.f_location(params, x))
        idx = self._multi_index(x)
        return jnp.zeros(self._grid_shape(), settings.dtype).at[idx].set(
            yres)

    def _grams(self, params):
        return tuple(
            k.cov(params, jnp.asarray(a, settings.dtype))
            for k, a in zip(self.f_kernels, self._axes))

    def _noise_var(self, params):
        return jnp.maximum(hval(self.f_noise.var, params),
                           jnp.asarray(1e-10, settings.dtype))

    def _is_complete(self, inputs):
        return int(np.shape(inputs)[0]) == int(np.prod(self._grid_shape()))

    def _idx_stack(self, x):
        return jnp.stack([jnp.asarray(j, jnp.int32)
                          for j in self._multi_index(x)])

    def _yres(self, params, inputs, outputs):
        x = jnp.asarray(inputs, settings.dtype)
        return (jnp.asarray(outputs, settings.dtype)
                - self.f_location(params, x))

    # -- the exact marginal likelihood --------------------------------------------
    def th_loglike_fn(self):
        def fn(params, space, inputs, outputs):
            if self._is_complete(inputs):
                yt = self._y_tensor(params, inputs, outputs)
                nll = kron_gp_nll(self._grams(params),
                                  self._noise_var(params), yt)
                bad = jnp.zeros((), bool)
            else:
                # INCOMPLETE grid: the observed block of the Kronecker
                # gram is no longer eigen-diagonalizable, but its matvec
                # still is — matrix-free NLL (PCG quad + SLQ logdet +
                # BBMM stochastic-trace gradient, ops/kron.py).  An
                # untrusted CG solve must read 'very bad', not plausible
                # (the engine='iterative' hardening lesson, CLAUDE.md).
                x = jnp.asarray(inputs, settings.dtype)
                mk = self._masked
                nll, info = masked_kron_nll(
                    self._grams(params), self._noise_var(params),
                    self._yres(params, inputs, outputs),
                    self._idx_stack(x), self._grid_shape(),
                    mk["rank"], mk["cg_iters"], mk["probes"],
                    mk["lanczos_iters"], mk["seed"])
                bad = info["cg_rel_residual"] > 5e-2
            ll = -nll
            bad = bad | ~jnp.isfinite(ll)
            return jnp.where(bad, GUARD, to_num(ll, nan=GUARD,
                                                neginf=GUARD))

        return fn

    def nll_distributed(self, params=None, mesh=None, axis="dp"):
        """Device-sharded exact Kronecker NLL (SURVEY §2.7 TP row: shard
        the factorization for N beyond one chip).

        COMPLETE grid: the observation tensor (and with it every N-cell
        intermediate of :func:`~g3py_tpu.ops.kron.kron_gp_nll`'s analytic
        backward — ``alpha``, the per-axis ``beta`` contractions, the
        eigen-basis fields) is sharded along the LONGEST grid axis with a
        GSPMD ``NamedSharding``; the tiny per-axis grams/eighs replicate
        and XLA inserts the one collective contraction the sharded axis
        needs.  A ``(512, 512, n_t)`` raster whose backward cannot fit
        one chip's HBM partitions its N-cell tensors ``1/D`` per device.

        INCOMPLETE grid: the observed rows (residuals + tap indices) are
        data-parallel, mirroring the SKI family — per-device scatters
        into the grid tensor close with one all-reduce per matvec inside
        the PCG/SLQ/BBMM pipeline (ops/kron.masked_kron_nll), zero
        bespoke collective code.

        Matches ``-loglike(params)`` (no hyper priors) to f32 collective
        rounding; differentiable; rides ``find_MAP(engine='distributed')``
        unchanged (stochastic.py `_find_map_distributed`)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        if params is None:
            params = self.params
        params = {k: jnp.asarray(v) for k, v in params.items()}
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), (axis,))
        ks = self._grams(params)
        s2 = self._noise_var(params)
        if self._is_complete(self.inputs):
            yt = self._y_tensor(params, self.inputs, self.outputs)
            shape = self._grid_shape()
            ax_i = int(np.argmax(shape))
            spec = [None] * len(shape)
            spec[ax_i] = axis
            yt = jax.lax.with_sharding_constraint(
                yt, NamedSharding(mesh, PartitionSpec(*spec)))
            # shard= partitions every N-cell intermediate of the forward
            # AND the eigh-free backward (alpha/beta/dinv fields) across
            # the mesh — without it XLA replicates them (measured
            # 13.3 GB/device instead of ~2.4 at 2048x2048x128 x 8 dev)
            return kron_gp_nll(ks, s2, yt, shard=(mesh, axis))
        x = jnp.asarray(self.inputs, settings.dtype)
        idx = jax.lax.with_sharding_constraint(
            self._idx_stack(x),
            NamedSharding(mesh, PartitionSpec(None, axis)))
        yres = jax.lax.with_sharding_constraint(
            self._yres(params, self.inputs, self.outputs),
            NamedSharding(mesh, PartitionSpec(axis)))
        mk = self._masked
        nll, info = masked_kron_nll(ks, s2, yres, idx,
                                    self._grid_shape(), mk["rank"],
                                    mk["cg_iters"], mk["probes"],
                                    mk["lanczos_iters"], mk["seed"])
        # hardening parity with th_loglike_fn: an untrusted CG solve must
        # read 'very bad' to the minimizer (zero-gradient plateau), or
        # L-BFGS chases estimator breakdown (the iterative-engine lesson)
        bad = (info["cg_rel_residual"] > 5e-2) | ~jnp.isfinite(nll)
        return jnp.where(bad, jnp.asarray(1e10, nll.dtype),
                         to_num(nll, nan=1e10, posinf=1e10, neginf=1e10))

    # -- posterior pieces ----------------------------------------------------------
    def _eig_state(self, params, inputs, outputs):
        ks = self._grams(params)
        qs, lams = kron_eigs(ks)
        dinv = kron_dinv(lams, self._noise_var(params))
        yt = self._y_tensor(params, inputs, outputs)
        at = kron_apply([q.T for q in qs], yt) * dinv
        alpha = kron_apply(list(qs), at)
        return qs, dinv, alpha

    def _cross(self, params, space):
        """Per-axis cross grams [(M, n_i)] for paired query rows."""
        xq = jnp.asarray(space, settings.dtype)
        return [k.cov(params, xq[:, i:i + 1], jnp.asarray(a,
                                                          settings.dtype))
                for i, (k, a) in enumerate(zip(self.f_kernels,
                                               self._axes))]

    def _prior_diag(self, params, space):
        xq = jnp.asarray(space, settings.dtype)
        out = None
        for i, k in enumerate(self.f_kernels):
            d = jnp.diagonal(k.cov(params, xq[:, i:i + 1]))
            out = d if out is None else out * d
        return out

    def _masked_b(self, cs, idx):
        """(n_obs, M) cross gram between queries and the OBSERVED cells:
        Khatri-Rao rows gathered at the observed multi-indices.  Memory
        O(n_obs * M) — chunk the query set for very large masked grids."""
        b = None
        for c, ix in zip(cs, tuple(idx)):
            piece = c[:, ix]                       # (M, n_obs)
            b = piece if b is None else b * piece
        return b.T

    def _posterior_moments(self, params, space, inputs, outputs):
        cs = self._cross(params, space)
        kdiag = self._prior_diag(params, space)
        if self._is_complete(inputs):
            qs, dinv, alpha = self._eig_state(params, inputs, outputs)
            mean = cross_mean(cs, alpha)
            var = cross_var(cs, qs, dinv, kdiag)
            return mean, jnp.maximum(var, zero32)
        # masked grid: one multi-RHS PCG solves alpha and the variance
        # columns together (shared preconditioner and gram slabs)
        x = jnp.asarray(inputs, settings.dtype)
        idx = self._idx_stack(x)
        ks = self._grams(params)
        s2 = self._noise_var(params)
        yres = self._yres(params, inputs, outputs)
        b = self._masked_b(cs, idx)                # (n_obs, M)
        rhs = jnp.concatenate([yres[:, None], b], axis=1)
        sol = masked_cross_solve(ks, s2, idx, self._grid_shape(), rhs,
                                 rank=self._masked["rank"],
                                 cg_iters=max(200,
                                              self._masked["cg_iters"]))
        alpha, sb = sol[:, 0], sol[:, 1:]
        mean = jnp.sum(b * alpha[:, None], axis=0)
        var = kdiag - jnp.sum(b * sb, axis=0)
        return mean, jnp.maximum(var, zero32)

    # -- moment statistics ----------------------------------------------------------
    def th_location(self, prior=False, noise=False):
        if prior:
            def fn(params, space, inputs, outputs, vector):
                return self.f_location(params, space)
        else:
            def fn(params, space, inputs, outputs, vector):
                m, _ = self._posterior_moments(params, space, inputs,
                                               outputs)
                return self.f_location(params, space) + m
        return fn

    def th_kernel_diag(self, prior=False, noise=False):
        if prior:
            def fn(params, space, inputs, outputs, vector):
                return self._prior_diag(params, space)
        else:
            def fn(params, space, inputs, outputs, vector):
                return self._posterior_moments(params, space, inputs,
                                               outputs)[1]
        return fn

    def th_mean(self, prior=False, noise=False, simulations=None):
        return self.th_location(prior=prior)

    def th_median(self, prior=False, noise=False, simulations=None):
        return self.th_location(prior=prior)

    def th_variance(self, prior=False, noise=False, simulations=None):
        def fn(params, space, inputs, outputs, vector):
            if prior:
                v = self._prior_diag(params, space)
            else:
                v = self._posterior_moments(params, space, inputs,
                                            outputs)[1]
            if noise:
                v = v + self._noise_var(params)
            return v

        return fn

    def th_covariance(self, prior=False, noise=False):
        def fn(params, space, inputs, outputs, vector):
            cs = self._cross(params, space)
            xq = jnp.asarray(space, settings.dtype)
            kqq = None
            for i, k in enumerate(self.f_kernels):
                g = k.cov(params, xq[:, i:i + 1])
                kqq = g if kqq is None else kqq * g
            if prior:
                out = kqq
            elif self._is_complete(inputs):
                qs, dinv, _alpha = self._eig_state(params, inputs,
                                                   outputs)
                out = cross_cov(cs, qs, dinv, kqq)
            else:
                x = jnp.asarray(inputs, settings.dtype)
                idx = self._idx_stack(x)
                b = self._masked_b(cs, idx)
                sb = masked_cross_solve(
                    self._grams(params), self._noise_var(params), idx,
                    self._grid_shape(), b, rank=self._masked["rank"],
                    cg_iters=max(200, self._masked["cg_iters"]))
                out = kqq - jnp.matmul(
                    b.T, sb, precision=settings.matmul_precision)
            if noise:
                out = out + self._noise_var(params) * jnp.eye(
                    jnp.shape(out)[0], dtype=settings.dtype)
            return out

        return fn

    def th_logpredictive(self, prior=False, noise=False):
        def fn(params, space, inputs, outputs, vector):
            if prior:
                m = self.f_location(params, space)
                v = self._prior_diag(params, space)
            else:
                ms, v = self._posterior_moments(params, space, inputs,
                                                outputs)
                m = self.f_location(params, space) + ms
            tot = v + self._noise_var(params)
            y = jnp.asarray(vector, settings.dtype)
            return jnp.sum(-0.5 * (LOG2PI + jnp.log(tot))
                           - 0.5 * (y - m) ** 2 / tot)

        return fn

    _dispatch_methods = dict(
        StochasticProcess._dispatch_methods,
        location="th_location",
        kernel_diag="th_kernel_diag",
    )

    # -- serving ----------------------------------------------------------------------
    def posterior_state(self, params=None):
        """Serving state is the params themselves (the eigen state is
        rebuilt inside each baked statistic jit at O(sum n_i^3) —
        recompute beats carrying an O(N) tensor per statistic);
        ``predictor()`` bakes params+data into fused statistics."""
        return {}

    def predictor(self, params=None):
        from .predictor import Predictor

        return Predictor(self, params)

    # -- joint sampling (Matheron on the per-axis-augmented grid) -----------------
    def _joint_draws(self, params, xq_np, inputs, outputs, samples, seed,
                     prior=False):
        """(M, samples) exact joint draws of the latent field at the
        query rows.  Per axis, the union of the grid axis and the query
        coordinates is itself an axis, so the joint prior over
        (grid x queries) is Kronecker on the augmented axes: draw the
        prior field there (Q_u sqrt(lam_u) eps), then Matheron-correct
        against the observations, f* = f'_q + K_*q S^{-1} (y - f'_X -
        eps_noise).  Every draw is exact and costs O(sum |u_i|^3 +
        N sum |u_i|)."""
        xq_np = np.asarray(xq_np, settings.floatx)
        m_rows = xq_np.shape[0]
        axes_u, grid_ix, query_ix = [], [], []
        for i, a in enumerate(self._axes):
            u, inv = np.unique(
                np.concatenate([a[:, 0], xq_np[:, i]]), return_inverse=True)
            axes_u.append(u.reshape(-1, 1))
            grid_ix.append(inv[: a.shape[0]])
            query_ix.append(inv[a.shape[0]:])
        u_size = int(np.prod([u.shape[0] for u in axes_u]))
        if u_size > 4_000_000:
            raise ValueError(
                f"augmented sampling grid has {u_size} cells — thin the "
                "query set (or query on a coarser grid)")

        ks_u = tuple(
            k.cov(params, jnp.asarray(u, settings.dtype))
            for k, u in zip(self.f_kernels, axes_u))
        qs_u, lams_u = kron_eigs(ks_u)
        sq = [jnp.sqrt(l) for l in lams_u]
        key = jax.random.PRNGKey(seed)
        ushape = tuple(u.shape[0] for u in axes_u)
        gix = tuple(jnp.asarray(g) for g in grid_ix)
        qix = tuple(jnp.asarray(qi) for qi in query_ix)
        # meshed index tuples selecting the grid / query sub-tensors
        gmesh = jnp.meshgrid(*gix, indexing="ij")

        def prior_field(k):
            eps = jax.random.normal(k, ushape, settings.dtype)
            scaled = eps
            for i, s in enumerate(sq):
                shape = [1] * len(ushape)
                shape[i] = s.shape[0]
                scaled = scaled * s.reshape(shape)
            return kron_apply(list(qs_u), scaled)

        def at_queries(field):
            return field[qix]                    # paired advanced indexing

        if prior:
            keys = jax.random.split(key, samples)
            draws = jax.vmap(lambda k: at_queries(prior_field(k)))(keys)
            return np.asarray(draws.T)

        r = self._noise_var(params)
        ks = self._grams(params)
        cs = [jnp.asarray(
            k.cov(params, jnp.asarray(xq_np[:, i:i + 1], settings.dtype),
                  jnp.asarray(a, settings.dtype)))
            for i, (k, a) in enumerate(zip(self.f_kernels, self._axes))]

        if self._is_complete(inputs):
            qs, lams = kron_eigs(ks)
            dinv = kron_dinv(lams, r)
            yt = self._y_tensor(params, inputs, outputs)

            def one(k):
                k1, k2 = jax.random.split(k)
                fpr = prior_field(k1)
                f_grid = fpr[tuple(gmesh)]
                eps_n = jnp.sqrt(r) * jax.random.normal(
                    k2, f_grid.shape, settings.dtype)
                resid = yt - f_grid - eps_n
                st = kron_apply([q.T for q in qs], resid) * dinv
                alpha_r = kron_apply(list(qs), st)
                return at_queries(fpr) + cross_mean(cs, alpha_r)

            draws = jax.vmap(one)(jax.random.split(key, samples))
            return np.asarray(draws.T)                          # (M, S)

        # masked grid: residuals for every draw solved in ONE multi-RHS
        # PCG against the observed-block operator
        x_in = jnp.asarray(inputs, settings.dtype)
        idx = self._idx_stack(x_in)
        yres = self._yres(params, inputs, outputs)
        obs_u = tuple(g[ix] for g, ix in zip(gix, tuple(idx)))

        def one_prior(k):
            k1, k2 = jax.random.split(k)
            fpr = prior_field(k1)
            f_obs = fpr[obs_u]
            eps_n = jnp.sqrt(r) * jax.random.normal(
                k2, f_obs.shape, settings.dtype)
            return at_queries(fpr), yres - f_obs - eps_n

        f_q, resids = jax.vmap(one_prior)(
            jax.random.split(key, samples))         # (S, M), (S, n_obs)
        alphas = masked_cross_solve(
            ks, r, idx, self._grid_shape(), resids.T,
            rank=self._masked["rank"],
            cg_iters=max(200, self._masked["cg_iters"]))  # (n_obs, S)
        b = self._masked_b(cs, idx)                 # (n_obs, M)
        corr = jnp.matmul(alphas.T, b,
                          precision=settings.matmul_precision)  # (S, M)
        return np.asarray((f_q + corr).T)                        # (M, S)

    # -- host-side sampling / quantiles ---------------------------------------------
    def sampler(self, params=None, space=None, inputs=None, outputs=None,
                samples=1, prior=False, noise=False, rng=None, seed=0):
        """(M, samples) JOINT draws of the latent field at the query
        rows (``noise=True`` adds observation noise per row)."""
        if params is None:
            params = self.params
        if space is None:
            space = self.space
        if inputs is None:
            inputs = self._inputs
        if outputs is None:
            outputs = self._outputs
        pj = {k: jnp.asarray(v) for k, v in params.items()}
        f = self._joint_draws(pj, space, inputs, outputs, int(samples),
                              int(seed), prior=prior)
        f = f + np.asarray(self.f_location(pj, jnp.asarray(
            space, settings.dtype)))[:, None]
        if noise:
            if rng is None:
                rng = np.random.default_rng(seed + 1)
            s2 = float(np.maximum(np.asarray(hval(self.f_noise.var, pj)),
                                  1e-10))
            f = f + np.sqrt(s2) * rng.standard_normal(f.shape).astype(
                settings.floatx)
        return f

    def quantiler(self, params=None, space=None, inputs=None, outputs=None,
                  q=0.975, prior=False, noise=False, simulations=None):
        from scipy import stats

        if params is None:
            params = self.params
        if space is None:
            space = self.space
        m = np.asarray(self.location(params, space, inputs, outputs,
                                     prior=prior))
        v = np.maximum(np.asarray(
            self.kernel_diag(params, space, inputs, outputs, prior=prior)),
            0.0)
        if noise:
            pj = {k: np.asarray(vv) for k, vv in params.items()}
            v = v + float(np.maximum(hval(self.f_noise.var, pj), 1e-10))
        return stats.norm.ppf(q, loc=m, scale=np.sqrt(np.maximum(v,
                                                                 1e-12)))
