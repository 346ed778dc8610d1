"""EllipticalProcess — shared posterior math for GP/TP families.

Rebuild of ``/root/reference/g3py/processes/elliptical.py``: owns a location
Mean, a Kernel (wrapped with additive KernelNoise when ``noisy=True``), a
Mapping warping, and optionally a Freedom degree hyper; exposes the
prior/posterior location/kernel/cholesky/diag selector methods.

The reference built every tensor eagerly at graph definition
(``th_define_process``, elliptical.py:60-107); here each selector returns a
pure jax function and XLA's jit cache plays the role of the compile cache.
Posterior algebra (elliptical.py:81-92) is computed through one robust
Cholesky of the observed gram + triangular solves (the reference used a
generic ``tsl.solve``):

  location* = m(s) + K_si Kii^{-1} (T^{-1}y - m(i))
  kernel*   = K_ss - K_si Kii^{-1} K_is

with the diag variant evaluated directly as k_ss - sum_col(solve(L, K_is)^2)
— never materializing the full posterior covariance for wide spaces.
"""

import numpy as np
import jax.numpy as jnp
import matplotlib.pyplot as plt
from matplotlib import cm

from ..config import settings
from ..hypers import Freedom
from ..hypers.kernels import KernelSum, KernelNoise
from ..hypers.means import Mean, Zero
from ..hypers.mappings import Mapping, Identity
from ..ops.guards import to_cov, to_num, to_bounded
from ..ops.linalg import (safe_cholesky, solve_lower_triangular, cho_solve,
                          blocked_trtri)
from ..utils.plots import plot_text, show, grid2d, plot_2d
from .stochastic import StochasticProcess, CompiledFn, zero32

__all__ = ["EllipticalProcess"]

# Reserved params-dict keys carrying a precomputed observed-gram
# factorization (``posterior_state``).  Keys with the ``_state_`` prefix
# pass through ``filter_params`` untouched (stochastic._call_method) and are
# never hyperparameters.  When present, the posterior selectors below use
# them instead of re-factorizing — the serving fast path (see
# models/predictor.py).
STATE_OBS_LINV = "_state_obs_linv"     # L^{-1} of chol(K_obs + noise)
STATE_OBS_ALPHA = "_state_obs_alpha"   # K^{-1} (T^{-1}y - m)
STATE_OBS_Z = "_state_obs_z"           # L^{-1} (T^{-1}y - m)


def _contains_kernel_noise(kernel):
    """True when a KernelNoise term hides anywhere in a kernel tree."""
    stack = [kernel]
    while stack:
        k = stack.pop()
        if isinstance(k, KernelNoise):
            return True
        for attr in ("k1", "k2", "k_inner"):
            sub = getattr(k, attr, None)
            if sub is not None:
                stack.append(sub)
    return False


class EllipticalProcess(StochasticProcess):
    def __init__(self, space=None, location: Mean = None, kernel=None,
                 mapping: Mapping = None, degree: Freedom = None, noisy=True,
                 var_noise=None, *args, **kwargs):
        self.f_location = location if location is not None else Zero()
        self.f_degree = degree
        self.f_mapping = mapping if mapping is not None else Identity()
        self.f_kernel = kernel
        if noisy:
            self.f_kernel_noise = KernelSum(
                self.f_kernel, KernelNoise(name="Noise", var=var_noise))
        else:
            self.f_kernel_noise = self.f_kernel
        kwargs["space"] = space
        super().__init__(*args, **kwargs)

    # -- registration (reference elliptical.py:35-52) -------------------------
    def _components(self):
        comps = [self.f_location, self.f_kernel_noise, self.f_mapping]
        if self.f_degree is not None:
            comps.append(self.f_degree)
        return comps

    def _check_hypers(self):
        self.f_location.check_dims(self.inputs)
        self.f_kernel_noise.check_dims(self.inputs)
        self.f_mapping.check_dims(self.inputs)
        self.f_location.check_hypers(self.name + "_")
        self.f_kernel_noise.check_hypers(self.name + "_")
        self.f_mapping.check_hypers(self.name + "_")
        if self.f_degree is not None:
            self.f_degree.check_dims(None)
            self.f_degree.check_hypers(self.name + "_")

    def default_hypers(self):
        x = self.inputs
        y = self.outputs
        out = {}
        out.update(self.f_location.default_hypers_dims(x, y))
        out.update(self.f_kernel_noise.default_hypers_dims(x, y))
        out.update(self.f_mapping.default_hypers_dims(x, y))
        if self.f_degree is not None:
            out.update(self.f_degree.default_hypers_dims(x, y))
        return out

    def _noncentered_sampling_shear(self):
        """Non-centered reparameterization of the warped hierarchy for
        ``sample_hypers(reparam='noncentered')``.

        The funnel in warped-GP hyper posteriors (the bench workload's
        remaining NUTS divergences) is the AMPLITUDE RIDGE: the scale of
        the latent observations ``z = g^{-1}(y)`` moves exponentially
        with the mapping hypers, and the kernel/noise variances must
        chase it.  Sampling the variance hypers *relative to the current
        data scale* removes the ridge exactly: in unconstrained (log)
        space this is the unit-Jacobian shear

            theta_var = v_var + log Var[g^{-1}(y; v_mapping)]

        (the shifted dims never feed the shift, so the map is unit
        lower-triangular — a pure reparameterization, no density
        correction).  Returns ``(shear, unshear)`` over the sampling-dims
        vector, or None when no amplitude hyper is being sampled."""
        import jax

        from ..hypers import LogTransform

        reg = self.active
        slices = reg.slices()
        prefix = self.name + "_"
        dims_full = []
        for p in reg.ordered_params:
            if (p.name.startswith(prefix) and p.name.endswith("_var")
                    and isinstance(p.prior.transform, LogTransform)):
                s0, s1, _ = slices[p.name]
                dims_full.extend(range(s0, s1))
        sampling = list(reg.sampling_dims)
        pos = {d: i for i, d in enumerate(sampling)}
        tgt = np.asarray([pos[d] for d in dims_full if d in pos],
                         np.int32)
        if tgt.size == 0:
            return None
        sdims = np.asarray(sampling, np.int32)
        full = jnp.asarray(reg.dict_to_array(reg.params))
        y = jnp.asarray(self.outputs, settings.dtype)

        def logscale(v):
            u = v if len(sdims) == reg.ndim else full.at[sdims].set(v)
            params = reg.array_to_dict_jax(u)
            z = self.f_mapping.inv(params, y)
            return jnp.log(jnp.maximum(jnp.var(z),
                                       jnp.asarray(1e-20, v.dtype)))

        def shear(v):
            return v.at[tgt].add(logscale(v))

        def unshear(v):
            # the mapping dims are untouched by shear, so the shift
            # computed at theta equals the shift computed at v
            return v.at[tgt].add(-logscale(v))

        return shear, unshear

    # -- shared pure-math helpers ------------------------------------------------
    def _latent_obs(self, params, outputs):
        """T^{-1} y (reference mapping_outputs, elliptical.py:62)."""
        return to_num(self.f_mapping.inv(params, outputs))

    def _obs_chol(self, params, inputs):
        """Robust Cholesky of the (noisy) observed gram."""
        return safe_cholesky(to_cov(self.f_kernel_noise.cov(params, inputs)))

    # -- device-sharded (multi-chip) training objective -------------------------
    def _distributed_parts(self, mesh=None, axis="dp", what="nll_distributed"):
        """Shared validation + (mesh, cov_fn, noise_fn) for every sharded
        band-gram consumer (training objectives, multi-chip serving).
        Requires the standard ``noisy=True`` construction and n divisible
        by the mesh device count."""
        from ..hypers import hval
        from ..hypers.kernels import KernelSum, KernelNoise
        from ..parallel.cholesky import _resolve_mesh

        mesh = _resolve_mesh(mesh, axis)
        n_dev = mesh.shape[axis]
        n_obs = len(self.inputs) if self.inputs is not None else 0
        if n_obs == 0 or n_obs % n_dev:
            raise ValueError(
                f"{what}: n={n_obs} observations must divide "
                f"evenly over the {n_dev}-device mesh (subset/pad the "
                "training data or use a mesh whose size divides n)")
        kn = self.f_kernel_noise
        if not (isinstance(kn, KernelSum) and isinstance(kn.k2, KernelNoise)):
            raise ValueError(f"{what} needs the noisy=True "
                             "KernelSum(kernel, KernelNoise) construction")
        if _contains_kernel_noise(self.f_kernel):
            # the band gram is built from CROSS covariances (x_band vs x);
            # a KernelNoise term inside the signal kernel contributes 0
            # there and would silently vanish — reject instead
            raise ValueError(f"{what} does not support KernelNoise "
                             "terms inside the signal kernel (the band gram "
                             "sees only cross-covariances)")
        kernel = self.f_kernel
        noise_hyper = kn.k2.var
        return (mesh, lambda p, x1, x2: kernel.cov(p, x1, x2),
                lambda p: hval(noise_hyper, p))

    def _distributed_qld(self, mesh=None, block=None, axis="dp"):
        """Device-sharded gram primitive ``fn(params, x, resid) ->
        (quad, logdet_half)`` (parallel/cholesky.py
        `distributed_quad_logdet`): the (n, n) observed gram lives as
        per-device row bands, never whole.  Used by the elliptical
        subclasses' ``nll_distributed`` scalarizations (gaussian and
        Student-t)."""
        from ..parallel.cholesky import distributed_quad_logdet

        mesh, cov_fn, noise_fn = self._distributed_parts(mesh, axis)
        return distributed_quad_logdet(cov_fn, mesh=mesh, block=block,
                                       axis=axis, noise_fn=noise_fn)

    # _find_map_distributed (find_MAP engine='distributed') lives on
    # StochasticProcess — it is generic over any subclass defining
    # ``nll_distributed`` (GP/WGP, TP/WTP here; StateSpaceGP's
    # time-axis-sharded objective rides the same engine).

    def _posterior_state_pure(self):
        """Pure ``fn(params, inputs, outputs) -> state dict`` behind
        :meth:`posterior_state` (also vmapped over parameter rows by the
        datatrace-averaged predictor)."""
        mapping = self.f_mapping
        location = self.f_location
        kernel_noise = self.f_kernel_noise

        def pure(p, inputs, outputs):
            chol = safe_cholesky(to_cov(kernel_noise.cov(p, inputs)))
            # the factorization runs ONCE per predictor — pick the block
            # for compile cost (fewer unrolled panels), not the last few
            # ms of runtime (2048: 46s compile / 77.5ms at 16k vs 1024:
            # 74s / 67.2ms on the hosted tunnel)
            nobs = inputs.shape[0]
            linv = blocked_trtri(
                chol, block=nobs if nobs <= 512 else
                (512 if nobs <= 4096 else 2048))
            resid = to_num(mapping.inv(p, outputs)) - location(p, inputs)
            z = jnp.matmul(linv, resid, precision=settings.matmul_precision)
            alpha = jnp.matmul(linv.T, z,
                               precision=settings.matmul_precision)
            return {STATE_OBS_LINV: linv, STATE_OBS_ALPHA: alpha,
                    STATE_OBS_Z: z}

        return pure

    def _posterior_state_update_pure(self):
        """Pure incremental-state update: given the factored state for
        ``x_old`` and a block of ``m`` new observations, produce the state
        for the concatenated data in O((n+m)^2 m) — no O(n^3) refactor.

        Block-Cholesky identity: with L_aug = [[L, 0], [C, S]],
        C = K_newX L^{-T} and S = chol(K_newnew - C C^T),

          linv_aug  = [[L^{-1}, 0], [-S^{-1} C L^{-1}, S^{-1}]]
          z_aug     = [z, S^{-1}(r_new - C z)]
          alpha_aug = linv_aug^T z_aug
        """
        mapping = self.f_mapping
        location = self.f_location
        kernel_noise = self.f_kernel_noise

        def pure(p, state, x_old, x_new, y_new):
            linv = state[STATE_OBS_LINV]
            z = state[STATE_OBS_Z]
            m = x_new.shape[0]
            # cross gram (noise contributes nothing off-diagonal) and the
            # new block's own noisy gram
            k_cross = to_num(kernel_noise.cov(p, x_new, x_old))  # (m, n)
            k_new = to_cov(kernel_noise.cov(p, x_new))  # (m, m)
            c = jnp.matmul(k_cross, linv.T,
                           precision=settings.matmul_precision)  # (m, n)
            s_block = k_new - jnp.matmul(c, c.T,
                                         precision=settings.matmul_precision)
            s_chol = safe_cholesky(s_block)
            s_inv = solve_lower_triangular(s_chol,
                                           jnp.eye(m, dtype=s_chol.dtype))
            # new whitened residual rows
            r_new = to_num(mapping.inv(p, y_new)) - location(p, x_new)
            z_b = jnp.matmul(s_inv, r_new - jnp.matmul(
                c, z, precision=settings.matmul_precision),
                precision=settings.matmul_precision)
            # assemble linv_aug
            bottom_left = -jnp.matmul(
                s_inv, jnp.matmul(c, linv,
                                  precision=settings.matmul_precision),
                precision=settings.matmul_precision)
            n = linv.shape[0]
            linv_aug = jnp.block(
                [[linv, jnp.zeros((n, m), linv.dtype)],
                 [bottom_left, s_inv]])
            z_aug = jnp.concatenate([z, z_b])
            alpha_aug = jnp.matmul(linv_aug.T, z_aug,
                                   precision=settings.matmul_precision)
            return {STATE_OBS_LINV: linv_aug, STATE_OBS_ALPHA: alpha_aug,
                    STATE_OBS_Z: z_aug}

        return pure

    def posterior_state(self, params=None):
        """Factor the observed gram ONCE for streaming prediction.

        Returns a dict of reserved ``_state_*`` device arrays (L^{-1} of the
        observed-gram Cholesky, alpha = K^{-1}(T^{-1}y - m), and the
        whitened residual z).  Merged into a params dict, every posterior
        statistic — mean/std/quantiles/cov/samples/logpredictive — runs as
        pure matmuls against this state: O(n m d + n^2 m) per query batch
        instead of O(n^3) per statistic.  ``predictor()`` wraps this into a
        serving object.  The state is valid for exactly these params and the
        current observed data (see ``Predictor._check``)."""
        if params is None:
            params = self.params
        params = self.filter_params(params)
        name = "posterior_state"
        if name not in self.compiles:
            state_pure = self._posterior_state_pure()

            def pure(p, space, inputs, outputs, vector):
                return state_pure(p, inputs, outputs)

            self.compiles[name] = CompiledFn(pure, name)
        _, inputs, outputs = self._resolve_data(None, None, None)
        if not self.is_observed:
            raise ValueError("posterior_state needs observed data "
                             "(call observed(x, y) first)")
        from ..config import asarray_x
        pdict = {k: asarray_x(v) for k, v in params.items()}
        vec = np.zeros(0, dtype=settings.floatx)
        # call the jit directly: the state must STAY on device (CompiledFn's
        # host conversion would round-trip O(n^2) bytes and break the dict)
        cf = self.compiles[name]
        cf.executed += 1
        return cf.fn(pdict, inputs, inputs, outputs, vec)

    def predictor(self, params=None):
        """Serving fast path: a :class:`~g3py_tpu.models.predictor.Predictor`
        bound to these params and the current observed data."""
        from .predictor import Predictor
        return Predictor(self, params=params)

    def averaged_predictor(self, datatrace, max_rows=64):
        """Serving fast path for the Bayesian model average: factor the
        posterior once PER DATATRACE ROW (vmapped), then serve
        row-averaged statistics as batched matmuls
        (:class:`~g3py_tpu.models.predictor.AveragedPredictor`)."""
        from .predictor import AveragedPredictor
        return AveragedPredictor(self, datatrace, max_rows=max_rows)

    def clustered_predictors(self, datatrace, max_rows=64):
        """One :class:`AveragedPredictor` per posterior cluster: serve each
        mode of a multimodal hyper posterior separately (the fast-path
        counterpart of ``plot_clusters``, bayesian/average.py).  Requires
        the ``_cluster`` column that :func:`cluster_datatrace` adds;
        returns ``{cluster_label: AveragedPredictor}`` ordered by label."""
        from .predictor import AveragedPredictor
        if "_cluster" not in datatrace:
            raise ValueError(
                "datatrace has no _cluster column — run "
                "cluster_datatrace(process, dt) first")
        out = {}
        for c in sorted(datatrace._cluster.unique()):
            sel = datatrace[datatrace._cluster == c]
            out[int(c)] = AveragedPredictor(self, sel, max_rows=max_rows)
        return out

    def _whitened_cross(self, params, inputs, cross):
        """v = L^{-1} K_is — by matmul against the precomputed inverse when
        a posterior state rides in ``params``, by TRSM otherwise."""
        if STATE_OBS_LINV in params:
            return jnp.matmul(params[STATE_OBS_LINV], cross.T,
                              precision=settings.matmul_precision)
        return solve_lower_triangular(self._obs_chol(params, inputs), cross.T)

    def _posterior_location(self, params, space, inputs, outputs, noise):
        kernel = self.f_kernel_noise if noise else self.f_kernel
        cross = to_num(kernel.cov(params, space, inputs))
        if STATE_OBS_ALPHA in params:
            return (self.f_location(params, space)
                    + jnp.dot(cross, params[STATE_OBS_ALPHA]))
        chol = self._obs_chol(params, inputs)
        resid = self._latent_obs(params, outputs) - self.f_location(params, inputs)
        return self.f_location(params, space) + jnp.dot(cross, cho_solve(chol, resid))

    def _posterior_kernel(self, params, space, inputs, outputs, noise):
        kernel = self.f_kernel_noise if noise else self.f_kernel
        cross = to_num(kernel.cov(params, space, inputs))
        v = self._whitened_cross(params, inputs, cross)  # (n_obs, n_space)
        k_ss = kernel.cov(params, space)
        return k_ss - jnp.matmul(v.T, v, precision=settings.matmul_precision)

    def _posterior_kernel_diag(self, params, space, inputs, outputs, noise):
        """Posterior variance diagonal.

        The latent variance ``k_ss - v'v`` suffers f32 cancellation when the
        space coincides with the observed inputs (it is ~0 there, so the
        subtraction can land a few ulp *negative* — the reference leaves it
        raw, elliptical.py:198-200).  We clamp the latent part at zero and
        add the (cross-cov-free) noise variance separately, so the noisy
        predictive variance is always >= the noise floor and logpredictive
        never sees a zero sd.
        """
        cross = to_num(self.f_kernel.cov(params, space, inputs))
        v = self._whitened_cross(params, inputs, cross)
        k_diag = jnp.diagonal(self.f_kernel.cov(params, space))
        latent = to_bounded(k_diag - jnp.sum(v * v, axis=0), zero32)
        if noise:
            return latent + self._noise_diag(params, space)
        return latent

    def _noise_diag(self, params, space):
        """Diagonal of the noise-only kernel, extracted structurally.

        ``diag(K+sigma^2 I) - diag(K)`` would lose the noise entirely to f32
        absorption whenever the signal variance dwarfs it, so when the noisy
        kernel is the standard ``KernelSum(f_kernel, KernelNoise)`` wrapper
        (this class's constructor) the noise term's own diagonal is evaluated
        directly."""
        kn = self.f_kernel_noise
        if kn is self.f_kernel:
            return jnp.zeros(jnp.shape(space)[0], dtype=settings.floatx)
        if isinstance(kn, KernelSum) and kn.k1 is self.f_kernel:
            return to_bounded(jnp.diagonal(kn.k2.cov(params, space)), zero32)
        return to_bounded(
            jnp.diagonal(kn.cov(params, space))
            - jnp.diagonal(self.f_kernel.cov(params, space)), zero32)

    # -- selector th_* quantities (reference elliptical.py:109-188) --------------
    def th_freedom(self, prior=False, noise=False):
        if self.f_degree is None:
            return None
        deg = self.f_degree

        if prior:
            def fn(params, space, inputs, outputs, vector):
                return deg(params)
        else:
            def fn(params, space, inputs, outputs, vector):
                return deg(params) + jnp.asarray(jnp.shape(inputs)[0],
                                                 settings.dtype)
        return fn

    def th_mapping_inv(self, prior=False, noise=False):
        def fn(params, space, inputs, outputs, vector):
            return self._latent_obs(params, outputs)
        return fn

    def th_mapping(self, prior=False, noise=False):
        def fn(params, space, inputs, outputs, vector):
            # forward warping of an arbitrary latent vector (callers pass the
            # latent through ``vector=``, reference used ``outputs=``)
            return self.f_mapping(params, vector)
        return fn

    def th_location(self, prior=False, noise=False):
        if prior:
            def fn(params, space, inputs, outputs, vector):
                return self.f_location(params, space)
        else:
            def fn(params, space, inputs, outputs, vector):
                return self._posterior_location(params, space, inputs, outputs, noise)
        return fn

    def th_kernel(self, prior=False, noise=False):
        if prior:
            kernel = self.f_kernel_noise if noise else self.f_kernel

            def fn(params, space, inputs, outputs, vector):
                return to_cov(kernel.cov(params, space))
        else:
            def fn(params, space, inputs, outputs, vector):
                return self._posterior_kernel(params, space, inputs, outputs, noise)
        return fn

    def th_cholesky(self, prior=False, noise=False):
        k_fn = self.th_kernel(prior=prior, noise=noise)

        def fn(params, space, inputs, outputs, vector):
            return safe_cholesky(to_cov(k_fn(params, space, inputs, outputs, vector)))
        return fn

    def th_kernel_diag(self, prior=False, noise=False):
        if prior:
            kernel = self.f_kernel_noise if noise else self.f_kernel

            def fn(params, space, inputs, outputs, vector):
                return to_bounded(jnp.diagonal(kernel.cov(params, space)), zero32)
        else:
            def fn(params, space, inputs, outputs, vector):
                return self._posterior_kernel_diag(params, space, inputs, outputs,
                                                   noise)
        return fn

    def th_kernel_sd(self, prior=False, noise=False):
        diag_fn = self.th_kernel_diag(prior=prior, noise=noise)

        def fn(params, space, inputs, outputs, vector):
            return jnp.sqrt(diag_fn(params, space, inputs, outputs, vector))
        return fn

    def th_cholesky_diag(self, prior=False, noise=False):
        sd_fn = self.th_kernel_sd(prior=prior, noise=noise)

        def fn(params, space, inputs, outputs, vector):
            return jnp.diag(sd_fn(params, space, inputs, outputs, vector))
        return fn

    # -- moments (reference elliptical.py:190-217) --------------------------------
    def th_median(self, prior=False, noise=False, simulations=None):
        loc_fn = self.th_location(prior=prior, noise=noise)

        def fn(params, space, inputs, outputs, vector):
            return self.f_mapping(params, loc_fn(params, space, inputs, outputs,
                                                 vector))
        return fn

    def th_mean(self, prior=False, noise=False, simulations=None):
        loc_fn = self.th_location(prior=prior, noise=noise)

        def fn(params, space, inputs, outputs, vector):
            return self.f_mapping(params, loc_fn(params, space, inputs, outputs,
                                                 vector))
        return fn

    def th_variance(self, prior=False, noise=False, simulations=None):
        return self.th_kernel_diag(prior=prior, noise=noise)

    def th_covariance(self, prior=False, noise=False):
        return self.th_kernel(prior=prior, noise=noise)

    # -- dispatcher bindings -------------------------------------------------------
    _dispatch_methods = dict(
        StochasticProcess._dispatch_methods,
        freedom="th_freedom",
        mapping="th_mapping",
        mapping_inv="th_mapping_inv",
        location="th_location",
        kernel="th_kernel",
        cholesky="th_cholesky",
        kernel_diag="th_kernel_diag",
        kernel_sd="th_kernel_sd",
        cholesky_diag="th_cholesky_diag",
    )

    # -- model plots (reference elliptical.py:219-333) -----------------------------
    def plot_kernel(self, params=None, space=None, inputs=None, prior=True,
                    noise=False, centers=(1 / 10, 1 / 2, 9 / 10)):
        if params is None:
            params = self.params
        if space is None:
            space = self.space
        if inputs is None:
            inputs = self.inputs
        ksi = self.kernel(params=params, space=space, inputs=inputs, prior=prior,
                          noise=noise).T
        for ind in centers:
            plt.plot(self.order, ksi[int(len(ksi) * ind), :],
                     label="k(x_" + str(int(len(ksi) * ind)) + ")")
        plot_text("Kernel", "Space x", "Kernel value k(x,v)")

    def plot_concentration(self, params=None, space=None, prior=True, noise=True,
                           color=True, cmap=cm.seismic, figsize=(6, 6),
                           title="Concentration"):
        if params is None:
            params = self.params
        if space is None:
            space = self.space
        concentration = self.kernel(params=params, space=space, prior=prior,
                                    noise=noise)
        if color:
            if figsize is not None:
                plt.figure(None, figsize)
            v = np.max(np.abs(concentration))
            plt.imshow(concentration, cmap=cmap, vmax=v, vmin=-v)
        else:
            plt.matshow(concentration)
        plot_text(title, "Space x", "Space x", legend=False)

    def plot_mapping(self, params=None, domain=None, inputs=None, outputs=None,
                     neval=100, title=None, label="mapping"):
        if params is None:
            params = self.params
        if outputs is None:
            outputs = self.outputs
        if domain is None:
            domain = np.linspace(outputs.min(), outputs.max(), neval,
                                 dtype=settings.floatx)
        plt.plot(domain, np.asarray(self.f_mapping.inv(
            {k: np.asarray(v) for k, v in params.items()}, domain)), label=label)
        plot_text(title or "Mapping", "Domain y", "Domain T(y)")

    def plot_model(self, params=None, indexs=None, kernel=True, mapping=True,
                   marginals=True, bivariate=True):
        if indexs is None:
            mid = len(self.index) // 2
            indexs = [int(self.index[mid]), int(self.index[mid]) + 1]
        if kernel:
            plt.subplot(121)
            self.plot_kernel(params=params)
        if mapping:
            plt.subplot(122)
            self.plot_mapping(params=params)
        show()
        if marginals:
            plt.subplot(121)
            self.plot_distribution(index=indexs[0], params=params,
                                   space=self.space[indexs[0]:indexs[0] + 1, :],
                                   prior=True)
            self.plot_distribution(index=indexs[0], params=params,
                                   space=self.space[indexs[0]:indexs[0] + 1, :])
            plt.subplot(122)
            self.plot_distribution(index=indexs[1], params=params,
                                   space=self.space[indexs[1]:indexs[1] + 1, :],
                                   prior=True)
            self.plot_distribution(index=indexs[1], params=params,
                                   space=self.space[indexs[1]:indexs[1] + 1, :])
            show()
        if bivariate:
            self.plot_distribution2D(indexs=indexs, params=params,
                                     space=self.space[indexs, :])
            show()

    def plot_distribution(self, index=0, params=None, space=None, inputs=None,
                          outputs=None, mean=True, var=True, cov=False, median=False,
                          quantiles=False, quantiles_noise=False, noise=False,
                          prior=False, sigma=4, neval=100, title=None, swap=False,
                          label=None):
        pred = self.predict(params=params, space=space, inputs=inputs,
                            outputs=outputs, mean=mean, var=var, cov=cov,
                            median=median, quantiles=quantiles,
                            quantiles_noise=quantiles_noise, noise=noise,
                            distribution=True, prior=prior)
        domain = np.linspace(pred.mean - sigma * pred.std,
                             pred.mean + sigma * pred.std, neval).reshape(-1)
        dist_plot = np.zeros(len(domain))
        for i in range(len(domain)):
            dist_plot[i] = pred.logpredictive(domain[i:i + 1])
        dist_plot = np.exp(dist_plot)
        if label is None:
            label = "prior" if prior else "posterior"
        if label is False:
            label = None
        if title is None:
            title = "Marginal Distribution y_" + str(self.order[index])
        if swap:
            plt.plot(dist_plot, domain, label=label)
            plot_text(title, "Density", "Domain y")
        else:
            plt.plot(domain, dist_plot, label=label)
            plot_text(title, "Domain y", "Density")

    def plot_distribution2D(self, indexs=(0, 1), params=None, space=None,
                            inputs=None, outputs=None, mean=True, var=True,
                            cov=False, median=False, quantiles=False,
                            quantiles_noise=False, noise=False, prior=False,
                            sigma_1=2, sigma_2=2, neval=33, title=None):
        pred = self.predict(params=params, space=space, inputs=inputs,
                            outputs=outputs, mean=mean, var=var, cov=cov,
                            median=median, quantiles=quantiles,
                            quantiles_noise=quantiles_noise, noise=noise,
                            distribution=True, prior=prior)
        dist1 = np.linspace(pred.mean[0] - sigma_1 * pred.std[0],
                            pred.mean[0] + sigma_1 * pred.std[0], neval)
        dist2 = np.linspace(pred.mean[1] - sigma_2 * pred.std[1],
                            pred.mean[1] + sigma_2 * pred.std[1], neval)
        xy, x2d, y2d = grid2d(dist1, dist2)
        dist_plot = np.zeros(len(xy))
        for i in range(len(xy)):
            dist_plot[i] = pred.logpredictive(xy[i])
        plot_2d(np.exp(dist_plot), x2d, y2d)
        plot_text(title or "Distribution2D",
                  "Domain y_" + str(self.order[indexs[0]]),
                  "Domain y_" + str(self.order[indexs[1]]), legend=False)

    def plot_location(self, params=None, space=None):
        if params is None:
            params = self.params
        if space is None:
            space = self.space
        plt.plot(self.order, self.location(params=params, space=space, prior=True),
                 label="location")
        plot_text("Location", "Space x", "Location value m(x)")
