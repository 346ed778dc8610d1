"""Datatrace toolkit: chain post-processing, convergence diagnostics,
posterior analytics and plots.

Rebuild of ``/root/reference/g3py/bayesian/average.py``: chains -> flat
pandas "datatrace" with burn-in/outlier flags and transformed columns
(:59-123), Gelman-Rubin / burn-in bisection / mESS diagnostics (:653-862 —
the reference numba-jitted ``gelman_rubin``; plain vectorized numpy is
already faster here), sklearn KDE / mixture clustering / candidate selection
(:138-397), and the seaborn/matplotlib plot suite (:402-649).

``mcmc_ensemble`` itself lives in :mod:`g3py_tpu.bayesian.samplers` (the
TPU-native sampler); it is re-exported here for reference-API parity.
"""

import numpy as np
import pandas as pd
import scipy.special
import scipy.stats
import matplotlib.pyplot as plt

from ..config import settings
from ..utils.plots import plot_text, show
from .. import native as _native
from .samplers import mcmc_ensemble  # noqa: F401  (re-export, reference parity)

__all__ = [
    "mcmc_ensemble",
    "chains_to_datatrace",
    "datatrace_to_chains",
    "datatrace_to_kde",
    "kde_to_datatrace",
    "cluster_datatrace",
    "errors_datatrace",
    "marginal_datatrace",
    "conditional_datatrace",
    "marginal",
    "conditional",
    "find_candidates",
    "gelman_rubin",
    "burn_in_samples",
    "effective_sample_min",
    "effective_sample_size",
    "plot_datatrace",
    "plot_clusters",
    "kde_datatrace",
    "hist_datatrace",
    "scatter_datatrace",
]


# ---------------------------------------------------------------------------
# datatrace construction (reference average.py:59-135)
# ---------------------------------------------------------------------------


def chains_to_datatrace(process, chains, ll=None, transforms=True, burnin_tol=0.01,
                        burnin_method="multi-sum", burnin_dims=None,
                        burnin_default=0.1, outlayer_percentile=0.001,
                        clusters=None):
    """chains (nchain, niter, ndim) -> flat frame with per-var columns,
    ``_nchain/_niter/_ll``, burn-in flag from Gelman-Rubin bisection,
    outlier flag from ll/param percentiles, transformed param columns, and
    optional clustering."""
    columns = process.active.param_names()
    n_vars = len(columns)
    chains = np.asarray(chains)
    if chains.ndim == 2:
        chains = chains[None, :, :]
    if ll is not None and np.ndim(ll) == 1:
        ll = np.asarray(ll)[None, :]
    nburn = None
    if burnin_tol is not None:
        dims = process.active.sampling_dims if burnin_dims is None else burnin_dims
        nburn = burn_in_samples(chains[:, :, dims], tol=burnin_tol,
                                method=burnin_method)
    frames = []
    for nchain in range(len(chains)):
        pdchain = pd.DataFrame(chains[nchain, :, :], columns=columns)
        pdchain["_nchain"] = nchain
        pdchain["_niter"] = pdchain.index
        if burnin_tol is not None:
            pdchain["_burnin"] = pdchain["_niter"] > nburn
        if ll is not None:
            pdchain["_ll"] = ll[nchain]
        frames.append(pdchain)
    datatrace = pd.concat(frames, ignore_index=True)

    if outlayer_percentile is not None and len(datatrace):
        base = datatrace[np.isfinite(datatrace["_ll"])] if ll is not None else datatrace
        if len(base):
            q = outlayer_percentile
            qcols = columns + (["_ll"] if ll is not None else [])
            lower = base[qcols].quantile(q)
            upper = base[qcols].quantile(1 - q)
            ndim = process.ndim
            par = datatrace.iloc[:, :ndim]
            bad = ((par > upper[columns]) | (par < lower[columns])).any(axis=1)
            if ll is not None:
                bad |= (datatrace["_ll"] > upper["_ll"]) | (datatrace["_ll"] < lower["_ll"])
            ok = ~bad
            if ll is not None:
                ok &= np.isfinite(datatrace["_ll"])
            ok &= np.isfinite(
                datatrace[columns].replace([np.inf, -np.inf], np.nan)
            ).all(axis=1)
            datatrace["_outlayer"] = ok

    if transforms:
        reg = process.active
        ncolumn = n_vars
        for p in reg.ordered_params:
            tname = p.prior.transform.name
            if tname == "id":
                continue
            cols = ([p.name] if p.size == 1
                    else [f"{p.name}__{i}" for i in range(p.size)])
            for c in cols:
                newc = c.replace(p.name, f"{p.name}_{tname}_")
                vals = p.prior.transform.forward(datatrace[c].values)
                datatrace.insert(ncolumn, newc, vals)
                ncolumn += 1

    if clusters is not None and clusters > 0:
        cluster_datatrace(process, datatrace, clusters)
    return datatrace


def datatrace_to_chains(process, dt, flat=False, burnin=False):
    """Inverse of :func:`chains_to_datatrace` (reference :126-135)."""
    if burnin and "_burnin" in dt and dt._burnin.any():
        # fall back to the full trace when burn-in never converged
        chain = dt[dt._burnin]
    else:
        chain = dt
    cols = process.active.param_names()
    if flat:
        return chain[cols].values
    lev = chain.set_index([chain._nchain, chain._niter]).index
    nchain = lev.get_level_values(0).nunique()
    niter = len(chain) // nchain
    return chain[cols].values.reshape(nchain, niter, process.ndim)


# ---------------------------------------------------------------------------
# posterior analytics (reference :138-397)
# ---------------------------------------------------------------------------


def datatrace_to_kde(process, dt, kernel="tophat", bandwidth=0.02, min_ll=-1e6):
    """Kernel density over post-burn-in samples (reference :138-159)."""
    from sklearn.neighbors import KernelDensity

    if "_ll" in dt:
        dt = dt[np.isfinite(dt["_ll"])]
        dt = dt[dt._ll > min_ll]
    cols = process.active.param_names()
    sel = dt[dt._burnin] if "_burnin" in dt else dt
    kde = KernelDensity(kernel=kernel, bandwidth=bandwidth).fit(sel[cols])
    kde.min_ll = sel["_ll"].min() if "_ll" in sel else -np.inf
    return kde


def kde_to_datatrace(process, kde, nsamples=1000, prior=False):
    """Rejection-refill sampling of a KDE back into a datatrace
    (reference :162-190)."""
    samples = kde.sample(n_samples=1)
    ll = np.asarray(process.logp_chain(samples, prior=prior))
    keep = ll > kde.min_ll
    samples, ll = samples[keep], ll[keep]
    while len(samples) < nsamples:
        new = kde.sample(n_samples=nsamples - len(samples))
        new_ll = np.asarray(process.logp_chain(new, prior=prior))
        keep = new_ll > kde.min_ll
        samples = np.concatenate([samples, new[keep]])
        ll = np.concatenate([ll, new_ll[keep]])
    kde_dt = chains_to_datatrace(process, samples[None, :, :], ll=ll[None, :])
    if hasattr(process, "_cluster"):
        process._cluster(kde_dt)
    kde_dt["_burnin"] = True
    return kde_dt


def cluster_datatrace(process, dt, n_components=5, bayesian=True, burnin=True,
                      outlayer=True, n_init=1, max_iter=5000):
    """GMM clustering of a datatrace; attaches a ``_cluster`` labeler to the
    process (reference :193-240)."""
    from sklearn import mixture

    cols = process.active.param_names()
    sel = dt
    if burnin and "_burnin" in sel:
        tmp = sel[sel._burnin]
        if len(tmp) > 0:
            sel = tmp
    if outlayer and "_outlayer" in sel:
        tmp = sel[sel._outlayer]
        if len(tmp) > 0:
            sel = tmp
    data = sel[cols]
    method = mixture.BayesianGaussianMixture if bayesian else mixture.GaussianMixture
    gm = method(n_components=n_components, covariance_type="full",
                max_iter=max_iter, n_init=n_init).fit(data)
    labels = gm.predict(data)
    argsort = np.argsort(np.bincount(labels, minlength=n_components))
    argsorted = sorted(np.arange(n_components), reverse=True)

    def _cluster(datatrace):
        pred = gm.predict(datatrace[cols].values)
        datatrace["_cluster"] = (pred == argsort[:, None]).T.dot(argsorted)

    _cluster(dt)
    process._cluster = _cluster
    return _cluster


def errors_datatrace(process, dt, inputs=None, outputs=None, space=None, hidden=None,
                     l1=True, l2=True, nlpd=False, mse=False):
    """Per-row prediction errors (reference :243-271), vectorized over the
    datatrace instead of a pandas .apply loop."""
    cols = process.active.param_names()
    arr = np.asarray(dt[cols].values, dtype=settings.floatx)

    def batch(th_name, **kw):
        # one vmapped dispatch for the whole trace; non-finite ROWS come
        # back as NaN through the pure functions' guards, while structural
        # errors (shape bugs, missing statistics) raise loudly — the old
        # per-row try/except would have hidden those as a NaN column
        out = process._call_method_vrows(
            th_name, arr, space=space, vector=hidden, inputs=inputs,
            outputs=outputs, **kw)
        return np.float32(np.asarray(out))

    if l1:
        dt["_l1"] = batch("th_error_l1")
    if l2:
        dt["_l2"] = batch("th_error_l2")
    if nlpd:
        n = len(space) if space is not None else len(process.space)
        dt["_nlpd"] = -batch("th_logpredictive", noise=True) / n
    if mse:
        dt["_mse"] = batch("th_error_mse")
    return dt


def marginal_datatrace(dt, items=None, like=None, regex=None, drop=None, samples=None):
    """Column/row filter of a datatrace (reference :275-305)."""
    if drop is not None:
        dt = dt.drop(drop, axis=1)
    if items is None and like is None and regex is None:
        df = dt
    else:
        df = dt.filter(items=items, like=like, regex=regex)
    if samples is None or samples > len(df):
        return df
    return df.sample(samples)


def conditional_datatrace(dt, lambda_df):
    """Rows satisfying a predicate (reference :308-322)."""
    out = dt.loc[lambda_df, :]
    print("#" + str(len(out)) + " (" + str(100 * len(out) / len(dt)) + " %)")
    return out


def marginal(dt, items=None, like=None, regex=None, drop=None, samples=None):
    return marginal_datatrace(dt, items=items, like=like, regex=regex, drop=drop,
                              samples=samples)


def conditional(dt, lambda_df):
    return conditional_datatrace(dt, lambda_df)


def find_candidates(dt, ll=1, l1=0, l2=0, nlpd=0, mse=0, mean=False, median=False,
                    by_cluster=True, rand=0):
    """Best rows per criterion, optionally per cluster (reference :330-397)."""
    dt_full = dt.drop_duplicates(
        subset=[k for k in dt.columns if not k.startswith("_")])
    candidates = []
    groups = (dt_full._cluster.unique()
              if (by_cluster and "_cluster" in dt_full) else [0])
    for c in groups:
        sel = dt_full[dt_full._cluster == c] if (by_cluster and "_cluster" in dt_full) else dt_full
        for crit, count, best in [("_ll", ll, "largest"), ("_l1", l1, "smallest"),
                                  ("_l2", l2, "smallest"), ("_nlpd", nlpd, "smallest"),
                                  ("_mse", mse, "smallest")]:
            if crit in sel and count:
                rows = (sel.nlargest(count, crit) if best == "largest"
                        else sel.nsmallest(count, crit))
                for index, row in rows.iterrows():
                    row = row.copy()
                    row.name = crit.lstrip("_") + str(c)
                    row["n"] = index
                    candidates.append(row)
        if mean:
            m = sel.mean(numeric_only=True)
            m.name = "mean"
            candidates.append(m)
        if median:
            m = sel.median(numeric_only=True)
            m.name = "median"
            candidates.append(m)
    out = pd.DataFrame(candidates, columns=list(dt.columns) + ["n"])
    if rand:
        out = pd.concat([out, dt.sample(rand)])
    if "_ll" in out:
        out = out.sort_values(by="_ll", ascending=False)
    return out


# ---------------------------------------------------------------------------
# diagnostics (reference :653-862)
# ---------------------------------------------------------------------------


def gelman_rubin(chains, method="multi-sum"):
    """|R-hat - 1| convergence score over (nwalkers, nsamples, ndim) chains
    (reference :653-682; numba there, plain numpy here)."""
    chains = np.asarray(chains, dtype=np.float64)
    nwalkers, nsamples, ndim = chains.shape
    if nwalkers == 1:
        return 0.0
    if method in ("multi-sum", "multi-max"):
        B = nsamples * np.cov(np.mean(chains, axis=1).T)
        W = np.zeros_like(np.atleast_2d(B))
        for chain in range(nwalkers):
            W += np.atleast_2d(np.cov(chains[chain, :, :].T))
        W /= nwalkers
        B = np.atleast_2d(B)
        Vhat = W * (nsamples - 1) / nsamples + B / nsamples
        eig = np.linalg.eigvals((1 / nsamples) * np.linalg.solve(W, Vhat))
        if method == "multi-sum":
            return float(np.abs((nsamples - 1) / nsamples
                                + ((nwalkers + 1) / nwalkers) * np.sum(eig.real) - 1))
        return float(np.abs((nsamples - 1) / nsamples
                            + ((nwalkers + 1) / nwalkers) * np.max(eig.real) - 1))
    worst, _rhat = _native.gelman_rubin_uni(chains)
    return worst


def burn_in_samples(chains, tol=0.1, method="multi-sum"):
    """Bisection for the smallest prefix window with |R-hat - 1| below tol;
    that count of leading samples is discarded as burn-in.

    Deliberate deviation from the reference (:685-706): there, ``burnin =
    upper`` is assigned *before* ``upper = n``, so the returned value is the
    previously proven window — one bisection step above the minimal one
    (up to 2x).  Here the loop keeps the invariant "``upper`` is always a
    window length proven below tol" (the initial full window passed the
    entry check) and returns it, i.e. the midpoint just proven converged.
    Pinned by tests/test_analytics.py::test_burn_in_change_point."""
    try:
        score = gelman_rubin(chains, method)
    except Exception:
        method = "uni"
        try:
            score = gelman_rubin(chains, method)
        except Exception:
            score = np.inf
    if score > tol:
        return chains.shape[1]
    lower = 0
    upper = chains.shape[1]
    while lower + 1 < upper:
        n = lower + (upper - lower) // 2
        if gelman_rubin(chains[:, :n, :], method) < tol:
            upper = n
        else:
            lower = n
    return upper


def effective_sample_min(process, alpha=0.05, error=0.05, p=None):
    """Target minimum mESS (reference :709-726; arXiv:1512.07713)."""
    if p is None:
        p = process.ndim
    return (np.pi * (2 ** (2 / p)) * scipy.stats.chi2.ppf(1 - alpha, p)
            / (((p * scipy.special.gamma(p / 2)) ** (2 / p)) * (error ** 2)))


def effective_sample_size(process, dt, method="mIS", batch_size=None, fixed=True,
                          flat=False, reshape=False, burnin=True):
    """Multivariate effective sample size over datatrace chains
    (reference :731-757)."""
    chains = datatrace_to_chains(process, dt, flat=flat, burnin=burnin)
    if fixed:
        dims = process.active.sampling_dims
        chains = chains[:, dims] if flat else chains[:, :, dims]
    dim_sample = 1
    if flat:
        chains = chains[None, :, :]
    elif reshape:
        nwalkers, nsamples, ndim = chains.shape
        chains = np.transpose(chains, axes=[1, 0, 2]).reshape(
            1, nsamples, nwalkers * ndim)
        dim_sample = nwalkers
    nwalkers = chains.shape[0]
    chains_mess = np.zeros(nwalkers)
    for nchain in range(nwalkers):
        chains_mess[nchain] = _mESS(chains[nchain, :, :], method, batch_size)
    return np.floor(dim_sample * np.sum(chains_mess))


def _mESS(chain, method="mIS", batch_size=None):
    """mESS = n (det(cov)/det(Sigma))^(1/d) (reference :760-779)."""
    nsamples, ndim = chain.shape
    cov_chain = np.atleast_2d(np.cov(chain.T))
    det_cov = np.abs(np.linalg.det(cov_chain))
    if det_cov == 0:
        return 1
    if method == "batch" or batch_size is not None:
        sigma_cov = _sigma_batch(chain, batch_size or 1)
    elif method == "adjusted":
        sigma_cov = _sigma_mIS_adj(chain)
    else:
        sigma_cov = _sigma_mIS(chain)
    det_sigma = np.abs(np.linalg.det(np.atleast_2d(sigma_cov)))
    if det_sigma == 0:
        return 1
    return nsamples * (det_cov / det_sigma) ** (1 / ndim)


def _is_positive_definite(m):
    try:
        np.linalg.cholesky(m)
        return True
    except np.linalg.LinAlgError:
        return False


def _autocov_matrix(chain, lag):
    return _native.autocov_matrix(chain, lag)


def _autocov_matrix_2(chain, i):
    return _native.autocov_matrix_2(chain, i)


def _sigma_batch(chain, batch_size):
    """Batch-means Markov-CLT covariance (reference :795-808; native C++
    core with a numpy fallback)."""
    return _native.sigma_batch(chain, batch_size)


def _sigma_mIS(chain):
    """mIS estimator (reference :811-829; Dai & Jones)."""
    n = chain.shape[0]
    k = int(np.floor(n / 2 - 1))
    sn = 0
    sigma_cov = _autocov_matrix(chain, lag=0) + 2 * _autocov_matrix(chain, lag=1)
    while sn < k and not _is_positive_definite(sigma_cov):
        sigma_cov += 2 * _autocov_matrix_2(chain, sn + 1)
        sn += 1
    sn -= 1
    m = sn + 1
    sigma_cov_init = sigma_cov
    sigma_cov = sigma_cov + 2 * _autocov_matrix_2(chain, sn + 1)
    while np.linalg.det(sigma_cov_init) < np.linalg.det(sigma_cov) and m < k:
        sigma_cov_init = sigma_cov
        sigma_cov = sigma_cov + 2 * _autocov_matrix_2(chain, m + 1)
        m += 1
    return sigma_cov


def _sigma_mIS_adj(chain):
    """Adjusted mIS estimator (reference :832-862)."""
    n = chain.shape[0]
    k = int(np.floor(n / 2 - 1))
    sn = 0
    sigma_cov = _autocov_matrix(chain, lag=0) + 2 * _autocov_matrix(chain, lag=1)
    while sn < k and not _is_positive_definite(sigma_cov):
        sigma_cov += 2 * _autocov_matrix_2(chain, sn + 1)
        sn += 1
    sn -= 1
    m = sn + 1
    sigma_cov_adj = sigma_cov
    sigma_cov_init = sigma_cov
    sigma_cov = sigma_cov + 2 * _autocov_matrix_2(chain, sn + 1)
    while np.linalg.det(sigma_cov_init) < np.linalg.det(sigma_cov) and m < k:
        sigma_cov_init = sigma_cov
        update = 2 * _autocov_matrix_2(chain, m + 1)
        if not _is_positive_definite(update):
            val, vec = np.linalg.eigh(update)
            val_pos = np.diag(np.maximum(val, 0))
            update_adj = vec.dot(np.linalg.solve(vec.T, val_pos.T).T)
        else:
            update_adj = update
        sigma_cov = sigma_cov + update
        sigma_cov_adj = sigma_cov_adj + update_adj
        m += 1
    return sigma_cov_adj


# ---------------------------------------------------------------------------
# datatrace plots (reference :402-649)
# ---------------------------------------------------------------------------


def plot_datatrace(datatrace, varnames=None, burnin=True, outlayer=True,
                   combined=False, figsize=None):
    """pymc3-style kde+trace panel grid with a burn-in marker
    (reference :402-507)."""
    import seaborn as sb

    dt = datatrace
    special = [c for c in dt.columns if c.startswith("_")]
    if varnames is None:
        varnames = [c for c in dt.columns if not c.startswith("_")]
    n = len(varnames)
    if n == 0:
        return
    fig, axs = plt.subplots(n, 2, squeeze=False,
                            figsize=figsize or (12, 2.2 * n))
    nburn = None
    if "_burnin" in dt and (~dt._burnin).any():
        nburn = dt[~dt._burnin]._niter.max()
    sel = dt
    if burnin and "_burnin" in dt:
        tmp = sel[sel._burnin]
        if len(tmp):
            sel = tmp
    if outlayer and "_outlayer" in sel:
        tmp = sel[sel._outlayer]
        if len(tmp):
            sel = tmp
    for i, v in enumerate(varnames):
        vals = sel[v].dropna().values
        try:
            sb.kdeplot(x=vals, ax=axs[i][0], fill=True)
        except Exception:
            axs[i][0].hist(vals, bins=30)
        axs[i][0].set_title(v)
        for nchain, g in dt.groupby("_nchain"):
            axs[i][1].plot(g._niter, g[v], alpha=0.4, lw=0.7)
        if nburn is not None:
            axs[i][1].axvline(nburn, color="r", ls="--", alpha=0.6)
        axs[i][1].set_title(v)
    plt.tight_layout()
    return fig


def plot_clusters(process, dt, clusters=None, *args, **kwargs):
    """Per-cluster candidate selection + average + particles plots
    (reference :509-527)."""
    if "_cluster" not in dt:
        cluster_datatrace(process, dt, n_components=clusters or 5)
    for c in sorted(dt._cluster.unique()):
        sel = dt[dt._cluster == c]
        process.plot(params=process.active.params_serie(sel.iloc[sel._ll.argmax()]),
                     title=f"cluster {c}", *args, **kwargs)
        show()


def kde_datatrace(dt, varnames=None, size=6):
    """Pairgrid KDE (reference :531-537)."""
    import seaborn as sb

    if varnames is None:
        varnames = [c for c in dt.columns if not c.startswith("_")][:4]
    g = sb.PairGrid(dt[varnames], height=size / max(len(varnames), 1))
    g.map_diag(sb.kdeplot)
    g.map_offdiag(sb.kdeplot, fill=True)
    return g


def hist_datatrace(dt, varnames=None, bins=50, reference=None, figsize=None):
    """Histogram grid with reference lines (reference :540-597)."""
    if varnames is None:
        varnames = [c for c in dt.columns if not c.startswith("_")]
    n = len(varnames)
    fig, axs = plt.subplots((n + 2) // 3, 3, squeeze=False,
                            figsize=figsize or (12, 2.5 * ((n + 2) // 3)))
    for i, v in enumerate(varnames):
        ax = axs[i // 3][i % 3]
        ax.hist(dt[v].dropna().values, bins=bins)
        ax.set_title(v)
        if reference is not None and v in reference:
            ax.axvline(np.asarray(reference[v]).ravel()[0], color="r", ls="--")
    plt.tight_layout()
    return fig


def scatter_datatrace(dt, varnames=None, samples=1000):
    """Pairplot colored by cluster (reference :600-649)."""
    import seaborn as sb

    if varnames is None:
        varnames = [c for c in dt.columns if not c.startswith("_")][:4]
    sel = dt if len(dt) <= samples else dt.sample(samples)
    hue = "_cluster" if "_cluster" in sel else None
    cols = varnames + ([hue] if hue else [])
    return sb.pairplot(sel[cols], hue=hue, corner=True)
