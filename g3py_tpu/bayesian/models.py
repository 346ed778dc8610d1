"""PlotModel: user-facing reporting mixin for every process.

Rebuild of the reference ``PlotModel``
(``/root/reference/g3py/bayesian/models.py:418-809``): predict-based plots
with mean/median/quantile/noise bands/samples, scores (l1/l2/mse/rmse/
median losses/logp/loglike/logprior/NLPD), Bayesian averaging of
predictions over a datatrace, posterior particles, and ipywidgets sliders.
"""

import numpy as np
import matplotlib.pyplot as plt

from ..config import settings
from ..utils import DictObj
from ..utils.plots import plot, plot_text, show, figure

__all__ = ["PlotModel"]


class PlotModel:
    def __init__(self, name=None, description=None, *args, **kwargs):
        if name is not None:
            self.name = name
        self.is_observed = False
        self.description = description
        if self.description is None:
            self.description = {"title": self.name, "x": "x", "y": "y"}
        self._widget_args = None
        self._widget_kwargs = None
        self.widget_params = None

    @property
    def params_widget(self):
        if self.widget_params is None:
            return self.params
        return DictObj(self.widget_params)

    def predict(self, *args, **kwargs):  # provided by StochasticProcess
        raise NotImplementedError

    def sample(self, params=None, space=None, inputs=None, outputs=None, samples=1,
               prior=False, noise=False):
        s = self.predict(params=params, space=space, inputs=inputs, outputs=outputs,
                         mean=False, std=False, var=False, cov=False, median=False,
                         quantiles=False, quantiles_noise=False, samples=samples,
                         prior=prior, noise=noise)
        return s["samples"]

    def scores(self, params=None, space=None, hidden=None, inputs=None, outputs=None,
               logp=False, logpred=False, bias=True, variance=False, median=False,
               loo=False, *args, **kwargs):
        """Metric set (reference models.py:449-469).  ``loo=True`` adds
        ``_loo`` (leave-one-out log pseudo-likelihood over the OBSERVED
        data, GPML §5.4.2) for processes that expose :meth:`loo`."""
        if hidden is None:
            hidden = self.hidden
        pred = self.predict(params=params, space=space, inputs=inputs, outputs=outputs,
                            mean=True, var=variance, median=median, distribution=logpred)
        scores = DictObj()
        if bias:
            scores["_l1"] = np.mean(np.abs(pred.mean - hidden))
            scores["_l2"] = np.mean((pred.mean - hidden) ** 2)
        if variance:
            scores["_mse"] = np.mean((pred.mean - hidden) ** 2 + pred.variance)
            scores["_rmse"] = np.sqrt(scores["_mse"])
        if median:
            scores["_median_l1"] = np.mean(np.abs(pred.median - hidden))
            scores["_median_l2"] = np.mean((pred.median - hidden) ** 2)
        if logp:
            scores["_logp"] = self.logp(params)
            scores["_loglike"] = self.loglike(params)
            scores["_logprior"] = self.logp(params, prior=True)
        if logpred:
            scores["_nlpd"] = -pred.logpredictive(hidden) / len(hidden)
        if loo and hasattr(self, "loo"):
            scores["_loo"] = self.loo(params)
        return scores

    def filter_params(self, params):
        return DictObj({p.name: params[p.name] for p in self.active.ordered_params
                        if p.name in params})

    def eval_params(self, params=None):
        """Params + logp + scores + untransformed view (reference
        models.py:475-487)."""
        r = DictObj(params)
        r["_ll"] = self.logp(self.filter_params(params))
        r.update(self.scores(params))
        return r

    # -- datatrace-wide (batched) model evaluation -----------------------------
    #
    # The reference evaluates a datatrace by looping predict/sample once per
    # row (models.py:489-543) — a dispatch storm on an accelerator.  Here the
    # row axis is vmapped: one compiled dispatch per *statistic*, regardless
    # of how many rows the datatrace has.

    def _datatrace_rows(self, datatrace):
        cols = self.active.param_names()
        return np.asarray(datatrace[cols].values, dtype=settings.floatx)

    def _batch_quantile_p(self, q, rows, space=None, inputs=None, outputs=None,
                          prior=False, noise=False):
        """Per-row latent quantile multiplier, or None when this process's
        predictive isn't location-scale shaped (then batching falls back to
        the per-row loop)."""
        return None

    def batch_predict(self, rows, space=None, inputs=None, outputs=None,
                      mean=True, std=True, var=False, cov=False, median=False,
                      quantiles=False, quantiles_noise=False, prior=False,
                      noise=False, **extra):
        """Requested statistics for an (R, ndim) matrix of unconstrained
        parameter rows; every value gains a leading row axis."""
        if extra.get("samples") or extra.get("distribution") \
                or extra.get("simulations"):
            # per-row-only predict features: let average() fall back to the
            # row loop rather than silently dropping the requested keys
            raise NotImplementedError(
                f"batch_predict does not support {sorted(extra)}")
        def vrows(th_name, nz=noise, **kw):
            return self._call_method_vrows(th_name, rows, space=space,
                                           inputs=inputs, outputs=outputs,
                                           prior=prior, noise=nz, **kw)

        values = DictObj()
        if mean:
            values["mean"] = vrows("th_mean")
        if var:
            values["variance"] = vrows("th_variance")
        if std:
            values["std"] = vrows("th_std")
        if cov:
            values["covariance"] = vrows("th_covariance")
        if median:
            values["median"] = vrows("th_median")
        if quantiles or quantiles_noise:
            p = self._batch_quantile_p(0.975, rows, space=space, inputs=inputs,
                                       outputs=outputs, prior=prior, noise=noise)
            if p is None:
                raise NotImplementedError("no location-scale quantile form")
            p = np.asarray(p, dtype=settings.floatx).reshape(-1, 1)
            loc = vrows("th_location")

            def qmap(latent_rows):
                return self._call_method_vrows(
                    "th_mapping", rows, space=space, inputs=inputs,
                    outputs=outputs, prior=prior, noise=noise,
                    vector_rows=latent_rows)

            if quantiles:
                sd = vrows("th_kernel_sd")
                values["quantile_up"] = qmap(loc + p * sd)
                values["quantile_down"] = qmap(loc - p * sd)
            if quantiles_noise:
                sdn = vrows("th_kernel_sd", nz=True)
                values["noise_std"] = vrows("th_std", nz=True)
                values["noise_up"] = qmap(loc + p * sdn)
                values["noise_down"] = qmap(loc - p * sdn)
        return values

    def average(self, datatrace, scores=True, *args, **kwargs):
        """Average predictions over datatrace rows (reference
        models.py:489-519), evaluated with one dispatch per statistic."""
        rows = self._datatrace_rows(datatrace)
        try:
            batch = self.batch_predict(rows, *args, **kwargs)
        except NotImplementedError:
            return self._average_loop(datatrace, scores, *args, **kwargs)
        average = DictObj({k: np.asarray(v, dtype=np.float64).mean(axis=0)
                           for k, v in batch.items()})
        if scores and self.hidden is not None:
            space = kwargs.get("space")
            mean_rows = batch.get("mean")
            if mean_rows is None:
                mean_rows = self._call_method_vrows(
                    "th_mean", rows, space=space,
                    inputs=kwargs.get("inputs"), outputs=kwargs.get("outputs"),
                    prior=kwargs.get("prior", False),
                    noise=kwargs.get("noise", False))
            hidden = self.hidden
            if np.shape(mean_rows)[-1] == len(hidden):
                resid = np.asarray(mean_rows, dtype=np.float64) - hidden
                average["_l1"] = float(np.mean(np.abs(resid)))
                average["_l2"] = float(np.mean(resid ** 2))
        return average

    def _average_loop(self, datatrace, scores=True, *args, **kwargs):
        """Per-row fallback for processes without a batched predictive."""
        average = None
        pred = None
        for _, v in datatrace.iterrows():
            params = self.active.params_serie(v)
            pred = self.predict(params, *args, **kwargs)
            if scores:
                pred.update(self.scores(params, *args, **kwargs))
            if average is None:
                # jax-backed outputs arrive as read-only views; copy
                average = DictObj({k: np.array(v) for k, v in pred.items()})
            else:
                for key in pred.keys():
                    average[key] = average[key] + pred[key]
        n = len(datatrace)
        for key in pred.keys():
            average[key] = average[key] / n
        return average

    def _batch_latent_rand(self, rows, n, rng, space=None, inputs=None,
                           outputs=None, prior=False, noise=False):
        """Per-row latent innovations (R, n), or None when this process's
        sampler isn't a colored-normal form."""
        return None

    def batch_sample(self, rows, space=None, inputs=None, outputs=None,
                     prior=False, noise=False, rng=None, chunk=None, **extra):
        """One warped posterior draw per parameter row, batched: (R, n)."""
        if extra.pop("samples", 1) not in (None, 1) or any(extra.values()):
            # e.g. samples=3 — per-row-only sample features: fall back to
            # the loop rather than silently returning one draw per row
            raise NotImplementedError(
                f"batch_sample does not support {sorted(extra) or 'samples>1'}")
        if rng is None:
            rng = np.random.default_rng()
        space_arr = self.space if space is None else space
        n = len(space_arr)
        R = len(rows)
        if chunk is None:
            # keep the (chunk, n, n) batched cholesky under ~256 MB f32
            chunk = max(1, int(2 ** 26 // max(n * n, 1)))
        outs = []
        for lo in range(0, R, chunk):
            sub = rows[lo:lo + chunk]
            rand = self._batch_latent_rand(sub, n, rng, space=space,
                                           inputs=inputs, outputs=outputs,
                                           prior=prior, noise=noise)
            if rand is None:
                raise NotImplementedError("no colored-normal sampler form")
            loc = self._call_method_vrows("th_location", sub, space=space,
                                          inputs=inputs, outputs=outputs,
                                          prior=prior, noise=noise)
            cho = self._call_method_vrows("th_cholesky", sub, space=space,
                                          inputs=inputs, outputs=outputs,
                                          prior=prior, noise=noise)
            latent = loc + np.einsum("rij,rj->ri", cho, rand)
            outs.append(self._call_method_vrows(
                "th_mapping", sub, space=space, inputs=inputs, outputs=outputs,
                prior=prior, noise=noise, vector_rows=latent))
        return np.concatenate(outs, axis=0)

    def particles(self, datatrace, nsamples=None, *args, **kwargs):
        """Posterior sample curves over datatrace rows (reference
        models.py:521-543): returns (n_space, nsamples)."""
        rows = self._datatrace_rows(datatrace)
        if nsamples is None:
            nsamples = len(rows)
        # cycle rows like the reference's repeating iterrows loop
        idx = np.resize(np.arange(len(rows)), nsamples)
        try:
            samples = self.batch_sample(rows[idx], *args, **kwargs)
            return np.asarray(samples).T
        except NotImplementedError:
            pass
        particles = []
        left = nsamples
        while left > 0:
            for _, v in datatrace.iterrows():
                particles.append(self.sample(self.active.params_serie(v),
                                             *args, **kwargs))
                left -= 1
                if not left > 0:
                    break
        return np.concatenate(particles, axis=1)

    def describe(self, title=None, x=None, y=None, text=None):
        if title is not None:
            self.description["title"] = title
        if x is not None:
            self.description["x"] = x
        if y is not None:
            self.description["y"] = y
        if text is not None:
            self.description["text"] = text

    # -- plotting --------------------------------------------------------------
    def plot_space(self, independent=False, observed=False):
        if independent:
            for i in range(self.space.shape[1]):
                figure(i)
                plot(self.order, self.space[:, i])
        else:
            plot(self.order, self.space)
        if self.index is not None and observed:
            if independent:
                for i in range(self.space.shape[1]):
                    figure(i)
                    plot(self.index, self.inputs[:, i], ".k")
            else:
                plot(self.index, self.inputs, ".k")

    def plot_hidden(self, order=None, hidden=None, big=None):
        if order is None:
            order = self.order
        if hidden is None:
            hidden = self.hidden
        if big is None:
            big = settings.plot_big
        if hidden is None:
            return
        if big:
            plot(order, hidden, "w", alpha=1.0, lw=4, label="")
            plot(order, hidden, "k", alpha=0.9, lw=3, label="Hidden Process")
        else:
            plot(order, hidden, "w", alpha=0.8, lw=3, label="")
            plot(order, hidden, "k", alpha=1.0, lw=2, label="Hidden Process")

    def plot_observations(self, index=None, outputs=None, big=None):
        if index is None:
            index = self.index
        if outputs is None:
            outputs = self.outputs
        if outputs is None:
            return
        plot(index, outputs, "Xw", ms=12)
        plot(index, outputs, "Xk", ms=10, label="Observations")

    def plot(self, params=None, space=None, inputs=None, outputs=None, hidden=True,
             order=None, mean=True, std=False, cov=False, median=False, quantiles=True,
             quantiles_noise=True, samples=0, palette="Reds", prior=False, noise=False,
             simulations=None, values=None, data=True, logp=True, big=None,
             plot_space=False, title=None, labels=None, loc="best", ncol=3):
        """Predict-then-render (reference models.py:609-726)."""
        if labels is None:
            labels = {}
        if values is None:
            values = self.predict(params=params, space=space, inputs=inputs,
                                  outputs=outputs, mean=mean, std=std, cov=cov,
                                  median=median, quantiles=quantiles,
                                  quantiles_noise=quantiles_noise, samples=samples,
                                  prior=prior, noise=noise, simulations=simulations)
        cmap = plt.get_cmap(palette if palette is not None else "Reds")
        if order is None:
            order = self.order
        if space is None:
            space = self.space
        if len(order) != len(space):
            if len(space.shape) == 1:
                order = space
            elif space.shape[1] == 1:
                order = space[:, 0]
            else:
                order = np.arange(len(space))
        if samples > 0:
            labels.setdefault("samples", None)
            plot(order, values["samples"][:, 0], color=cmap(0.9), alpha=0.15,
                 lw=1.0, label=labels["samples"])
            plot(order, values["samples"], color=cmap(0.9), alpha=0.15, lw=1.0)
        if mean:
            labels.setdefault("mean", "Mean")
            plot(order, values["mean"], "-w", alpha=1.0, lw=4)
            plot(order, values["mean"], "-", color=cmap(1.0), alpha=0.8, lw=3,
                 label=labels["mean"])
        if median:
            labels.setdefault("median", "Median")
            plot(order, values["median"], "--w", alpha=1.0, lw=4)
            plot(order, values["median"], "--", color=cmap(1.0), alpha=0.8, lw=3,
                 label=labels["median"])
        if quantiles:
            labels.setdefault("quantiles", "95% CI")
            plot(order, values["quantile_up"], "--", color=cmap(1.0), alpha=0.5,
                 lw=2, label=labels["quantiles"])
            plot(order, values["quantile_down"], "--", color=cmap(1.0), alpha=0.5, lw=2)
            plt.fill_between(order, values["quantile_up"], values["quantile_down"],
                             color=cmap(1.0), alpha=0.1)
        if quantiles_noise:
            labels.setdefault("quantiles_noise", "95% CI + Noise")
            plt.fill_between(order, values["noise_up"], values["noise_down"],
                             color=cmap(1.0), alpha=0.1,
                             label=labels["quantiles_noise"])
        if std:
            labels.setdefault("std", "4.0 Std")
            plot(order, values["mean"] + 2.0 * values["std"], "--k", alpha=0.2,
                 label=labels["std"])
            plot(order, values["mean"] - 2.0 * values["std"], "--k", alpha=0.2)
        if data and hidden is not False:
            self.plot_hidden(big=big)
        if data and self.is_observed:
            self.plot_observations(big=big)
        if title is None:
            title = self.description["title"]
        if logp:
            if params is None:
                params = self.params
            title += " (logp: {0:.3f})".format(float(self.logp(params)))
        if loc is not None:
            plot_text(title, self.description["x"], self.description["y"], loc=loc, ncol=ncol)
        if plot_space:
            show()
            plot(order, space)
            plot_text("Space X", "Index", "Value", legend=False)

    def plot_datatrace(self, datatrace, overlap=False, limit=10, scores=True,
                       *args, **kwargs):
        """Plot each datatrace candidate (reference models.py:728-757)."""
        for k, v in datatrace.iterrows():
            params = self.active.params_serie(v)
            self.plot(params, *args, **kwargs)
            if not overlap:
                if scores:
                    name = str(k) + " - " + str(self.scores(params, *args, **kwargs))
                else:
                    name = str(k)
                plot_text(name, self.description["x"], self.description["y"])
                show()
            if limit is None:
                pass
            elif limit > 1:
                limit -= 1
            else:
                break

    # -- widgets -----------------------------------------------------------------
    def _widget_intervals(self, params):
        """Per-param slider ranges (min, max, value, step) — the widget's
        layout logic, separated from ipywidgets so it is testable headless
        (reference models.py:759-789 slider construction)."""
        intervals = dict()
        for k, v in params.items():
            v = float(np.squeeze(v)) if np.size(v) == 1 else float(np.mean(v))
            if v > 0.1:
                intervals[k] = (0.0, 2 * v, v, 1e-2)
            elif v < -0.1:
                intervals[k] = (2 * v, 0.0, v, 1e-2)
            else:
                intervals[k] = (-5.0, 5.0, v, 1e-2)
        return intervals

    def widget(self, params=None, model=False, auto=False, *args, **kwargs):
        """Interactive param sliders (reference models.py:759-789); requires
        ipywidgets + a notebook frontend."""
        from ipywidgets import interact, interact_manual, FloatSlider

        if params is None:
            params = self.params_widget
        intervals = {
            k: FloatSlider(min=lo, max=hi, value=v, step=st)
            for k, (lo, hi, v, st) in self._widget_intervals(params).items()}
        self._widget_args = args
        self._widget_kwargs = kwargs
        widget_plot = self._widget_plot_model if model else self._widget_plot
        if auto:
            return interact(widget_plot, **intervals)
        return interact_manual(widget_plot, **intervals)

    def _check_params_dims(self, params):
        r = dict()
        spec = self.active.params_spec
        for k, v in params.items():
            if k in spec:
                r[k] = np.array(v, dtype=settings.floatx).reshape(spec[k].shape)
        return r

    def _widget_plot(self, **params):
        self.widget_params = self._check_params_dims(params)
        self.plot(params=self.params_widget, *self._widget_args, **self._widget_kwargs)
        show()

    def _widget_plot_model(self, **params):
        self.widget_params = self._check_params_dims(params)
        self.plot_model(params=self.params_widget, indexs=None, kernel=False,
                        mapping=True, marginals=True, bivariate=False)
        show()
