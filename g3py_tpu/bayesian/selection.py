"""Optimizer wrapper and the Experiment model-selection harness.

Rebuild of ``/root/reference/g3py/bayesian/selection.py``: the hardened
scipy BFGS/Powell wrapper (:14-42) and the repeated-simulation
model-selection benchmark (:45-343).
"""

import time

import numpy as np
import scipy.optimize as sp_optimize

from ..config import settings
from ..utils import DictObj, MaxTime, nan_to_high, save_pkl, load_pkl

__all__ = ["optimize", "Experiment"]


def optimize(logp, start, dlogp=None, fmin=None, max_time=None, disp=False):
    """Maximize ``logp`` from ``start`` with scipy fmin_bfgs (gradient when
    available) or fmin_powell; the objective is hardened against NaN/Inf and
    exceptions, and a wall-clock budget aborts via callback exception
    (reference selection.py:14-42)."""
    start = np.asarray(start, dtype=np.float64)

    def objective(p):
        try:
            return float(nan_to_high(-logp(p.astype(settings.floatx))))
        except Exception:
            return 1.0e32

    callback = None if max_time is None else MaxTime(max_time)
    if fmin is None:
        fmin = "bfgs" if dlogp is not None else "powell"
    try:
        if fmin == "bfgs" and dlogp is not None:
            def grad(p):
                try:
                    g = -np.asarray(dlogp(p.astype(settings.floatx)), dtype=np.float64)
                    return np.where(np.isfinite(g), g, 0.0)
                except Exception:
                    return np.zeros_like(p)

            out = sp_optimize.fmin_bfgs(objective, start, fprime=grad, disp=disp,
                                        callback=callback)
        elif fmin == "bfgs":
            out = sp_optimize.fmin_bfgs(objective, start, disp=disp, callback=callback)
        else:
            out = sp_optimize.fmin_powell(objective, start, disp=disp,
                                          callback=callback)
    except TimeoutError:
        if disp:
            print("Optimization time limit reached")
        return start.astype(settings.floatx)
    except Exception as m:
        if disp:
            print("Optimization error:", m)
        return start.astype(settings.floatx)
    return np.atleast_1d(np.asarray(out)).astype(settings.floatx)


class Experiment:
    """Repeated-simulation model-selection benchmark (reference
    selection.py:45-343): per-simulation random splits, multi-start
    training per model, obs/valid/test scores and wall-times persisted to
    disk with resume-on-restart."""

    def __init__(self, models=None, file=None, load=True):
        self.models = list(models) if models is not None else []
        self.file = file
        self.data_x = None
        self.data_y = None
        self.data_p = None
        self.data_limit = 1
        self.data_method = "random"
        self.scores_mean = True
        self.scores_median = False
        self.scores_variance = True
        self.scores_logp = True
        self.scores_time = True
        self.find_MAP = True
        self.starts = 1
        self.master = None
        self.points = 1
        self.powell = True
        self.max_time = None
        # training engine for select_model: "scipy" (reference recipe),
        # "jax" (vmapped on-device L-BFGS), "iterative" (matrix-free, GP
        # family, large N) or "distributed" (band-sharded exact NLL over a
        # mesh; the obs split size must divide the device count).  Extra
        # engine knobs (rank/cg_iters/mesh/...) go in engine_kwargs.
        self.engine = "scipy"
        self.engine_kwargs = {}
        # training objective: 'logp' (marginal likelihood) or 'loo'
        # (leave-one-out pseudo-likelihood, GPML 5.4.2 — scipy/jax
        # engines, GP family)
        self.objective = "logp"
        # candidate-selection criterion among optimized starts: '_l2'
        # (holdout validation error, needs holdout>0) or 'loo' (training
        # -set LOO pseudo-likelihood — internal CV, no holdout needed)
        self.selection = "_l2"
        self.holdout = 0.0
        self.results = None
        self.simulations = {}
        if file is not None and load:
            try:
                state = load_pkl(file)
                self.__dict__.update(state)
                print("Loaded experiment " + file)
            except Exception:
                pass

    # -- configuration (reference selection.py:60-133) -------------------------
    def add_model(self, model):
        self.models.append(model)

    def set_data(self, x, y, p=0.5, limit=1.0, method="random", holdout=0.0):
        self.data_x = np.asarray(x)
        self.data_y = np.asarray(y)
        self.data_p = p
        self.data_limit = limit
        self.data_method = method
        self.holdout = holdout

    def set_scores(self, mean=True, median=False, variance=True, logp=True, time=True):
        self.scores_mean = mean
        self.scores_median = median
        self.scores_variance = variance
        self.scores_logp = logp
        self.scores_time = time

    def set_selection(self, find_MAP=True, starts=1, points=1, powell=True,
                      master=None, max_time=None, engine="scipy",
                      engine_kwargs=None, objective="logp",
                      selection="_l2"):
        self.find_MAP = find_MAP
        self.starts = starts
        self.points = points
        self.powell = powell
        self.master = master
        self.max_time = max_time
        self.engine = engine
        self.engine_kwargs = engine_kwargs or {}
        if objective not in ("logp", "loo"):
            raise ValueError(f"unknown objective {objective!r}")
        if selection not in ("_l2", "loo"):
            raise ValueError(f"unknown selection {selection!r} "
                             "('_l2' holdout error | 'loo' internal CV)")
        self.objective = objective
        self.selection = selection

    def save(self, path=None):
        path = path or self.file
        if path is None:
            return
        state = {k: v for k, v in self.__dict__.items() if k != "models"}
        save_pkl(state, path)

    # -- data splits ------------------------------------------------------------
    def new_data(self, seed=None):
        from ..utils.data import random_obs, uniform_obs

        rng = np.random.default_rng(seed)
        n = len(self.data_x)
        limit = int(self.data_limit * n) if self.data_limit <= 1 else int(self.data_limit)
        if self.data_method == "uniform":
            obs_i, test_i = uniform_obs(self.data_x[:limit], self.data_p)
        else:
            obs_i, test_i = random_obs(self.data_x[:limit], self.data_p, rng=rng)
        valid_i = np.array([], dtype=int)
        if self.holdout > 0:
            k = int(len(obs_i) * self.holdout)
            valid_i = obs_i[:k]
            obs_i = obs_i[k:]
        return obs_i, valid_i, test_i

    # -- selection ---------------------------------------------------------------
    def select_model(self, sp, valid_index=None, display=False):
        """Multi-start training with default/randomized starts and optional
        master-model warm start.  Without a holdout the best start wins by
        logp; with one, every optimized candidate is scored on the holdout
        and the best holdout score wins (reference selection.py:183-235)."""
        starts = [sp.params_default]
        for _ in range(max(self.starts - 1, 0)):
            starts.append(sp.params_random(mean=sp.params_default, sigma=0.2))
        if self.master is not None and self.master is not sp:
            try:
                starts.append(sp.params_process(process=self.master))
            except Exception:
                pass
        if not self.find_MAP:
            best, best_ll = None, -np.inf
            for s in starts:
                ll = sp.logp(s)
                if ll > best_ll:
                    best, best_ll = s, ll
            return best
        objective = getattr(self, "objective", "logp")
        if self.engine != "scipy":
            params, points_list = sp.find_MAP(
                start=starts, points=self.points, display=display,
                engine=self.engine, return_points=True,
                objective=objective, **(self.engine_kwargs or {}))
        else:
            params, points_list = sp.find_MAP(
                start=starts, points=self.points, powell=self.powell,
                display=display, max_time=self.max_time,
                objective=objective, return_points=True)
        selection = getattr(self, "selection", "_l2")
        if selection == "loo":
            # internal-CV selection: training-set LOO pseudo-likelihood
            # (higher is better); works without a holdout split
            if not hasattr(sp, "loo"):
                raise ValueError(
                    f"selection='loo' needs models exposing .loo (the GP "
                    f"family does); {type(sp).__name__} does not")
            best, best_score = params, -np.inf
            for _name, _ll, cand in points_list:
                try:
                    score = float(sp.loo(DictObj(cand)))
                except Exception:
                    score = -np.inf
                if np.isfinite(score) and score > best_score:
                    best, best_score = DictObj(cand), score
            return best
        if valid_index is None or len(valid_index) == 0:
            return params
        # holdout selection: smallest validation l2 among the candidates
        best, best_score = params, np.inf
        for _name, _ll, cand in points_list:
            try:
                s = self.calc_scores(sp, DictObj(cand), valid_index)
                score = float(s.get("_l2", np.inf))
            except Exception:
                score = np.inf
            if np.isfinite(score) and score < best_score:
                best, best_score = DictObj(cand), score
        return best

    def calc_scores(self, sp, params, index):
        x = self.data_x[index]
        y = self.data_y[index]
        if len(index) == 0:
            return DictObj()
        return sp.scores(params, space=x, hidden=y, logp=self.scores_logp,
                         variance=self.scores_variance, median=self.scores_median)

    def add_result(self, row):
        import pandas as pd

        if self.results is None:
            self.results = pd.DataFrame([row])
        else:
            self.results = pd.concat(
                [self.results, pd.DataFrame([row])], ignore_index=True)
        if self.file is not None:
            self.save()

    def run(self, n_simulations=1, repeat=False, display=False):
        """Main loop (reference selection.py:237-292): per (simulation,
        model) train + score, skipping pairs already persisted."""
        for sim in range(n_simulations):
            if sim not in self.simulations:
                self.simulations[sim] = self.new_data(seed=sim)
            obs_i, valid_i, test_i = self.simulations[sim]
            for sp in self.models:
                done = False
                if self.results is not None and not repeat:
                    done = ((self.results["_simulation"] == sim)
                            & (self.results["_model"] == sp.name)).any()
                if done:
                    continue
                x_obs = self.data_x[obs_i]
                y_obs = self.data_y[obs_i]
                t0 = time.time()
                sp.observed(x_obs, y_obs)
                time_obs = time.time() - t0
                t0 = time.time()
                params = self.select_model(sp, valid_index=valid_i,
                                           display=display)
                time_params = time.time() - t0
                row = DictObj()
                row["_simulation"] = sim
                row["_model"] = sp.name
                row["time_obs"] = time_obs
                row["time_params"] = time_params
                t0 = time.time()
                for k, v in self.calc_scores(sp, params, obs_i).items():
                    row["obs" + k] = v
                row["time_scores_obs"] = time.time() - t0
                if len(valid_i):
                    t0 = time.time()
                    for k, v in self.calc_scores(sp, params, valid_i).items():
                        row["valid" + k] = v
                    row["time_valid"] = time.time() - t0
                t0 = time.time()
                for k, v in self.calc_scores(sp, params, test_i).items():
                    row["test" + k] = v
                row["time_test"] = time.time() - t0
                for k, v in params.items():
                    row[k] = np.asarray(v)
                self.add_result(row)
                if display:
                    print(f"sim {sim} model {sp.name}: "
                          + str({k: v for k, v in row.items() if k.startswith('test')}))
        return self.results

    def run_fanout(self, n_simulations=1, repeat=False, display=False,
                   points=None, max_iters=200, shard=False, mesh=None):
        """``run`` with the training grid fused on device: every
        (simulation, start) pair of each model trains simultaneously
        through the masked loglike (bayesian/fanout.py) instead of the
        per-cell scipy loop — S*K optimizations per model become one
        compiled program (13 s warm for a 4x2 grid at n=256 on the hosted
        chip vs ~383 s per split sequentially; docs/performance.md).

        Semantics vs ``run``: identical splits, scores, result rows and
        resume behavior; start points are the FULL-data defaults plus
        perturbations (the reference recomputed defaults per split);
        holdout selection (when configured) picks among the grid's
        optimized candidates by validation l2, like the reference.
        Requires every model to expose ``th_loglike_masked_fn`` (the
        GP/WGP/TP families)."""
        from .fanout import fit_splits

        if points is None:
            points = max(self.points, self.starts, 1)
        sims = {}
        for sim in range(n_simulations):
            if sim not in self.simulations:
                self.simulations[sim] = self.new_data(seed=sim)
            sims[sim] = self.simulations[sim]
        # same limit rule as new_data: fraction when <=1, absolute otherwise
        n_all = (int(self.data_limit) if self.data_limit > 1
                 else int(self.data_limit * len(self.data_x)))
        x_all = np.asarray(self.data_x[:n_all])
        y_all = np.asarray(self.data_y[:n_all])
        for sp in self.models:
            if not hasattr(sp, "th_loglike_masked_fn"):
                raise ValueError(
                    f"model {sp.name} has no masked loglike; use run()")
            todo = []
            for sim in range(n_simulations):
                done = False
                if self.results is not None and not repeat:
                    done = ((self.results["_simulation"] == sim)
                            & (self.results["_model"] == sp.name)).any()
                if not done:
                    todo.append(sim)
            if not todo:
                continue
            sp.observed(x_all, y_all)
            masks = np.zeros((len(todo), len(x_all)), np.float32)
            for row_i, sim in enumerate(todo):
                masks[row_i, sims[sim][0]] = 1.0
            t0 = time.time()
            plist, vals, pts = fit_splits(
                sp, masks, points=points, max_iters=max_iters, shard=shard,
                mesh=mesh, return_points=True)
            grid_time = time.time() - t0
            reg = sp.active
            for row_i, sim in enumerate(todo):
                obs_i, valid_i, test_i = sims[sim]
                t0 = time.time()
                sp.observed(x_all[obs_i], y_all[obs_i])
                time_obs = time.time() - t0
                params = plist[row_i]
                if len(valid_i):
                    # holdout selection among this sim's optimized starts
                    best_score = np.inf
                    for k in range(pts.shape[1]):
                        cand = DictObj(reg.array_to_dict(pts[row_i, k]))
                        try:
                            s = self.calc_scores(sp, cand, valid_i)
                            score = float(s.get("_l2", np.inf))
                        except Exception:
                            score = np.inf
                        if np.isfinite(score) and score < best_score:
                            params, best_score = cand, score
                row = DictObj()
                row["_simulation"] = sim
                row["_model"] = sp.name
                # same timing columns as run(): the fused grid's train time
                # is amortized evenly over its rows
                row["time_obs"] = time_obs
                row["time_params"] = grid_time / len(todo)
                t0 = time.time()
                for k, v in self.calc_scores(sp, params, obs_i).items():
                    row["obs" + k] = v
                row["time_scores_obs"] = time.time() - t0
                if len(valid_i):
                    t0 = time.time()
                    for k, v in self.calc_scores(sp, params, valid_i).items():
                        row["valid" + k] = v
                    row["time_valid"] = time.time() - t0
                t0 = time.time()
                for k, v in self.calc_scores(sp, params, test_i).items():
                    row["test" + k] = v
                row["time_test"] = time.time() - t0
                for k, v in params.items():
                    row[k] = np.asarray(v)
                self.add_result(row)
                if display:
                    print(f"sim {sim} model {sp.name} (fanout): "
                          + str({k: v for k, v in row.items()
                                 if k.startswith('test')}))
        return self.results

    # -- reporting ---------------------------------------------------------------
    def describe(self, score="test_l2"):
        """Pivot results per model (reference selection.py:297-324)."""
        if self.results is None:
            return None
        return self.results.pivot_table(index="_simulation", columns="_model",
                                        values=score)

    def plot(self, score="test_l2", kind="violin"):
        """Per-model score comparison (reference selection.py:329-339)."""
        import seaborn as sb

        df = self.results
        if df is None:
            return
        if kind == "violin":
            sb.violinplot(data=df, x="_model", y=score)
        else:
            sb.swarmplot(data=df, x="_model", y=score)
