"""Fit object and posterior consumption: extract / fitted / predict.

Python equivalent of the reference's S3 generics on class ``stan4bartFit``
(/root/reference/R/generics.R:169-723; man/generics.Rd): draw types

    ev, ppd, fixef, indiv.fixef, ranef, indiv.ranef, indiv.bart,
    sigma, Sigma, k, varcount, stan, callback

for train or test samples, with warmup inclusion, chain combining, probit
``Phi`` transforms, ppd noise injection (incl. weights), centered-X
un-centering via the training means, and new-group posterior sampling from
the per-draw covariance Cholesky (generics.R:553-612 ``fitted_random`` /
``levelfun`` semantics).

Array convention: draws are returned with observation/parameter axes first
and the draw axis LAST; ``combine_chains=True`` (default) flattens
(chains x iterations) into one draw axis, else a trailing (iter, chain)
pair, matching the reference's combine_chains helper (generics.R:1-16).
"""

from __future__ import annotations

import math
import warnings
from dataclasses import dataclass, field
from typing import Any

import numpy as np
from scipy.stats import norm

EXTRACT_TYPES = (
    "ev", "ppd", "fixef", "indiv.fixef", "ranef", "indiv.ranef",
    "indiv.bart", "sigma", "Sigma", "k", "varcount", "stan", "callback",
)


@dataclass
class Stan4bartFit:
    mf: Any
    pm: Any
    prog: Any
    family: str
    draws: Any                 # pytree, leaves with leading (chains, iter)
    warmup: int
    chains: int
    stan_names: list
    test_frame: Any = None
    treatment: str | None = None
    final_states: Any = None
    R_inv: np.ndarray | None = None
    keep_fits: bool = True
    sigma_init: float = 1.0
    seed: int = 0
    callback_draws: Any = None
    # resolved prior info (assemble info dict) for prior_summary()
    prior_info: dict | None = None
    # wall-clock phase timings (the reference's warm/sample_delta_t,
    # interruptable_sampler.hpp:101-102): dict with 'total' plus
    # 'warmup'/'sample' seconds — REAL measured per-phase wall clock on
    # the default (host-chunked) path, pro-rated on the fused
    # sharded/multihost paths; 'interrupted': True on partial fits
    timings: dict | None = None
    # True once the stored stan draws hold un-rotated betas.  An init field
    # (not init=False) so dataclasses.replace() carries it over and
    # __post_init__ cannot re-apply R_inv to already-un-rotated draws
    # (that double application silently corrupted resumed qr=True fits).
    qr_unrotated: bool = False
    _name_idx: dict = field(default_factory=dict, init=False)
    _rng_calls: int = field(default=0, init=False)

    def __post_init__(self):
        self._name_idx = {n: i for i, n in enumerate(self.stan_names)}
        # QR un-rotation of beta draws (stan4bart_fit.R:560-570), once
        if (self.R_inv is not None and self.keep_fits
                and not self.qr_unrotated):
            self.draws = self.draws._replace(
                stan=self._unrotate_stan(self.draws.stan)
            )
            self.qr_unrotated = True

    def _unrotate_stan(self, stan):
        """beta columns of a raw stan draw array -> original coordinates
        (beta_orig = R_inv^T beta_qr; stan4bart_fit.R:560-570)."""
        K = self.mf.K
        bi = [self._name_idx[f"beta.{j + 1}"] for j in range(K)]
        beta = stan[..., bi] @ np.asarray(self.R_inv).T
        if hasattr(stan, "at"):
            return stan.at[..., bi].set(beta)
        return self._np_set(stan, bi, beta)

    @staticmethod
    def _np_set(arr, idx, vals):
        arr = np.array(arr)
        arr[..., idx] = vals
        return arr

    # -- internals ----------------------------------------------------------

    @property
    def is_binary(self) -> bool:
        return self.family == "binomial"

    @property
    def iterations(self) -> int:
        import jax

        if self.draws is None:  # keep_fits=False with no callback
            return self.warmup + self.prog.iterations
        return jax.tree_util.tree_leaves(self.draws)[0].shape[1]

    def _slice(self, arr, include_warmup):
        """arr leading axes (chains, iter, ...) -> iteration slice."""
        if include_warmup:
            return arr
        return arr[:, self.warmup :]

    def _flatten(self, arr, combine_chains):
        """(chains, iter, ...) -> (..., draws) or (..., iter, chains)."""
        arr = np.asarray(arr)
        moved = np.moveaxis(arr, (0, 1), (-1, -2))  # (..., iter, chains)
        if combine_chains:
            return moved.reshape(
                moved.shape[:-2] + (moved.shape[-2] * moved.shape[-1],)
            )
        return moved

    def _stan_rows(self, names, include_warmup):
        idx = [self._name_idx[n] for n in names]
        return self._slice(self.draws.stan, include_warmup)[..., idx]

    def _num_draws(self, include_warmup):
        it = self.iterations if include_warmup else (
            self.iterations - self.warmup
        )
        return it * self.chains

    def _rng(self):
        # fresh stream per call: repeated extract("ppd") calls must return
        # fresh noise, and the ppd / new-level-ranef streams must not be
        # correlated (the reference draws from R's global RNG each call,
        # generics.R:419-461); still reproducible per fit + call sequence
        self._rng_calls += 1
        return np.random.default_rng((self.seed, 0x5EED, self._rng_calls))

    # -- component draws (internal, (chains, iter, ...) layout) -------------

    def _beta_draws(self, include_warmup):
        K = self.mf.K
        if K == 0:
            sl = self._slice(self.draws.stan, include_warmup)
            return np.zeros(sl.shape[:2] + (0,))
        return self._stan_rows([f"beta.{j + 1}" for j in range(K)],
                               include_warmup)

    def _b_draws(self, include_warmup):
        q = self.mf.q
        if q == 0:
            sl = self._slice(self.draws.stan, include_warmup)
            return np.zeros(sl.shape[:2] + (0,))
        return self._stan_rows([f"b.{j + 1}" for j in range(q)],
                               include_warmup)

    def _theta_L_draws(self, include_warmup):
        L = self.mf.len_theta_L
        if L == 0:
            sl = self._slice(self.draws.stan, include_warmup)
            return np.zeros(sl.shape[:2] + (0,))
        return self._stan_rows([f"theta_L.{j + 1}" for j in range(L)],
                               include_warmup)

    def _sigma_draws(self, include_warmup):
        if self.is_binary:
            raise ValueError("sigma is not defined for binary outcomes")
        return self._stan_rows(["aux.1"], include_warmup)[..., 0]

    def _term_keys(self):
        """Dict keys per ranef term: the group name, disambiguated when a
        factor carries several independent terms (|| splits; R's VarCorr
        allows duplicate list names, Python dicts cannot)."""
        keys, seen = [], {}
        for t in self.mf.re_terms:
            n = seen.get(t.group_name, 0)
            seen[t.group_name] = n + 1
            keys.append(t.group_name if n == 0
                        else f"{t.group_name}.{n + 1}")
        return keys

    def _Sigma_draws(self, include_warmup):
        """Per-term covariance draws from theta_L (mkVarCorr semantics,
        lme4_functions.R:1199-1224; dispersion already folded in)."""
        th = self._theta_L_draws(include_warmup)  # (C, I, L)
        out = {}
        mark = 0
        for t, key in zip(self.mf.re_terms, self._term_keys()):
            p = t.p
            if p == 1:
                out[key] = (th[..., mark] ** 2)[..., None, None]
                mark += 1
            else:
                ntri = p + math.comb(p, 2)
                seg = th[..., mark : mark + ntri]
                mark += ntri
                T = np.zeros(seg.shape[:2] + (p, p))
                k = 0
                for c in range(p):
                    for r in range(c, p):
                        T[..., r, c] = seg[..., k]
                        k += 1
                out[key] = T @ np.swapaxes(T, -1, -2)
        return out

    def _frame_for(self, sample):
        return self.mf if sample == "train" else self._require_test()

    def _indiv_fixef(self, include_warmup, sample="train", frame=None):
        """(X - X_mean) beta per draw (generics.R:510-551 fitted_fixed)."""
        beta = self._beta_draws(include_warmup)  # (C, I, K)
        X = np.asarray((frame or self._frame_for(sample)).X)
        return np.einsum("nk,cik->cin", X, beta)

    def _indiv_ranef(self, include_warmup, sample="train",
                     sample_new_levels=True, frame=None):
        """Z b per draw; unseen test levels get draws from N(0, Sigma_draw)
        (generics.R:553-612)."""
        b = self._b_draws(include_warmup)  # (C, I, q)
        fr = frame or self._frame_for(sample)
        re_terms = fr.re_terms
        C, I = b.shape[:2]
        n = re_terms[0].lhs.shape[0] if re_terms else np.asarray(fr.X).shape[0]
        eta = np.zeros((C, I, n))
        if not re_terms:
            return eta
        rng = self._rng()
        Sigmas = (self._Sigma_draws(include_warmup)
                  if sample_new_levels else None)
        off = 0
        for t_train, t, key in zip(self.mf.re_terms, re_terms,
                                   self._term_keys()):
            p, l = t_train.p, t_train.l
            b_term = b[..., off : off + p * l].reshape(C, I, l, p)
            gidx = np.asarray(t.group_idx)
            seen = gidx >= 0
            safe = np.clip(gidx, 0, None)
            contrib = np.einsum("np,cinp->cin", t.lhs,
                                b_term[:, :, safe, :])
            if (~seen).any():
                if sample_new_levels:
                    Sig = Sigmas[key]  # (C, I, p, p)
                    chol = np.linalg.cholesky(
                        Sig + 1e-12 * np.eye(p)
                    )
                    # one b draw per (chain, iter, distinct NEW LEVEL),
                    # shared across that level's rows (levelfun semantics,
                    # generics.R:553-612) — preserves within-draw
                    # correlation of observations in the same new group
                    if t.new_level_ids is not None:
                        lev_of_row = t.new_level_ids[~seen]
                    else:
                        lev_of_row = np.arange((~seen).sum())
                    n_lev = int(lev_of_row.max()) + 1
                    z = rng.standard_normal((C, I, n_lev, p))
                    b_lev = np.einsum("cipq,cilq->cilp", chol, z)
                    b_new = b_lev[:, :, lev_of_row, :]
                    contrib_new = np.einsum(
                        "np,cinp->cin", t.lhs[~seen], b_new
                    )
                    contrib[:, :, ~seen] = contrib_new
                else:
                    contrib[:, :, ~seen] = 0.0
            eta += contrib
            off += p * l
        return eta

    def _indiv_bart(self, include_warmup, sample="train"):
        arr = (self.draws.bart_train if sample == "train"
               else self._require_test_draws())
        return self._slice(arr, include_warmup)

    def _require_test(self):
        if self.test_frame is None:
            raise ValueError("no test data was provided to stan4bart()")
        return self.test_frame

    def _require_test_draws(self):
        self._require_test()
        return self.draws.bart_test

    def _ev(self, include_warmup, sample="train", sample_new_levels=True):
        ev = self._indiv_bart(include_warmup, sample)
        ev = ev + self._indiv_fixef(include_warmup, sample)
        if self.mf.q > 0:
            ev = ev + self._indiv_ranef(include_warmup, sample,
                                        sample_new_levels)
        off = (self.mf.offset if sample == "train"
               else self._require_test().offset)
        if off is not None:
            ev = ev + np.asarray(off)
        if self.is_binary:
            ev = norm.cdf(ev)
        return ev

    # -- public API ----------------------------------------------------------

    def _na_expand(self, arr, sample):
        """na_action='exclude': re-insert NaN rows at the original
        positions of incomplete observations (test-03-na_action.R:45-92).
        arr has the observation axis first."""
        fr = self._frame_for(sample)
        if (self.mf.na_action != "exclude"
                or bool(np.all(fr.complete_rows))):
            return arr
        out = np.full((fr.n_original,) + arr.shape[1:], np.nan,
                      dtype=np.float64)
        out[np.asarray(fr.complete_rows)] = arr
        return out

    def extract(self, type: str = "ev", sample: str = "train",
                combine_chains: bool = True, include_warmup: bool = False,
                sample_new_levels: bool = True):
        """Posterior draws of the requested quantity (generics.R:169-472)."""
        if type not in EXTRACT_TYPES:
            raise ValueError(f"type must be one of {EXTRACT_TYPES}")
        if sample not in ("train", "test"):
            raise ValueError("sample must be 'train' or 'test'")

        if type == "callback":
            import jax

            src = self.callback_draws if self.keep_fits else self.draws
            if src is None:
                raise ValueError(
                    "no callback was supplied to stan4bart()"
                    + ("" if self.keep_fits else
                       " and keep_fits=False stored no raw draws")
                )
            return jax.tree_util.tree_map(
                lambda a: self._flatten(self._slice(a, include_warmup),
                                        combine_chains),
                src,
            )
        if not self.keep_fits:
            raise ValueError(
                "raw draws were not stored (keep_fits=False); only "
                "type='callback' is available (man/stan4bart.Rd:227-242)"
            )
        if type == "stan":
            return self._flatten(
                self._slice(self.draws.stan, include_warmup), combine_chains
            )
        if type == "k":
            if not hasattr(self.draws, "k"):
                raise ValueError("k draws unavailable")
            return self._flatten(self._slice(self.draws.k, include_warmup),
                                 combine_chains)
        if type == "sigma":
            return self._flatten(self._sigma_draws(include_warmup),
                                 combine_chains)
        if type == "varcount":
            return self._flatten(
                self._slice(self.draws.varcount, include_warmup),
                combine_chains,
            )
        if type == "fixef":
            return self._flatten(self._beta_draws(include_warmup),
                                 combine_chains)
        if type == "ranef":
            b = self._b_draws(include_warmup)
            C, I = b.shape[:2]
            out = {}
            off = 0
            for t, key in zip(self.mf.re_terms, self._term_keys()):
                arr = b[..., off : off + t.p * t.l].reshape(C, I, t.l, t.p)
                out[key] = self._flatten(arr, combine_chains)
                off += t.p * t.l
            return out
        if type == "Sigma":
            sig = self._Sigma_draws(include_warmup)
            return {
                k: self._flatten(v, combine_chains) for k, v in sig.items()
            }
        if type == "indiv.fixef":
            return self._na_expand(
                self._flatten(self._indiv_fixef(include_warmup, sample),
                              combine_chains), sample)
        if type == "indiv.ranef":
            return self._na_expand(
                self._flatten(
                    self._indiv_ranef(include_warmup, sample,
                                      sample_new_levels),
                    combine_chains,
                ), sample)
        if type == "indiv.bart":
            return self._na_expand(
                self._flatten(self._indiv_bart(include_warmup, sample),
                              combine_chains), sample)
        if type == "ev":
            return self._na_expand(
                self._flatten(
                    self._ev(include_warmup, sample, sample_new_levels),
                    combine_chains,
                ), sample)
        # ppd: ev + observation noise (generics.R:419-461)
        ev = self._ev(include_warmup, sample, sample_new_levels)
        rng = self._rng()
        if self.is_binary:
            ppd = rng.binomial(1, ev).astype(np.float64)
        else:
            sigma = self._sigma_draws(include_warmup)[..., None]
            if self.mf.weights is not None and sample == "train":
                sigma = sigma / np.sqrt(np.asarray(self.mf.weights))
            ppd = ev + rng.standard_normal(ev.shape) * sigma
        return self._na_expand(self._flatten(ppd, combine_chains), sample)

    def fitted(self, type: str = "ev", sample: str = "train", **kw):
        """Posterior mean of extract(type) (generics.R:476-508)."""
        draws = self.extract(type=type, sample=sample, combine_chains=True,
                             **kw)
        if isinstance(draws, dict):
            return {k: v.mean(axis=-1) for k, v in draws.items()}
        return draws.mean(axis=-1)

    # -- information criteria (beyond the reference: rstanarm's log_lik /
    # loo / waic generics next to the posterior accessors) --------------------

    def _log_lik_raw(self, include_warmup=False):
        """Pointwise log p(y_i | draw) on the training data, internal
        (chains, iter, n) layout.  Gaussian: Normal(ev, sigma/sqrt(w_i))
        — the exact likelihood continuous.stan:402-429 increments;
        probit: Bernoulli(Phi(lin)), weights scaling the log-density as
        in the weighted Stan target."""
        if not self.keep_fits:
            raise ValueError("log_lik requires keep_fits=True")
        ev = self._ev(include_warmup, "train")       # probit: P(y = 1)
        y = np.asarray(self.mf.y, dtype=np.float64)
        w = (None if self.mf.weights is None
             else np.asarray(self.mf.weights, dtype=np.float64))
        if self.is_binary:
            p = np.clip(ev, 1e-12, 1.0 - 1e-12)
            ll = np.where(y > 0, np.log(p), np.log1p(-p))
            if w is not None:
                ll = ll * w
        else:
            sigma = self._sigma_draws(include_warmup)[..., None]
            var = sigma ** 2 if w is None else sigma ** 2 / w
            ll = -0.5 * (np.log(2.0 * np.pi * var) + (y - ev) ** 2 / var)
        return ll

    def log_lik(self, combine_chains: bool = True,
                include_warmup: bool = False):
        """Pointwise log-likelihood, (n_obs, draws) with the draws axis
        last (same layout as extract); na_action='exclude' re-inserts
        NaN rows.  Feeds fit.loo() / fit.waic()."""
        return self._na_expand(
            self._flatten(self._log_lik_raw(include_warmup),
                          combine_chains), "train")

    def loo(self, include_warmup: bool = False,
            use_r_eff: bool = True) -> dict:
        """PSIS-LOO expected log predictive density (loo.py): elpd_loo,
        p_loo, looic with standard errors, plus per-observation
        pareto_k diagnostics (k > 0.7 flags unreliable points).

        use_r_eff: correct the PSIS tail length for MCMC
        autocorrelation with the per-observation relative efficiency
        ESS/S computed from the chain-structured draws (the loo
        package's r_eff); False assumes independent draws."""
        import jax

        from .loo import psis_loo
        from .parallel.diagnostics import ess

        raw = self._log_lik_raw(include_warmup)     # (chains, iter, n)
        ll = self._flatten(raw, True)
        r_eff = None
        if use_r_eff and raw.shape[0] * raw.shape[1] >= 8:
            S = raw.shape[0] * raw.shape[1]
            r_eff = np.asarray(
                jax.jit(jax.vmap(ess, in_axes=2))(np.asarray(raw))
            ) / S
        out = psis_loo(ll, r_eff=r_eff)
        if out["n_high_k"]:
            warnings.warn(
                f"{out['n_high_k']} of {out['n_obs']} observations have "
                "pareto_k > 0.7: their PSIS-LOO contributions are "
                "unreliable (consider exact refits for those points)")
        return out

    def waic(self, include_warmup: bool = False) -> dict:
        """WAIC (pWAIC2 penalty) from the pointwise log-likelihood."""
        from .loo import waic as _waic

        return _waic(self._flatten(self._log_lik_raw(include_warmup),
                                   True))

    # -- out-of-sample prediction (needs keep_trees) --------------------------

    def _tree_draws(self, include_warmup):
        if (not hasattr(self.draws, "tree_feature")
                or self.draws.tree_feature.shape[-1] == 0):
            raise ValueError(
                "predict/trees require keep_trees=True at fit time "
                "(the reference's keepTrees, man/generics.Rd)"
            )
        return (
            self._slice(self.draws.tree_feature, include_warmup),
            self._slice(self.draws.tree_cut, include_warmup),
            self._slice(self.draws.tree_leaf_value, include_warmup),
        )

    def _predict_bart(self, bart_X_new, include_warmup=False):
        """Walk every stored tree draw over new data: (C, I, n_new)."""
        import jax
        import jax.numpy as jnp

        from stan4bart_tpu.ops.bart import compute_ranks, predict_trees

        feature, cut, leaf_value = self._tree_draws(include_warmup)
        ranks_new = jnp.asarray(
            compute_ranks(np.asarray(bart_X_new), self.prog.cuts)
        )
        cfg = self.prog.bart_cfg

        def per_draw(f, c, lv):
            return predict_trees(cfg, f, c, lv, ranks_new)

        fn = jax.jit(jax.vmap(jax.vmap(per_draw)))
        return np.asarray(fn(jnp.asarray(feature), jnp.asarray(cut),
                             jnp.asarray(leaf_value)))

    def predict(self, newdata, type: str = "ev", combine_chains: bool = True,
                sample_new_levels: bool = True, offset=None):
        """Posterior draws on new data from the stored tree ensembles
        (generics.R:614-723).  types: ev, ppd, indiv.bart, indiv.fixef,
        indiv.ranef."""
        ok = ("ev", "ppd", "indiv.bart", "indiv.fixef", "indiv.ranef")
        if type not in ok:
            raise ValueError(f"predict type must be one of {ok}")
        tf = self.mf.build_test_frame(newdata)

        if type == "indiv.fixef":
            out = self._indiv_fixef(False, frame=tf)
        elif type == "indiv.ranef":
            out = self._indiv_ranef(False, sample_new_levels=sample_new_levels,
                                    frame=tf)
        elif type == "indiv.bart":
            out = self._predict_bart(tf.bart_X)
        else:
            out = self._predict_bart(tf.bart_X)
            out = out + self._indiv_fixef(False, frame=tf)
            if self.mf.q > 0:
                out = out + self._indiv_ranef(
                    False, sample_new_levels=sample_new_levels, frame=tf
                )
            if tf.offset is not None:
                out = out + np.asarray(tf.offset)
            if offset is not None:
                out = out + np.asarray(offset)
            if self.is_binary:
                out = norm.cdf(out)
            if type == "ppd":
                rng = self._rng()
                if self.is_binary:
                    out = rng.binomial(1, out).astype(np.float64)
                else:
                    sigma = self._sigma_draws(False)[..., None]
                    out = out + rng.standard_normal(out.shape) * sigma
        return self._flatten(out, combine_chains)

    # -- flattened-tree export -------------------------------------------------

    def trees(self, include_warmup: bool = False) -> dict:
        """Flattened tree ensemble draws as columns chain/sample/tree/n/var/
        value (the reference's extract(fit, "trees") via dbarts
        FlattenedTrees; init.cpp:577-671).  Nodes appear in depth-first
        preorder with the left (condition-true) child first — the same
        order dbarts' recursive flattener emits; the reference shifts
        ``var``/``tree`` to 1-based for R (init.cpp:649-653) while this
        build keeps 0-based indices with -1 leaves.  ``var``
        is the 0-based split variable for internal nodes and -1 for leaves;
        ``value`` is the split cut value or the leaf value; ``n`` is the
        training-observation count in the node."""
        import jax
        import jax.numpy as jnp

        from stan4bart_tpu.ops.bart import walk_tree

        feature, cut, leaf_value = self._tree_draws(include_warmup)
        C, I, T, M = feature.shape
        cfg = self.prog.bart_cfg

        # per-node training counts: recompute leaf membership per tree draw,
        # then propagate leaf counts up the heap
        ranks = self.prog.ranks

        def node_counts(f, c):
            leaf_idx = walk_tree(f, c, ranks, cfg.max_depth)
            onehot = (
                leaf_idx[:, None] == jnp.arange(M, dtype=jnp.int32)[None, :]
            )
            counts = jnp.sum(onehot, axis=0).astype(jnp.int32)
            for i in range((M - 2) // 2, -1, -1):
                counts = counts.at[i].add(
                    jnp.where(f[i] >= 0,
                              counts[2 * i + 1] + counts[2 * i + 2], 0)
                )
            return counts

        counts = np.asarray(
            jax.jit(jax.vmap(jax.vmap(jax.vmap(node_counts))))(
                jnp.asarray(feature), jnp.asarray(cut)
            )
        )

        # static preorder permutation of the full heap
        preorder = []

        def visit(i):
            if i >= M:
                return
            preorder.append(i)
            visit(2 * i + 1)
            visit(2 * i + 2)

        visit(0)
        preorder = np.asarray(preorder)

        f = np.asarray(feature)[..., preorder]
        cu = np.asarray(cut)[..., preorder]
        lv = np.asarray(leaf_value)[..., preorder]
        cn = counts[..., preorder]
        active = f >= -1

        chain_col = np.broadcast_to(
            np.arange(C)[:, None, None, None], f.shape
        )[active]
        sample_col = np.broadcast_to(
            np.arange(I)[None, :, None, None], f.shape
        )[active]
        tree_col = np.broadcast_to(
            np.arange(T)[None, None, :, None], f.shape
        )[active]
        var_col = f[active]
        is_internal = var_col >= 0
        cut_vals = self.prog.cuts[
            np.clip(var_col, 0, None), cu[active]
        ]
        value_col = np.where(is_internal, cut_vals, lv[active])
        out = dict(
            sample=sample_col, tree=tree_col, n=cn[active],
            var=np.where(is_internal, var_col, -1),
            value=value_col,
        )
        if C > 1:
            out = {"chain": chain_col, **out}
        return out

    def print_trees(self, chains=None, samples=None, trees=None,
                    include_warmup: bool = False, max_print: int = 50):
        """Human-readable tree dump (the reference's printTrees,
        init.cpp:505-576): indented internal nodes as 'X[var] <= cut' and
        leaves with their values, restricted to the requested chain/sample/
        tree indices (all when None)."""
        feature, cut, leaf_value = self._tree_draws(include_warmup)
        feature = np.asarray(feature)
        cut_arr = np.asarray(cut)
        lv = np.asarray(leaf_value)
        C, I, T, M = feature.shape
        chains = range(C) if chains is None else np.atleast_1d(chains)
        samples = range(I) if samples is None else np.atleast_1d(samples)
        trees = range(T) if trees is None else np.atleast_1d(trees)
        names = self.mf.bart_names
        printed = 0

        def emit(c, s, t, node, depth):
            nonlocal printed
            if node >= M or printed >= max_print * 100:
                return
            f = feature[c, s, t, node]
            pad = "  " * (depth + 1)
            if f >= 0:
                cutv = self.prog.cuts[f, cut_arr[c, s, t, node]]
                print(f"{pad}{names[f]} <= {cutv:.6g}")
                emit(c, s, t, 2 * node + 1, depth + 1)
                emit(c, s, t, 2 * node + 2, depth + 1)
            elif f == -1:
                print(f"{pad}leaf {lv[c, s, t, node]:.6g}")

        for c in chains:
            for s in samples:
                for t in trees:
                    if printed >= max_print:
                        print(f"... (stopped after {max_print} trees)")
                        return
                    print(f"[chain {c + 1}] sample {s + 1} tree {t + 1}:")
                    emit(c, s, t, 0, 0)
                    printed += 1

    def prior_summary(self):
        """Print the resolved priors — the reference's prior summary
        (rstanarm_functions.R:270-365): family, location/scale, and the
        autoscale-adjusted scales actually used."""
        if not self.prior_info:
            print("prior information was not recorded")
            return

        def show_block(title, ps):
            dist = ps.get("prior_dist_name")
            if dist is None:
                print(f"{title}: flat (improper uniform)")
                return
            scale = np.atleast_1d(ps.get("prior_scale", np.nan))
            mean = np.atleast_1d(ps.get("prior_mean", 0.0))
            desc = f"{dist}(location = {np.round(mean, 3).tolist()}, " \
                   f"scale = {np.round(scale, 3).tolist()})"
            if ps.get("prior_autoscale"):
                desc += "  [autoscaled]"
            print(f"{title}: {desc}")

        print("Priors:")
        show_block("  coefficients", self.prior_info.get("coef", {}))
        if not self.is_binary:
            show_block("  aux (sigma)", self.prior_info.get("aux", {}))
        cov = self.prior_info.get("covariance")
        if cov and self.mf.q > 0:
            args = ", ".join(f"{k} = {v}" for k, v in cov.items()
                             if k != "dist")
            print(f"  covariance: {cov.get('dist')}({args})")

    # -- pretty-named draw matrix ----------------------------------------------

    def parameter_names(self) -> list:
        """Pretty names for the constrained block (as.array dimnames,
        generics.R:18-112)."""
        names = []
        for n in self.stan_names:
            if n.endswith("__"):
                continue
            base, _, idx = n.rpartition(".")
            j = int(idx) - 1 if idx.isdigit() else 0
            if base == "beta":
                names.append(f"beta_{self.mf.X_names[j]}")
            elif base == "b":
                names.append(self.mf.b_names()[j])
            elif base == "aux":
                names.append("sigma")
            elif base == "theta_L":
                names.append(self._theta_L_name(j))
            else:
                names.append(n)
        return names

    def _theta_L_name(self, j):
        mark = 0
        for t in self.mf.re_terms:
            ntri = t.p + math.comb(t.p, 2)
            if j < mark + ntri:
                local = j - mark
                k = 0
                for c in range(t.p):
                    for r in range(c, t.p):
                        if k == local:
                            return (f"Sigma[{t.group_name}:"
                                    f"{t.coef_names[r]},{t.coef_names[c]}]")
                        k += 1
            mark += ntri
        return f"theta_L.{j + 1}"

    def as_array(self, include_warmup: bool = False):
        """(iterations, chains, params) with pretty names — the reference's
        as.array.stan4bartFit (generics.R:18-112)."""
        stan = self._slice(self.draws.stan, include_warmup)
        keep = [i for i, n in enumerate(self.stan_names)
                if not n.endswith("__")]
        arr = np.moveaxis(stan[..., keep], 0, 1)  # (iter, chains, params)
        return arr, self.parameter_names()

    def as_matrix(self, include_warmup: bool = False):
        """(iterations * chains, params) with pretty names — the
        reference's as.matrix.stan4bartFit (chains flattened)."""
        arr, names = self.as_array(include_warmup)
        return arr.reshape(-1, arr.shape[-1]), names

    # -- checkpoint / resume ---------------------------------------------------

    def save(self, path: str):
        """Checkpoint the entire fit — draws, design, and live sampler state
        (tree arrays + NUTS position/adaptation + RNG keys are all plain
        arrays).  Generalizes the reference's tree-only exportBARTState
        persistence (init.cpp:409-446; sampler resume is explicitly
        unsupported there, man/stan4bart.Rd:243-247 — here it is supported
        via continue_sampling)."""
        import pickle

        with open(path, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def load(path: str) -> "Stan4bartFit":
        import pickle

        with open(path, "rb") as f:
            return pickle.load(f)

    def continue_sampling(self, iterations: int,
                          chunk_size: int | None = None) -> "Stan4bartFit":
        """Resume the chains from their final state for ``iterations`` more
        post-warmup draws; returns a new fit with the draws appended.

        Runs through the production driver ladder (GibbsProgram.
        continue_chunked): the chain-blocked fused sweep when the fit
        was built with it, auto-chunked executions on time-capped
        backends (the axon tunnel kills single executions past ~60 s),
        and interrupt-safe partial resumes — the same machinery as
        ``stan4bart()`` itself, so resume works at chip scale."""
        import jax
        from dataclasses import replace

        if self.final_states is None:
            raise ValueError("no final sampler state was stored")
        prog = self.prog
        if (chunk_size is None and jax.process_count() == 1
                and jax.default_backend() in ("tpu", "axon")):
            from stan4bart_tpu.fit import _auto_chunk_size

            chunk_size = _auto_chunk_size(
                prog.N, prog.bart_cfg.num_trees, self.chains,
                prog.skip_bart)
        states, new_draws, _ = prog.continue_chunked(
            self.final_states, iterations, chunk_size)
        if self.qr_unrotated:
            # stored draws are already in original coordinates; bring the
            # fresh draws to match before merging (never re-rotate stored)
            new_draws = new_draws._replace(
                stan=self._unrotate_stan(new_draws.stan)
            )
        merged = jax.tree_util.tree_map(
            lambda a, b: np.concatenate([np.asarray(a), b], axis=1),
            self.draws, new_draws,
        )
        return replace(self, draws=merged, final_states=states)

    # -- diagnostics ----------------------------------------------------------

    def check_sampler_diagnostics(self):
        """Post-fit warnings: divergences, treedepth saturation, E-BFMI
        (stan4bart.R:255-297)."""
        if not self.keep_fits:
            return
        stan = self.draws.stan[:, self.warmup :]
        div = stan[..., self._name_idx["divergent__"]].sum()
        if div > 0:
            warnings.warn(
                f"{int(div)} of {stan.shape[0] * stan.shape[1]} "
                "post-warmup draws were divergent transitions"
            )
        td = stan[..., self._name_idx["treedepth__"]]
        max_td = self.prog.nuts_cfg.max_treedepth
        n_max = (td >= max_td).sum()
        if n_max > 0:
            warnings.warn(
                f"{int(n_max)} draws hit the maximum treedepth of {max_td}"
            )
        energy = stan[..., self._name_idx["energy__"]]
        for c in range(energy.shape[0]):
            e = energy[c]
            if len(e) > 3:
                num = np.sum(np.diff(e) ** 2) / len(e)
                den = np.var(e, ddof=1)
                if den > 0 and num / den < 0.2:
                    warnings.warn(
                        f"chain {c + 1} E-BFMI = {num / den:.3f} < 0.2: "
                        "the posterior may be poorly explored"
                    )
                    break
        # equilibration check (beyond reference; motivated by a measured
        # case, BENCH_NOTES round 3: at n=2000 a 300-iteration warmup
        # left a residual RSS/sigma transient that depressed lp ESS and
        # biased sigma ~3% — the BART ensemble-complexity relaxation runs
        # on a hundreds-of-iterations timescale).  A monotone lp trend
        # ACROSS the sampling phase means warmup ended early: compare
        # first- and last-quarter means against the MC error of chain
        # quarters (a loose 6-sigma gate so healthy chains never warn).
        lp = np.asarray(stan[..., self._name_idx["lp__"]], np.float64)
        n_it = lp.shape[1]
        if n_it >= 40:
            from stan4bart_tpu.parallel.diagnostics import ess as _ess

            q = n_it // 4
            head = lp[:, :q].mean(axis=1)
            tail = lp[:, -q:].mean(axis=1)
            # error scale from the DETRENDED series (a trend would
            # otherwise inflate its own error estimate), stretched by
            # the autocorrelation time n/ESS
            t_idx = np.arange(n_it) - (n_it - 1) / 2.0
            slope = (lp @ t_idx) / (t_idx @ t_idx)
            resid = lp - slope[:, None] * t_idx[None, :]
            resid = resid - resid.mean(axis=1, keepdims=True)
            zmax, worst = 0.0, 0
            for c in range(lp.shape[0]):
                sd = float(np.std(resid[c], ddof=1))
                if sd == 0.0:
                    continue
                ess_c = float(np.asarray(_ess(resid[c][None, :])))
                tau = n_it / max(ess_c, 1.0)
                se = sd * np.sqrt(2.0 * tau / q) + 1e-12
                z = float((tail[c] - head[c]) / se)
                if abs(z) > abs(zmax):
                    zmax, worst = z, c
            if abs(zmax) > 6.0:
                warnings.warn(
                    f"chain {worst + 1}'s log-posterior trends "
                    f"monotonically across the sampling phase (drift "
                    f"{float(tail[worst] - head[worst]):+.1f}, "
                    f"{zmax:.1f} SEs): warmup likely ended before the "
                    "BART ensemble equilibrated — increase warmup (the "
                    "complexity relaxation runs on a hundreds-of-"
                    "iterations timescale at large n; BENCH_NOTES "
                    "round 3)"
                )

    def adjudicate_parametric_smc(self, n_particles: int = 1024,
                                  n_mcmc: int = 8,
                                  seed: int | None = None) -> dict:
        """Independent tempered-SMC adjudication of the parametric block.

        Runs ``ops.smc.smc_sample`` (adaptive tempering + HMC moves — a
        sampler family with no kernel in common with the Gibbs/NUTS fit)
        on the parametric CONDITIONAL posterior with the BART component
        fixed at its posterior-mean fit, exposing the adjudication tool
        used to certify the centered-ranef geometry (docs/
        interweaving.md) on the public fit surface.  The reference
        vendors stan/variational+services but exposes no second sampler
        (SURVEY.md section 2.5).

        Contract: this targets the conditional given the mean BART fit,
        NOT the marginal parametric posterior — conditional spreads are
        a lower bound on marginal ones.  Agreement of means within MC
        error is the check; a gap flags a mixing or implementation
        problem in the main sampler.  Gaussian family only.

        Returns dict with ``names``, ``draws`` (n_particles, P),
        ``log_evidence``, ``final_temp`` (1.0 = bridged to the target),
        and ``mcmc_mean``/``smc_mean`` aligned to ``names``.
        """
        if self.is_binary:
            raise NotImplementedError(
                "SMC adjudication targets the Gaussian parametric "
                "conditional; the probit conditional depends on latent "
                "responses that have no fixed value to condition on"
            )
        import jax
        import jax.numpy as jnp

        from stan4bart_tpu.ops.smc import smc_sample

        prog, pm = self.prog, self.pm
        bart_mean = np.asarray(self.extract("indiv.bart")).mean(axis=-1)
        offset = prog._stan_offset_from_fit(
            jnp.asarray(bart_mean, prog.dtype))
        rng = jax.random.PRNGKey(
            (self.seed + 0x5AC) if seed is None else int(seed))
        res = smc_sample(
            lambda u: pm.log_prob(u, offset, prog.y),
            pm.num_upars, int(n_particles), rng, n_mcmc=int(n_mcmc),
            dtype=prog.dtype,
        )
        names = pm.constrained_names()
        draws = np.asarray(jax.vmap(pm.constrained_draw)(res.particles))
        mcmc = self._slice(self.draws.stan, False)[
            ..., [self._name_idx[n] for n in names]
        ].reshape(-1, len(names))
        return {
            "names": names,
            "draws": draws,
            "log_evidence": float(res.log_evidence),
            "final_temp": float(res.final_temp),
            "smc_mean": draws.mean(axis=0),
            "mcmc_mean": mcmc.mean(axis=0),
        }

    def summary(self, include_diagnostics: bool = True):
        """Per-parameter posterior summary: mean, sd, 5%/95% quantiles,
        split-R-hat, ESS.  The reference vendors Stan's R-hat/ESS without
        calling them (SURVEY.md section 5); here they are part of the fit
        surface.  Returns a dict of column arrays keyed by statistic, plus
        'names'."""
        from stan4bart_tpu.parallel.diagnostics import ess, split_rhat

        arr, names = self.as_array()          # (iter, chains, params)
        chains_first = np.moveaxis(arr, 1, 0)  # (chains, iter, params)
        mean = chains_first.mean(axis=(0, 1))
        sd = chains_first.std(axis=(0, 1), ddof=1)
        q5, q95 = np.quantile(chains_first, [0.05, 0.95], axis=(0, 1))
        rhat = np.asarray(split_rhat(chains_first))
        # one vmapped dispatch over the parameter axis (a per-parameter
        # Python loop is O(P) dispatches — pathological at large q)
        import jax

        ess_vals = np.asarray(
            jax.jit(jax.vmap(ess, in_axes=2))(chains_first)
        ).astype(np.float64)
        out = dict(names=names, mean=mean, sd=sd, q5=q5, q95=q95,
                   rhat=rhat, ess=ess_vals)
        if include_diagnostics:
            stan = self.draws.stan[:, self.warmup :]
            out["divergences"] = int(
                stan[..., self._name_idx["divergent__"]].sum()
            )
            out["mean_treedepth"] = float(
                stan[..., self._name_idx["treedepth__"]].mean()
            )
        return out

    def print_summary(self, max_rows: int = 40):
        """Readable posterior table (the reference's print/summary
        generics)."""
        s = self.summary()
        print(self.__repr__())
        header = f"{'parameter':<28}{'mean':>10}{'sd':>10}{'5%':>10}" \
                 f"{'95%':>10}{'rhat':>8}{'ess':>8}"
        print(header)
        for j, name in enumerate(s["names"][:max_rows]):
            print(f"{name:<28}{s['mean'][j]:>10.3f}{s['sd'][j]:>10.3f}"
                  f"{s['q5'][j]:>10.3f}{s['q95'][j]:>10.3f}"
                  f"{s['rhat'][j]:>8.3f}{s['ess'][j]:>8.0f}")
        if len(s["names"]) > max_rows:
            print(f"... ({len(s['names']) - max_rows} more parameters)")
        print(f"divergences: {s['divergences']}  "
              f"mean treedepth: {s['mean_treedepth']:.1f}")

    # -- per-component accessors (formula/terms/model.frame S3 methods,
    # lme4_functions.R:1403-1482)

    @property
    def formula(self) -> str:
        return self.mf.parsed.raw

    def terms(self, component: str = "fixed") -> list:
        """Term strings of one model component (fixed | bart | random)."""
        p = self.mf.parsed
        if component == "fixed":
            return list(p.fixed_terms)
        if component == "bart":
            return list(p.bart_terms)
        if component == "random":
            return [t.raw for t in p.random_terms]
        raise ValueError("component must be fixed, bart, or random")

    def model_frame(self, component: str = "fixed"):
        """Design data of one component: (matrix, column names) for
        fixed/bart, the ReTermData list for random."""
        if component == "fixed":
            return np.asarray(self.mf.X), list(self.mf.X_names)
        if component == "bart":
            return np.asarray(self.mf.bart_X), list(self.mf.bart_names)
        if component == "random":
            return self.mf.re_terms
        raise ValueError("component must be fixed, bart, or random")

    def __repr__(self):
        post = self.iterations - self.warmup
        return (
            f"Stan4bartFit({self.family}; n={self.mf.N}, K={self.mf.K}, "
            f"bart_vars={self.mf.bart_X.shape[1]}, q={self.mf.q}; "
            f"chains={self.chains}, warmup={self.warmup}, draws={post})"
        )
