"""The parametric multilevel log-posterior ("continuous" model) in pure JAX.

Reimplements, as ~300 lines of differentiable JAX, exactly what the
reference's generated+hand-edited Stan model computes
(/root/reference/src/stan_files/continuous.stan:1-429;
src/stan_files/continuous.hpp:2171-2638 log_prob, 3662-3768
get_parametric_mean), replacing the 153k-line vendored stan/math tree with
``jax.grad``:

* transformed parameters: aux scaling; beta from z_beta per prior family —
  normal / Student-t via the Cornish-Fisher ``CFt`` expansion / horseshoe /
  hs_plus / laplace / lasso / product_normal (continuous.stan:124-158,
  293-322);
* ``make_theta_L`` — the scaled onion-method Cholesky of the rstanarm decov
  prior blocks, dispersion folded in (continuous.stan:2-59);
* ``make_b`` — block matvec expanding z_b into random effects
  (continuous.stan:61-94);
* model block — gaussian (optionally weighted) likelihood with mutable
  ``offset_``, coefficient/intercept/aux priors, ``decov_lp``
  (continuous.stan:96-122, 344-429);
* constraint transforms (exp for positives, logistic for rho in (0,1)) with
  log-Jacobians, matching Stan's unconstrained parameterization so NUTS
  behaves like the reference sampler.

Static structure (dims, prior codes) lives in ``ParametricConfig``; everything
data-dependent but iteration-constant (X, Z gather structures, hyperparameter
vectors) is closed over; the Gibbs-mutable pieces (``offset_``, ``y``) are
explicit arguments — the coupling surface the reference implements as
``set_offset`` / ``set_response`` mutators (continuous.hpp:3626-3635).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from stan4bart_tpu.models import dists

_LOG_HALF = -0.6931471805599452862


# ---------------------------------------------------------------------------
# configuration


@dataclass(frozen=True)
class ParametricConfig:
    """Static model structure (shapes & prior codes only — hashable/jittable)."""

    N: int
    K: int
    has_intercept: bool
    is_binary: bool
    has_weights: bool
    prior_dist: int                 # 0..7 (continuous.stan:184-186); 8 = R2
    prior_dist_for_intercept: int   # 0..2
    prior_dist_for_aux: int         # 0..3
    t: int
    p: tuple = ()
    l: tuple = ()
    num_normals: tuple = ()         # only for prior_dist == 7
    # centered random-effect parameterization: sample b directly with a
    # MVN(0, T T') prior instead of b = T z_b, z_b ~ N(0,1).  SAME posterior
    # (pure reparameterization), radically better geometry in the
    # data-dominated regime: at n=10k the reference's non-centered rstanarm
    # parameterization forms a curved (z_b, tau) ridge that pins NUTS at
    # max treedepth with stepsize ~5e-4 (measured on CPU x64 and TPU alike)
    centered: bool = False
    # covariance prior family: 0 = decov (gamma-scaled simplex, the
    # reference's only option), 1 = lkj (independent half-t sds + LKJ
    # correlation, rstanarm's lkj() for prior_covariance)
    cov_prior: int = 0

    @property
    def q(self) -> int:
        return int(sum(pi * li for pi, li in zip(self.p, self.l)))

    @property
    def len_theta_L(self) -> int:
        return int(sum(pi + math.comb(pi, 2) for pi in self.p))

    @property
    def len_rho(self) -> int:
        return int(sum(self.p)) - self.t

    @property
    def len_concentration(self) -> int:
        return int(sum(pi for pi in self.p if pi > 1))

    @property
    def len_regularization(self) -> int:
        return int(sum(1 for pi in self.p if pi > 1))

    @property
    def len_z_T(self) -> int:
        return int(sum(max(0, pi - 2) * (pi - 1) for pi in self.p))

    @property
    def hs(self) -> int:
        return {3: 2, 4: 4}.get(self.prior_dist, 0)

    @property
    def z_beta_dim(self) -> int:
        if self.prior_dist == 7:
            return int(sum(self.num_normals))
        return self.K


# ---------------------------------------------------------------------------
# unconstrained-parameter layout

_POS, _ID, _UNIT = "pos", "id", "unit"


def make_layout(cfg: ParametricConfig):
    """Ordered (name, size, transform) blocks — Stan's declaration order
    (continuous.stan:261-278)."""
    blocks = []

    def add(name, size, kind):
        if size > 0:
            blocks.append((name, int(size), kind))

    add("gamma", 1 if cfg.has_intercept else 0, _ID)
    add("z_beta", cfg.z_beta_dim, _ID)
    add("global", cfg.hs, _POS)
    add("local", cfg.hs * cfg.K, _POS)
    add("caux", 1 if cfg.hs > 0 else 0, _POS)
    add("mix", cfg.K if cfg.prior_dist in (5, 6) else 0, _POS)
    add("one_over_lambda", 1 if cfg.prior_dist == 6 else 0, _POS)
    add("R2", 1 if cfg.prior_dist == 8 else 0, _UNIT)
    add("b_raw" if cfg.centered else "z_b", cfg.q, _ID)
    add("z_T", cfg.len_z_T, _ID)
    add("rho", cfg.len_rho, _UNIT)
    if cfg.cov_prior == 1:
        # lkj: per-coefficient sds replace the decov zeta/tau machinery
        add("sds", sum(cfg.p), _POS)
    else:
        add("zeta", cfg.len_concentration, _POS)
        add("tau", cfg.t, _POS)
    add("aux_unscaled", 0 if cfg.is_binary else 1, _POS)
    return blocks


class ParamLayout:
    def __init__(self, cfg: ParametricConfig):
        self.blocks = make_layout(cfg)
        self.slices = {}
        off = 0
        for name, size, kind in self.blocks:
            self.slices[name] = (off, size, kind)
            off += size
        self.num_upars = off
        # vectorized transform masks: one exp/sigmoid pass over the whole
        # vector instead of per-block slices (each small fusion costs ~13us
        # of launch latency on TPU, and this runs twice per leapfrog)
        kinds = np.concatenate([
            np.full(size, {"id": 0, "pos": 1, "unit": 2}[kind])
            for _, size, kind in self.blocks
        ]) if self.blocks else np.zeros(0)
        self._pos_mask = kinds == 1
        self._unit_mask = kinds == 2
        self._any_pos = bool(self._pos_mask.any())
        self._any_unit = bool(self._unit_mask.any())

    def get(self, u, name):
        if name not in self.slices:
            return None
        off, size, _ = self.slices[name]
        return jax.lax.dynamic_slice_in_dim(u, off, size)

    def constrain(self, u):
        """unconstrained vector -> dict of constrained blocks + log|Jacobian|."""
        pos = jnp.asarray(self._pos_mask)
        unit = jnp.asarray(self._unit_mask)
        x = u
        log_jac = jnp.zeros((), u.dtype)
        if self._any_pos:
            x = jnp.where(pos, jnp.exp(u), x)
            log_jac = log_jac + jnp.sum(jnp.where(pos, u, 0.0))
        if self._any_unit:
            x = jnp.where(unit, jax.nn.sigmoid(u), x)
            log_jac = log_jac + jnp.sum(jnp.where(
                unit, jax.nn.log_sigmoid(u) + jax.nn.log_sigmoid(-u), 0.0
            ))
        out = {}
        for name, size, kind in self.blocks:
            off, _, _ = self.slices[name]
            out[name] = x[off : off + size]
        return out, log_jac

    def unconstrain_dict(self, vals: dict) -> np.ndarray:
        u = np.zeros(self.num_upars)
        for name, size, kind in self.blocks:
            off, _, _ = self.slices[name]
            v = np.atleast_1d(np.asarray(vals.get(name, np.zeros(size))))
            if kind == _POS:
                v = np.log(v)
            elif kind == _UNIT:
                v = np.log(v) - np.log1p(-v)
            u[off : off + size] = v
        return u


# ---------------------------------------------------------------------------
# transformed parameters


def cft(z, df):
    """Cornish-Fisher expansion: standard normal -> Student-t quantile
    (continuous.stan:146-158)."""
    z2 = z * z
    z3 = z2 * z
    z5 = z2 * z3
    z7 = z2 * z5
    z9 = z2 * z7
    df2 = df * df
    df3 = df2 * df
    df4 = df2 * df2
    return (
        z
        + (z3 + z) / (4.0 * df)
        + (5.0 * z5 + 16.0 * z3 + 3.0 * z) / (96.0 * df2)
        + (3.0 * z7 + 19.0 * z5 + 17.0 * z3 - 15.0 * z) / (384.0 * df3)
        + (79.0 * z9 + 776.0 * z7 + 1482.0 * z5 - 1920.0 * z3 - 945.0 * z)
        / (92160.0 * df4)
    )


def _hs_lambda_tilde(lam, tau, c2):
    lam2 = lam * lam
    return jnp.sqrt(c2 * lam2 / (c2 + tau * tau * lam2))


def compute_beta(cfg: ParametricConfig, c, hyper, aux):
    """beta from z_beta per prior family (continuous.stan:293-322)."""
    pd = cfg.prior_dist
    z_beta = c.get("z_beta")
    if cfg.K == 0:
        return jnp.zeros(0, dtype=hyper["prior_mean"].dtype)
    if pd == 0:
        return z_beta
    if pd == 1:
        return z_beta * hyper["prior_scale"] + hyper["prior_mean"]
    if pd == 2:
        return (
            cft(z_beta, hyper["prior_df"]) * hyper["prior_scale"]
            + hyper["prior_mean"]
        )
    if pd in (3, 4):
        loc = c["local"].reshape(cfg.hs, cfg.K)
        glob = c["global"]
        c2 = hyper["slab_scale"] ** 2 * c["caux"][0]
        error_scale = 1.0 if cfg.is_binary else aux
        tau_g = (
            glob[0] * jnp.sqrt(glob[1]) * hyper["global_prior_scale"]
            * error_scale
        )
        if pd == 3:
            lam = loc[0] * jnp.sqrt(loc[1])
        else:
            lam = loc[0] * jnp.sqrt(loc[1]) * loc[2] * jnp.sqrt(loc[3])
        return z_beta * _hs_lambda_tilde(lam, tau_g, c2) * tau_g
    if pd == 5:
        return (
            hyper["prior_mean"]
            + hyper["prior_scale"] * jnp.sqrt(2.0 * c["mix"]) * z_beta
        )
    if pd == 6:
        return (
            hyper["prior_mean"]
            + c["one_over_lambda"][0]
            * hyper["prior_scale"] * jnp.sqrt(2.0 * c["mix"]) * z_beta
        )
    if pd == 7:
        segs = []
        z_pos = 0
        for k in range(cfg.K):
            nn = cfg.num_normals[k]
            prod = jnp.prod(z_beta[z_pos : z_pos + nn])
            z_pos += nn
            segs.append(
                prod * hyper["prior_scale"][k] ** nn + hyper["prior_mean"][k]
            )
        return jnp.stack(segs)
    if pd == 8:
        # R2 prior (stan_lm): beta_qr = u sqrt(R2) sd(y), u uniform on the
        # unit sphere via z/|z| with z ~ N(0,1) (Stan's unit_vector), with
        # X = Q sqrt(N-1) so var(X beta) = R2 var(y)
        r2 = c["R2"][0]
        norm = jnp.sqrt(jnp.sum(z_beta * z_beta) + 1e-30)
        return z_beta / norm * jnp.sqrt(r2) * hyper["R2_s"]
    raise ValueError(f"unknown prior_dist {pd}")


def make_theta_L(cfg: ParametricConfig, dispersion, tau, scale, zeta, rho, z_T):
    """Scaled onion-method Cholesky blocks (continuous.stan:2-59).

    p is static, so the loops unroll at trace time into fixed-size ops.
    """
    theta_L = []
    zeta_mark = rho_mark = z_T_mark = 0
    for i, nc in enumerate(cfg.p):
        if nc == 1:
            theta_L.append((tau[i] * scale[i] * dispersion)[None])
            continue
        trace_T_i = (tau[i] * scale[i] * dispersion) ** 2 * nc
        pi_seg = zeta[zeta_mark : zeta_mark + nc]
        pi_seg = pi_seg / jnp.sum(pi_seg)
        zeta_mark += nc
        T = [[None] * nc for _ in range(nc)]
        std_dev = jnp.sqrt(pi_seg[0] * trace_T_i)
        T[0][0] = std_dev
        std_dev = jnp.sqrt(pi_seg[1] * trace_T_i)
        T21 = 2.0 * rho[rho_mark] - 1.0
        rho_mark += 1
        T[1][1] = std_dev * jnp.sqrt(1.0 - T21 * T21)
        T[1][0] = std_dev * T21
        for r in range(1, nc - 1):  # rows 3..nc (0-based r+1)
            T_row = z_T[z_T_mark : z_T_mark + r + 1]
            z_T_mark += r + 1
            scale_factor = (
                jnp.sqrt(rho[rho_mark] / jnp.dot(T_row, T_row)) * std_dev
            )
            std_dev = jnp.sqrt(pi_seg[r + 1] * trace_T_i)
            for ci in range(r + 1):
                T[r + 1][ci] = T_row[ci] * scale_factor
            T[r + 1][r + 1] = jnp.sqrt(1.0 - rho[rho_mark]) * std_dev
            rho_mark += 1
        # vech (column-major lower triangle incl. diagonal)
        for ci in range(nc):
            for ri in range(ci, nc):
                theta_L.append(T[ri][ci][None])
    if not theta_L:
        return jnp.zeros(0, dtype=tau.dtype if cfg.t else jnp.float64)
    return jnp.concatenate(theta_L)




def make_theta_L_lkj(cfg: ParametricConfig, sds, rho, z_T):
    """Cholesky blocks for the lkj covariance prior: diag(sds_i) @ L_corr_i
    with L_corr_i built by the same onion recursion as decov (the rho beta
    ladder with shape eta=regularization IS the LKJ(eta) onion sampler).
    Unlike decov, the dispersion is NOT folded in — sds are in response
    units (rstanarm stan_mvmer lkj semantics)."""
    theta_L = []
    sd_mark = rho_mark = z_T_mark = 0
    for nc in cfg.p:
        if nc == 1:
            theta_L.append(sds[sd_mark][None])
            sd_mark += 1
            continue
        sd_seg = sds[sd_mark : sd_mark + nc]
        sd_mark += nc
        T = [[None] * nc for _ in range(nc)]
        T[0][0] = sd_seg[0]
        T21 = 2.0 * rho[rho_mark] - 1.0
        rho_mark += 1
        T[1][1] = sd_seg[1] * jnp.sqrt(1.0 - T21 * T21)
        T[1][0] = sd_seg[1] * T21
        for r in range(1, nc - 1):
            T_row = z_T[z_T_mark : z_T_mark + r + 1]
            z_T_mark += r + 1
            scale_factor = (
                jnp.sqrt(rho[rho_mark] / jnp.dot(T_row, T_row))
                * sd_seg[r + 1]
            )
            for ci in range(r + 1):
                T[r + 1][ci] = T_row[ci] * scale_factor
            T[r + 1][r + 1] = jnp.sqrt(1.0 - rho[rho_mark]) * sd_seg[r + 1]
            rho_mark += 1
        for ci in range(nc):
            for ri in range(ci, nc):
                theta_L.append(T[ri][ci][None])
    if not theta_L:
        return jnp.zeros(0, dtype=sds.dtype if cfg.t else jnp.float64)
    return jnp.concatenate(theta_L)


def make_b(cfg: ParametricConfig, z_b, theta_L):
    """b = blockdiag(T_i x I_{l_i}) z_b, level-major within each term
    (continuous.stan:61-94)."""
    out = []
    b_mark = 0
    theta_mark = 0
    for i, nc in enumerate(cfg.p):
        li = cfg.l[i]
        if nc == 1:
            seg = z_b[b_mark : b_mark + li] * theta_L[theta_mark]
            out.append(seg)
            b_mark += li
            theta_mark += 1
        else:
            # unpack T_i from vech (column-major lower incl. diag)
            rows, cols, vals = [], [], []
            for ci in range(nc):
                for ri in range(ci, nc):
                    rows.append(ri)
                    cols.append(ci)
                    vals.append(theta_L[theta_mark])
                    theta_mark += 1
            T = jnp.zeros((nc, nc), dtype=z_b.dtype)
            T = T.at[jnp.array(rows), jnp.array(cols)].set(jnp.stack(vals))
            zseg = z_b[b_mark : b_mark + nc * li].reshape(li, nc)
            out.append(
                jnp.dot(zseg, T.T,
                        precision=jax.lax.Precision.HIGHEST).reshape(-1)
            )
            b_mark += nc * li
    if not out:
        return jnp.zeros(0, dtype=z_b.dtype)
    return jnp.concatenate(out)


def decov_delta(cfg: ParametricConfig, concentration: np.ndarray) -> np.ndarray:
    """delta vector for the zeta ~ gamma(delta, 1) prior
    (continuous.stan transformed data:251-257)."""
    delta = []
    pos = 0
    for nc in cfg.p:
        if nc > 1:
            for j in range(nc):
                delta.append(concentration[pos])
                pos += 1
    return np.asarray(delta)


# ---------------------------------------------------------------------------
# the model


class ParametricModel:
    """Holds static structure + iteration-constant data; exposes
    ``log_prob(u, offset_, y)`` and the draw/mean accessors."""

    def __init__(self, cfg: ParametricConfig, X, z_structs, hyper,
                 weights=None, dtype=jnp.float64):
        """z_structs: list of (lhs (N,p_i), group_idx (N,)) per random term."""
        self.cfg = cfg
        self.layout = ParamLayout(cfg)
        self.dtype = dtype
        self.X = jnp.asarray(X, dtype=dtype)
        self.z_structs = [
            (jnp.asarray(lhs, dtype=dtype), jnp.asarray(gidx, dtype=jnp.int32))
            for lhs, gidx in z_structs
        ]
        self.weights = (
            jnp.asarray(weights, dtype=dtype) if cfg.has_weights else None
        )
        # observation sharding (parallel/mesh.run_obs_sharded): when set,
        # X / z_structs / weights / gram_A / gram_AW hold the LOCAL obs
        # shard of a mesh axis named obs_axis and every likelihood
        # reduction is psum'd over it; cfg.N stays the GLOBAL count (it
        # only enters normalization constants), N_rows is the local row
        # count used for per-obs array allocation.
        self.obs_axis = None
        self.N_rows = int(np.shape(X)[0]) if X is not None else cfg.N
        self.hyper = {
            k: (jnp.asarray(v, dtype=dtype)
                if isinstance(v, (np.ndarray, list, float, int))
                and not isinstance(v, bool) else v)
            for k, v in hyper.items()
        }
        # per-term offsets into the flat b vector
        self.b_offsets = []
        off = 0
        for pi, li in zip(cfg.p, cfg.l):
            self.b_offsets.append(off)
            off += pi * li

    def _psum(self, x):
        """All-reduce a (pytree of) local sufficient statistic(s) over the
        observation mesh axis; identity when not obs-sharded."""
        return (jax.lax.psum(x, self.obs_axis) if self.obs_axis is not None
                else x)

    # -- transformed parameters ---------------------------------------------

    def _aux(self, c):
        """aux (sigma) from aux_unscaled (continuous.stan:286-290, 325-332)."""
        cfg, h = self.cfg, self.hyper
        if cfg.is_binary:
            return jnp.asarray(1.0, dtype=self.dtype)
        au = c["aux_unscaled"][0]
        if cfg.prior_dist_for_aux == 0:
            return au
        aux = h["prior_scale_for_aux"] * au
        if cfg.prior_dist_for_aux <= 2:
            aux = aux + h["prior_mean_for_aux"]
        return aux

    def transformed(self, c):
        """-> dict(aux, beta, theta_L, b)."""
        cfg, h = self.cfg, self.hyper
        aux = self._aux(c)
        beta = compute_beta(cfg, c, h, aux)
        dispersion = jnp.asarray(1.0, self.dtype) if cfg.is_binary else aux
        if cfg.cov_prior == 1:
            theta_L = make_theta_L_lkj(
                cfg, c.get("sds", jnp.zeros(0, self.dtype)),
                c.get("rho", jnp.zeros(0, self.dtype)),
                c.get("z_T", jnp.zeros(0, self.dtype)),
            )
        else:
            theta_L = make_theta_L(
                cfg, dispersion, c.get("tau", jnp.zeros(0, self.dtype)),
                h["scale_decov"],
                c.get("zeta", jnp.zeros(0, self.dtype)),
                c.get("rho", jnp.zeros(0, self.dtype)),
                c.get("z_T", jnp.zeros(0, self.dtype)),
            )
        if cfg.centered:
            b = c.get("b_raw", jnp.zeros(0, self.dtype))
        else:
            b = make_b(cfg, c.get("z_b", jnp.zeros(0, self.dtype)), theta_L)
        return dict(aux=aux, beta=beta, theta_L=theta_L, b=b)

    # -- linear predictor pieces --------------------------------------------

    def eta_fixed(self, beta, X=None):
        X = self.X if X is None else X
        if self.cfg.K == 0:
            return jnp.zeros(X.shape[0], dtype=self.dtype)
        # full f32 precision: the TPU MXU default casts inputs to bf16,
        # which injects O(1) noise into the 10k-term log-density sum and
        # collapses NUTS stepsize adaptation (measured: stepsize 1e-5,
        # treedepth pinned at max)
        return jnp.dot(X, beta, precision=jax.lax.Precision.HIGHEST)

    # level-count threshold above which the Z matvec switches from the
    # (N, l) one-hot MXU matmul to a gather/segment-sum: the one-hot costs
    # O(N*l) memory per term PER CHAIN (at l=4096, N=10k, f32 that is
    # 160 MB — past HBM per vmapped chain), while the gather path is O(N*p)
    # with a serialized gather (~0.4 ms at N=10k measured) and a
    # scatter-add transpose.  This is the large-q regime the reference
    # engineered CSR for (continuous.hpp:1176-1197; SURVEY section 5).
    LARGE_Q_THRESHOLD = int(os.environ.get("S4B_LARGE_Q_THRESHOLD", "2048"))

    def eta_random(self, b, z_structs=None):
        """Z b per term (TPU-native replacement for the reference's CSR
        matvec, continuous.hpp:1176-1197).

        Small l: one-hot MXU matmul — fancy-index gathers compile to
        serialized kCustom gathers on TPU (~0.4 ms at N=10k) and their AD
        transpose is a scatter-add, while the (N, l) one-hot matmul runs on
        the MXU with a matmul transpose and the one-hot build is
        loop-invariant so XLA hoists it out of the leapfrog loop.
        Large l (> LARGE_Q_THRESHOLD): gather/segment-sum — the one-hot's
        O(N*l) memory is the binding constraint there, not flops."""
        zs = self.z_structs if z_structs is None else z_structs
        n = zs[0][0].shape[0] if zs else self.N_rows
        eta = jnp.zeros(n, dtype=self.dtype)
        for (lhs, gidx), off, pi, li in zip(
            zs, self.b_offsets, self.cfg.p, self.cfg.l
        ):
            b_mat = b[off : off + pi * li].reshape(li, pi)
            if li > self.LARGE_Q_THRESHOLD:
                safe = jnp.clip(gidx, 0, li - 1)
                per_obs = jnp.where(
                    (gidx >= 0)[:, None], b_mat[safe], 0.0
                )
            else:
                # unseen levels (gidx == -1) get an all-zero one-hot row
                onehot = (
                    gidx[:, None]
                    == jnp.arange(li, dtype=jnp.int32)[None, :]
                ).astype(self.dtype)
                per_obs = jnp.dot(onehot, b_mat,
                                  precision=jax.lax.Precision.HIGHEST)
            eta = eta + jnp.sum(lhs * per_obs, axis=1)
        return eta

    def parametric_mean(self, c, tp, include_fixed=True, include_random=True):
        """eta_param = X beta + Z b (+ gamma) — continuous.hpp:3662-3768."""
        eta = jnp.zeros(self.N_rows, dtype=self.dtype)
        if include_fixed:
            eta = eta + self.eta_fixed(tp["beta"])
            if self.cfg.has_intercept:
                eta = eta + c["gamma"][0]
        if include_random and self.cfg.q > 0:
            eta = eta + self.eta_random(tp["b"])
        return eta

    # -- log posterior --------------------------------------------------------

    def log_prob(self, u, offset_, y):
        """Full log-posterior density of the unconstrained vector, including
        constraint Jacobians (continuous.stan model block:344-429)."""
        cfg, h = self.cfg, self.hyper
        c, log_jac = self.layout.constrain(u)
        tp = self.transformed(c)
        aux, beta, b = tp["aux"], tp["beta"], tp["b"]

        eta = offset_ + self.eta_fixed(beta)
        if cfg.q > 0:
            eta = eta + self.eta_random(b)
        if cfg.has_intercept:
            eta = eta + c["gamma"][0]

        actual_aux = jnp.asarray(1.0, self.dtype) if cfg.is_binary else aux

        if self.obs_axis is not None:
            # obs-sharded: local quadratic, one psum; the normalization
            # uses the GLOBAL cfg.N (prior terms are replicated, not
            # reduced).  NOTE: gradients w.r.t. u through this form need
            # a grad-side all-reduce the manual-sharding driver does not
            # insert — the obs-sharded driver therefore requires the
            # Gram-compressed likelihood (log_prob_gram, whose anchor is
            # forward-only) for every differentiated evaluation and uses
            # this direct form only in forward-only kernels (slice
            # sampler, telemetry).
            hi = jax.lax.Precision.HIGHEST
            r = y - eta
            quad = (jnp.dot(self.weights, r * r, precision=hi)
                    if cfg.has_weights else jnp.dot(r, r, precision=hi))
            quad = self._psum(quad)
            lp = (
                -0.5 * cfg.N * jnp.log(
                    2.0 * jnp.pi * actual_aux * actual_aux
                )
                - 0.5 * quad / (actual_aux * actual_aux)
            )
        elif not cfg.has_weights:
            lp = dists.normal_lpdf(y, eta, actual_aux)
        else:
            lp = (
                -0.5 * cfg.N * jnp.log(
                    2.0 * jnp.pi * actual_aux * actual_aux
                )
                - 0.5 * jnp.dot(self.weights, (y - eta) ** 2)
                / (actual_aux * actual_aux)
            )

        return lp + self._prior_lp(c, tp) + log_jac

    def _prior_lp(self, c, tp):
        """Every prior term of the model block (continuous.stan:368-429) —
        N-independent, shared by the direct and Gram-compressed
        likelihood paths."""
        cfg, h = self.cfg, self.hyper
        lp = jnp.zeros((), dtype=self.dtype)

        # aux prior (continuous.stan:368-376) on aux_unscaled
        if (not cfg.is_binary and cfg.prior_dist_for_aux > 0
                and float(h["prior_scale_for_aux"]) > 0):
            au = c["aux_unscaled"][0]
            if cfg.prior_dist_for_aux == 1:
                lp = lp + dists.normal_lpdf(au) - _LOG_HALF
            elif cfg.prior_dist_for_aux == 2:
                lp = lp + dists.student_t_lpdf(
                    au, h["prior_df_for_aux"]
                ) - _LOG_HALF
            else:
                lp = lp + dists.exponential_lpdf(au)

        # coefficient priors (continuous.stan:378-415); empty-vector lpdfs
        # contribute 0 in Stan, so skip the block entirely when K == 0
        pd = cfg.prior_dist if cfg.z_beta_dim > 0 else 0
        if pd in (1, 2, 7):
            lp = lp + dists.normal_lpdf(c["z_beta"])
        elif pd in (3, 4):
            loc = c["local"].reshape(cfg.hs, cfg.K)
            glob = c["global"]
            lp = lp + dists.normal_lpdf(c["z_beta"])
            lp = lp + dists.normal_lpdf(loc[0]) - cfg.K * _LOG_HALF
            lp = lp + dists.inv_gamma_lpdf(
                loc[1], 0.5 * h["prior_df"], 0.5 * h["prior_df"]
            )
            if pd == 4:
                lp = lp + dists.normal_lpdf(loc[2]) - cfg.K * _LOG_HALF
                # unorthodox use of prior_scale as df2 (continuous.stan:397-398)
                lp = lp + dists.inv_gamma_lpdf(
                    loc[3], 0.5 * h["prior_scale"], 0.5 * h["prior_scale"]
                )
            lp = lp + dists.normal_lpdf(glob[0]) - _LOG_HALF
            lp = lp + dists.inv_gamma_lpdf(
                glob[1], 0.5 * h["global_prior_df"], 0.5 * h["global_prior_df"]
            )
            lp = lp + dists.inv_gamma_lpdf(
                c["caux"], 0.5 * h["slab_df"], 0.5 * h["slab_df"]
            )
        elif pd in (5, 6):
            lp = lp + dists.normal_lpdf(c["z_beta"])
            lp = lp + dists.exponential_lpdf(c["mix"])
            if pd == 6:
                lp = lp + dists.chi_square_lpdf(
                    c["one_over_lambda"], h["prior_df"][0]
                )
        elif pd == 8:
            # unit-sphere direction via z ~ N(0,1); R2 ~ Beta(K/2, eta)
            # (the unit-interval Jacobian is already in log_jac)
            lp = lp + dists.normal_lpdf(c["z_beta"])
            lp = lp + dists.beta_lpdf(
                c["R2"], 0.5 * cfg.K, h["R2_eta"]
            )

        # intercept prior (continuous.stan:417-425)
        if cfg.has_intercept and cfg.prior_dist_for_intercept > 0:
            g = c["gamma"][0]
            if cfg.prior_dist_for_intercept == 1:
                lp = lp + dists.normal_lpdf(
                    g, h["prior_mean_for_intercept"],
                    h["prior_scale_for_intercept"],
                )
            else:
                lp = lp + dists.student_t_lpdf(
                    g, h["prior_df_for_intercept"],
                    h["prior_mean_for_intercept"],
                    h["prior_scale_for_intercept"],
                )

        # decov_lp (continuous.stan:96-122); centered variant replaces the
        # standard-normal z_b prior with the equivalent MVN(0, T T') prior
        # on b itself (triangular solves against the theta_L blocks)
        if cfg.q > 0:
            if cfg.centered:
                lp = lp + self._centered_b_lpdf(c["b_raw"], tp["theta_L"])
            else:
                lp = lp + dists.normal_lpdf(c["z_b"])
            if cfg.len_z_T > 0:
                lp = lp + dists.normal_lpdf(c["z_T"])
            rho_mark = 0
            reg_mark = 0
            for nc in cfg.p:
                if nc > 1:
                    reg = h["regularization"][reg_mark]
                    reg_mark += 1
                    shape1 = [reg + 0.5 * (nc - 2)]
                    shape2 = [reg + 0.5 * (nc - 2)]
                    nu_run = reg + 0.5 * (nc - 2)
                    for j in range(2, nc):
                        nu_run = nu_run - 0.5
                        shape1.append(0.5 * j)
                        shape2.append(nu_run)
                    rho_seg = c["rho"][rho_mark : rho_mark + nc - 1]
                    rho_mark += nc - 1
                    lp = lp + dists.beta_lpdf(
                        rho_seg, jnp.asarray(shape1, self.dtype),
                        jnp.asarray(shape2, self.dtype),
                    )
            if cfg.cov_prior == 1:
                # lkj: sds ~ half-Student-t(df, 0, scale) per term
                # (rstanarm lkj(); the rho beta ladder above already
                # implements LKJ(regularization) via the onion)
                sd_mark = 0
                _LOG_2 = 0.6931471805599453
                for i, nc in enumerate(cfg.p):
                    seg = c["sds"][sd_mark : sd_mark + nc]
                    sd_mark += nc
                    lp = lp + dists.student_t_lpdf(
                        seg, h["lkj_df"][i], 0.0, h["lkj_scale"][i]
                    ) + nc * _LOG_2
            else:
                if cfg.len_concentration > 0:
                    lp = lp + dists.gamma_lpdf(c["zeta"], h["delta"], 1.0)
                lp = lp + dists.gamma_lpdf(c["tau"], h["shape_decov"], 1.0)

        return lp

    # -- Gram-compressed likelihood (NUTS hot-loop, O(D^2) per leapfrog) --

    def dense_design(self) -> np.ndarray:
        """Host-side dense design A (N, D), f64, columns ordered
        [gamma | beta | b] so that eta - offset = A @ v.  The b columns
        follow make_b's flat layout (term-major, then level-major, then
        coefficient: index off_i + g*p_i + j carries lhs[:, j] on rows of
        level g).  Used only at setup to build the Gram structures."""
        cfg = self.cfg
        N = cfg.N
        cols = []
        if cfg.has_intercept:
            cols.append(np.ones((N, 1)))
        if cfg.K > 0:
            cols.append(np.asarray(self.X, dtype=np.float64))
        for (lhs, gidx), pi, li in zip(self.z_structs, cfg.p, cfg.l):
            lhs = np.asarray(lhs, dtype=np.float64)
            gidx = np.asarray(gidx)
            Z = np.zeros((N, li * pi))
            valid = gidx >= 0  # unseen levels contribute nothing
            rows = np.arange(N)[valid]
            for j in range(pi):
                Z[rows, gidx[valid] * pi + j] = lhs[valid, j]
            cols.append(Z)
        if not cols:
            return np.zeros((N, 0))
        return np.concatenate(cols, axis=1)

    def enable_gram(self) -> bool:
        """Precompute the Gram structures for ``log_prob_gram``: the dense
        design A, the weighted design AW = diag(w) A, and G = A' W A
        (f64-accumulated on host, then cast).  Returns False when the
        model has no linear coefficients (D == 0)."""
        if getattr(self, "_gram_ready", False):
            return True
        A = self.dense_design()
        if A.shape[1] == 0:
            return False
        if self.cfg.has_weights:
            AW = A * np.asarray(self.weights, np.float64)[:, None]
        else:
            AW = A
        G = A.T @ AW
        self.gram_A = jnp.asarray(A, self.dtype)
        # unweighted: AW is A — alias the device buffer, don't duplicate
        self.gram_AW = (self.gram_A if AW is A
                        else jnp.asarray(AW, self.dtype))
        self.gram_G = jnp.asarray(G, self.dtype)
        self._gram_ready = True
        return True

    def _coef_vector(self, c, tp):
        """v = [gamma | beta | b] matching dense_design's column order."""
        parts = []
        if self.cfg.has_intercept:
            parts.append(c["gamma"])
        if self.cfg.K > 0:
            parts.append(tp["beta"])
        if self.cfg.q > 0:
            parts.append(tp["b"])
        return (jnp.concatenate(parts) if parts
                else jnp.zeros(0, self.dtype))

    def gram_anchor(self, u, offset_, y):
        """Per-Gibbs-iteration sufficient statistics of the Gaussian
        likelihood, anchored at the current draw u (one O(N*D) pass):
        v_hat, rr = ||y - offset - A v_hat||_W^2, and g = A' W r_hat.
        Anchoring keeps every f32 magnitude at the residual scale, so the
        within-trajectory lp differences NUTS accepts on do not suffer
        big-number cancellation (unlike the raw y'y expansion)."""
        hi = jax.lax.Precision.HIGHEST
        c, _ = self.layout.constrain(u)
        tp = self.transformed(c)
        vhat = self._coef_vector(c, tp)
        eta = offset_ + jnp.dot(self.gram_A, vhat, precision=hi)
        r = y - eta
        rw = r * self.weights if self.cfg.has_weights else r
        rr = jnp.dot(r, rw, precision=hi)
        g = jnp.dot(r, self.gram_AW, precision=hi)
        # obs-sharded: ONE all-reduce per Gibbs iteration carries the
        # entire likelihood into the trajectory — every leapfrog of the
        # NUTS transition is then O(D^2) with zero communication
        rr, g = self._psum((rr, g))
        return vhat, rr, g

    def log_prob_gram(self, u, anchor):
        """``log_prob`` with the Gaussian likelihood evaluated from the
        anchored sufficient statistics:

            ||y_eff - A v||_W^2 = rr - 2 d'g + d'Gd,   d = v - v_hat

        — O(D^2) per evaluation, independent of N, so the per-leapfrog
        cost of the NUTS transition no longer touches the observation
        axis (the offset, and hence the anchor, is constant within a
        Gibbs iteration).  Exact in real arithmetic; same posterior as
        the direct form (continuous.stan:344-366)."""
        cfg = self.cfg
        hi = jax.lax.Precision.HIGHEST
        vhat, rr, g = anchor
        c, log_jac = self.layout.constrain(u)
        tp = self.transformed(c)
        actual_aux = (jnp.asarray(1.0, self.dtype) if cfg.is_binary
                      else tp["aux"])
        d = self._coef_vector(c, tp) - vhat
        quad = (rr - 2.0 * jnp.dot(d, g, precision=hi)
                + jnp.dot(d, jnp.dot(self.gram_G, d, precision=hi),
                          precision=hi))
        lp = (-0.5 * cfg.N * jnp.log(2.0 * jnp.pi * actual_aux * actual_aux)
              - 0.5 * quad / (actual_aux * actual_aux))
        return lp + self._prior_lp(c, tp) + log_jac

    def _centered_b_lpdf(self, b, theta_L):
        """Sum over terms/levels of MVN(b_level | 0, T_i T_i') with T_i
        unpacked from the theta_L vech blocks."""
        cfg = self.cfg
        _LOG_SQRT_2PI = 0.9189385332046727417803297364056176
        lp = jnp.zeros((), dtype=self.dtype)
        b_mark = 0
        th_mark = 0
        for nc, li in zip(cfg.p, cfg.l):
            if nc == 1:
                theta = theta_L[th_mark]
                seg = b[b_mark : b_mark + li]
                z = seg / theta
                lp = lp + jnp.sum(-0.5 * z * z) \
                    - li * (jnp.log(jnp.abs(theta)) + _LOG_SQRT_2PI)
                b_mark += li
                th_mark += 1
            else:
                rows, cols, vals = [], [], []
                for ci in range(nc):
                    for ri in range(ci, nc):
                        rows.append(ri)
                        cols.append(ci)
                        vals.append(theta_L[th_mark])
                        th_mark += 1
                T = jnp.zeros((nc, nc), dtype=self.dtype)
                T = T.at[jnp.array(rows), jnp.array(cols)].set(
                    jnp.stack(vals)
                )
                seg = b[b_mark : b_mark + nc * li].reshape(li, nc)
                w = jax.scipy.linalg.solve_triangular(
                    T, seg.T, lower=True
                )
                logdet = jnp.sum(jnp.log(jnp.abs(jnp.diag(T))))
                lp = lp + jnp.sum(-0.5 * w * w) \
                    - li * (logdet + nc * _LOG_SQRT_2PI)
                b_mark += nc * li
        return lp

    # -- exact conjugate refresh of the linear block ----------------------

    def enable_linear_gibbs(self) -> bool:
        """Eligibility + setup for ``linear_gibbs_refresh``: with all-normal
        (or flat) priors on gamma/beta and the centered MVN(0, T T') prior
        on b, the full conditional of v = [gamma | beta | b] given
        (offset, aux, theta_L) is exactly multivariate normal with
        precision G / aux^2 + P_prior — a closed-form Gibbs block the
        reference has no counterpart for (its Stan kernel is the only
        sampler of the parametric coordinates).  Requires the Gram
        structures (``enable_gram``)."""
        if getattr(self, "_lg_ready", False):
            return True
        cfg = self.cfg
        if cfg.K > 0 and cfg.prior_dist not in (0, 1):
            return False
        if (cfg.has_intercept
                and cfg.prior_dist_for_intercept not in (0, 1)):
            return False
        if not self.enable_gram():
            return False
        D = self.gram_G.shape[0]
        # fixed prior mean + precision for the [gamma | beta] head; the b
        # block precisions depend on theta_L and are filled per call
        mu = np.zeros(D)
        prec = np.zeros(D)
        pos = 0
        h = self.hyper
        if cfg.has_intercept:
            if cfg.prior_dist_for_intercept == 1:
                s = float(np.asarray(h["prior_scale_for_intercept"]))
                if s <= 0:
                    return False
                mu[0] = float(np.asarray(h["prior_mean_for_intercept"]))
                prec[0] = 1.0 / (s * s)
            pos = 1
        if cfg.K > 0 and cfg.prior_dist == 1:
            s = np.asarray(h["prior_scale"], np.float64).reshape(-1)
            s = np.broadcast_to(s, (cfg.K,))
            if np.any(s <= 0):
                return False
            m = np.asarray(h["prior_mean"], np.float64).reshape(-1)
            mu[pos : pos + cfg.K] = np.broadcast_to(m, (cfg.K,))
            prec[pos : pos + cfg.K] = 1.0 / (s * s)
        self._lg_mu = jnp.asarray(mu, self.dtype)
        self._lg_prec_head = jnp.asarray(prec, self.dtype)
        self._lg_b_off = pos + cfg.K
        self._lg_ready = True
        return True

    def linear_gibbs_refresh(self, u, offset_, y, rng):
        """One exact draw from the full conditional of v = [gamma|beta|b]
        given (aux, theta_L, offset_, y), written back into the
        unconstrained vector.  Anchored at the current draw like
        ``log_prob_gram`` so every f32 magnitude stays at the
        residual/step scale:

            Q  = G / aux^2 + P(theta_L)
            d* = Q^{-1} (g / aux^2 - P (v_hat - mu))
            v  = v_hat + d* + L^{-T} z,   L = chol(Q),  z ~ N(0, I_D)

        A valid Metropolis-within-Gibbs component: the conditional is the
        exact posterior conditional, so the invariant distribution is
        unchanged (composition with the NUTS kernel)."""
        cfg = self.cfg
        hi = jax.lax.Precision.HIGHEST
        c, _ = self.layout.constrain(u)
        tp = self.transformed(c)
        aux = (jnp.asarray(1.0, self.dtype) if cfg.is_binary
               else tp["aux"])
        vhat = self._coef_vector(c, tp)

        # anchored likelihood statistics (one O(N*D) pass)
        eta = offset_ + jnp.dot(self.gram_A, vhat, precision=hi)
        r = y - eta
        rw = r * self.weights if cfg.has_weights else r
        g = self._psum(jnp.dot(rw, self.gram_A, precision=hi))

        # prior precision P: fixed head + per-term b blocks from theta_L
        # (dispersion already folded into theta_L under decov).  In the
        # non-centered parameterization the b prior is the SAME
        # MVN(0, T T') after the z_b -> b transform, so P is identical —
        # only the write-back differs (z_b = T^{-1} b per level).
        D = self.gram_G.shape[0]
        P = jnp.diag(self._lg_prec_head)
        th = tp["theta_L"]
        th_mark = 0
        col = self._lg_b_off
        term_tinv = []   # per-term T^{-1} (or scalar 1/theta) for write-back
        for nc, li in zip(cfg.p, cfg.l):
            if nc == 1:
                prec_i = 1.0 / (th[th_mark] * th[th_mark])
                term_tinv.append(1.0 / th[th_mark])
                idx = col + np.arange(li)
                P = P.at[idx, idx].add(prec_i)
                th_mark += 1
                col += li
            else:
                rows, cols_, vals = [], [], []
                for ci in range(nc):
                    for ri in range(ci, nc):
                        rows.append(ri)
                        cols_.append(ci)
                        vals.append(th[th_mark])
                        th_mark += 1
                T = jnp.zeros((nc, nc), dtype=self.dtype)
                T = T.at[np.array(rows), np.array(cols_)].set(
                    jnp.stack(vals)
                )
                Tinv = jax.scipy.linalg.solve_triangular(
                    T, jnp.eye(nc, dtype=self.dtype), lower=True
                )
                term_tinv.append(Tinv)
                Pi = jnp.dot(Tinv.T, Tinv, precision=hi)
                Pb = jnp.kron(jnp.eye(li, dtype=self.dtype), Pi)
                P = P.at[col : col + li * nc,
                         col : col + li * nc].add(Pb)
                col += li * nc

        inv_aux2 = 1.0 / (aux * aux)
        Q = self.gram_G * inv_aux2 + P
        rhs = g * inv_aux2 - jnp.dot(P, vhat - self._lg_mu, precision=hi)
        L = jnp.linalg.cholesky(Q)
        d_mean = jax.scipy.linalg.cho_solve((L, True), rhs)
        z = jax.random.normal(rng, (D,), dtype=self.dtype)
        d = d_mean + jax.scipy.linalg.solve_triangular(
            L.T, z, lower=False
        )
        v_new = vhat + d

        # write back into the unconstrained layout
        pos = 0
        if cfg.has_intercept:
            off = self.layout.slices["gamma"][0]
            u = u.at[off].set(v_new[0])
            pos = 1
        if cfg.K > 0:
            beta_new = jax.lax.dynamic_slice_in_dim(v_new, pos, cfg.K)
            if cfg.prior_dist == 1:
                zb = (beta_new - self.hyper["prior_mean"]) \
                    / self.hyper["prior_scale"]
            else:
                zb = beta_new
            off = self.layout.slices["z_beta"][0]
            u = jax.lax.dynamic_update_slice_in_dim(u, zb, off, 0)
            pos += cfg.K
        if cfg.q > 0:
            b_new = jax.lax.dynamic_slice_in_dim(v_new, pos, cfg.q)
            if cfg.centered:
                off = self.layout.slices["b_raw"][0]
                u = jax.lax.dynamic_update_slice_in_dim(u, b_new, off, 0)
            else:
                # non-centered: z_b = T^{-1} b per level (b is level-major
                # with nc coefs per level; see make_b)
                z_parts = []
                b_mark = 0
                for (nc, li), tinv in zip(zip(cfg.p, cfg.l), term_tinv):
                    if nc == 1:
                        z_parts.append(
                            b_new[b_mark : b_mark + li] * tinv
                        )
                        b_mark += li
                    else:
                        b_mat = b_new[b_mark : b_mark + nc * li
                                      ].reshape(li, nc)
                        z_parts.append(
                            jnp.dot(b_mat, tinv.T, precision=hi)
                            .reshape(-1)
                        )
                        b_mark += nc * li
                z_new = jnp.concatenate(z_parts)
                off = self.layout.slices["z_b"][0]
                u = jax.lax.dynamic_update_slice_in_dim(u, z_new, off, 0)
        return u

    def initial_inv_mass(self, scale_y: float, n_obs: int) -> np.ndarray:
        """Analytic initial diagonal inverse-metric (posterior-variance
        heuristics on the unconstrained scale).  The reference starts NUTS
        from a unit metric and burns ~100 warmup iterations at treedepth
        ~10 before the first window update; seeding approximate scales cuts
        that cost without changing the adapted stationary behavior.

        Scales are EARLY-CHAIN upper bounds (residual sd ~ sd(y) while the
        BART fit is still poor): an over-wide metric only costs a few
        leapfrogs, while an under-wide one can freeze a coordinate through
        the first adaptation window and bias a short run (observed with a
        sigma_init-based scale)."""
        cfg = self.cfg
        # jnp throughout so scale_y may be a traced value (the SBC
        # harness jits whole fits with y as an argument)
        out = jnp.ones(self.num_upars)
        prior_scale = np.asarray(self.hyper["prior_scale"])
        safety = 4.0
        for name, size, _ in self.layout.blocks:
            off = self.layout.slices[name][0]
            if name == "z_beta" and cfg.prior_dist in (1, 2) and cfg.K > 0:
                # early beta_j sd ~ sd(y) / (sd(x_j) sqrt(n)); X is centered
                sd_x = np.maximum(np.std(np.asarray(self.X), axis=0), 1e-8)
                beta_sd = safety * scale_y / (sd_x * np.sqrt(n_obs))
                out = out.at[off : off + size].set(
                    (beta_sd / prior_scale) ** 2)
            elif name == "aux_unscaled" and not cfg.is_binary:
                # log-sd posterior variance ~ 1/(2n), scale-free
                out = out.at[off].set(safety**2 / (2.0 * n_obs))
            elif name == "b_raw":
                # centered b: marginal prior sd ~ tau * scale * sigma;
                # over-wide is safe, adaptation shrinks it
                out = out.at[off : off + size].set(
                    jnp.maximum(scale_y, 1.0) ** 2)
        return out

    # -- output packaging -----------------------------------------------------

    def constrained_draw(self, u):
        """Flat constrained draw (upars then tpars: aux, beta, b, theta_L) —
        the writer row layout consumed by extract (SURVEY.md section 2.3)."""
        c, _ = self.layout.constrain(u)
        tp = self.transformed(c)
        parts = [c[name] for name, _, _ in self.layout.blocks]
        if not self.cfg.is_binary:
            parts.append(tp["aux"][None])
        if self.cfg.K > 0:
            parts.append(tp["beta"])
        if self.cfg.q > 0:
            parts.append(tp["b"])
            parts.append(tp["theta_L"])
        return jnp.concatenate(parts) if parts else jnp.zeros(0)

    def constrained_names(self) -> list[str]:
        names = []

        def push(base, n):
            names.extend(f"{base}.{i + 1}" for i in range(n))

        for name, size, _ in self.layout.blocks:
            push(name, size)
        if not self.cfg.is_binary:
            push("aux", 1)
        if self.cfg.K > 0:
            push("beta", self.cfg.K)
        if self.cfg.q > 0:
            push("b", self.cfg.q)
            push("theta_L", self.cfg.len_theta_L)
        return names

    def prior_draw_unconstrained(self, rng):
        """One draw of the UNCONSTRAINED parameter vector from the model's
        prior — the exact generative complement of ``_prior_lp``, block by
        block (simulation-based calibration, benchmarks/sbc.py, and
        prior-predictive tooling; the reference has no prior sampler —
        rstanarm's prior_PD runs the full MCMC with the likelihood off).

        Supported: normal / student-t / product-normal / R2 coefficient
        priors (z_beta is standard normal under all of them — the CFt/R2
        shaping lives in compute_beta), normal / student-t intercept,
        half-normal / half-t / exponential aux, NON-centered ranef with
        decov or lkj covariance priors.  Raises for flat priors (not
        generative), hs / laplace coefficients, and the centered
        parameterization."""
        cfg, h = self.cfg, self.hyper
        dtype = self.dtype
        if cfg.z_beta_dim > 0 and cfg.prior_dist not in (1, 2, 7, 8):
            raise NotImplementedError(
                f"prior_draw: coefficient prior_dist {cfg.prior_dist} "
                "(flat/hs/laplace) is not supported"
            )
        if cfg.has_intercept and cfg.prior_dist_for_intercept == 0:
            raise NotImplementedError("prior_draw: flat intercept prior")
        if not cfg.is_binary and cfg.prior_dist_for_aux == 0:
            raise NotImplementedError("prior_draw: flat aux prior")
        if cfg.centered:
            raise NotImplementedError(
                "prior_draw: centered ranef (draw non-centered and "
                "transform)"
            )

        def logit(p):
            return jnp.log(p) - jnp.log1p(-p)

        parts = []
        for bi, (name, size, kind) in enumerate(self.layout.blocks):
            r = jax.random.fold_in(rng, bi)
            if name == "gamma":
                z = (jax.random.normal(r, (size,), dtype)
                     if cfg.prior_dist_for_intercept == 1
                     else jax.random.t(
                         r, h["prior_df_for_intercept"], (size,), dtype))
                v = (h["prior_mean_for_intercept"]
                     + h["prior_scale_for_intercept"] * z)
            elif name in ("z_beta", "z_b", "z_T"):
                v = jax.random.normal(r, (size,), dtype)
            elif name == "R2":
                v = logit(jax.random.beta(
                    r, 0.5 * cfg.K, h["R2_eta"], (size,), dtype))
            elif name == "rho":
                # the onion beta ladder — shapes exactly as _prior_lp
                s1, s2 = [], []
                reg_mark = 0
                for nc in cfg.p:
                    if nc > 1:
                        reg = h["regularization"][reg_mark]
                        reg_mark += 1
                        s1.append(reg + 0.5 * (nc - 2))
                        s2.append(reg + 0.5 * (nc - 2))
                        nu_run = reg + 0.5 * (nc - 2)
                        for j in range(2, nc):
                            nu_run = nu_run - 0.5
                            s1.append(0.5 * j)
                            s2.append(nu_run)
                v = logit(jax.random.beta(
                    r, jnp.asarray(s1, dtype), jnp.asarray(s2, dtype),
                    (size,), dtype))
            elif name == "zeta":
                v = jnp.log(jax.random.gamma(
                    r, jnp.asarray(h["delta"], dtype), (size,), dtype))
            elif name == "tau":
                v = jnp.log(jax.random.gamma(
                    r, jnp.asarray(h["shape_decov"], dtype), (size,),
                    dtype))
            elif name == "sds":
                # half-student-t(df, 0, scale) per term coefficient;
                # keep hyper reads traced (indexing a closed-over jnp
                # constant under jit yields a tracer — float() would
                # raise ConcretizationTypeError)
                term = np.concatenate(
                    [[i] * nc for i, nc in enumerate(cfg.p)]
                ).astype(np.int32)
                dfs = jnp.asarray(h["lkj_df"], dtype)[term]
                scales = jnp.asarray(h["lkj_scale"], dtype)[term]
                v = jnp.log(scales * jnp.abs(
                    jax.random.t(r, dfs, (size,), dtype)))
            elif name == "aux_unscaled":
                if cfg.prior_dist_for_aux == 1:
                    v = jnp.abs(jax.random.normal(r, (size,), dtype))
                elif cfg.prior_dist_for_aux == 2:
                    v = jnp.abs(jax.random.t(
                        r, h["prior_df_for_aux"], (size,), dtype))
                else:
                    v = jax.random.exponential(r, (size,), dtype)
                v = jnp.log(v)
            else:
                raise NotImplementedError(f"prior_draw: block {name}")
            parts.append(v)
        return (jnp.concatenate(parts) if parts
                else jnp.zeros(0, dtype))

    @property
    def num_upars(self) -> int:
        return self.layout.num_upars
