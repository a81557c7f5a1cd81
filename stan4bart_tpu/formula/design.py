"""Design-matrix construction for stan4bart models.

Implements the semantics of the reference's data assembly
(/root/reference/R/lme4_functions.R:23-213 ``glFormula``, 447-542 ``mkReTrms``;
R/rstanarm_functions.R:420-447 ``center_x``; R/test_data.R:1-160
``getTestDataFrames``) on plain numpy/dict data:

* fixed part: model matrix with treatment-contrast factors, the intercept
  column dropped (BART absorbs the level; lme4_functions.R:181-182), columns
  centered with the means recorded for later un-centering
  (rstanarm_functions.R:428-443; generics.R:540);
* bart part: numeric matrix with factors expanded to full one-hot (dbarts
  behavior, test-08-glFormula.R:84-95);
* random part: per-term (lhs covariate matrix, integer group index) pairs in
  lme4 order — terms outermost, levels next, coefficients innermost — matching
  the reference's flat ``b`` layout (continuous.stan ``make_b``);
* NA actions ``"omit"`` (drop union of per-component NA rows) and
  ``"exclude"`` (fit on complete rows, re-insert NaN on output), mirroring
  test-03-na_action.R.

The same column encodings (factor levels, contrasts, centering means) are
re-applied to new data for test frames / ``predict``.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

import numpy as np

from stan4bart_tpu.formula.parser import ParsedFormula, RandomTerm, parse_formula

_EVAL_NS = {
    "log": np.log, "log2": np.log2, "log10": np.log10, "log1p": np.log1p,
    "exp": np.exp, "sqrt": np.sqrt, "abs": np.abs, "sin": np.sin,
    "cos": np.cos, "tan": np.tan, "I": lambda x: x, "np": np,
}


def _as_columns(data) -> dict[str, np.ndarray]:
    """Accept a pandas DataFrame or a dict of 1-d arrays."""
    if hasattr(data, "columns") and hasattr(data, "__getitem__"):
        try:
            return {str(c): np.asarray(data[c]) for c in data.columns}
        except Exception:
            pass
    return {str(k): np.asarray(v) for k, v in dict(data).items()}


def _is_factor(col: np.ndarray) -> bool:
    return col.dtype.kind in ("U", "S", "O", "b")


@dataclass
class _ColumnCodec:
    """How one raw variable was encoded (for re-encoding test data)."""

    expr: str
    is_factor: bool
    levels: list | None = None  # factor levels in sorted order


@dataclass
class ReTermData:
    """One random-effect term ``(lhs | group)`` ready for sampling."""

    group_name: str
    coef_names: list[str]      # cnms, e.g. ["(Intercept)", "X4"]
    levels: list               # group level labels
    lhs: np.ndarray            # (N, p) float
    group_idx: np.ndarray      # (N,) int32; -1 marks an unseen (new) level
    # per-row id of the distinct NEW level for unseen rows (-1 elsewhere):
    # the reference's levelfun draws ONE b per new level shared across that
    # level's rows within a draw (generics.R:553-612), not one per row
    new_level_ids: np.ndarray | None = None
    p: int = 0
    l: int = 0

    def __post_init__(self):
        self.p = self.lhs.shape[1]
        self.l = len(self.levels)


@dataclass
class ModelFrame:
    """All design data for one model, plus the codecs to rebuild on new data."""

    parsed: ParsedFormula
    y: np.ndarray
    X: np.ndarray              # (N, K) centered, no intercept
    X_means: np.ndarray        # (K,)
    X_names: list[str]
    bart_X: np.ndarray         # (N, P_bart)
    bart_names: list[str]
    re_terms: list[ReTermData]
    weights: np.ndarray | None
    offset: np.ndarray | None
    na_action: str
    complete_rows: np.ndarray  # bool (N_original,)
    n_original: int
    # codecs for test-frame construction
    _fixed_codecs: dict[str, _ColumnCodec] = field(default_factory=dict)
    _bart_codecs: dict[str, _ColumnCodec] = field(default_factory=dict)
    _fixed_col_spec: list = field(default_factory=list)
    _bart_col_spec: list = field(default_factory=list)
    _dropped_fixed: list[str] = field(default_factory=list)

    @property
    def N(self) -> int:
        return len(self.y)

    @property
    def K(self) -> int:
        return self.X.shape[1]

    @property
    def p(self) -> list[int]:
        return [t.p for t in self.re_terms]

    @property
    def l(self) -> list[int]:
        return [t.l for t in self.re_terms]

    @property
    def q(self) -> int:
        return sum(t.p * t.l for t in self.re_terms)

    @property
    def len_theta_L(self) -> int:
        return sum(t.p + math.comb(t.p, 2) for t in self.re_terms)

    def b_names(self) -> list[str]:
        """Flat names of b in lme4 order (rstanarm_functions.R:251-267)."""
        names = []
        for t in self.re_terms:
            for lev in t.levels:
                for c in t.coef_names:
                    names.append(f"b[{c} {t.group_name}:{lev}]")
        return names

    def build_test_frame(self, newdata) -> "TestFrame":
        return _build_test_frame(self, newdata)


@dataclass
class TestFrame:
    X: np.ndarray              # centered with the *training* means
    bart_X: np.ndarray
    re_terms: list[ReTermData]  # group_idx == -1 for new levels
    offset: np.ndarray | None
    complete_rows: np.ndarray
    n_original: int


def _eval_base_expr(expr: str, cols: dict[str, np.ndarray]) -> np.ndarray:
    expr = expr.strip()
    if expr in cols:
        return cols[expr]
    ns = dict(_EVAL_NS)
    ns.update(cols)
    try:
        val = eval(expr, {"__builtins__": {}}, ns)  # noqa: S307 - formula DSL
    except Exception as e:
        raise ValueError(f"cannot evaluate formula term {expr!r}: {e}") from e
    return np.asarray(val)


def _factor_levels(col: np.ndarray) -> list:
    return sorted(set(np.asarray(col).tolist()))


def _level_index(col: np.ndarray, levels: list) -> np.ndarray:
    """Vectorized level lookup; -1 for unseen levels."""
    col = np.asarray(col).astype(str)
    lev = np.asarray([str(v) for v in levels])
    order = np.argsort(lev)
    pos = np.searchsorted(lev[order], col)
    pos = np.clip(pos, 0, len(lev) - 1)
    idx = order[pos]
    idx = np.where(lev[idx] == col, idx, -1)
    return idx.astype(np.int64)


def _encode_factor(col: np.ndarray, levels: list) -> np.ndarray:
    """(N, n_levels) one-hot; unseen levels encode to all-zero rows."""
    idx = _level_index(col, levels)
    out = np.zeros((len(col), len(levels)))
    ok = idx >= 0
    out[np.arange(len(col))[ok], idx[ok]] = 1.0
    return out


class _TermEncoder:
    """Encodes a list of term strings into a numeric matrix with factor
    handling, recording the column spec for test-frame rebuilds."""

    def __init__(self, contrasts: bool):
        # contrasts=True: treatment contrasts (drop first level) as in the
        # fixed part of an (implicit-)intercept model; False: full one-hot
        # as dbarts does for the bart part.
        self.contrasts = contrasts
        self.codecs: dict[str, _ColumnCodec] = {}
        # each entry: (term, [(expr, kind, levels_or_None), ...]) where the
        # product over the factor list gives the columns for that term
        self.col_spec: list = []

    def _base(self, expr: str, cols, fit: bool):
        val = _eval_base_expr(expr, cols)
        if _is_factor(val):
            if fit:
                self.codecs[expr] = _ColumnCodec(
                    expr, True, _factor_levels(val)
                )
            codec = self.codecs[expr]
            mat = _encode_factor(val, codec.levels)
            names = [f"{expr}{lev}" for lev in codec.levels]
            if self.contrasts and mat.shape[1] > 1:
                mat, names = mat[:, 1:], names[1:]
            return mat, names
        if fit:
            self.codecs[expr] = _ColumnCodec(expr, False)
        return np.asarray(val, dtype=np.float64).reshape(len(val), -1), [expr]

    def encode(self, terms: list[str], cols, fit: bool = True):
        mats, names = [], []
        for term in terms:
            parts = [p.strip() for p in _split_interaction(term)]
            m, n = self._base(parts[0], cols, fit)
            for part in parts[1:]:
                m2, n2 = self._base(part, cols, fit)
                m = np.einsum("ni,nj->nij", m, m2).reshape(len(m), -1)
                n = [f"{a}:{b}" for a in n for b in n2]
            mats.append(m)
            names.extend(n)
        if not mats:
            return np.zeros((len(next(iter(cols.values()))), 0)), []
        return np.concatenate(mats, axis=1), names


def _split_interaction(term: str) -> list[str]:
    depth, cur, out = 0, [], []
    for ch in term:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if depth == 0 and ch == ":":
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def _group_index(group_expr: str, cols, levels: list | None):
    """Integer level index for a (possibly ':' interacted) grouping factor."""
    parts = [p.strip() for p in group_expr.split(":")]
    vals = [np.asarray(cols[p]).astype(str) for p in parts]
    combined = vals[0]
    for v in vals[1:]:
        combined = np.char.add(np.char.add(combined, ":"), v)
    if levels is None:
        levels = sorted(set(combined.tolist()))
    idx = _level_index(combined, levels).astype(np.int32)
    return idx, levels, combined


def _drop_rank_deficient(X: np.ndarray, names: list[str], tol: float = 1e-7):
    """Pivoted-QR column dropping for rank-deficient fixed designs
    (chkRank.drop.cols 'warn+drop.cols', lme4_functions.R:909-952).
    Returns (X_kept, names_kept, dropped_names); dropped names are recorded
    so test frames re-drop the same columns."""
    p = X.shape[1]
    scale = np.linalg.norm(X, axis=0)
    scale[scale == 0] = 1.0
    Xn = X / scale  # scale-invariant, like R's relative qr tolerance
    keep, dropped = [], []
    Q = np.zeros((X.shape[0], 0))
    # greedy in-order selection keeps the LEFTMOST of each collinear set
    # (matching R's LINPACK qr preference for original column order)
    for j in range(p):
        v = Xn[:, j].copy()
        if Q.shape[1]:
            v -= Q @ (Q.T @ v)
            v -= Q @ (Q.T @ v)  # second pass for numerical orthogonality
        nv = np.linalg.norm(v)
        if nv > tol:
            keep.append(j)
            Q = np.concatenate([Q, (v / nv)[:, None]], axis=1)
        else:
            dropped.append(names[j])
    if not dropped:
        return X, names, []
    import warnings

    warnings.warn(
        f"fixed-effect model matrix is rank deficient so dropping "
        f"{len(dropped)} column(s) / coefficient(s): {dropped}"
    )
    return X[:, keep], [names[j] for j in keep], dropped


def _check_x_scale(X: np.ndarray, names: list[str], tol: float = 1e3):
    """Warn when continuous predictor scales differ wildly
    (checkScaleX, lme4_functions.R:953-980)."""
    cont = np.array([not np.all(np.isin(X[:, j], (0.0, 1.0)))
                     for j in range(X.shape[1])])
    if cont.sum() == 0:
        return
    col_sd = X[:, cont].std(axis=0, ddof=1)
    col_sd = np.maximum(col_sd, 1e-300)
    logsd = np.abs(np.log(col_sd))
    logcomp = np.abs(np.log(col_sd[:, None] / col_sd[None, :]))
    if np.any(logsd > np.log(tol)) or np.any(logcomp > np.log(tol)):
        import warnings

        warnings.warn(
            "some predictor variables are on very different scales: "
            "consider rescaling"
        )


def _na_rows(arrs: list[np.ndarray]) -> np.ndarray:
    """Boolean mask of rows with any NA across the given arrays."""
    n = len(arrs[0]) if arrs else 0
    bad = np.zeros(n, dtype=bool)
    for a in arrs:
        a = np.asarray(a)
        if a.dtype.kind == "f":
            bad |= np.isnan(a.reshape(len(a), -1)).any(axis=1)
        elif a.dtype.kind == "O":
            bad |= np.array([v is None or (isinstance(v, float) and np.isnan(v))
                             for v in a.tolist()])
    return bad


def build_model_frame(
    formula: str | ParsedFormula,
    data,
    weights=None,
    offset=None,
    na_action: str = "omit",
) -> ModelFrame:
    cols = _as_columns(data)
    parsed = (
        formula
        if isinstance(formula, ParsedFormula)
        else parse_formula(formula, columns=list(cols.keys()))
    )
    if not parsed.has_bart:
        raise ValueError(
            "formula requires a bart() component (reference: stan4bart.R:44-47)"
        )

    y = _eval_base_expr(parsed.response, cols).astype(np.float64)
    n_original = len(y)

    fixed_enc = _TermEncoder(contrasts=True)
    X_full, X_names = fixed_enc.encode(parsed.fixed_terms, cols)
    bart_enc = _TermEncoder(contrasts=False)
    bart_X, bart_names = bart_enc.encode(parsed.bart_terms, cols)

    re_raw = []
    for rt in parsed.random_terms:
        lhs_names = ["(Intercept)"] if rt.lhs_intercept else []
        lhs_mats = (
            [np.ones((n_original, 1))] if rt.lhs_intercept else []
        )
        if rt.lhs_terms:
            enc = _TermEncoder(contrasts=True)
            m, nm = enc.encode(rt.lhs_terms, cols)
            lhs_mats.append(m)
            lhs_names.extend(nm)
        lhs = (
            np.concatenate(lhs_mats, axis=1)
            if lhs_mats
            else np.ones((n_original, 1))
        )
        gidx, glevels, _ = _group_index(rt.group, cols, None)
        # dimension sanity checks (lme4_functions.R:768-864 checkNlevels)
        if len(glevels) < 2:
            raise ValueError(
                f"grouping factor {rt.group!r} must have > 1 sampled level"
            )
        if len(glevels) >= n_original:
            raise ValueError(
                f"number of levels of grouping factor {rt.group!r} "
                f"({len(glevels)}) must be < number of observations "
                f"({n_original})"
            )
        re_raw.append((rt, lhs, lhs_names, gidx, glevels))

    off = None
    if parsed.offset_terms or offset is not None:
        off = np.zeros(n_original)
        if offset is not None:
            off = off + np.asarray(offset, dtype=np.float64)
        for oterm in parsed.offset_terms:
            off = off + _eval_base_expr(oterm, cols).astype(np.float64)

    w = np.asarray(weights, dtype=np.float64) if weights is not None else None

    # NA handling: union of per-component NA rows (test-03-na_action.R:23-43)
    na_parts = [y, X_full, bart_X] + [lhs for _, lhs, _, gidx, _ in re_raw]
    na_parts += [np.where(gidx < 0, np.nan, 0.0)
                 for _, _, _, gidx, _ in re_raw]
    if off is not None:
        na_parts.append(off)
    if w is not None:
        na_parts.append(w)
    bad = _na_rows(na_parts)
    keep = ~bad
    if na_action not in ("omit", "exclude"):
        raise ValueError(f"unknown na_action {na_action!r}")
    if bad.any():
        y, X_full, bart_X = y[keep], X_full[keep], bart_X[keep]
        re_raw = [
            (rt, lhs[keep], nm, gidx[keep], glev)
            for rt, lhs, nm, gidx, glev in re_raw
        ]
        if off is not None:
            off = off[keep]
        if w is not None:
            w = w[keep]

    # duplicate group-specific terms check (rstanarm_functions.R:591-606)
    seen_cnms: dict[str, set] = {}
    for rt, _, nm, _, _ in re_raw:
        prev = seen_cnms.setdefault(rt.group, set())
        overlap = prev & set(nm)
        if overlap:
            raise ValueError(
                "stan4bart does not permit formulas with duplicate "
                f"group-specific terms: {rt.group!r} is used as a grouping "
                f"factor multiple times and {sorted(overlap)} is included "
                "multiple times. Consider using || or -1 in your formulas."
            )
        prev.update(nm)

    # drop degenerate fixed columns (<2 unique values;
    # rstanarm_functions.R:437-443), then rank-deficient columns
    # (chkRank.drop.cols, lme4_functions.R:909-952), then center
    dropped = []
    if X_full.shape[1] > 0:
        nuniq = np.array([len(np.unique(X_full[:, j]))
                          for j in range(X_full.shape[1])])
        keep_cols = (nuniq >= 2) | np.all(X_full == 1.0, axis=0)
        dropped = [n for n, k in zip(X_names, keep_cols) if not k]
        X_full = X_full[:, keep_cols]
        X_names = [n for n, k in zip(X_names, keep_cols) if k]
    if X_full.shape[1] > 1:
        X_full, X_names, rank_dropped = _drop_rank_deficient(X_full, X_names)
        dropped += rank_dropped
    if X_full.shape[1] >= 1:
        _check_x_scale(X_full, X_names)
    X_means = X_full.mean(axis=0) if X_full.shape[1] else np.zeros(0)
    X = X_full - X_means

    re_terms = [
        ReTermData(group_name=rt.group, coef_names=nm, levels=glev,
                   lhs=lhs, group_idx=gidx)
        for rt, lhs, nm, gidx, glev in re_raw
    ]

    return ModelFrame(
        parsed=parsed, y=y, X=X, X_means=X_means, X_names=X_names,
        bart_X=bart_X, bart_names=bart_names, re_terms=re_terms,
        weights=w, offset=off, na_action=na_action,
        complete_rows=keep, n_original=n_original,
        _fixed_codecs=fixed_enc.codecs, _bart_codecs=bart_enc.codecs,
        _fixed_col_spec=[], _bart_col_spec=[], _dropped_fixed=dropped,
    )


_IDENT_RE = re.compile(r"[A-Za-z_.][A-Za-z0-9_.]*")


def _required_vars(parsed: ParsedFormula) -> set:
    """Column names the formula's non-response side needs — identifiers
    appearing in fixed/bart/offset/random terms, minus the functions of
    the formula eval namespace."""
    exprs = (list(parsed.fixed_terms) + list(parsed.bart_terms)
             + list(parsed.offset_terms))
    for rt in parsed.random_terms:
        exprs += list(rt.lhs_terms) + [rt.group]
    names: set = set()
    for e in exprs:
        names.update(_IDENT_RE.findall(e))
    names = {n for n in names if not n.startswith("np.")}
    return names - set(_EVAL_NS) - {"True", "False", "offset"}


def _build_test_frame(mf: ModelFrame, newdata) -> TestFrame:
    """Re-encode new data with the training codecs (test_data.R:1-160).

    Missing columns raise a single explicit error up front (the
    reference's validated-newdata semantics, generics.R:514-523) instead
    of a raw KeyError from deep inside a term encoder; extra columns are
    ignored (encoding is name-based, so order never matters)."""
    cols = _as_columns(newdata)
    missing = sorted(v for v in _required_vars(mf.parsed)
                     if v not in cols)
    if missing:
        raise ValueError(
            "newdata is missing required column(s) "
            f"{', '.join(repr(m) for m in missing)} used by the model "
            f"formula {mf.parsed.raw!r}; extra columns are ignored and "
            "column order does not matter"
        )
    n_new = len(next(iter(cols.values())))

    fixed_enc = _TermEncoder(contrasts=True)
    fixed_enc.codecs = mf._fixed_codecs
    X_full, X_names = fixed_enc.encode(mf.parsed.fixed_terms, cols, fit=False)
    # re-drop the training-dropped columns, re-center with training means
    keep = [n not in mf._dropped_fixed for n in X_names]
    X_full = X_full[:, np.asarray(keep, dtype=bool)]
    X = X_full - mf.X_means

    bart_enc = _TermEncoder(contrasts=False)
    bart_enc.codecs = mf._bart_codecs
    bart_X, _ = bart_enc.encode(mf.parsed.bart_terms, cols, fit=False)

    re_terms = []
    for rt_parsed, rt_data in zip(mf.parsed.random_terms, mf.re_terms):
        lhs_mats = (
            [np.ones((n_new, 1))] if rt_parsed.lhs_intercept else []
        )
        if rt_parsed.lhs_terms:
            enc = _TermEncoder(contrasts=True)
            m, _ = enc.encode(rt_parsed.lhs_terms, cols)
            lhs_mats.append(m)
        lhs = (
            np.concatenate(lhs_mats, axis=1)
            if lhs_mats
            else np.ones((n_new, 1))
        )
        gidx, _, combined = _group_index(rt_parsed.group, cols,
                                         rt_data.levels)
        new_ids = np.full(n_new, -1, dtype=np.int64)
        unseen = gidx < 0
        if unseen.any():
            _, inv = np.unique(combined[unseen], return_inverse=True)
            new_ids[unseen] = inv
        re_terms.append(
            ReTermData(group_name=rt_data.group_name,
                       coef_names=rt_data.coef_names,
                       levels=rt_data.levels, lhs=lhs, group_idx=gidx,
                       new_level_ids=new_ids)
        )

    off = None
    if mf.parsed.offset_terms:
        off = np.zeros(n_new)
        for oterm in mf.parsed.offset_terms:
            off = off + _eval_base_expr(oterm, cols).astype(np.float64)

    na_parts = [X_full, bart_X] + [t.lhs for t in re_terms]
    bad = _na_rows(na_parts)
    keep_rows = ~bad
    if bad.any():
        X, bart_X = X[keep_rows], bart_X[keep_rows]
        re_terms = [
            ReTermData(group_name=t.group_name, coef_names=t.coef_names,
                       levels=t.levels, lhs=t.lhs[keep_rows],
                       group_idx=t.group_idx[keep_rows],
                       new_level_ids=t.new_level_ids[keep_rows])
            for t in re_terms
        ]
        if off is not None:
            off = off[keep_rows]

    return TestFrame(X=X, bart_X=bart_X, re_terms=re_terms, offset=off,
                     complete_rows=keep_rows, n_original=n_new)
