"""Formula-engine tests, modeled on the reference's test-08-glFormula.R:
partition into bart/fixed/random varnames, '.'-expansion, interactions,
offset removal, nested factors, factor one-hot in the bart matrix."""

import numpy as np
import pytest

from stan4bart_tpu.formula import build_model_frame, parse_formula
from stan4bart_tpu.utils.friedman import friedman_dataframe, generate_friedman_data


@pytest.fixture(scope="module")
def df():
    return friedman_dataframe(
        generate_friedman_data(100, ranef=True, causal=True)
    )


def test_parse_partition(df):
    p = parse_formula(
        "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 + X4 | g.1) + (1 | g.2)",
        columns=list(df.keys()),
    )
    assert p.response == "y"
    assert set(p.bart_terms) == {f"X{i}" for i in range(1, 11) if i != 4}
    assert p.fixed_terms == ["X4", "z"]
    assert len(p.random_terms) == 2
    assert p.random_terms[0].group == "g.1"
    assert p.random_terms[0].lhs_terms == ["X4"]
    assert p.random_terms[0].lhs_intercept
    assert p.random_terms[1].group == "g.2"
    assert p.random_terms[1].lhs_terms == []


def test_parse_interactions_and_star():
    p = parse_formula("y ~ bart(x1) + a*b + c:d")
    assert p.fixed_terms == ["a", "b", "a:b", "c:d"]


def test_parse_offset():
    p = parse_formula("y ~ bart(x1) + x2 + offset(o)")
    assert p.offset_terms == ["o"]
    assert p.fixed_terms == ["x2"]


def test_parse_nested_group():
    p = parse_formula("y ~ bart(x1) + (1 | g.1:g.2)")
    assert p.random_terms[0].group == "g.1:g.2"


def test_slash_nesting_expansion():
    """(1 | g1/g2) == (1|g1) + (1|g1:g2) (lme4 '/' operator,
    lme4_functions.R:664-736)."""
    p = parse_formula("y ~ bart(x1) + (1 | g.1/g.2)")
    assert [t.group for t in p.random_terms] == ["g.1", "g.1:g.2"]
    p3 = parse_formula("y ~ bart(x1) + (1 + x2 | a/b/c)")
    assert [t.group for t in p3.random_terms] == ["a", "a:b", "a:b:c"]
    assert all(t.lhs_terms == ["x2"] for t in p3.random_terms)


def test_slash_nesting_builds(df):
    mf = build_model_frame("y ~ bart(X1+X2) + X4 + (1 | g.1/g.2)", df)
    explicit = build_model_frame(
        "y ~ bart(X1+X2) + X4 + (1 | g.1) + (1 | g.1:g.2)", df
    )
    assert [t.group_name for t in mf.re_terms] == ["g.1", "g.1:g.2"]
    assert mf.q == explicit.q
    for a, b in zip(mf.re_terms, explicit.re_terms):
        np.testing.assert_array_equal(a.group_idx, b.group_idx)


def test_duplicate_ranef_term_errors(df):
    """rstanarm_functions.R:591-606 check_reTrms."""
    with pytest.raises(ValueError, match="duplicate group-specific"):
        build_model_frame(
            "y ~ bart(X1+X2) + X4 + (1 | g.1) + (1 + X4 | g.1)", df
        )
    # distinct coefficient sets on the same factor are allowed
    mf = build_model_frame(
        "y ~ bart(X1+X2) + X4 + (0 + X4 | g.1) + (1 | g.1)", df
    )
    assert len(mf.re_terms) == 2


def test_rank_deficient_X_drops_and_warns(df):
    data = {k: np.asarray(v) for k, v in df.items()}
    data["X4b"] = 2.0 * np.asarray(df["X4"])  # exactly collinear
    with pytest.warns(UserWarning, match="rank deficient"):
        mf = build_model_frame("y ~ bart(X1+X2) + X4 + X4b + z", data)
    assert "X4b" in mf._dropped_fixed
    assert mf.X_names == ["X4", "z"]
    # the test frame re-drops the recorded column
    tf = mf.build_test_frame(data)
    assert tf.X.shape[1] == mf.X.shape[1]
    np.testing.assert_allclose(tf.X, mf.X)


def test_extreme_scale_warns(df):
    data = {k: np.asarray(v) for k, v in df.items()}
    data["huge"] = np.asarray(df["X4"]) * 1e7 + np.arange(len(data["y"]))
    with pytest.warns(UserWarning, match="different scales"):
        build_model_frame("y ~ bart(X1+X2) + X4 + huge", data)


def test_model_frame_shapes(df):
    mf = build_model_frame(
        "y ~ bart(. - g.1 - g.2 - X4 - z) + X4 + z + (1 + X4 | g.1) + (1 | g.2)",
        df,
    )
    n = len(df["y"])
    assert mf.X.shape == (n, 2)
    assert mf.bart_X.shape == (n, 9)
    # X is centered, no intercept column
    assert np.allclose(mf.X.mean(axis=0), 0.0, atol=1e-12)
    assert "(Intercept)" not in mf.X_names
    # lme4 dims
    assert mf.p == [2, 1]
    assert mf.l == [5, 8]
    assert mf.q == 2 * 5 + 1 * 8
    assert mf.len_theta_L == (2 + 1) + 1


def test_factor_onehot_in_bart():
    n = 30
    rng = np.random.default_rng(0)
    data = {
        "y": rng.normal(size=n),
        "x1": rng.normal(size=n),
        "f": np.array(["a", "b", "c"])[rng.integers(0, 3, n)],
    }
    mf = build_model_frame("y ~ bart(x1 + f) + f", data)
    # bart: full one-hot (3 cols); fixed: treatment contrasts (2 cols)
    assert mf.bart_names == ["x1", "fa", "fb", "fc"]
    assert mf.X_names == ["fb", "fc"]
    onehot = mf.bart_X[:, 1:]
    assert np.all(onehot.sum(axis=1) == 1.0)


def test_na_omit():
    n = 20
    rng = np.random.default_rng(1)
    y = rng.normal(size=n)
    x1 = rng.normal(size=n)
    x2 = rng.normal(size=n)
    x1[3] = np.nan
    x2[7] = np.nan
    mf = build_model_frame("y ~ bart(x1) + x2", {"y": y, "x1": x1, "x2": x2})
    assert mf.N == n - 2
    assert not mf.complete_rows[3] and not mf.complete_rows[7]


def test_test_frame_roundtrip(df):
    mf = build_model_frame(
        "y ~ bart(X1 + X2 + X3) + X4 + (1 | g.1)", df
    )
    tf = mf.build_test_frame(df)
    assert np.allclose(tf.X, mf.X)
    assert np.allclose(tf.bart_X, mf.bart_X)
    assert np.array_equal(tf.re_terms[0].group_idx, mf.re_terms[0].group_idx)


def test_test_frame_new_levels():
    n = 10
    rng = np.random.default_rng(2)
    data = {
        "y": rng.normal(size=n),
        "x": rng.normal(size=n),
        "g": np.array(["a", "b"])[rng.integers(0, 2, n)],
    }
    mf = build_model_frame("y ~ bart(x) + (1 | g)", data)
    new = dict(data)
    new["g"] = np.array(["a", "c"] * 5)  # "c" is unseen
    tf = mf.build_test_frame(new)
    assert (tf.re_terms[0].group_idx == -1).sum() == 5


def test_b_names(df):
    mf = build_model_frame("y ~ bart(X1) + (1 + X4 | g.1)", df)
    names = mf.b_names()
    assert names[0] == "b[(Intercept) g.1:0]"
    assert names[1] == "b[X4 g.1:0]"
    assert len(names) == 10


def test_double_bar_splits():
    """(expr || g) splits into independent terms exactly as the reference
    (expandDoubleVert, lme4_functions.R:555-566; findbars expands with
    expand_doublevert_method="split", :731-736)."""
    p = parse_formula("y ~ bart(x1) + (1 + x2 || g)")
    assert len(p.random_terms) == 2
    assert p.random_terms[0].lhs_intercept
    assert p.random_terms[0].lhs_terms == []
    assert not p.random_terms[1].lhs_intercept
    assert p.random_terms[1].lhs_terms == ["x2"]
    # no intercept: just the slope term
    p0 = parse_formula("y ~ bart(x1) + (0 + x2 || g)")
    assert len(p0.random_terms) == 1
    assert not p0.random_terms[0].lhs_intercept
    # intercept only: single term, same as (1 | g)
    p1 = parse_formula("y ~ bart(x1) + (1 || g)")
    assert len(p1.random_terms) == 1
    assert p1.random_terms[0].lhs_intercept
    # several slopes each get their own term
    p2 = parse_formula("y ~ bart(x1) + (1 + a + b || g)")
    assert [(t.lhs_intercept, t.lhs_terms) for t in p2.random_terms] == [
        (True, []), (False, ["a"]), (False, ["b"])
    ]


def test_double_bar_builds_like_explicit_split(df):
    mf = build_model_frame("y ~ bart(X1+X2) + X4 + (1 + X4 || g.1)", df)
    explicit = build_model_frame(
        "y ~ bart(X1+X2) + X4 + (1 | g.1) + (0 + X4 | g.1)", df
    )
    assert mf.p == explicit.p == [1, 1]
    assert mf.q == explicit.q
    # two independent scalar blocks -> 2 variance parameters, 0 covariances
    assert mf.len_theta_L == 2
    for a, b in zip(mf.re_terms, explicit.re_terms):
        np.testing.assert_array_equal(a.group_idx, b.group_idx)
        np.testing.assert_array_equal(a.lhs, b.lhs)


def test_double_bar_fit_diagonal_covariance(df):
    """A || fit's covariance posterior is structurally diagonal: Sigma
    comes back as two independent 1x1 blocks (off-diagonals absent), and
    both extract dict types disambiguate the repeated group name."""
    from stan4bart_tpu import stan4bart

    fit = stan4bart(
        "y ~ bart(X1 + X2 + X3) + X4 + (1 + X4 || g.1)", df,
        seed=3, chains=2, iter=60, warmup=30, verbose=-1,
        bart_args={"n.trees": 10},
    )
    sig = fit.extract("Sigma")
    assert set(sig.keys()) == {"g.1", "g.1.2"}
    assert sig["g.1"].shape[:2] == (1, 1)
    assert sig["g.1.2"].shape[:2] == (1, 1)
    ran = fit.extract("ranef")
    assert set(ran.keys()) == {"g.1", "g.1.2"}
    assert np.all(np.isfinite(sig["g.1"]))
    # ev still coherent with the components
    ev = fit.extract("ev")
    comp = (fit.extract("indiv.bart") + fit.extract("indiv.fixef")
            + fit.extract("indiv.ranef"))
    np.testing.assert_allclose(ev, comp, atol=1e-5)
