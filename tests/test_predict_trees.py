"""keep_trees machinery: predict on new data from stored ensembles
(test-01-continuous.R:204-261 predict ≡ extract) and the flattened-trees
export (test-07-extractedTrees.R)."""

import numpy as np
import pytest

import stan4bart_tpu as s4b
from stan4bart_tpu.utils.friedman import friedman_dataframe, generate_friedman_data


@pytest.fixture(scope="module")
def fit_and_df():
    d = generate_friedman_data(120, ranef=True)
    df = friedman_dataframe(d)
    fit = s4b.stan4bart(
        "y ~ bart(X1 + X2 + X3 + X5) + X4 + (1 | g.2)", df,
        chains=2, warmup=60, iter=160, seed=3, verbose=-1,
        bart_args={"n.trees": 15, "keep_trees": True},
    )
    return fit, df, d


def test_predict_train_equals_extract(fit_and_df):
    fit, df, d = fit_and_df
    # walking the stored trees on the training data must reproduce the
    # stored bart_train draws exactly
    pred = fit.predict(df, type="indiv.bart")
    stored = fit.extract("indiv.bart")
    np.testing.assert_allclose(pred, stored, atol=1e-10)


def test_predict_ev_equals_extract(fit_and_df):
    fit, df, d = fit_and_df
    pred = fit.predict(df, type="ev", sample_new_levels=False)
    stored = fit.extract("ev", sample_new_levels=False)
    np.testing.assert_allclose(pred, stored, atol=1e-10)


def test_predict_components(fit_and_df):
    fit, df, d = fit_and_df
    fx = fit.predict(df, type="indiv.fixef")
    rf = fit.predict(df, type="indiv.ranef")
    bt = fit.predict(df, type="indiv.bart")
    ev = fit.predict(df, type="ev")
    np.testing.assert_allclose(ev, fx + rf + bt, atol=1e-10)


def test_predict_new_rows(fit_and_df):
    fit, df, d = fit_and_df
    new = {k: v[:30] for k, v in df.items()}
    pred = fit.predict(new, type="ev")
    assert pred.shape[0] == 30
    assert np.all(np.isfinite(pred))


def test_trees_export(fit_and_df):
    fit, df, d = fit_and_df
    tr = fit.trees()
    # 2 chains -> chain column present (test-07:10-39 inverse)
    assert set(tr.keys()) == {"chain", "sample", "tree", "n", "var", "value"}
    n_rows = len(tr["sample"])
    assert n_rows > 0
    assert tr["tree"].max() == 14
    # root rows: every (chain, sample, tree) triple appears
    kept = fit.iterations - fit.warmup
    roots = tr["n"] >= 0
    assert len(np.unique(tr["sample"])) == kept
    # leaves carry no split var
    leaves = tr["var"] == -1
    assert leaves.sum() > 0
    # n column: root node count equals training n
    # (first row of each tree in preorder is the root)
    first_rows = np.flatnonzero(
        np.r_[True, (np.diff(tr["tree"]) != 0)
              | (np.diff(tr["sample"]) != 0) | (np.diff(tr["chain"]) != 0)]
    )
    assert np.all(tr["n"][first_rows] == fit.mf.N)


def test_as_array_names(fit_and_df):
    fit, df, d = fit_and_df
    arr, names = fit.as_array()
    kept = fit.iterations - fit.warmup
    assert arr.shape == (kept, 2, len(names))
    assert "sigma" in names
    assert "beta_X4" in names
    assert "b[(Intercept) g.2:0]" in names
    assert any(n.startswith("Sigma[g.2:") for n in names)
    # extract("sigma") values match the as_array column (test-01:51-66)
    sig_col = arr[..., names.index("sigma")]
    sig = fit.extract("sigma", combine_chains=False)
    np.testing.assert_allclose(np.moveaxis(sig_col, 0, 0), sig, atol=1e-12)


def test_predict_without_keep_trees_raises():
    d = generate_friedman_data(60)
    df = friedman_dataframe(d)
    fit = s4b.stan4bart("y ~ bart(X1 + X2) + X4", df, chains=1,
                        warmup=10, iter=30, seed=0, verbose=-1,
                        bart_args={"n.trees": 5})
    with pytest.raises(ValueError, match="keep_trees"):
        fit.predict(df)
