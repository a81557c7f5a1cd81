"""Checkpoint/resume (beyond-reference capability, SURVEY.md section 5) and
na_action='exclude' re-expansion (test-03-na_action.R)."""

import numpy as np
import pytest

import stan4bart_tpu as s4b
from stan4bart_tpu.utils.friedman import friedman_dataframe, generate_friedman_data


def test_save_load_roundtrip(tmp_path):
    df = friedman_dataframe(generate_friedman_data(80, ranef=True))
    fit = s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df, chains=2,
                        warmup=20, iter=50, seed=0, verbose=-1,
                        bart_args={"n.trees": 5})
    p = str(tmp_path / "fit.pkl")
    fit.save(p)
    fit2 = s4b.Stan4bartFit.load(p)
    np.testing.assert_allclose(fit2.extract("ev"), fit.extract("ev"))
    np.testing.assert_allclose(fit2.extract("sigma"), fit.extract("sigma"))


def test_continue_sampling():
    df = friedman_dataframe(generate_friedman_data(80, ranef=True))
    fit = s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df, chains=2,
                        warmup=20, iter=50, seed=0, verbose=-1,
                        bart_args={"n.trees": 5})
    fit2 = fit.continue_sampling(40)
    assert fit2.iterations == fit.iterations + 40
    # original draws preserved
    np.testing.assert_allclose(fit2.draws.stan[:, : fit.iterations],
                               fit.draws.stan)
    # new draws are sane
    ev = fit2.extract("ev")
    assert ev.shape[-1] == (fit2.iterations - fit2.warmup) * 2
    assert np.all(np.isfinite(ev))


def test_continue_sampling_qr_preserves_old_draws():
    """Regression: dataclasses.replace() re-ran __post_init__ and re-applied
    the QR un-rotation, corrupting stored beta draws on resume."""
    df = friedman_dataframe(generate_friedman_data(80, ranef=True))
    fit = s4b.stan4bart("y ~ bart(X1+X2) + X4 + X3 + (1 | g.2)", df, chains=2,
                        warmup=20, iter=50, seed=0, verbose=-1,
                        stan_args={"qr": True}, bart_args={"n.trees": 5})
    old_fixef = fit.extract("fixef")
    fit2 = fit.continue_sampling(30)
    np.testing.assert_allclose(
        fit2.extract("fixef")[..., : old_fixef.shape[-1]], old_fixef
    )
    # resumed draws live in the same (un-rotated) coordinates as the old
    new_fixef = fit2.extract("fixef")[..., old_fixef.shape[-1]:]
    assert np.all(np.isfinite(new_fixef))
    assert abs(np.mean(new_fixef) - np.mean(old_fixef)) < 5 * np.std(old_fixef)


def test_new_level_draws_shared_within_level():
    """Reference levelfun semantics: rows of the SAME new group level share
    one b draw per iteration (within-draw correlation preserved)."""
    df = friedman_dataframe(generate_friedman_data(80, ranef=True))
    fit = s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df, chains=1,
                        warmup=15, iter=40, seed=0, verbose=-1,
                        bart_args={"n.trees": 4})
    new = {c: np.asarray(df[c])[:6].copy() for c in df}
    new["g.2"] = np.array(["newA", "newA", "newA", "newB", "newB", "newB"],
                          dtype=object)
    tf = fit.mf.build_test_frame(new)
    ran = fit._indiv_ranef(False, sample_new_levels=True, frame=tf)
    # intercept-only term: rows in the same new level get identical draws
    np.testing.assert_allclose(ran[..., 0], ran[..., 1])
    np.testing.assert_allclose(ran[..., 3], ran[..., 4])
    # ... and different levels get different draws
    assert np.max(np.abs(ran[..., 0] - ran[..., 3])) > 1e-8


def test_na_exclude_reinserts():
    d = generate_friedman_data(90)
    df = friedman_dataframe(d)
    df["X1"] = df["X1"].copy()
    df["X1"][[3, 17]] = np.nan        # bart-component NAs
    df["X4"] = df["X4"].copy()
    df["X4"][7] = np.nan              # fixed-component NA
    fit = s4b.stan4bart("y ~ bart(X1+X2) + X4", df, chains=1,
                        warmup=15, iter=40, seed=0, verbose=-1,
                        na_action="exclude", bart_args={"n.trees": 4})
    assert fit.mf.N == 87
    ev = fit.extract("ev")
    assert ev.shape[0] == 90
    assert np.isnan(ev[[3, 7, 17]]).all()
    assert np.isfinite(ev[np.setdiff1d(np.arange(90), [3, 7, 17])]).all()
    fitted = fit.fitted("ev")
    assert np.isnan(fitted[[3, 7, 17]]).all()


def test_na_omit_drops():
    d = generate_friedman_data(90)
    df = friedman_dataframe(d)
    df["X1"] = df["X1"].copy()
    df["X1"][[3, 17]] = np.nan
    fit = s4b.stan4bart("y ~ bart(X1+X2) + X4", df, chains=1,
                        warmup=15, iter=40, seed=0, verbose=-1,
                        na_action="omit", bart_args={"n.trees": 4})
    assert fit.mf.N == 88
    assert fit.extract("ev").shape[0] == 88


def test_continue_sampling_chunked_equals_single_execution():
    """Resume through the production chunked driver (round-5: resume
    previously bypassed chunking and died on time-capped backends):
    chunk boundaries must not change the resumed draws, and the fused
    chain-blocked driver must be selected for sweep-kernel fits."""
    df = friedman_dataframe(generate_friedman_data(80, ranef=True))
    fit = s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df, chains=2,
                        warmup=15, iter=30, seed=4, verbose=-1,
                        bart_args={"n.trees": 5})
    whole = fit.continue_sampling(12)
    chunked = fit.continue_sampling(12, chunk_size=5)
    np.testing.assert_array_equal(whole.draws.stan, chunked.draws.stan)
    np.testing.assert_array_equal(whole.draws.bart_train,
                                  chunked.draws.bart_train)

    # fused-kernel fit resumes on the chain-blocked batched driver
    fit32 = s4b.stan4bart("y ~ bart(X1+X2) + X4 + (1 | g.2)", df,
                          chains=2, warmup=10, iter=20, seed=4,
                          verbose=-1, dtype="float32",
                          bart_args={"n.trees": 5, "sweep_kernel": True})
    more = fit32.continue_sampling(8, chunk_size=3)
    assert more.iterations == fit32.iterations + 8
    assert np.all(np.isfinite(more.extract("sigma")))
