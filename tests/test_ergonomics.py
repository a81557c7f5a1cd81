"""Production ergonomics of the default dispatch path: host-chunked
execution with real per-phase wall clock (reference
interruptable_sampler.hpp:101-102 warm/sample_delta_t), chunk-boundary
invariance, per-refresh progress printing (init.cpp:746-754), user
interrupts yielding valid partial fits (the reference honors
R_CheckUserInterrupt every transition, stan_sampler.hpp:44-48), and
auto-chunk sizing for time-capped devices."""

import numpy as np
import pytest

import stan4bart_tpu as s4b
from stan4bart_tpu.fit import _auto_chunk_size
from stan4bart_tpu.utils.friedman import (
    friedman_dataframe,
    generate_friedman_data,
)

FORMULA = "y ~ bart(X1+X2) + X4 + (1 | g.2)"


def _df(n=100):
    return friedman_dataframe(generate_friedman_data(n, ranef=True))


def test_real_phase_timings():
    fit = s4b.stan4bart(FORMULA, _df(), chains=2, warmup=15, iter=40,
                        seed=3, verbose=-1, bart_args={"n.trees": 5})
    t = fit.timings
    assert t["warmup"] > 0.0 and t["sample"] > 0.0
    # measured per-phase wall clock, not a pro-rated split of total
    assert t["warmup"] + t["sample"] <= t["total"] + 1e-6
    ratio = t["warmup"] / t["sample"]
    prorated = 15 / 25
    # the two phases genuinely differ in cost (warmup pays adaptation);
    # a pro-rated split would reproduce the iteration ratio exactly
    assert abs(ratio - prorated) > 1e-9


def test_chunk_boundaries_do_not_change_draws():
    kw = dict(chains=2, warmup=12, iter=33, seed=9, verbose=-1,
              bart_args={"n.trees": 5})
    df = _df()
    f_whole = s4b.stan4bart(FORMULA, df, **kw)
    f_chunked = s4b.stan4bart(FORMULA, df, chunk_size=7, **kw)
    np.testing.assert_array_equal(f_whole.draws.stan, f_chunked.draws.stan)
    np.testing.assert_array_equal(f_whole.draws.bart_train,
                                  f_chunked.draws.bart_train)


def test_refresh_progress_printing(capsys):
    s4b.stan4bart(FORMULA, _df(), chains=1, warmup=10, iter=30, seed=1,
                  verbose=2, refresh=10, bart_args={"n.trees": 4})
    out = capsys.readouterr().out
    assert "starting warmup, 10 draws" in out
    assert "starting sample, 20 draws" in out
    assert "iter 10 / 20" in out and "iter 20 / 20" in out


def test_interrupt_yields_partial_fit():
    """A KeyboardInterrupt mid-run returns the completed draws as a valid
    fit (stan_sampler.hpp:44-48 analog)."""
    seen = []

    def boom(phase, done, total):
        seen.append((phase, done, total))
        if phase == "sample" and done >= 8:
            raise KeyboardInterrupt

    with pytest.warns(UserWarning, match="interrupted"):
        fit = s4b.stan4bart(FORMULA, _df(), chains=2, warmup=10, iter=50,
                            seed=5, verbose=-1, chunk_size=4,
                            bart_args={"n.trees": 5}, _progress=boom)
    assert fit.timings.get("interrupted") is True
    # 10 warmup + 8 sample draws completed
    assert fit.iterations == 18 and fit.warmup == 10
    ev = fit.extract("ev")
    assert ev.shape[-1] == 8 * 2  # sample draws x chains
    assert np.all(np.isfinite(ev))
    assert np.isfinite(fit.extract("sigma")).all()


def test_interrupt_during_warmup_is_still_a_fit():
    def boom(phase, done, total):
        if phase == "warmup" and done >= 8:
            raise KeyboardInterrupt

    with pytest.warns(UserWarning, match="interrupted"):
        fit = s4b.stan4bart(FORMULA, _df(), chains=1, warmup=20, iter=40,
                            seed=5, verbose=-1, chunk_size=4,
                            bart_args={"n.trees": 5}, _progress=boom)
    # only 8 warmup draws exist; the warmup boundary moves so the
    # "sample" view is empty rather than mislabeled warmup draws
    assert fit.iterations == 8 and fit.warmup == 8
    assert fit.extract("sigma", include_warmup=True).size == 8


def test_auto_chunk_size_bounds():
    # small problems: generous chunks, capped at 500
    assert _auto_chunk_size(250, 50, 4, 1) == 500
    # production scale: chunks sized so each execution stays under the
    # device-time budget
    big = _auto_chunk_size(200_000, 100, 64, 1, budget_s=20.0)
    assert 1 <= big <= 500
    est_iter_s = 2e-9 * 200_000 * 100 * 64
    assert big * est_iter_s <= 25.0
    # never below 1 even when a single iteration exceeds the budget
    assert _auto_chunk_size(10**7, 1000, 1024, 5) == 1


def test_predict_missing_column_friendly_error():
    """Missing newdata columns raise one explicit error naming them
    (reference generics.R:514-523 newdata validation), not a raw
    KeyError from inside a term encoder; extra columns are ignored and
    order does not matter."""
    df = _df()
    fit = s4b.stan4bart(FORMULA, df, chains=1, warmup=6, iter=12,
                        seed=11, verbose=-1,
                        bart_args={"n.trees": 3, "keep_trees": True})
    bad = {k: np.asarray(v)[:10] for k, v in df.items() if k != "X2"}
    with pytest.raises(ValueError, match="missing required column.*'X2'"):
        fit.predict(bad)
    # extra columns + shuffled order: fine (name-based encoding)
    good = {k: np.asarray(v)[:10] for k, v in df.items()}
    good["unrelated"] = np.arange(10.0)
    good = dict(reversed(list(good.items())))
    p = fit.predict(good)
    assert np.all(np.isfinite(p))


def test_exec_budget_feedback_shrinks_chunks(monkeypatch, capsys):
    """Closed-loop chunk sizing (round-5): when a measured steady-state
    chunk exceeds the execution budget, remaining chunks shrink — and
    chunk boundaries never change the draws."""
    kw = dict(chains=2, warmup=10, iter=24, seed=13, verbose=0,
              bart_args={"n.trees": 4})
    df = _df()
    base = s4b.stan4bart(FORMULA, df, chunk_size=6, **kw)
    monkeypatch.setenv("S4B_EXEC_BUDGET_S", "0.000001")
    shrunk = s4b.stan4bart(FORMULA, df, chunk_size=6, **kw)
    out = capsys.readouterr().out
    assert "shrinking chunk size" in out
    np.testing.assert_array_equal(base.draws.stan, shrunk.draws.stan)
