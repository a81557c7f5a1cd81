"""QR reparameterization: draws are un-rotated back to the original
coefficient space (stan4bart_fit.R:239-253, 560-570; test-01:162-201)."""

import numpy as np
import pytest

import stan4bart_tpu as s4b
from stan4bart_tpu.utils.friedman import friedman_dataframe, generate_friedman_data


def test_qr_unrotation():
    d = generate_friedman_data(200, causal=True)
    df = friedman_dataframe(d)
    fit = s4b.stan4bart(
        "y ~ bart(X1+X2+X3+X5) + X4 + z", df, chains=1,
        warmup=150, iter=400, seed=3, verbose=-1,
        bart_args={"n.trees": 25}, stan_args={"qr": True},
    )
    fx = fit.extract("fixef").mean(-1)
    assert abs(fx[0] - 10.0) < 2.0
    assert abs(fx[1] - 5.0) < 1.5
    # component identity still holds after un-rotation
    ev = fit.fitted("ev")
    parts = fit.fitted("indiv.bart") + fit.fitted("indiv.fixef")
    np.testing.assert_allclose(ev, parts + fit.fitted("indiv.ranef"),
                               atol=1e-8)


def test_qr_single_predictor_rejected():
    d = generate_friedman_data(60)
    df = friedman_dataframe(d)
    with pytest.raises(ValueError, match="multiple predictors"):
        s4b.stan4bart("y ~ bart(X1+X2) + X4", df, chains=1, iter=10,
                      verbose=-1, stan_args={"qr": True})
