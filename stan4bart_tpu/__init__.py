"""stan4bart_tpu — TPU-native Bayesian semiparametric regression.

A brand-new JAX/XLA/Pallas framework (not a port) with the capabilities of the
R package ``stan4bart`` (reference: vdorie/stan4bart): regressions whose mean is

    continuous:  y_i | b ~ N( f(X^b_i) + X^f_i beta + Z_i b, sigma^2 )
    binary:      P(y_i = 1 | b) = Phi( f(X^b_i) + X^f_i beta + Z_i b )

where f(.) is a BART sum-of-trees sampled by a vectorized Metropolis-within-Gibbs
sweep over flattened tree arrays, and the parametric multilevel block is sampled
by NUTS over the rstanarm-style "continuous" log-posterior (decov covariance
prior, full lme4 random-effect syntax).  The two samplers are Gibbs-alternated
once per iteration inside a single compiled ``lax.scan`` step; chains shard over
a ``jax.sharding.Mesh`` axis.

Reference parity map: see SURVEY.md at the repo root.
"""

from stan4bart_tpu.fit import chi, stan4bart  # noqa: F401
from stan4bart_tpu.loo import loo_compare  # noqa: F401
from stan4bart_tpu.models import priors  # noqa: F401
from stan4bart_tpu.models.priors import (  # noqa: F401
    R2,
    cauchy,
    decov,
    dirichlet,
    exponential,
    hs,
    hs_plus,
    laplace,
    lasso,
    lkj,
    normal,
    product_normal,
    student_t,
)
from stan4bart_tpu.parallel.diagnostics import ess, split_rhat  # noqa: F401
from stan4bart_tpu.results import Stan4bartFit  # noqa: F401
from stan4bart_tpu.utils.friedman import generate_friedman_data  # noqa: F401

__version__ = "0.5.0"
