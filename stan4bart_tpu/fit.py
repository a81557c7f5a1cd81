"""Top-level user API: ``stan4bart(formula, data, ...)``.

Placeholder while the sampler stack comes up; filled in by the Gibbs
coupling milestone (SURVEY.md section 7.2 step 4-5).
"""

from __future__ import annotations


def stan4bart(*args, **kwargs):
    raise NotImplementedError("fit API lands with the Gibbs coupling milestone")
