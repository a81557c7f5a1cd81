"""Fit object + posterior consumption (extract / fitted / predict).

Placeholder while the sampler stack comes up; filled in by the posterior-API
milestone (SURVEY.md section 7.2 step 5).
"""

from __future__ import annotations


class Stan4bartFit:
    pass
