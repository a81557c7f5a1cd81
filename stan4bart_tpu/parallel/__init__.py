from stan4bart_tpu.parallel.diagnostics import ess, split_rhat  # noqa: F401
