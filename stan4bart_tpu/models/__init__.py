from stan4bart_tpu.models import priors  # noqa: F401
