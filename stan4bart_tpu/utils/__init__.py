from stan4bart_tpu.utils.friedman import generate_friedman_data  # noqa: F401
