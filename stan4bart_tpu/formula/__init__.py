from stan4bart_tpu.formula.parser import ParsedFormula, parse_formula  # noqa: F401
from stan4bart_tpu.formula.design import ModelFrame, build_model_frame  # noqa: F401
