from .compiler import compile_plan
from .plan import ValidationPlan, load_plan
from .typemap import spark_struct_for

__all__ = ["compile_plan", "ValidationPlan", "load_plan", "spark_struct_for"]
