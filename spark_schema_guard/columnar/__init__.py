from .compiler import compile_plan
from .plan import ValidationPlan
from .typemap import spark_struct_for

__all__ = ["compile_plan", "ValidationPlan", "spark_struct_for"]
