from .compiler import RowValidator, compile_row_validator

__all__ = ["RowValidator", "compile_row_validator"]
