from .spec import validate_spec, SpecError
from .compile import compile_spec, compile_expr
from .parser import parse_description

__all__ = [
    "validate_spec",
    "SpecError",
    "compile_spec",
    "compile_expr",
    "parse_description",
]
