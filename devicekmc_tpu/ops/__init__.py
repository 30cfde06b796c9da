from .ell import ell_matvec
from .cg import cg_solve

__all__ = ["ell_matvec", "cg_solve"]
