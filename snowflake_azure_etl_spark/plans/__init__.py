from .datedim import build_dim_date, DIM_DATE_COLUMNS
from .surrogate import with_surrogate_key

__all__ = ["build_dim_date", "DIM_DATE_COLUMNS", "with_surrogate_key"]
