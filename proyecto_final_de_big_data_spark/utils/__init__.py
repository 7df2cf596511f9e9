from .dates import QUARTER_MONTHS, normalize_month, resolve_months
from .logging import get_logger

__all__ = ["QUARTER_MONTHS", "normalize_month", "resolve_months", "get_logger"]
