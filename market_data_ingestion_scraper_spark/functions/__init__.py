from .scalar import (
    bounded_window,
    exact_avg,
    exact_sum,
    is_summary_row,
    revenue,
    sanitize_name,
)

__all__ = [
    "bounded_window",
    "exact_avg",
    "exact_sum",
    "is_summary_row",
    "revenue",
    "sanitize_name",
]
