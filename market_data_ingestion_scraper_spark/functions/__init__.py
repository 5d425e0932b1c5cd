from .scalar import (
    exact_avg,
    exact_sum,
    is_summary_row,
    revenue,
    sanitize_name,
)

__all__ = ["exact_avg", "exact_sum", "is_summary_row", "revenue", "sanitize_name"]
