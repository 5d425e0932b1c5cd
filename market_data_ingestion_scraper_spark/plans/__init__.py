from .audit import aqe_disabled, explain_str, plan_report

__all__ = ["aqe_disabled", "explain_str", "plan_report"]
