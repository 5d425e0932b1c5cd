from .audit import aqe_disabled, executed_shuffles, explain_str, plan_report

__all__ = ["aqe_disabled", "executed_shuffles", "explain_str", "plan_report"]
