from .checks import CheckResult, DQReport, run_checks

__all__ = ["run_checks", "DQReport", "CheckResult"]
