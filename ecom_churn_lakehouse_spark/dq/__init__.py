from .checks import CheckResult, DQReport, assert_single_value, run_checks

__all__ = ["run_checks", "DQReport", "CheckResult", "assert_single_value"]
