from .evaluator import referenced_names, safe_eval
from .executor import ScanExecutor, run_scan

__all__ = ["safe_eval", "referenced_names", "ScanExecutor", "run_scan"]
