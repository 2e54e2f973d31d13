from .metrics import evaluate_run

__all__ = ["evaluate_run"]
