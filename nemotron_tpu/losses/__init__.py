from .rnnt import rnnt_loss  # noqa: F401
