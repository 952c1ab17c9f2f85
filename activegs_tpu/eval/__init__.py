from . import metrics, tsdf  # noqa: F401
from .evaluation import EvaluationTool  # noqa: F401
