from .recorder import MissionRecorder  # noqa: F401
from . import checkpoint  # noqa: F401
