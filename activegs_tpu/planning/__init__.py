from .planner import PlanBase  # noqa: F401
from .confidence import ConfidencePlanner  # noqa: F401
from .exploration import ExplorationPlanner  # noqa: F401
from .random_planner import RandomPlanner  # noqa: F401


def get_planner(cfg, *args, **kwargs):
    """Planner factory (`planning/__init__.py:6-15` analog)."""
    kind = cfg.planner.type
    table = {
        "confidence": ConfidencePlanner,
        "exploration": ExplorationPlanner,
        "random": RandomPlanner,
    }
    return table[kind](cfg.planner, *args, **kwargs)
