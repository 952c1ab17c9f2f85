from .planner import PlanBase, PlannerConfig  # noqa: F401
from .confidence import ConfidencePlanner  # noqa: F401
from .exploration import ExplorationPlanner  # noqa: F401
from .random_planner import RandomPlanner  # noqa: F401


def get_planner(planner_cfg: PlannerConfig, *args, **kwargs):
    """Planner factory (`planning/__init__.py:6-15` analog)."""
    table = {
        "confidence": ConfidencePlanner,
        "exploration": ExplorationPlanner,
        "random": RandomPlanner,
    }
    return table[planner_cfg.type](planner_cfg, *args, **kwargs)
