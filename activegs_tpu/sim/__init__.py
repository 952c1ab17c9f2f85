from .base import SimulatorBase  # noqa: F401
from .synthetic import BoxRoomSimulator, default_room  # noqa: F401
from .replay import ReplaySimulator  # noqa: F401


def get_simulator(cfg):
    """Factory over simulator types (`simulator/__init__.py:4-5` analog)."""
    kind = cfg.simulator.type
    if kind == "synthetic":
        return BoxRoomSimulator.from_config(cfg)
    if kind == "replay":
        return ReplaySimulator.from_config(cfg)
    raise ValueError(f"unknown simulator type: {kind}")
