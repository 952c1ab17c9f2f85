"""Shared app plumbing: config loading, experiment dirs, component wiring."""

from __future__ import annotations

import os
import sys

import yaml

from .. import runtime
from ..config import build_components, load_config
from ..mapping.mapper import IncrementalMapper
from ..planning import get_planner
from ..sim import get_simulator


def parse_cli(config_name: str):
    overrides = [a for a in sys.argv[1:] if "=" in a]
    cfg = load_config(config_name, overrides)
    runtime.setup_cache()
    runtime.init_distributed()  # no-op unless a pod-slice env opts in
    return cfg


def experiment_path(cfg) -> str:
    return os.path.join(
        cfg.experiment.output_dir,
        str(cfg.experiment.exp_id),
        cfg.scene.scene_name,
        cfg.planner.planner_name,
        str(cfg.experiment.run_id),
    )


def dump_config(cfg, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "exp_config.yaml"), "w") as f:
        yaml.dump(cfg.to_dict(), f)


def build_mission(cfg, viewer=None):
    comp = build_components(cfg)
    simulator = get_simulator(cfg)
    planner = get_planner(
        comp["planner_cfg"],
        comp["map_cfg"],
        comp["voxel_cfg"],
        comp["raster_cfg"],
        seed=cfg.get("seed", 0),
    )
    mapper = IncrementalMapper(
        comp["map_cfg"],
        comp["voxel_cfg"],
        comp["raster_cfg"],
        keyframe_capacity=cfg.mapper.get("keyframe_capacity", 256),
        seed=cfg.get("seed", 0),
        viewer=viewer,
    )
    mapper.load_simulator(simulator)
    mapper.load_planner(planner)
    return mapper, simulator, planner, comp
