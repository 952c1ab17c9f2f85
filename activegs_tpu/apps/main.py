"""Mission entry point — the analog of the reference's `main.py`.

    python -m activegs_tpu.apps.main planner=confidence scene=synthetic/boxroom \
        experiment.budget=300 use_gui=true
"""

from __future__ import annotations

import os

from ..io.recorder import MissionRecorder
from .common import build_mission, dump_config, experiment_path, parse_cli


def main():
    cfg = parse_cli("main")
    viewer = None
    if cfg.get("use_gui", False):
        # live browser viewer (viz/webviewer.py) — the interactive analog of
        # the reference's Open3D GUI process; gui_port=0 picks a free port
        from ..viz.webviewer import WebViewer

        viewer = WebViewer(port=int(cfg.get("gui_port", 8787)))
        print(f" live viewer: http://127.0.0.1:{viewer.port}/")
    elif cfg.get("dump_views", False):
        from ..viz.viewer import MissionViewer

        viewer = MissionViewer(os.path.join(experiment_path(cfg), "viewer"))

    prewarm_steps = int(cfg.experiment.get("prewarm_steps", 0))
    if prewarm_steps > 0:
        # throwaway unrecorded mission: absorbs executable loads/compiles up
        # the capacity-bucket ladder BEFORE the recorder starts charging the
        # budget — a cached executable still costs 5-10 s to LOAD per
        # process (CLAUDE.md), and the recorder bills real seconds
        # (`utils/common.py:289-329` semantics), so unwarmed loads are
        # mission capability lost (VERDICT r4 ask #3a)
        print(f" prewarm: {prewarm_steps} unrecorded steps...")
        wmapper, _, _, _ = build_mission(cfg)
        wmapper.run(max_steps=prewarm_steps)
        del wmapper

    mapper, simulator, planner, comp = build_mission(cfg, viewer=viewer)

    if cfg.get("debug", False):
        recorder = None  # (`main.py:27-28`)
    else:
        path = experiment_path(cfg)
        dump_config(cfg, path)
        recorder = MissionRecorder(
            path,
            budget=cfg.experiment.budget,
            record_interval=cfg.experiment.record_interval,
            record_rgbd=cfg.experiment.get("record_rgbd", False),
            record_global_path=cfg.experiment.get("record_global_path", True),
        )
        mapper.load_recorder(recorder)

    mapper.run(max_steps=cfg.get("max_steps", None))


if __name__ == "__main__":
    main()
