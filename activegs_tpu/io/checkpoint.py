"""Map checkpointing: save/load the gaussian + voxel map states.

Replaces the torch-pickle map persistence (`GaussianMap.save/load`,
`gaussian_map.py:491-527`; `VoxelMap.save`, `voxel_map.py:439-447`) with
npz + JSON. Only the live prefix of the static-capacity store is written,
so snapshots match the reference's dynamic arrays. Optimizer state is
deliberately NOT persisted — Adam is recreated each keyframe (SURVEY §5).
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from ..mapping import gaussians as gm
from ..mapping import voxel_map as vm


def save_gaussian_map(path: str, state: gm.GaussianMapState, cfg: gm.MapConfig):
    n = int(state.count)
    np.savez_compressed(
        path,
        means=np.asarray(state.means[:n]),
        scales_raw=np.asarray(state.scales_raw[:n]),
        rotations_raw=np.asarray(state.rotations_raw[:n]),
        opacities_raw=np.asarray(state.opacities_raw[:n]),
        colors=np.asarray(state.colors[:n]),
        view_scores=np.asarray(state.view_scores[:n]),
        view_supports=np.asarray(state.view_supports[:n]),
        view_means=np.asarray(state.view_means[:n]),
        meta=json.dumps(
            {
                "near": cfg.bound[0],
                "far": cfg.bound[1],
                "background": list(cfg.background),
                "scale_factor": cfg.scale_factor,
                "use_view_distribution": cfg.use_view_distribution,
            }
        ),
    )


def load_gaussian_map(path: str, cfg: gm.MapConfig | None = None, capacity=None):
    """Returns (state, cfg). The stored meta reconstructs the map config the
    way `GaussianMap.load` restores scalars (`gaussian_map.py:509-527`)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    n = len(data["means"])
    if cfg is None:
        cfg = gm.MapConfig(
            bound=(meta["near"], meta["far"]),
            background=tuple(meta["background"]),
            scale_factor=meta["scale_factor"],
            use_view_distribution=meta["use_view_distribution"],
        )
    cap = capacity or max(cfg.capacity, 1 << (n - 1).bit_length())
    if cap < n:
        cap = 1 << (n - 1).bit_length()
    cfg = dataclasses.replace(cfg, capacity=cap)
    state = gm.init_state(cfg)

    def fill(field, value):
        return getattr(state, field).at[:n].set(jnp.asarray(value))

    state = gm.GaussianMapState(
        means=fill("means", data["means"]),
        scales_raw=fill("scales_raw", data["scales_raw"]),
        rotations_raw=fill("rotations_raw", data["rotations_raw"]),
        opacities_raw=fill("opacities_raw", data["opacities_raw"]),
        colors=fill("colors", data["colors"]),
        view_scores=fill("view_scores", data["view_scores"]),
        view_supports=fill("view_supports", data["view_supports"]),
        view_means=fill("view_means", data["view_means"]),
        count=jnp.int32(n),
    )
    return state, cfg


def save_voxel_map(path: str, state: vm.VoxelMapState, grid: vm.VoxelGrid):
    np.savez_compressed(
        path,
        log_odds=np.asarray(state.log_odds),
        unexplored=np.asarray(state.unexplored),
        roi_mask=np.asarray(state.roi_mask),
        voxel_normal=np.asarray(state.voxel_normal),
        meta=json.dumps(
            {
                "bbox_min": list(grid.bbox_min),
                "bbox_max": list(grid.bbox_max),
                "dim": list(grid.dim),
                "size": list(grid.size),
            }
        ),
    )


def load_voxel_map(path: str):
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    grid = vm.VoxelGrid(
        bbox_min=tuple(meta["bbox_min"]),
        bbox_max=tuple(meta["bbox_max"]),
        dim=tuple(meta["dim"]),
        size=tuple(meta["size"]),
    )
    state = vm.VoxelMapState(
        log_odds=jnp.asarray(data["log_odds"]),
        unexplored=jnp.asarray(data["unexplored"]),
        roi_mask=jnp.asarray(data["roi_mask"]),
        voxel_normal=jnp.asarray(data["voxel_normal"]),
    )
    return state, grid
