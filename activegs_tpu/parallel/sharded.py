"""Multi-device execution: shard the view axis over a device mesh.

The reference is single-GPU with a serial per-view render loop (SURVEY
§2.2); the TPU-native scaling axis is views (8 training views, ~100 planner
candidate views): each device renders its view shard with the full
replicated gaussian state, and per-parameter gradients / per-view utilities
are combined with `psum`/all-gather over ICI. Implemented with
`jax.shard_map` so the same code runs on a virtual CPU mesh in tests
(SURVEY §4) and on real pods.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..mapping import gaussians as gm
from ..mapping.trainer import batch_loss
from ..render.renderer import render_view
from ..render.types import Camera, RasterConfig

VIEW_AXIS = "view"


def make_view_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (VIEW_AXIS,))


def sharded_train_step(
    params: dict,
    state: gm.GaussianMapState,
    batch: tuple,
    mesh: Mesh,
    cfg: gm.MapConfig,
    raster_cfg: RasterConfig,
):
    """One data-parallel loss+grad evaluation: the view batch is sharded
    over the mesh, gaussian parameters are replicated, and gradients are
    psum-reduced over ICI (overlapping with backward under XLA latency
    hiding). Returns (loss, grads, per_frame_errors)."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), (P(VIEW_AXIS), P(VIEW_AXIS), P(VIEW_AXIS), P(VIEW_AXIS))),
        out_specs=(P(), P(), P(VIEW_AXIS)),
        check_vma=False,  # binning's scatter loops carry device-invariant inits
    )
    def step(params, state, batch):
        n_total = batch[0].shape[0] * jax.lax.psum(1, VIEW_AXIS)
        n_local = batch[0].shape[0]

        def local_loss(p):
            loss, per_frame = batch_loss(p, state, batch, cfg, raster_cfg)
            # batch_loss averages over local views; rescale so the psum of
            # local losses equals the global mean
            return loss * (n_local / n_total), per_frame

        (loss, per_frame), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params
        )
        loss = jax.lax.psum(loss, VIEW_AXIS)
        grads = jax.lax.psum(grads, VIEW_AXIS)
        return loss, grads, per_frame

    return step(params, state, batch)


def sharded_candidate_utility(
    gm_state: gm.GaussianMapState,
    candidates: jnp.ndarray,  # (V, 4, 4), V divisible by mesh size
    intrinsic: jnp.ndarray,
    mesh: Mesh,
    shape: tuple[int, int],
    cfg: gm.MapConfig,
    raster_cfg: RasterConfig,
):
    """Shard planner candidate renders over devices; all-gather the
    per-view channel statistics (mean confidence-weighted depth terms used
    by the utility; full utility assembly stays in planning/confidence.py).
    Returns per-candidate (mean_depth, mean_uncertainty_term, opacity)."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(VIEW_AXIS), P()),
        out_specs=P(VIEW_AXIS),
        check_vma=False,
    )
    def run(gm_state, cands, intrinsic):
        attrs = gm.attrs_of(gm_state, cfg)

        def one(extrinsic):
            out, _ = render_view(
                attrs,
                Camera(extrinsic=extrinsic, intrinsic=intrinsic),
                shape,
                raster_cfg,
            )
            return jnp.stack(
                [
                    jnp.mean(out.depth),
                    jnp.mean((1.0 - out.confidence) * out.depth),
                    jnp.mean(out.opacity),
                ]
            )

        return jax.lax.map(one, cands)

    return run(gm_state, candidates, intrinsic)
