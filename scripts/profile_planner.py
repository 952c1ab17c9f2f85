"""Where does the confidence planner's device time go at mission scale?

Times _confidence_utility_batch (100 candidates, 128^2, utility raster cfg
dup2/b1.0) at the bench map shape (200k surfels in a 262k bucket), then
isolates the render-only portion, and a variant with per-candidate in-view
compaction to evaluate that lever before building it.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from activegs_tpu import runtime

runtime.setup_cache()

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from activegs_tpu.mapping import gaussians as gm
from activegs_tpu.mapping import voxel_map as vm
from activegs_tpu.planning import confidence as cp
from activegs_tpu.render.renderer import (
    compact_in_view,
    pack_attrs,
    render_view,
    subset_view,
)
from activegs_tpu.render import preprocess as rp
from activegs_tpu.render.types import Camera, RasterConfig

ITERS = 4  # utility batch is heavy; dispatch (~31 ms) amortizes over it


def fence(x):
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def timed(fn, *args):
    out = fn(*args)
    fence(out)
    best = 1e9
    for i in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0


def main():
    res = 128
    n_cand = 100
    cfg = gm.MapConfig(capacity=1 << 19)
    rcfg = RasterConfig(max_dup=2, entry_budget_mult=1.0)
    state, buf = B.build_scene(512, 200_000, cfg)
    cap_b = gm.bucket_capacity(200_000, cfg.capacity)
    state = gm.slice_state(state, cap_b)

    vcfg = vm.VoxelConfig()
    grid = vm.VoxelGrid.create(((0.0, 0.0, 0.0), (6.0, 5.0, 3.0)), vcfg)
    vstate = vm.init_state(grid)

    rng = np.random.default_rng(0)
    cands = np.tile(np.eye(4, dtype=np.float32)[None], (n_cand, 1, 1))
    cands[:, :3, 3] = rng.uniform(1, 4, (n_cand, 3)) * np.array([1, 1, 0.5])
    intr = np.asarray(buf.intrinsics[0])
    valid = np.ones((n_cand, res, res), bool)
    depth_range = jnp.asarray([0.0, 5.0], jnp.float32)

    run = lambda st: cp._confidence_utility_batch(
        st,
        vstate.unexplored,
        jnp.asarray(cands),
        jnp.asarray(intr),
        jnp.asarray(valid),
        depth_range,
        grid,
        (res, res),
        cfg,
        rcfg,
    )
    t = timed(run, state)
    print(f"utility batch ({n_cand} cands): {t:7.1f} ms  ({t/n_cand:5.2f} ms/cand)")

    # the wired path: measured entry budget + per-candidate subset compaction
    # (candidate_utilities picks both; this times the underlying batch)
    from activegs_tpu.mapping.trainer import pick_entry_bucket, pick_subset_bucket

    max_ents, max_iv = (
        int(x)
        for x in cp._candidate_entry_stats(
            state, jnp.asarray(cands), jnp.asarray(intr), (res, res), cfg, rcfg
        )
    )
    eb = pick_entry_bucket(max_ents)
    sb = pick_subset_bucket(max_iv, cap_b)
    print(f"measured: entries {max_ents} -> budget {eb}; in-view {max_iv} -> subset {sb}")

    run_c = lambda st: cp._confidence_utility_batch(
        st,
        vstate.unexplored,
        jnp.asarray(cands),
        jnp.asarray(intr),
        jnp.asarray(valid),
        depth_range,
        grid,
        (res, res),
        cfg,
        rcfg,
        entry_budget=eb,
        subset_bucket=sb,
    )
    t = timed(run_c, state)
    print(f"utility batch compacted      : {t:7.1f} ms  ({t/n_cand:5.2f} ms/cand)")

    # render-only portion
    attrs = gm.attrs_of(state, cfg)

    @jax.jit
    def render_only(means):
        a = dataclasses.replace(attrs, means=means)

        def one(ext):
            out, _ = render_view(
                a, Camera(extrinsic=ext, intrinsic=jnp.asarray(intr)), (res, res), rcfg
            )
            return jnp.sum(out.rgb)

        return jnp.sum(jax.lax.map(one, jnp.asarray(cands)))

    t = timed(render_only, attrs.means)
    print(f"render-only          : {t:7.1f} ms  ({t/n_cand:5.2f} ms/cand)")

    # per-candidate compaction variant (bucket fixed at 65536)
    bucket = 65536
    packed = pack_attrs(attrs)

    @jax.jit
    def render_compact(means):
        a = dataclasses.replace(attrs, means=means)
        pk = pack_attrs(a)

        def one(ext):
            cam = Camera(extrinsic=ext, intrinsic=jnp.asarray(intr))
            _, _, _, iv = rp.preprocess(a, cam, (res, res), rcfg)
            sel, selv, inv, _n = compact_in_view(iv, bucket)
            a_v = subset_view(pk, (sel, selv, inv))
            out, _ = render_view(a_v, cam, (res, res), rcfg)
            return jnp.sum(out.rgb)

        return jnp.sum(jax.lax.map(one, jnp.asarray(cands)))

    t = timed(render_compact, attrs.means)
    print(f"render compacted(64k): {t:7.1f} ms  ({t/n_cand:5.2f} ms/cand)")


if __name__ == "__main__":
    main()
