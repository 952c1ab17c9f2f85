"""A/B the subtile-packing flag: keyframe prep (binning incl. the packed
layout's second placement sort) vs per-step train cost (kernels, gathers,
loss, Adam), at the bench shape. Explains where the bench delta between
BENCH_PACK=0/1 comes from.

Timing per CLAUDE.md: ITERS iterations inside one jit, subtract ~31 ms
dispatch, perturb inputs, fence with a host scalar pull.
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
import optax

import bench as B
from activegs_tpu.mapping import gaussians as gm
from activegs_tpu.mapping import keyframes as kf
from activegs_tpu.mapping import trainer
from activegs_tpu.render.renderer import (
    build_combine_plan,
    compact_in_view,
    pack_attrs,
    prepare_view_bins,
    subset_view,
)
from activegs_tpu.render import preprocess as rp
from activegs_tpu.render.types import Camera, RasterConfig

ITERS = 10
DISPATCH_MS = 31.0


def timed_ms(fn, *args):
    fn(*args)  # warm
    best = 1e9
    for r in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) * 1000.0)
    return max(best - DISPATCH_MS, 0.0)


def main():
    res = 512
    cfg = gm.MapConfig(
        capacity=1 << 19, batch_size=8, optimization_steps=10, unroll_views=True
    )
    state, buf = B.build_scene(res, 200_000, cfg)
    cap_b = gm.bucket_capacity(200_000, cfg.capacity)
    state = gm.slice_state(state, cap_b)
    key = jax.random.PRNGKey(0)
    params = trainer._params_of(state)
    opt = trainer.make_optimizer(cfg)

    for tag, raster_cfg in (
        ("plain", RasterConfig()),
        ("pack", RasterConfig(subtile_packing=True)),
    ):
        max_iv, max_ents = (
            int(x)
            for x in trainer.keyframe_view_stats(state, buf, key, cfg, raster_cfg)
        )
        sb = trainer.pick_subset_bucket(max_iv, cap_b)
        eb = trainer.pick_entry_bucket(max_ents)
        print(f"[{tag}] in-view {max_iv} -> subset {sb}; entries {max_ents} -> budget {eb}")

        _, k1 = jax.random.split(key)
        ids = kf.sample_weighted(buf, k1, cfg.batch_size, cfg.active_size)
        batch = jax.tree.map(jnp.asarray, kf.decode_frames(buf, ids))
        h, w = batch[0].shape[-2:]
        attrs0 = gm.attrs_of(state, cfg)
        packed0 = pack_attrs(attrs0)

        @jax.jit
        def prep(eps):
            def prep_one(c):
                cam = Camera(extrinsic=c[0], intrinsic=c[1])
                _, _, _, iv = rp.preprocess(attrs0, cam, (h, w), raster_cfg)
                sel, selv, inv, _n = compact_in_view(iv, sb)
                attrs_v = subset_view(packed0, (sel, selv, inv))
                attrs_v = dataclasses.replace(attrs_v, means=attrs_v.means + eps)
                bins_v = prepare_view_bins(
                    attrs_v, cam, (h, w), raster_cfg, entry_budget=eb
                )
                return sel, selv, inv, bins_v

            sels, selvs, invs, bins = jax.lax.map(prep_one, (batch[2], batch[3]))
            plan = build_combine_plan(sels, selvs, invs, attrs0.num)
            return sels, selvs, invs, bins, plan

        t_prep = timed_ms(prep, jnp.float32(0.0))
        # second call with perturbed input (memoization guard)
        t_prep = min(t_prep, timed_ms(prep, jnp.float32(1e-7)))
        print(f"[{tag}] prep (8-view subset+bins, once/keyframe): {t_prep:7.1f} ms")

        sels, selvs, invs, bins, plan = jax.tree.map(jnp.asarray, prep(jnp.float32(0)))
        subsets = (sels, selvs, invs, plan)
        opt_state = opt.init(params)

        def full_step(eps, params, opt_state):
            def body(i, c):
                p, o = c
                p = jax.tree.map(lambda x: x + eps * (i + 1).astype(x.dtype), p)
                (loss, _pf), grads = jax.value_and_grad(
                    trainer.batch_loss, has_aux=True
                )(p, state, batch, cfg, raster_cfg, bins, subsets)
                updates, o2 = opt.update(grads, o, p)
                return optax.apply_updates(p, updates), o2

            p2, _ = jax.lax.fori_loop(0, ITERS, body, (params, opt_state))
            return sum(x.ravel()[0] for x in jax.tree.leaves(p2))

        jitted = jax.jit(full_step)
        t_step = timed_ms(jitted, jnp.float32(1e-9), params, opt_state) / ITERS
        print(f"[{tag}] train step (vg + adam, frozen bins):      {t_step:7.2f} ms/step")


if __name__ == "__main__":
    main()
