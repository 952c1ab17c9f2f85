"""Break the bench train step (512^2, 200k surfels, 8 views, subset bucket)
into phases: render fwd, render fwd+bwd (trivial loss), full loss fwd,
full value_and_grad, Adam. Timing per CLAUDE.md: ITERS iterations inside one
jit via fori_loop, subtract ~31 ms dispatch, fence with a host scalar pull.
"""

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
    compact_in_view,
    pack_attrs,
    prepare_view_bins,
    subset_view,
    render_view,
)
from activegs_tpu.render.types import Camera, RasterConfig

ITERS = 10
DISPATCH_MS = 31.0


def timed(fn, *args):
    fn(*args)  # warm
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) * 1000.0)
    return max(best - DISPATCH_MS, 0.0) / ITERS


def loop(fn, n=ITERS):
    """Run fn(perturb) n times inside one jit, chaining a scalar through the
    input so iterations cannot be collapsed."""

    @jax.jit
    def run(*args):
        def body(i, acc):
            out = fn(acc * 1e-20, *args)
            return acc + jax.tree.leaves(out)[0].ravel()[0]

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    return run


def main():
    res = 512
    cfg = gm.MapConfig(capacity=1 << 19, batch_size=8, optimization_steps=10, unroll_views=True)
    raster_cfg = RasterConfig()
    state, buf = B.build_scene(res, 200_000, cfg)
    cap_b = gm.bucket_capacity(200_000, cfg.capacity)
    state = gm.slice_state(state, cap_b)
    key = jax.random.PRNGKey(0)
    max_iv, _ = (
        int(x) for x in trainer.keyframe_view_stats(state, buf, key, cfg, raster_cfg)
    )
    sb = trainer.pick_subset_bucket(max_iv, cap_b)
    print(f"capacity bucket {cap_b}, max in-view {max_iv}, subset bucket {sb}")

    # replicate the frozen-bins prep exactly as train_keyframe does
    key2, k1 = jax.random.split(key)
    max_iv2, max_ents = (
        int(x) for x in trainer.keyframe_view_stats(state, buf, key, cfg, raster_cfg)
    )
    eb = trainer.pick_entry_bucket(max_ents)
    print(f"entry budget {eb} (max entries {max_ents})")
    ids = kf.sample_weighted(buf, k1, cfg.batch_size, cfg.active_size)
    batch = jax.tree.map(jnp.asarray, kf.decode_frames(buf, ids))
    h, w = batch[0].shape[-2:]
    attrs0 = gm.attrs_of(state, cfg)
    packed0 = pack_attrs(attrs0)

    from activegs_tpu.render import preprocess as rp
    from activegs_tpu.render.renderer import build_combine_plan

    @jax.jit
    def prep():
        def prep_one(c):
            cam = Camera(extrinsic=c[0], intrinsic=c[1])
            _, _, _, iv = rp.preprocess(attrs0, cam, (h, w), raster_cfg)
            sel, selv, inv, _n = compact_in_view(iv, sb)
            attrs_v = subset_view(packed0, (sel, selv, inv))
            bins_v = prepare_view_bins(
                attrs_v, cam, (h, w), raster_cfg, entry_budget=eb
            )
            return sel, selv, inv, bins_v

        sels, selvs, invs, bins = jax.lax.map(prep_one, (batch[2], batch[3]))
        plan = build_combine_plan(sels, selvs, invs, attrs0.num)
        return sels, selvs, invs, bins, plan

    t0 = time.perf_counter()
    sels, selvs, invs, bins, plan = jax.tree.map(jnp.asarray, prep())
    t_prep = (time.perf_counter() - t0) * 1000.0
    subsets = (sels, selvs, invs, plan)
    params = trainer._params_of(state)
    print(f"prep (8-view subset+bins, once/keyframe): {t_prep:.1f} ms incl dispatch")

    # ---- phase: full train step (value_and_grad + adam) --------------------
    opt = trainer.make_optimizer(cfg)
    opt_state = opt.init(params)

    def full_step(eps, params, opt_state):
        p = jax.tree.map(lambda x: x + eps, params)
        (loss, per_frame), grads = jax.value_and_grad(
            trainer.batch_loss, has_aux=True
        )(p, state, batch, cfg, raster_cfg, bins, subsets)
        updates, opt_state2 = opt.update(grads, opt_state, p)
        params2 = optax.apply_updates(p, updates)
        # chain every updated param through the output so nothing is DCE'd
        return loss + sum(x.ravel()[0] for x in jax.tree.leaves(params2))

    t = timed(loop(full_step), params, opt_state)
    print(f"full step (loss+grad+adam): {t:7.2f} ms/step")

    # ---- phase: value_and_grad only ---------------------------------------
    def vg_only(eps, params):
        p = jax.tree.map(lambda x: x + eps, params)
        (loss, _), grads = jax.value_and_grad(trainer.batch_loss, has_aux=True)(
            p, state, batch, cfg, raster_cfg, bins, subsets
        )
        return loss + sum(x.ravel()[0] for x in jax.tree.leaves(grads))

    t_vg = timed(loop(vg_only), params)
    print(f"value_and_grad only:        {t_vg:7.2f} ms/step")

    # ---- phase: loss forward only -----------------------------------------
    def fwd_only(eps, params):
        p = jax.tree.map(lambda x: x + eps, params)
        loss, _ = trainer.batch_loss(p, state, batch, cfg, raster_cfg, bins, subsets)
        return loss

    t_f = timed(loop(fwd_only), params)
    print(f"loss forward only:          {t_f:7.2f} ms/step")

    # ---- phase: render-only fwd (no loss pipeline) ------------------------
    from activegs_tpu.render.renderer import subset_packed_batch, unpack_attrs

    def render_fwd(eps, params):
        p = jax.tree.map(lambda x: x + eps, params)
        st = trainer._with_params(state, p)
        attrs = gm.attrs_of(st, cfg)
        stacked = subset_packed_batch(pack_attrs(attrs), sels, selvs, plan)

        def one(args):
            ext, intr, b, rows = args
            o, _aux = render_view(
                unpack_attrs(rows),
                Camera(extrinsic=ext, intrinsic=intr),
                (h, w),
                raster_cfg,
                background=jnp.asarray(cfg.background),
                bin_result=b,
            )
            return o

        out = jax.lax.map(one, (batch[2], batch[3], bins, stacked))
        return jnp.sum(out.rgb) * 1e-6

    t_rf = timed(loop(render_fwd), params)
    print(f"render fwd only:            {t_rf:7.2f} ms/step")

    # ---- phase: render fwd+bwd with trivial loss --------------------------
    def render_vg(eps, params):
        p = jax.tree.map(lambda x: x + eps, params)

        def inner(p):
            st = trainer._with_params(state, p)
            attrs = gm.attrs_of(st, cfg)
            stacked = subset_packed_batch(pack_attrs(attrs), sels, selvs, plan)

            def one(args):
                ext, intr, b, rows = args
                o, _aux = render_view(
                    unpack_attrs(rows),
                    Camera(extrinsic=ext, intrinsic=intr),
                    (h, w),
                    raster_cfg,
                    background=jnp.asarray(cfg.background),
                    bin_result=b,
                )
                return o

            out = jax.lax.map(one, (batch[2], batch[3], bins, stacked))
            return (
                jnp.sum(out.rgb) + jnp.sum(out.depth) + jnp.sum(out.normal)
            ) * 1e-6

        g = jax.grad(inner)(p)
        return sum(x.ravel()[0] for x in jax.tree.leaves(g))

    t_rvg = timed(loop(render_vg), params)
    print(f"render fwd+bwd (sum loss):  {t_rvg:7.2f} ms/step")

    print("---- derived ----")
    print(f"loss pipeline fwd:          {t_f - t_rf:7.2f} ms/step")
    print(f"loss pipeline fwd+bwd:      {t_vg - t_rvg:7.2f} ms/step")
    print(f"adam:                       {t - t_vg:7.2f} ms/step")
    print(f"render bwd alone:           {t_rvg - t_rf:7.2f} ms/step")


if __name__ == "__main__":
    main()
