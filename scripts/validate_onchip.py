"""On-chip (real TPU, interpret=False) validation of the tiled rasterizer.

Interpret-mode tests cannot model Mosaic DMA races; this script is the
hardware gate for kernel changes that touch DMA slot wiring — in particular
`RasterConfig.cross_tile_prefetch` (composite_pallas._fwd_kernel), whose
failure mode would be silent image corruption. Run it after ANY change to
the kernels' DMA structure, before trusting bench numbers.

Checks:
  A. small scene (64x64, 96 surfels): tiled path vs the dense oracle
     (render/dense.py) — all 5 channels AND parameter gradients — for
     cross_tile_prefetch in (off, on); the two xtp variants must also be
     BITWISE identical (they evaluate the same math in the same order;
     any difference is a DMA race).
  B. mission scale (512^2, 200k surfels, the bench scene): the full
     train_keyframe program (8 views x 10 steps, fwd+bwd+Adam):
       - xtp on vs off — all parameter leaves BITWISE identical, repeated
         with perturbed inputs (races are intermittent; 80 renders per
         repeat give them surface area).

Prints one PASS/FAIL line per check and exits non-zero on failure.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from activegs_tpu import runtime  # noqa: E402

runtime.setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

FAILURES = []


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'} {name} {detail}")
    if not ok:
        FAILURES.append(name)


def make_small_attrs(n=96, seed=1):
    """Same generator as tests/test_render.make_attrs (kept standalone)."""
    from activegs_tpu.core import quaternions as quat
    from activegs_tpu.render.types import GaussianAttrs

    rng = np.random.default_rng(seed)
    means = np.stack(
        [
            rng.uniform(-0.8, 0.8, n),
            rng.uniform(-0.8, 0.8, n),
            rng.uniform(1.0, 3.0, n),
        ],
        axis=1,
    ).astype(np.float32)
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    toward = means / np.linalg.norm(means, axis=1, keepdims=True)
    normals[np.sum(normals * toward, axis=1) > 0] *= -1
    q, _ = quat.normal_to_quaternion(jnp.asarray(normals))
    scales = np.stack(
        [rng.uniform(0.05, 0.15, n), rng.uniform(0.05, 0.15, n), np.full(n, 1e-6)],
        axis=1,
    ).astype(np.float32)
    return GaussianAttrs(
        means=jnp.asarray(means),
        scales=jnp.asarray(scales),
        rotations=q,
        opacities=jnp.asarray(rng.uniform(0.3, 0.9, n).astype(np.float32)),
        colors=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        confidences=jnp.asarray(rng.uniform(0, 1, n).astype(np.float32)),
        valid=jnp.ones((n,), bool),
    )


def small_scene_checks():
    from activegs_tpu.core import geometry as geo
    from activegs_tpu.render.dense import render_dense
    from activegs_tpu.render.renderer import render_view
    from activegs_tpu.render.types import Camera, RasterConfig

    # interpret=None auto-detects: compiled on TPU (the point of this
    # script), interpreted under --allow-cpu debugging
    cfg0 = RasterConfig(sigma_extent=3.5, max_dup=16, entry_budget_mult=20.0)
    attrs = make_small_attrs()
    cam = Camera(extrinsic=jnp.eye(4), intrinsic=geo.intrinsics_from_fov(60.0, 60.0))
    shape = (64, 64)
    rng = np.random.default_rng(7)
    wr = {
        k: jnp.asarray(rng.normal(size=(c, *shape)).astype(np.float32))
        for k, c in (("rgb", 3), ("depth", 1), ("normal", 3), ("opacity", 1), ("confidence", 1))
    }

    def loss_tiled(attrs, cfg):
        out, _ = render_view(attrs, cam, shape, cfg)
        return sum(jnp.sum(getattr(out, k) * wr[k]) for k in wr)

    def loss_dense(attrs):
        ref = render_dense(attrs, cam, shape, cfg0)
        return sum(jnp.sum(ref[k] * wr[k]) for k in wr)

    grad_leaves = ("means", "scales", "rotations", "opacities", "colors")

    def grads_of(fn, *a):
        g = jax.grad(
            lambda at: fn(at, *a) if a else fn(at),
            allow_int=True,
        )(attrs)
        return {k: np.asarray(getattr(g, k)) for k in grad_leaves}

    t0 = time.time()
    ref = render_dense(attrs, cam, shape, cfg0)
    gref = grads_of(loss_dense)
    variants = {
        "seq": dataclasses.replace(cfg0, cross_tile_prefetch=False),
        "xtp": dataclasses.replace(cfg0, cross_tile_prefetch=True),
    }
    outs, grads = {}, {}
    for tag, cfg in variants.items():
        out, _ = render_view(attrs, cam, shape, cfg)
        outs[tag] = {k: np.asarray(getattr(out, k)) for k in wr}
        grads[tag] = grads_of(loss_tiled, cfg)
        for k in wr:
            atol = 1e-4 if k == "depth" else 2e-5
            err = float(np.abs(outs[tag][k] - np.asarray(ref[k])).max())
            check(f"small/{tag}/{k} vs oracle", err <= atol, f"maxerr={err:.2e}")
        for k in grad_leaves:
            scale = max(1.0, float(np.abs(gref[k]).max()))
            err = float(np.abs(grads[tag][k] - gref[k]).max()) / scale
            check(f"small/{tag}/grad_{k} vs oracle", err <= 2e-4, f"relerr={err:.2e}")
    for k in wr:
        check(
            f"small/bitwise out {k} (xtp vs seq)",
            np.array_equal(outs["xtp"][k], outs["seq"][k]),
        )
    for k in grad_leaves:
        check(
            f"small/bitwise grad {k} (xtp vs seq)",
            np.array_equal(grads["xtp"][k], grads["seq"][k]),
        )
    print(f"  small-scene block took {time.time() - t0:.1f}s")


def mission_scale_check(repeats=3):
    import bench
    from activegs_tpu.mapping import gaussians as gm
    from activegs_tpu.mapping import trainer
    from activegs_tpu.render.types import RasterConfig

    res, n_gauss, steps = 512, 200_000, 10
    cfg = gm.MapConfig(
        capacity=1 << 19, batch_size=8, optimization_steps=steps, unroll_views=True
    )
    state, buf = bench.build_scene(res, n_gauss, cfg)
    cap_b = gm.bucket_capacity(n_gauss, cfg.capacity)
    state = gm.slice_state(state, cap_b)
    keys = (99, 0, 1, 2)

    def budgets(rcfg):
        stats = [
            trainer.keyframe_view_stats(state, buf, jax.random.PRNGKey(k), cfg, rcfg)
            for k in keys
        ]
        return (
            trainer.pick_subset_bucket(max(int(s[0]) for s in stats), cap_b),
            trainer.pick_entry_bucket(max(int(s[1]) for s in stats)),
        )

    budget_cache = {}

    def run(rcfg, i):
        if "b" not in budget_cache:
            budget_cache["b"] = budgets(rcfg)
        subset_bucket, entry_budget = budget_cache["b"]
        s = dataclasses.replace(state, means=state.means + jnp.float32(1e-6) * (i + 1))
        s1, _, loss, _ = trainer.train_keyframe(
            s,
            buf,
            jax.random.PRNGKey(i),
            cfg,
            rcfg,
            steps=steps,
            subset_bucket=subset_bucket,
            entry_budget=entry_budget,
        )
        return {
            "loss": np.asarray(loss),
            **{k: np.asarray(getattr(s1, k)) for k in trainer.PARAM_FIELDS},
        }

    for i in range(repeats):
        t0 = time.time()
        a = run(RasterConfig(cross_tile_prefetch=False), i)
        b = run(RasterConfig(cross_tile_prefetch=True), i)
        ok = all(np.array_equal(a[k], b[k]) for k in a)
        bad = [k for k in a if not np.array_equal(a[k], b[k])]
        check(
            f"mission/bitwise train_keyframe rep{i} (xtp on vs off)",
            ok,
            f"({time.time() - t0:.1f}s)" + (f" diff={bad}" if bad else ""),
        )


def main():
    backend = jax.default_backend()
    if backend != "tpu" and "--allow-cpu" not in sys.argv:
        print(f"refusing to run on backend={backend}: this is the HARDWARE gate "
              "(interpret mode cannot model DMA races). Pass --allow-cpu to debug.")
        sys.exit(2)
    small_scene_checks()
    if "--quick" not in sys.argv:
        mission_scale_check()
    if FAILURES:
        print(f"FAILED: {len(FAILURES)} checks: {FAILURES}")
        sys.exit(1)
    print("ALL ON-CHIP CHECKS PASSED")


if __name__ == "__main__":
    main()
