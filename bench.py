"""Benchmark: differentiable-rasterizer training throughput (rays/s, fwd+bwd).

Runs the reference workload shape (BASELINE.md: 10 Adam iterations x 8-view
batch at 512x512 per keyframe, `config/mapper/incremental.yaml:18,24`) on a
realistic surfel count and reports rays/s through the full train step
(render all channels + 4-term loss + backward + Adam update).

vs_baseline normalizes against 2.0e8 rays/s — an estimate of the reference
CUDA tile rasterizer's fwd+bwd throughput on its tested single-GPU platform
(BASELINE.json `published` is empty; 3DGS-class rasterizers land at
~1-2 ms/512^2 view fwd+bwd on consumer GPUs => ~1.3-5e8 rays/s).

Single-chip roofline (v5e, bench shape: 512^2 x 8 views x 10 steps, 200k
surfels, subset bucket 32768, entry budget 65536; measured r3-r4):

  pairs/step   318.7M = 622,464 K-aligned entry slots x 512 px/tile.
               (Real entries 418,359; the 33% padding is structural —
               Mosaic DMA slices must be 128-lane aligned, so every
               tile segment rounds up to K=128.)
  VPU rates    mul 4.79 / add 5.54 / fma 4.84 / cmp+sel 8.33 / exp 4.06
               Tops/s f32 (scripts/microbench_vpu.py, op-counted).
  fwd kernel   ~44 VPU ops/pair -> 2.9 ms ALU floor; measured 6.9 ms
               (7.3 before the approx-reciprocal change).
  bwd kernel   ~66 VPU ops/pair + 128 MXU MACs/pair (triangular suffix
               matmul, HIGHEST) -> ~4.3 ms VPU + ~2.5 ms MXU floor;
               measured 13.6 ms.
  gathers      5.6 ms measured, AT the per-index floor (~4.2 ns/idx,
               layout- and row-count-independent past the u16 detour).
  glue         ~10.7 ms measured: loss-pipeline tail 3.4, IDLE 2.6,
               relayouts 2.3, reduce_sum 1.1, binning sort 0.8.

The ~2.5x kernel gap over the pure-ALU floor is pipeline structure, not
op count: a ~1 us fixed cost per chunk-iteration (DMA wait + loop
overhead; measured-by-difference, consistent across BOTH kernels over
their 4,863 chunk-iterations/step) plus cross-sublane scan shifts.
Structural redesigns measured and rejected: MXU moment sums (r2), bf16
pair math (r2: 33.8 vs 37.6 Mrays/s), two-subtile packing (r3: 55.1 ->
51.3), fused multi-view dispatch (r4: 56.2 -> 49.2; IDLE barely moved,
so per-view launch gaps are NOT the IDLE source), chunk=256 (r4: +57%
padded pairs for -21% chunk count — a wash by both cost models);
explicit approx-reciprocal+NR landed +1% (r4: 55.6 -> 56.2).

Per-chip ceiling GIVEN this measured structure: kernels ~20.5 + gathers
5.4 + irreducible glue ~3 = ~29 ms/step = ~72 Mrays/s. The committed
round-4 driver artifact is 55.1 Mrays/s (BENCH_r04.json) — the repo's
headline number; in-session runs of identical code spread ~+-3%
(54.3-56.8 observed, BASELINE.md), so the step sits 1.25-1.3x off the
ceiling, the residual itemized above (loss tail / IDLE / relayouts).
The 2.0e8 vs_baseline constant is the cross-architecture CUDA-class
reference, NOT this per-chip ceiling; the TPU-native scale axis is the
view/candidate mesh (bench.py --scaling).

Prints ONE JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_RAYS_PER_S = 2.0e8


def scaling_bench():
    """Scaling-efficiency harness (BASELINE.md north star: >=80% rays/s at
    1 -> N devices). Measures the sharded train step at every power-of-two
    mesh size the visible devices allow and prints one JSON line per size
    with efficiency vs the 1-device run.

    On the single real TPU chip this honestly degenerates to n=1; run with
    BENCH_SCALING_CPU=1 to validate the harness itself on a virtual
    8-device CPU mesh (relative numbers only — Pallas runs interpreted on
    CPU, so efficiencies there validate plumbing, not ICI).  Real
    multi-chip efficiency needs a TPU slice (v5e-8 or larger), which this
    machine does not expose."""
    if os.environ.get("BENCH_SCALING_CPU"):
        from activegs_tpu import runtime

        runtime.force_cpu(8)

    results = run_scaling(
        res=int(os.environ.get("BENCH_RES", 128)),
        n_gauss=int(os.environ.get("BENCH_GAUSSIANS", 4096)),
        steps=int(os.environ.get("BENCH_STEPS", 2)),
    )
    for line in results:
        print(json.dumps(line))
    return results


def run_scaling(res=128, n_gauss=4096, steps=2):
    """Measure sharded-train rays/s at mesh sizes 1,2,4,... Returns a list
    of result dicts (also used by tests on the virtual CPU mesh)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from activegs_tpu.core import geometry as geo
    from activegs_tpu.core import quaternions as quat
    from activegs_tpu.mapping import gaussians as gm
    from activegs_tpu.mapping import trainer
    from activegs_tpu.parallel import make_view_mesh, sharded_train_step
    from activegs_tpu.render.types import RasterConfig

    n_dev = len(jax.devices())
    sizes = []
    s = 1
    while s <= min(n_dev, 8):
        sizes.append(s)
        s *= 2

    cfg = gm.MapConfig(capacity=max(512, 1 << (n_gauss - 1).bit_length()))
    raster_cfg = RasterConfig(
        interpret=jax.default_backend() != "tpu"
    )
    rng = np.random.default_rng(0)
    state = gm.init_state(cfg)
    normals = rng.normal(size=(n_gauss, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    q, _ = quat.normal_to_quaternion(jnp.asarray(normals))
    state = dataclasses.replace(
        state,
        means=state.means.at[:n_gauss].set(
            jnp.asarray(rng.uniform(-1, 1, (n_gauss, 3)).astype(np.float32))
            + jnp.asarray([0.0, 0.0, 2.0])
        ),
        rotations_raw=state.rotations_raw.at[:n_gauss].set(q),
        colors=state.colors.at[:n_gauss].set(
            jnp.asarray(rng.uniform(0, 1, (n_gauss, 3)).astype(np.float32))
        ),
        opacities_raw=state.opacities_raw.at[:n_gauss].set(1.0),
        count=jnp.int32(n_gauss),
    )
    params = trainer._params_of(state)
    v = 8  # view batch, divisible by every mesh size
    rgb = jnp.asarray(rng.uniform(0, 1, (v, 3, res, res)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1, 3, (v, 1, res, res)).astype(np.float32))
    exts = jnp.tile(jnp.eye(4)[None], (v, 1, 1))
    intrs = jnp.tile(geo.intrinsics_from_fov(60.0, 60.0)[None], (v, 1, 1))
    batch = (rgb, depth, exts, intrs)

    results = []
    base = None
    for n in sizes:
        mesh = make_view_mesh(n)
        step = jax.jit(
            lambda p, b: sharded_train_step(p, state, b, mesh, cfg, raster_cfg)[:2]
        )
        loss, grads = step(params, batch)
        _ = float(loss)  # fence (block_until_ready lies under axon)
        times = []
        for i in range(max(2, steps)):
            b2 = (rgb + jnp.float32(1e-6) * (i + 1), depth, exts, intrs)
            t0 = time.perf_counter()
            loss, grads = step(params, b2)
            _ = float(loss)
            times.append(time.perf_counter() - t0)
        t = min(times)
        rays = v * res * res
        rps = rays / t
        base = rps if base is None else base
        results.append(
            {
                "metric": "scaling_train_rays_per_s",
                "mesh_devices": n,
                "value": rps,
                "unit": "rays/s",
                "efficiency_vs_1dev": rps / (base * n),
                "backend": jax.default_backend(),
            }
        )
    return results


def build_scene(res, n_gauss, cfg, opacity_raw=1.0):
    """Synthetic but realistic bench scene: camera-facing surfels filling a
    6x5x3 room shell + an 8-keyframe ring looking at the walls. Returns
    (state, buf). Shared by bench main() and perf-scan scripts.

    opacity_raw: pre-activation opacity (sigmoid). The default 1.0
    (op=0.73) matches a mid-mission map; 5.0 (op=0.993) models a CONVERGED
    map where front surfels saturate transmittance and chunk-granular early
    termination fires (BENCH_OPAQUE=1; the CUDA baseline's biggest lever
    on real scenes, `gau_frag.glsl:20-26`)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from activegs_tpu.core import geometry as geo
    from activegs_tpu.core import quaternions as quat
    from activegs_tpu.mapping import gaussians as gm
    from activegs_tpu.mapping import keyframes as kf
    from activegs_tpu.planning.paths import rotation_from_z

    rng = np.random.default_rng(0)
    state = gm.init_state(cfg)
    pts = np.zeros((n_gauss, 3), np.float32)
    face = rng.integers(0, 5, n_gauss)
    r2 = rng.uniform(0, 1, (n_gauss, 2))
    dims = np.array([6.0, 5.0, 3.0])
    for f in range(5):
        m = face == f
        axis = f % 3
        side = f // 3
        p = np.zeros((m.sum(), 3))
        other = [a for a in range(3) if a != axis]
        p[:, other[0]] = r2[m, 0] * dims[other[0]]
        p[:, other[1]] = r2[m, 1] * dims[other[1]]
        p[:, axis] = side * dims[axis]
        pts[m] = p
    normals = np.zeros((n_gauss, 3), np.float32)
    for f in range(5):
        m = face == f
        axis = f % 3
        side = f // 3
        normals[m, axis] = 1.0 - 2.0 * side
    q, _ = quat.normal_to_quaternion(jnp.asarray(normals))
    scales_raw = np.zeros((n_gauss, 3), np.float32)
    scales_raw[:, 2] = -20.0
    state = dataclasses.replace(
        state,
        means=state.means.at[:n_gauss].set(jnp.asarray(pts)),
        rotations_raw=state.rotations_raw.at[:n_gauss].set(q),
        scales_raw=state.scales_raw.at[:n_gauss].set(jnp.asarray(scales_raw)),
        opacities_raw=state.opacities_raw.at[:n_gauss].set(opacity_raw),
        colors=state.colors.at[:n_gauss].set(
            jnp.asarray(rng.uniform(0, 1, (n_gauss, 3)).astype(np.float32))
        ),
        count=jnp.int32(n_gauss),
    )

    buf = kf.init_buffer(8, res, res)
    intr = geo.intrinsics_from_fov(60.0, 60.0)
    center = dims / 2
    for i in range(8):
        ang = 2 * np.pi * i / 8
        look = np.array([np.cos(ang), np.sin(ang), 0.05])
        e = np.eye(4, dtype=np.float32)
        e[:3, :3] = rotation_from_z(look)[0]
        e[:3, 3] = center
        frame = {
            "rgb": jnp.asarray(rng.uniform(0, 1, (3, res, res)).astype(np.float32)),
            "depth": jnp.asarray(
                rng.uniform(1.0, 4.0, (1, res, res)).astype(np.float32)
            ),
            "extrinsic": jnp.asarray(e),
            "intrinsic": intr,
            "depth_range": jnp.asarray([0.0, 5.0]),
        }
        buf = kf.add_frame(buf, frame)
    return state, buf


def term_probe(state, buf, map_cfg, raster_cfg, res):
    """Chunk-granular early-termination telemetry on keyframe 0: (chunks
    available, chunks processed, tiles that terminated early, mean final
    transmittance). One extra fwd-only program (remote-compiled once)."""
    import jax
    import jax.numpy as jnp

    from activegs_tpu.mapping import gaussians as gm
    from activegs_tpu.render import composite_pallas as cp
    from activegs_tpu.render import renderer as R
    from activegs_tpu.render.types import Camera

    attrs = gm.attrs_of(state, map_cfg)
    cam = Camera(extrinsic=buf.extrinsics[0], intrinsic=buf.intrinsics[0])
    shape = (res, res)
    num_tiles, ntx = R._kernel_static(shape, raster_cfg)

    @jax.jit
    def run(attrs):
        entries, b, *_ = R._prepare_entries(attrs, cam, shape, raster_cfg, False)
        out = cp.composite_tiled(
            entries, b.tile_start, b.tile_len, (num_tiles, ntx, raster_cfg)
        )
        stop = out[:, cp.ROW_STOP, 0]
        nch = jnp.ceil(b.tile_len / raster_cfg.chunk)
        trans = out[:, cp.ROW_TRANS, :]
        return (
            jnp.sum(nch),
            jnp.sum(stop),
            jnp.sum(stop < nch),
            jnp.mean(trans),
        )

    avail, done, term, mt = (float(x) for x in run(attrs))
    return {
        "chunks_available": int(avail),
        "chunks_processed": int(done),
        "tiles_terminated_early": int(term),
        "num_tiles": num_tiles,
        "mean_final_transmittance": round(mt, 4),
    }


def main():
    from activegs_tpu import runtime

    runtime.setup_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from activegs_tpu.mapping import gaussians as gm
    from activegs_tpu.mapping import trainer
    from activegs_tpu.render.types import RasterConfig

    res = int(os.environ.get("BENCH_RES", 512))
    n_gauss = int(os.environ.get("BENCH_GAUSSIANS", 200_000))
    steps = int(os.environ.get("BENCH_STEPS", 10))
    batch = 8

    cfg = gm.MapConfig(
        capacity=1 << 19,
        batch_size=batch,
        optimization_steps=steps,
        unroll_views=True,
    )
    def env_flag(name, default=""):
        # "0" disables: any(-non-empty) truthiness made BENCH_XTP=0 enable
        return os.environ.get(name, default) not in ("", "0")

    raster_cfg = RasterConfig(
        bf16_pairs=env_flag("BENCH_BF16"),
        # default ON (matches RasterConfig; on-chip validated, perf-neutral)
        cross_tile_prefetch=env_flag("BENCH_XTP", "1"),
    )

    import dataclasses

    # BENCH_OPAQUE=1: converged-map variant (op=0.993) where transmittance
    # saturates and chunk-level early termination fires (VERDICT r3 #3)
    opaque = env_flag("BENCH_OPAQUE")
    state, buf = build_scene(res, n_gauss, cfg, opacity_raw=5.0 if opaque else 1.0)

    # match the mission loop: heavy programs run on the live-count bucket,
    # and each view trains its compacted in-view subset (mapper.step parity)
    cap_b = gm.bucket_capacity(n_gauss, cfg.capacity)
    state = gm.slice_state(state, cap_b)
    # budgets must cover every batch the timed/warm-up keys will sample
    # (subset under-coverage drops gaussians silently, unlike entry drops)
    bench_keys = (99, 0, 1, 2)
    stats = [
        trainer.keyframe_view_stats(
            state, buf, jax.random.PRNGKey(k), cfg, raster_cfg
        )
        for k in bench_keys
    ]
    max_in_view = max(int(s[0]) for s in stats)
    max_entries = max(int(s[1]) for s in stats)
    subset_bucket = trainer.pick_subset_bucket(max_in_view, cap_b)
    entry_budget = trainer.pick_entry_bucket(max_entries)

    run = lambda s, b, k: trainer.train_keyframe(
        s,
        b,
        k,
        cfg,
        raster_cfg,
        steps=steps,
        subset_bucket=subset_bucket,
        entry_budget=entry_budget,
    )

    def perturbed(i):
        # unique inputs per call: the serving stack memoizes identical
        # (executable, input) executions, which would fake the timing
        return dataclasses.replace(
            state, means=state.means + jnp.float32(1e-6) * (i + 1)
        )

    def materialize(s):
        # this serving stack's block_until_ready does not actually block;
        # pulling a value to the host is the only honest fence
        return float(s.means[12345, 0])

    # warm up (compile)
    s1, b1, _, _aux = run(perturbed(-1), buf, jax.random.PRNGKey(99))
    materialize(s1)

    import contextlib

    # BENCH_PROFILE=<dir> captures a jax.profiler trace of the timed runs
    # (inspect with tensorboard / xprof; SURVEY §5 tracing commitment)
    prof_dir = os.environ.get("BENCH_PROFILE")
    prof = jax.profiler.trace(prof_dir) if prof_dir else contextlib.nullcontext()
    times = []
    with prof:
        for i in range(3):
            t0 = time.perf_counter()
            s1, b1, _, _aux = run(perturbed(i), buf, jax.random.PRNGKey(i))
            materialize(s1)
            times.append(time.perf_counter() - t0)
    t = min(times)

    rays = steps * batch * res * res
    rays_per_s = rays / t
    line = {
        "metric": "train_rays_per_s_fwd_bwd",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / BASELINE_RAYS_PER_S,
    }
    if opaque:
        line["variant"] = "opaque"
        line["term_stats"] = term_probe(state, buf, cfg, raster_cfg, res)
    print(json.dumps(line))


if __name__ == "__main__":
    if os.environ.get("BENCH_SCALING") or "--scaling" in sys.argv:
        scaling_bench()
    else:
        main()
