"""Scan rasterizer tile/chunk/max_dup configs on the real-TPU bench workload.

Times `trainer.train_keyframe` (the bench hot program: 10 steps x 8 views at
512^2, 200k surfels, mission-parity subset bucketing) for each candidate
RasterConfig and prints one JSON line per config. First run of a new config
pays a Mosaic compile (minutes); the persistent cache makes re-runs cheap.

Usage: python scripts/tile_scan.py '[ [32,32,128,4], [16,16,128,8] ]'
       (each entry: [tile_h, tile_w, chunk, max_dup])
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from activegs_tpu import runtime  # noqa: E402

runtime.setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench as B  # noqa: E402
from activegs_tpu.mapping import gaussians as gm  # noqa: E402
from activegs_tpu.mapping import trainer  # noqa: E402
from activegs_tpu.render.types import RasterConfig  # noqa: E402


def main():
    configs = json.loads(sys.argv[1]) if len(sys.argv) > 1 else [
        [32, 32, 128, 4],
        [16, 32, 128, 8],
        [16, 16, 128, 8],
        [8, 16, 128, 16],
    ]
    res = int(os.environ.get("BENCH_RES", 512))
    n_gauss = int(os.environ.get("BENCH_GAUSSIANS", 200_000))
    steps = int(os.environ.get("BENCH_STEPS", 10))
    cfg = gm.MapConfig(capacity=1 << 19, batch_size=8, optimization_steps=steps, unroll_views=True)
    state0, buf = B.build_scene(res, n_gauss, cfg)
    cap_b = gm.bucket_capacity(n_gauss, cfg.capacity)
    state0 = gm.slice_state(state0, cap_b)

    for th, tw, chunk, max_dup in configs:
        rcfg = RasterConfig(tile_h=th, tile_w=tw, chunk=chunk, max_dup=max_dup)
        try:
            max_iv, _ = (
                int(x)
                for x in trainer.keyframe_view_stats(
                    state0, buf, jax.random.PRNGKey(0), cfg, rcfg
                )
            )
            sb = trainer.pick_subset_bucket(max_iv, cap_b)
            run = lambda s, k: trainer.train_keyframe(
                s, buf, k, cfg, rcfg, steps=steps, subset_bucket=sb
            )
            t_c0 = time.perf_counter()
            s1, _, loss, aux = run(state0, jax.random.PRNGKey(99))
            float(s1.means[12345, 0])
            compile_s = time.perf_counter() - t_c0
            times = []
            for i in range(3):
                s_in = dataclasses.replace(
                    state0, means=state0.means + jnp.float32(1e-6) * (i + 1)
                )
                t0 = time.perf_counter()
                s1, _, loss, aux = run(s_in, jax.random.PRNGKey(i))
                float(s1.means[12345, 0])
                times.append(time.perf_counter() - t0)
            t = min(times)
            rays = steps * 8 * res * res
            print(
                json.dumps(
                    {
                        "tile": [th, tw],
                        "chunk": chunk,
                        "max_dup": max_dup,
                        "subset_bucket": sb,
                        "rays_per_s": rays / t,
                        "ms_per_step": 1e3 * t / steps,
                        "num_dropped": int(aux["num_dropped"]),
                        "loss": float(loss),
                        "compile_s": compile_s,
                    }
                ),
                flush=True,
            )
        except Exception as e:  # keep scanning past Mosaic rejections
            print(
                json.dumps(
                    {"tile": [th, tw], "chunk": chunk, "max_dup": max_dup,
                     "error": repr(e)[:200]}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
