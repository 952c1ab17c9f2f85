"""Why is mission train_keyframe ~8x slower than bench at identical render
shapes? Suspect: the 256-slot keyframe buffer (~1.1 GB loop-carried state).
Times train_keyframe warm with buffer capacity 8 vs 256 at the bench shape.
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

import bench as B
from activegs_tpu.mapping import gaussians as gm
from activegs_tpu.mapping import keyframes as kf
from activegs_tpu.mapping import trainer
from activegs_tpu.render.types import RasterConfig


def main():
    res = 512
    cfg = gm.MapConfig(capacity=1 << 19, batch_size=8, optimization_steps=10, unroll_views=True)
    rcfg = RasterConfig()
    state, buf8 = B.build_scene(res, 200_000, cfg)
    cap_b = gm.bucket_capacity(200_000, cfg.capacity)
    state = gm.slice_state(state, cap_b)

    # copy the 8 frames into a 256-slot buffer (mission keyframe_capacity)
    buf256 = kf.init_buffer(256, res, res)
    import dataclasses

    n = int(buf8.count)
    buf256 = dataclasses.replace(
        buf256,
        rgb=buf256.rgb.at[:n].set(buf8.rgb[:n]),
        depth=buf256.depth.at[:n].set(buf8.depth[:n]),
        extrinsics=buf256.extrinsics.at[:n].set(buf8.extrinsics[:n]),
        intrinsics=buf256.intrinsics.at[:n].set(buf8.intrinsics[:n]),
        count=jnp.int32(n),
    )

    for name, buf in (("kf_cap=8", buf8), ("kf_cap=256", buf256)):
        key = jax.random.PRNGKey(0)
        miv, me = (
            int(x)
            for x in trainer.keyframe_view_stats(state, buf, key, cfg, rcfg)
        )
        sb = trainer.pick_subset_bucket(miv, cap_b)
        eb = trainer.pick_entry_bucket(me)
        run = lambda s, b, k: trainer.train_keyframe(
            s, b, k, cfg, rcfg, steps=10, subset_bucket=sb, entry_budget=eb
        )
        s1, b1, loss, _ = run(state, buf, jax.random.PRNGKey(9))
        _ = float(s1.means[123, 0])
        times = []
        for i in range(3):
            s2 = dataclasses.replace(state, means=state.means + 1e-6 * (i + 1))
            t0 = time.perf_counter()
            s1, b1, loss, _ = run(s2, buf, jax.random.PRNGKey(i))
            _ = float(s1.means[123, 0])
            times.append(time.perf_counter() - t0)
        print(f"{name}: subset={sb} entries={eb} train={min(times)*1000:.0f} ms")


if __name__ == "__main__":
    main()
