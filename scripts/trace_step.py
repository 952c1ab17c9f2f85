"""Capture an xprof trace of the warm bench train step and print the op
ledger (scripts/parse_profile.py). One keyframe program (8 views x 10
steps) traced twice with perturbed inputs; all programs should be warm in
the persistent cache from bench runs.

Usage: python scripts/trace_step.py [trace_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from activegs_tpu import runtime

runtime.setup_cache()

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from activegs_tpu.mapping import gaussians as gm
from activegs_tpu.mapping import trainer
from activegs_tpu.render.types import RasterConfig


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_step"
    cfg = gm.MapConfig(
        capacity=1 << 19, batch_size=8, optimization_steps=10, unroll_views=True
    )
    rcfg = RasterConfig()
    state, buf = B.build_scene(512, 200_000, cfg)
    cap_b = gm.bucket_capacity(200_000, cfg.capacity)
    state = gm.slice_state(state, cap_b)
    keys = (99, 0)
    stats = [
        trainer.keyframe_view_stats(state, buf, jax.random.PRNGKey(k), cfg, rcfg)
        for k in keys
    ]
    sb = trainer.pick_subset_bucket(max(int(s[0]) for s in stats), cap_b)
    eb = trainer.pick_entry_bucket(max(int(s[1]) for s in stats))

    def run(s, k):
        out = trainer.train_keyframe(
            s, buf, jax.random.PRNGKey(k), cfg, rcfg, steps=10,
            subset_bucket=sb, entry_budget=eb,
        )
        return float(out[0].means[12345, 0])  # host fence

    run(state, 99)  # warm
    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        for i in range(2):
            pert = dataclasses.replace(
                state, means=state.means + jnp.float32(1e-6) * (i + 1)
            )
            run(pert, i)
    print(f"traced 2 keyframes (20 steps) in {time.time() - t0:.1f}s -> {trace_dir}")


if __name__ == "__main__":
    main()
