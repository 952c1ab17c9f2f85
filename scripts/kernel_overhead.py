"""Measure the per-tile FIXED cost of the composite kernels.

Runs the fwd/bwd kernels on the bench-shaped entry stream twice: once with
the real tile_len and once with tile_len=0 everywhere (empty tiles -> no
chunk loop iterations). The empty-tile time is pure per-tile overhead
(grid step + out write + DMA bookkeeping); the difference is pair math.

Timing per CLAUDE.md: >=20 iterations inside one jit, subtract ~31 ms
dispatch, fence by pulling a scalar.
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
from activegs_tpu.render import composite_pallas as cp
from activegs_tpu.render import preprocess as pp
from activegs_tpu.render import binning
from activegs_tpu.render.renderer import _prepare_entries, _tile_grid
from activegs_tpu.render.types import Camera, RasterConfig

ITERS = 20
DISPATCH_MS = 31.0


def timed(fn, *args):
    fn(*args)  # warm
    t0 = time.perf_counter()
    out = fn(*args)
    fence = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) * 1000.0
    return max(dt - DISPATCH_MS, 0.0) / ITERS, fence


def main():
    res = 512
    cfg = gm.MapConfig(capacity=1 << 18, batch_size=8)
    raster_cfg = RasterConfig()
    state, buf = B.build_scene(res, 200_000, cfg)
    attrs = gm.attrs_of(state, cfg)
    cam = Camera(extrinsic=buf.extrinsics[0], intrinsic=buf.intrinsics[0])
    ntx, nty = _tile_grid((res, res), raster_cfg)
    num_tiles = ntx * nty
    static = (num_tiles, ntx, raster_cfg)

    @jax.jit
    def prep():
        entries, b, _, _, _ = _prepare_entries(
            attrs, cam, (res, res), raster_cfg, False, None
        )
        return jax.lax.stop_gradient(entries), b.tile_start, b.tile_len

    entries, tile_start, tile_len = jax.tree.map(jnp.asarray, prep())
    e_count = int(jnp.sum(tile_len))
    print(f"tiles={num_tiles} entries={entries.shape} sum(len)={e_count}")

    def loop(fn):
        @jax.jit
        def run(entries, ts, tl):
            def body(i, acc):
                out = fn(entries + acc * 1e-20, ts, tl)
                return acc + out.ravel()[0]

            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        return run

    fwd = loop(lambda e, ts, tl: cp.composite_tiled(e, ts, tl, static))
    t_real, _ = timed(fwd, entries, tile_start, tile_len)
    t_empty, _ = timed(fwd, entries, tile_start, jnp.zeros_like(tile_len))
    print(f"fwd real  {t_real:7.3f} ms/view")
    print(f"fwd empty {t_empty:7.3f} ms/view  ({t_empty/num_tiles*1000:.2f} us/tile fixed)")

    # bwd via grad of a scalar readout
    def scalar(e, ts, tl):
        out = cp.composite_tiled(e, ts, tl, static)
        return jnp.sum(out[:, :9, :] * 1e-3), out

    gfn = jax.grad(scalar, has_aux=True)
    bwd = loop(lambda e, ts, tl: gfn(e, ts, tl)[0])
    t_breal, _ = timed(bwd, entries, tile_start, tile_len)
    t_bempty, _ = timed(bwd, entries, tile_start, jnp.zeros_like(tile_len))
    print(f"fwd+bwd real  {t_breal:7.3f} ms/view")
    print(f"fwd+bwd empty {t_bempty:7.3f} ms/view ({t_bempty/num_tiles*1000:.2f} us/tile fixed both)")


if __name__ == "__main__":
    main()
