"""Is VPU elementwise math 2x faster in bf16 than f32 on this chip?

Decides whether a bf16 pair-math flag in the compositor is worth building.
One Pallas kernel per dtype: R rounds of multiply-add over a (256, 512)
block resident in VMEM (no HBM traffic in the loop), grid of T programs.
Timing per CLAUDE.md: value fence, >=20 inner rounds, subtract ~31 ms
dispatch only implicitly (both variants share it; the RATIO is the answer).
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

from activegs_tpu import runtime

runtime.setup_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROUNDS = 512  # ~68 Gops f32: well above the ~31 ms dispatch floor
SUB, LANE = 256, 512
GRID = 512


def kernel(x_ref, o_ref, *, dtype):
    x = x_ref[0].astype(dtype)
    c1 = jnp.asarray(1.000001, dtype)
    c0 = jnp.asarray(1e-7, dtype)

    def body(i, v):
        return v * c1 + c0

    y = jax.lax.fori_loop(0, ROUNDS, body, x)
    o_ref[0] = y.astype(jnp.float32)


def run(dtype):
    f = pl.pallas_call(
        functools.partial(kernel, dtype=dtype),
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((1, SUB, LANE), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, SUB, LANE), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((GRID, SUB, LANE), jnp.float32),
    )
    x = jnp.ones((GRID, SUB, LANE), jnp.float32)
    g = jax.jit(lambda x: f(x))
    y = g(x)
    _ = float(y[0, 0, 0])
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter()
        y = g(x + 1e-6 * (i + 1))
        _ = float(y[0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    ops = GRID * SUB * LANE * ROUNDS * 2  # mul+add
    print(
        f"{dtype.__name__}: {best*1000:.2f} ms  "
        f"{ops/best/1e12:.2f} Tops/s (incl ~31 ms dispatch)"
    )
    return best


if __name__ == "__main__":
    t32 = run(jnp.float32)
    t16 = run(jnp.bfloat16)
    print(f"ratio f32/bf16 = {t32/t16:.2f}")
