"""Measure the VPU's sustained f32 elementwise throughput per primitive.

Calibrates the roofline in ROOFLINE.md: the compositor kernels' op mix is
mostly f32 mul/add/fma with a few exp/div/compare per pair, so the kernel
floor is (ops/pair x pairs) / the rates printed here.

Methodology fixes over microbench_bf16.py (whose (256, 512) block spills
VREGs and under-reports peak ~3x): the working set is a (128, 128) f32
block (16 VREGs — resident), the chain x = x*c1 + c0 has a 16-issue-slot
dependency distance (hides FMA latency), and each program runs ROUNDS
serial rounds so the grid amortizes program overhead. Timing per
CLAUDE.md: value fence, perturbed inputs, best-of-3, ~31 ms dispatch
subtracted explicitly (device time = total - 31 ms, clamped).
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

SUB, LANE = 128, 128  # 16 VREGs: resident, no spills
ROUNDS = 4096
GRID = 256
DISPATCH_MS = 31.0


def kernel(x_ref, o_ref, *, op):
    x = x_ref[0]
    c1 = jnp.float32(1.000001)
    c0 = jnp.float32(1e-7)

    if op == "fma":
        body = lambda i, v: v * c1 + c0  # 2 ops/el/round
        ops_per_round = 2
    elif op == "mul":
        body = lambda i, v: v * c1  # 1
        ops_per_round = 1
    elif op == "add":
        body = lambda i, v: v + c0  # 1
        ops_per_round = 1
    elif op == "cmpsel":
        body = lambda i, v: jnp.where(v > c0, v * c1, v)  # cmp+sel+mul = 3
        ops_per_round = 3
    elif op == "exp":
        body = lambda i, v: jnp.exp(-v) + c0  # count exp as 1 + neg + add
        ops_per_round = 3
    elif op == "div":
        body = lambda i, v: c1 / (v + c0)  # div as 1 + add
        ops_per_round = 2
    else:
        raise ValueError(op)

    y = jax.lax.fori_loop(0, ROUNDS, body, x)
    o_ref[0] = y
    kernel.ops_per_round = ops_per_round


OPS_PER_ROUND = {"fma": 2, "mul": 1, "add": 1, "cmpsel": 3, "exp": 3, "div": 2}


def run(op):
    f = pl.pallas_call(
        functools.partial(kernel, op=op),
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((1, SUB, LANE), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, SUB, LANE), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((GRID, SUB, LANE), jnp.float32),
    )
    x = jnp.full((GRID, SUB, LANE), 0.5, jnp.float32)
    g = jax.jit(lambda x: f(x))
    y = g(x)
    _ = float(y[0, 0, 0])
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter()
        y = g(x + 1e-6 * (i + 1))
        _ = float(y[0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    dev_ms = max(best * 1000 - DISPATCH_MS, 1e-3)
    ops = GRID * SUB * LANE * ROUNDS * OPS_PER_ROUND[op]
    rate = ops / (dev_ms / 1000) / 1e12
    print(
        f"{op:7s}: total {best*1000:7.2f} ms, device ~{dev_ms:7.2f} ms, "
        f"{rate:5.2f} Tops/s ({OPS_PER_ROUND[op]} ops/el/round)"
    )
    return rate


if __name__ == "__main__":
    for op in ("fma", "mul", "add", "cmpsel", "exp", "div"):
        run(op)
