import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

from activegs_tpu import runtime

runtime.setup_cache()

import jax
import jax.numpy as jnp
import numpy as np

N = 262144
B = 32768
ITERS = 50

rng = np.random.default_rng(0)
rows = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
cols = rows.T.copy()
idx = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
idxN = jnp.asarray(rng.integers(0, B, N).astype(np.int32))
gB_rows = jnp.asarray(rng.normal(size=(B, 16)).astype(np.float32))
gB_cols = gB_rows.T.copy()


def timed(name, make_fn, *args):
    """make_fn(*args) -> (init_acc, body(i, acc)). Times ITERS fori_loop
    iterations; the body must depend on i so LICM can't hoist it."""
    def outer(*a):
        init, body = make_fn(*a)
        return jax.lax.fori_loop(0, ITERS, body, init)

    f = jax.jit(outer)
    o = f(*args)
    float(jnp.asarray(o).reshape(-1)[0])
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        o = f(*args)
        float(jnp.asarray(o).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {(best - 0.031)/ITERS*1e3:8.3f} ms", flush=True)


def shift_idx(i, ix, n):
    j = ix + i
    return jnp.where(j < n, j, j - n)


# 1/2: forward-style gathers (B rows/cols out of N)
timed(
    "row gather (N,16)[idxB] -> (B,16)",
    lambda x, ix: (
        jnp.zeros((B, 16), jnp.float32),
        lambda i, a: a + x[shift_idx(i, ix, N)],
    ),
    rows, idx,
)
timed(
    "col gather (16,N)[:,idxB] -> (16,B)",
    lambda x, ix: (
        jnp.zeros((16, B), jnp.float32),
        lambda i, a: a + x[:, shift_idx(i, ix, N)],
    ),
    cols, idx,
)
# 3/4: VJP-style expansion gathers (N rows/cols out of B)
timed(
    "row gather (B,16)[idxN] -> (N,16)",
    lambda x, ix: (
        jnp.zeros((N, 16), jnp.float32),
        lambda i, a: a + x[shift_idx(i, ix, B)],
    ),
    gB_rows, idxN,
)
timed(
    "col gather (16,B)[:,idxN] -> (16,N)",
    lambda x, ix: (
        jnp.zeros((16, N), jnp.float32),
        lambda i, a: a + x[:, shift_idx(i, ix, B)],
    ),
    gB_cols, idxN,
)
# 5/6: elementwise add layout cost
timed("add (N,16)", lambda x: (x, lambda i, a: a + 1.0), rows)
timed("add (16,N)", lambda x: (x, lambda i, a: a + 1.0), cols)

# 7/8: 24-col entry-style gathers
rows24 = jnp.asarray(rng.normal(size=(N, 24)).astype(np.float32))
cols24 = rows24.T.copy()
E = 98048 + 1024
idxE = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
timed(
    "row gather (N,24)[idxE] -> (E,24)",
    lambda x, ix: (
        jnp.zeros((E, 24), jnp.float32),
        lambda i, a: a + x[shift_idx(i, ix, N)],
    ),
    rows24, idxE,
)
timed(
    "col gather (24,N)[:,idxE] -> (24,E)",
    lambda x, ix: (
        jnp.zeros((24, E), jnp.float32),
        lambda i, a: a + x[:, shift_idx(i, ix, N)],
    ),
    cols24, idxE,
)
# 9: transpose (E,24)->(24,E)
gE = jnp.asarray(rng.normal(size=(E, 24)).astype(np.float32))
timed(
    "transpose (E,24) -> (24,E)",
    lambda x: (
        jnp.zeros((24, E), jnp.float32),
        lambda i, a: a + (x + i.astype(jnp.float32)).T,
    ),
    gE,
)
