"""Microbench the candidate ops for a sort-based cross-view gradient combine:
row vs lane gathers at the relevant sizes, masked shifted adds, relayouts.
Timing per CLAUDE.md (fori_loop, subtract dispatch, scalar fence).
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

ITERS = 20
DISPATCH_MS = 31.0


def timed(fn, *args):
    fn(*args)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) * 1000.0)
    return max(best - DISPATCH_MS, 0.0) / ITERS


def loop(fn, n=ITERS):
    @jax.jit
    def run(*args):
        def body(i, acc):
            out = fn(acc * 1e-20, *args)
            return acc + jax.tree.leaves(out)[0].ravel()[0]

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    return run


def main():
    rng = np.random.default_rng(0)
    N = 262144
    B = 32768
    V = 8
    VB = V * B
    row = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
    col = jnp.asarray(row.T)
    idx_vb = jnp.asarray(rng.integers(0, N, VB).astype(np.int32))
    idx_n = jnp.asarray(rng.integers(0, VB, N).astype(np.int32))
    idx_b = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
    flat_col = jnp.asarray(rng.normal(size=(16, VB)).astype(np.float32))
    flat_row = jnp.asarray(flat_col.T)
    m1 = jnp.asarray(rng.random(VB) < 0.3)
    m2 = jnp.asarray(rng.random(VB) < 0.2)
    m3 = jnp.asarray(rng.random(VB) < 0.1)

    t = timed(loop(lambda e, x: x[idx_b, :] + e), row)
    print(f"row gather B={B}:        {t:6.3f} ms")
    t = timed(loop(lambda e, x: x[:, idx_b] + e), col)
    print(f"lane gather B={B}:       {t:6.3f} ms")
    t = timed(loop(lambda e, x: x[idx_vb, :] + e), row)
    print(f"row gather VB={VB}:    {t:6.3f} ms")
    t = timed(loop(lambda e, x: x[:, idx_vb] + e), col)
    print(f"lane gather VB={VB}:   {t:6.3f} ms")
    t = timed(loop(lambda e, x: x[idx_n, :] + e), flat_row)
    print(f"row gather N={N}:      {t:6.3f} ms")
    t = timed(loop(lambda e, x: x[:, idx_n] + e), flat_col)
    print(f"lane gather N={N}:     {t:6.3f} ms")

    # masked shifted adds, (VB, 16) sublane-shift variant
    def seg_row(e, x):
        v = x + e
        for m, k in ((m1, 1), (m2, 2), (m3, 4)):
            sh = jnp.concatenate([v[k:], jnp.zeros((k, 16), v.dtype)], axis=0)
            v = v + jnp.where(m[:, None], sh, 0.0)
        return v

    t = timed(loop(seg_row), flat_row)
    print(f"3 masked adds (VB,16): {t:6.3f} ms")

    # masked shifted adds, (16, VB) lane-shift variant
    def seg_col(e, x):
        v = x + e
        for m, k in ((m1, 1), (m2, 2), (m3, 4)):
            sh = jnp.concatenate([v[:, k:], jnp.zeros((16, k), v.dtype)], axis=1)
            v = v + jnp.where(m[None, :], sh, 0.0)
        return v

    t = timed(loop(seg_col), flat_col)
    print(f"3 masked adds (16,VB): {t:6.3f} ms")

    # relayout (V,16,B) -> (16, VB)
    stacked = jnp.asarray(rng.normal(size=(V, 16, B)).astype(np.float32))
    t = timed(loop(lambda e, x: (x + e).transpose(1, 0, 2).reshape(16, VB)), stacked)
    print(f"(V,16,B)->(16,VB):     {t:6.3f} ms")
    t = timed(
        loop(lambda e, x: (x + e).transpose(0, 2, 1).reshape(VB, 16)), stacked
    )
    print(f"(V,16,B)->(VB,16):     {t:6.3f} ms")

    # dense accumulate add at (N,16) vs (16,N)
    t = timed(loop(lambda e, x: x + x[::-1] + e), row)
    print(f"(N,16) add:            {t:6.3f} ms")
    t = timed(loop(lambda e, x: x + x[:, ::-1] + e), col)
    print(f"(16,N) add:            {t:6.3f} ms")


if __name__ == "__main__":
    main()
