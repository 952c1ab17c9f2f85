"""Generate the committed golden rasterizer fixtures (tests/fixtures/).

Renders the DENSE oracle (render/dense.py) at pinned seeds and saves images,
per-gaussian stats, and parameter gradients to an npz. tests/test_render.py's
TestGolden asserts the tiled Pallas path matches these frozen values, so
perf rewrites of binning/compositing cannot silently drift the contract
(the contract itself is pinned against the CUDA rasterizer's call surface,
`/root/reference/utils/operations.py:645-720`).

Run on CPU: JAX_PLATFORMS handling is done via jax.config (axon ignores the
env var).  Regenerate ONLY on a deliberate contract change.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "golden_render.npz"
)


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_render import CFG, _loss_fn, make_attrs, make_camera

    from activegs_tpu.render.dense import render_dense
    from activegs_tpu.render.types import GaussianAttrs, RenderOutput

    attrs = make_attrs(96, seed=1)
    cam = make_camera()
    shape = (64, 64)
    rng = np.random.default_rng(17)
    mask = jnp.asarray((rng.uniform(size=shape) > 0.3).astype(np.float32))

    ref = render_dense(
        attrs, cam, shape, CFG, front_only=False, render_mask=mask, weight_thres=0.03
    )

    key = jax.random.PRNGKey(0)
    names = ["means", "scales", "rotations", "opacities", "colors"]

    def loss(*floats):
        a = GaussianAttrs(
            **{
                **{k: getattr(attrs, k) for k in attrs.__dataclass_fields__},
                **dict(zip(names, floats)),
            }
        )

        def rd(a_):
            r = render_dense(a_, cam, shape, CFG)
            return (
                RenderOutput(
                    rgb=r["rgb"],
                    depth=r["depth"],
                    normal=r["normal"],
                    opacity=r["opacity"],
                    confidence=r["confidence"],
                ),
                None,
            )

        return _loss_fn(rd, a, key)

    args = tuple(getattr(attrs, n) for n in names)
    grads = jax.grad(loss, argnums=tuple(range(5)))(*args)

    data = {
        "rgb": np.asarray(ref["rgb"]),
        "depth": np.asarray(ref["depth"]),
        "normal": np.asarray(ref["normal"]),
        "opacity": np.asarray(ref["opacity"]),
        "confidence": np.asarray(ref["confidence"]),
        "importance": np.asarray(ref["importance"]),
        "count": np.asarray(ref["count"]),
        "mask": np.asarray(mask),
    }
    for n, g in zip(names, grads):
        data[f"grad_{n}"] = np.asarray(g)

    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez_compressed(FIXTURE, **data)
    print(f"wrote {FIXTURE} ({os.path.getsize(FIXTURE) / 1024:.1f} KB)")


if __name__ == "__main__":
    main()
