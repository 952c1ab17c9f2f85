"""Shared datatypes for the TPU surfel rasterizer.

The rasterizer re-implements the capability of the reference's external CUDA
package `diff_gaussian_rasterization_2d` (call surface pinned at
`utils/operations.py:645-720`) as a TPU-native pipeline:

  1. preprocess (pure jnp, differentiable): project surfels, EWA covariance,
     surfel plane parameters — per (view, gaussian),
  2. binning (XLA): clamp tile spans, expand to (tile, gaussian) entries,
     one uint32 key sort per view, K-aligned per-tile segments,
  3. composite (Pallas): per-tile front-to-back alpha blending over entry
     chunks — VPU for alpha evaluation, MXU for the channel accumulation —
     with a hand-written backward kernel (custom_vjp).

Channel set matches `utils/operations.py:703`: rgb, normal, depth, opacity,
confidence per pixel; importance, count, radii per gaussian.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

# ---- entry parameter layout (rows of the (PARAM_DIM, E) entry array) ----
P_MEAN_X = 0
P_MEAN_Y = 1
P_CONIC_A = 2
P_CONIC_B = 3
P_CONIC_C = 4
P_OPACITY = 5
P_COLOR_R = 6
P_COLOR_G = 7
P_COLOR_B = 8
P_NRM_X = 9
P_NRM_Y = 10
P_NRM_Z = 11
P_PLANE_A = 12  # depth plane: t(u, v) = D / (A*u + B*v + C), u/v in pixels
P_PLANE_B = 13
P_PLANE_C = 14
P_PLANE_D = 15
P_CONF = 16
P_DEPTH_Z = 17  # camera-space center depth (sort key + fallback depth)
P_EXT_X = 18  # per-axis screen extents (AABB of the sigma_extent ellipse);
P_EXT_Y = 19  # binning-only rows, stop-gradiented and ignored by kernels
PARAM_DIM = 24  # padded to a sublane multiple

# ---- output channel layout of the compositor (rows of (OUT_DIM, T, P)) ----
O_R = 0
O_G = 1
O_B = 2
O_NX = 3
O_NY = 4
O_NZ = 5
O_DEPTH = 6
O_CONF = 7
O_TRANS = 8  # final transmittance (opacity = 1 - T)
OUT_DIM = 9

# number of composited feature channels (everything except transmittance)
FEAT_DIM = 8


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A posed pinhole view. extrinsic: OpenCV camera-to-world (4, 4);
    intrinsic: normalized (3, 3) (`simulator/utils.py:13-30`)."""

    extrinsic: jnp.ndarray
    intrinsic: jnp.ndarray


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianAttrs:
    """Activated surfel attributes, the analog of `GaussianMap.get_attr()`
    (`mapping/gaussian_map.py:573-581`). All arrays have leading dim N
    (static capacity); `valid` masks live gaussians."""

    means: jnp.ndarray  # (N, 3) world positions
    scales: jnp.ndarray  # (N, 3) activated scales (third ~ 0 for surfels)
    rotations: jnp.ndarray  # (N, 4) unit quaternions (wxyz)
    opacities: jnp.ndarray  # (N,) in (0, 1)
    colors: jnp.ndarray  # (N, 3) SH0 passthrough colors
    confidences: jnp.ndarray  # (N,) in [0, 1], non-trainable channel
    valid: jnp.ndarray  # (N,) bool

    @property
    def num(self) -> int:
        return self.means.shape[0]


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer configuration (hashable; becomes a jit constant)."""

    # 16x32 tiles bench ~7% faster than 32x32. Earlier this truncated REAL
    # missions (large early surfels exceeding max_dup: dropped 86k -> 259k
    # per keyframe at r2 head), but the per-axis AABB spans (P_EXT_X/Y,
    # exact bbox of the sigma_extent ellipse instead of the circumscribed
    # 3DGS circle-square) shrink elongated-surfel spans enough to make it
    # the default; re-check mission `dropped` telemetry when changing.
    tile_h: int = 16
    tile_w: int = 32
    chunk: int = 128  # entries per compositing chunk (K)
    max_dup: int = 4  # tiles covered per gaussian (dense expansion grid)
    # compact entry budget as a multiple of N: the sort runs on the dense
    # max_dup*N grid, but everything downstream (gather, composite, backward)
    # only touches the first entry_budget_mult*N slots — overflowing tiles
    # lose their tail (reported via num_dropped)
    entry_budget_mult: float = 2.0
    alpha_cut: float = 1.0 / 255.0  # per-sample alpha cutoff (gau_frag.glsl:23)
    alpha_max: float = 0.99  # alpha clamp (gau_frag.glsl:20)
    term_eps: float = 1.0 / 255.0  # early-termination transmittance
    lowpass: float = 0.3  # EWA pixel low-pass (gau_vert.glsl:104-105)
    tan_clamp: float = 1.3  # frustum clamp factor (gau_vert.glsl:86-91)
    near: float = 0.05  # z cull distance
    sigma_extent: float = 3.0  # bbox radius in sigmas (gau_vert.glsl:156)
    # Exact per-candidate tile culling (binning.candidate_tiles): drop a
    # (gaussian, tile) entry when the minimum of the conic quadratic over
    # the tile's pixel-center rect exceeds 2*ln(opacity/alpha_cut) — every
    # pixel the entry could have touched evaluates alpha < alpha_cut, which
    # the compositor zeroes, so outputs are unchanged (only float
    # regrouping at chunk boundaries, ~1e-7). Kills ~9% of bench entries
    # (opacity 0.73); more for freshly spawned op=0.5 mission surfels.
    tile_cull: bool = True
    depth_lo: float = 0.5  # plane-depth clamp, relative to center depth
    depth_hi: float = 2.0
    # bf16 pair math: evaluate the per-(entry, pixel) alpha terms and the
    # transmittance scan in bfloat16. dx/dy are formed in f32 first (screen
    # coords need the mantissa), the depth-plane chain and all accumulators
    # stay f32, reductions accumulate in f32, and compares run on f32
    # upcasts (Mosaic v5e has no bf16 vector compare). Correctness is pinned
    # by tests/test_render.py::TestBf16 (PSNR-convergence parity).
    #
    # MEASURED SLOWER on the v5e bench despite 2.1x raw bf16 VPU throughput
    # (scripts/microbench_bf16.py): 33.8 vs 37.6 Mrays/s — every f32<->bf16
    # cast is a cross-sublane repack ((8,128) vs (16,128) native tiles) and
    # the kernels' mixed-precision seams outnumber the pure mul/add runs
    # bf16 accelerates. Kept as an option for future hardware; default off.
    bf16_pairs: bool = False
    # Backward-kernel suffix sum as one strictly-upper-triangular
    # (K, K) @ (K, P) MXU matmul at HIGHEST precision instead of the
    # ~14-pass Hillis-Steele doubling scan (+2.5% step throughput on the
    # v5e bench; agreement ~1e-7 — the 0/1 mask splits exactly into bf16
    # passes). The transmittance cumprods stay as doubling scans: the
    # log-space matmul form was measured SLOWER (transcendental seams),
    # see composite_pallas._excl_cumprod_total.
    mxu_scan: bool = True
    # Cross-tile first-chunk DMA prefetch in the forward kernel: Pallas TPU
    # grids run sequentially with scratch persisting across grid steps, so
    # program t can start tile t+1's chunk-0 entry DMA (into a dedicated
    # third buffer slot) before finishing — hiding the per-tile first-DMA
    # latency that is otherwise un-overlapped (most tiles have 1-2 chunks).
    # On-chip validation (2026-08, v5e): scripts/validate_onchip.py passed —
    # small-scene oracle parity AND bitwise equality of the full
    # mission-scale train step (3 repeats) with the flag on vs off, so the
    # slot-2 wiring is race-free on hardware. Measured perf-NEUTRAL on the
    # bench (55.83 vs 55.88 Mrays/s): the per-tile chunk-0 stall it hides
    # is already overlapped well enough in practice. Default ON (validated,
    # free); rerun the script after ANY change to the DMA slot wiring —
    # interpret-mode tests do not model DMA races.
    cross_tile_prefetch: bool = True
    # Two-subtile packing (bin at half-width subtiles, pair-interleave the
    # entry layout) was built, on-chip validated, measured NEGATIVE at 1x
    # AND 2x bench density (55.1 -> 51.3 and 31.2 -> 29.7 Mrays/s: the
    # 64-granularity alignment + pair-balance padding double the entry
    # stream), and DELETED in round 4. Full post-mortem: NOTES_ROUNDS r3.
    # Do not rebuild unless per-subtile entry counts grow well past ~128
    # (the padding floor only amortizes there).
    interpret: Optional[bool] = None  # None = auto (interpret off TPU)

    @property
    def tile_pixels(self) -> int:
        return self.tile_h * self.tile_w


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RenderOutput:
    """Per-view render result; the analog of the tuple returned by
    `GaussianRenderer.render_view` (`utils/operations.py:791-826`)."""

    rgb: jnp.ndarray  # (3, h, w)
    depth: jnp.ndarray  # (1, h, w)
    normal: jnp.ndarray  # (3, h, w) camera-space, normalized + masked
    opacity: jnp.ndarray  # (1, h, w) accumulated alpha
    confidence: jnp.ndarray  # (1, h, w)
