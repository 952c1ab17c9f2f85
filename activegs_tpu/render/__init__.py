from .types import Camera, RasterConfig, GaussianAttrs, RenderOutput  # noqa: F401
from .renderer import render_view, render_stats  # noqa: F401
