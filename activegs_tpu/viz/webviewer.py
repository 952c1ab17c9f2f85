"""Live web viewer: browser-based interactive mission monitoring.

Closes the interactivity gap with the reference's live Open3D GUI
(`visualization/gui.py:38-1031`: fly-cam, channel selector, voxel toggles,
screenshots) and the OpenGL splat viewer
(`visualization/gl_render/render_ogl.py:64-133`) without an OpenGL stack —
right for a headless TPU host: a tiny in-process HTTP server streams the
render-channel panels and voxel top view to any browser, with

  * live polling of the latest keyframe panel + voxel map + mission stats,
  * a fly-cam: the browser posts pose offsets (WASD/arrow semantics) and the
    server renders the requested novel view on demand from the live map,
  * channel selection (rgb / depth / confidence / opacity / normal / d2n),
  * screenshot = right-click save (images are plain PNGs).

Runs in a daemon thread beside the mission loop; renders triggered by the
browser reuse the same jitted render program the mission uses (device
dispatch is serialized by the JAX runtime, so the only cost is latency).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from ..render.types import Camera
from .viewer import _colormap, render_channel_panel, scene_overlay, voxel_top_view

_PAGE = """<!DOCTYPE html>
<html><head><title>active-gs-tpu live viewer</title>
<style>
 body { background: #111; color: #ddd; font-family: monospace; margin: 1em; }
 img { image-rendering: pixelated; border: 1px solid #333; }
 #stats { white-space: pre; color: #8c8; }
 button { margin: 2px; }
</style></head>
<body>
<h3>active-gs-tpu live viewer</h3>
<div id="stats">waiting for mission...</div>
<div>
 <b>latest keyframe panel</b> (rgb | depth | conf / opac | normal | d2n)<br>
 <img id="panel" src="/panel.png" width="768">
</div>
<div style="display:flex; gap:2em">
 <div><b>voxel top view</b><br><img id="voxel" src="/voxel.png" width="320"></div>
 <div><b>scene overlay</b> (exec path | planned | candidates | NBV | frustum)<br>
  <img id="scene" src="/scene.png" width="320"></div>
 <div><b>fly-cam</b> (click image, then WASD move / arrows rotate / QE up-down)<br>
  <img id="fly" src="/fly.png" width="384" tabindex="0"><br>
  channel: <select id="chan">
   <option>rgb</option><option>depth</option><option>confidence</option>
   <option>opacity</option><option>normal</option><option>d2n</option>
  </select>
  <button onclick="resetFly()">reset pose</button><br>
  conf &ge; <input type="range" id="confmin" min="0" max="1" step="0.05"
   value="0" style="width:100px">
  scale &times; <input type="range" id="scalemod" min="0.1" max="2" step="0.1"
   value="1" style="width:100px"><span id="svals"></span><br>
  <button onclick="fetch('/record_pose'+flyUrl().slice(8)).then(r=>r.json())
    .then(s=>{document.getElementById('rec').textContent=s.count+' recorded';})">
    record pose</button>
  <a href="/poses.json" style="color:#8c8" id="rec">0 recorded</a>
 </div>
</div>
<script>
let dx=0, dy=0, dz=0, yaw=0, pitch=0;
function resetFly(){ dx=dy=dz=yaw=pitch=0; refreshFly(); }
function flyUrl(){
  const cm = document.getElementById('confmin').value;
  const sm = document.getElementById('scalemod').value;
  document.getElementById('svals').textContent = ` (${cm} / ${sm})`;
  return `/fly.png?dx=${dx}&dy=${dy}&dz=${dz}&yaw=${yaw}&pitch=${pitch}` +
         `&conf_min=${cm}&scale_mod=${sm}` +
         `&chan=${document.getElementById('chan').value}&t=${Date.now()}`;
}
document.getElementById('confmin').addEventListener('change', refreshFly);
document.getElementById('scalemod').addEventListener('change', refreshFly);
function refreshFly(){ document.getElementById('fly').src = flyUrl(); }
document.getElementById('fly').addEventListener('keydown', (e) => {
  const s = 0.15, r = 0.1;
  if (e.key === 'w') dz += s; if (e.key === 's') dz -= s;
  if (e.key === 'a') dx -= s; if (e.key === 'd') dx += s;
  if (e.key === 'q') dy -= s; if (e.key === 'e') dy += s;
  if (e.key === 'ArrowLeft') yaw -= r; if (e.key === 'ArrowRight') yaw += r;
  if (e.key === 'ArrowUp') pitch -= r; if (e.key === 'ArrowDown') pitch += r;
  refreshFly(); e.preventDefault();
});
document.getElementById('chan').addEventListener('change', refreshFly);
setInterval(() => {
  document.getElementById('panel').src = '/panel.png?t=' + Date.now();
  document.getElementById('voxel').src = '/voxel.png?t=' + Date.now();
  document.getElementById('scene').src = '/scene.png?t=' + Date.now();
  fetch('/stats.json').then(r => r.json()).then(s => {
    document.getElementById('stats').textContent = JSON.stringify(s, null, 1);
  });
}, 2000);
</script>
</body></html>
"""


def _filter_attrs_impl(a, cm, sm):
    """Fly-cam render filter (`gui.py:836-873`): hide gaussians below the
    confidence threshold, scale every surfel by the slider factor."""
    import dataclasses

    return dataclasses.replace(
        a,
        valid=a.valid & (a.confidences >= cm),
        scales=a.scales * sm,
    )


def _filter_attrs(attrs, conf_min, scale_mod):
    import jax

    global _filter_attrs_jit
    if _filter_attrs_jit is None:
        _filter_attrs_jit = jax.jit(_filter_attrs_impl)
    return _filter_attrs_jit(attrs, conf_min, scale_mod)


_filter_attrs_jit = None


def _png_bytes(img: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


class WebViewer:
    """Drop-in `viewer` for IncrementalMapper: `on_step` caches the latest
    panels; a daemon HTTP server serves them plus on-demand fly-cam renders."""

    def __init__(self, port: int = 8787, shape=(256, 256), host: str = "127.0.0.1"):
        self.shape = shape
        self._lock = threading.Lock()
        self._panel: bytes | None = None
        self._voxel: bytes | None = None
        self._scene: bytes | None = None
        self._stats: dict = {}
        self._exec_path: list = []
        self._poses: list = []  # GUI-recorded fly-cam poses (4x4 lists)
        self._mapper = None
        self._base_pose: np.ndarray | None = None
        self._intrinsic = None
        self._depth_range = (0.0, 5.0)

        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _send(self, code, ctype, body: bytes):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                try:
                    url = urlparse(self.path)
                    if url.path == "/":
                        self._send(200, "text/html", _PAGE.encode())
                    elif url.path == "/stats.json":
                        with viewer._lock:
                            body = json.dumps(viewer._stats).encode()
                        self._send(200, "application/json", body)
                    elif url.path == "/panel.png":
                        with viewer._lock:
                            img = viewer._panel
                        if img is None:
                            self._send(404, "text/plain", b"no panel yet")
                        else:
                            self._send(200, "image/png", img)
                    elif url.path == "/voxel.png":
                        with viewer._lock:
                            img = viewer._voxel
                        if img is None:
                            self._send(404, "text/plain", b"no voxel view yet")
                        else:
                            self._send(200, "image/png", img)
                    elif url.path == "/scene.png":
                        with viewer._lock:
                            img = viewer._scene
                        if img is None:
                            self._send(404, "text/plain", b"no scene view yet")
                        else:
                            self._send(200, "image/png", img)
                    elif url.path == "/fly.png":
                        q = {k: v[0] for k, v in parse_qs(url.query).items()}
                        body = viewer._render_fly(q)
                        if body is None:
                            self._send(404, "text/plain", b"mission not started")
                        else:
                            self._send(200, "image/png", body)
                    elif url.path == "/record_pose":
                        # GUI-driven pose recording (`gui.py:836-963`): the
                        # current fly-cam pose appends to a downloadable list
                        q = {k: v[0] for k, v in parse_qs(url.query).items()}
                        n = viewer._record_pose(q)
                        if n is None:
                            self._send(404, "text/plain", b"mission not started")
                        else:
                            self._send(
                                200,
                                "application/json",
                                json.dumps({"count": n}).encode(),
                            )
                    elif url.path == "/poses.json":
                        with viewer._lock:
                            body = json.dumps(viewer._poses).encode()
                        self._send(200, "application/json", body)
                    else:
                        self._send(404, "text/plain", b"not found")
                except BrokenPipeError:
                    pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    # ---- mapper hook ----

    def on_step(self, mapper, frame, path, stats) -> None:
        cam = Camera(extrinsic=frame["extrinsic"], intrinsic=frame["intrinsic"])
        panel = render_channel_panel(
            mapper.gm_state,
            mapper.map_cfg,
            cam,
            self.shape,
            mapper.raster_cfg,
            depth_range=tuple(np.asarray(frame["depth_range"]).tolist()),
        )
        top = voxel_top_view(mapper.vm_state, mapper.grid, mapper.voxel_cfg)
        self._exec_path.append(np.asarray(frame["extrinsic"][:3, 3], np.float32))
        planner = mapper.planner
        scene = scene_overlay(
            mapper.vm_state,
            mapper.grid,
            mapper.voxel_cfg,
            exec_path=np.stack(self._exec_path),
            planned_path=np.asarray(path) if path is not None else None,
            candidates=getattr(planner, "last_candidates", None),
            nbv=getattr(planner, "last_nbv", None),
            camera=cam,
        )
        with self._lock:
            self._mapper = mapper
            self._base_pose = np.asarray(frame["extrinsic"], np.float32)
            self._intrinsic = frame["intrinsic"]
            self._depth_range = tuple(np.asarray(frame["depth_range"]).tolist())
            self._panel = _png_bytes(panel)
            self._voxel = _png_bytes(top)
            self._scene = _png_bytes(scene)
            self._stats = dict(stats)

    # ---- fly-cam ----

    def _fly_pose(self, q: dict) -> np.ndarray | None:
        """Fly-cam extrinsic from pose-offset query params (None before the
        first mission step)."""
        with self._lock:
            base = self._base_pose
        if base is None:
            return None
        dx = float(q.get("dx", 0)); dy = float(q.get("dy", 0))
        dz = float(q.get("dz", 0))
        yaw = float(q.get("yaw", 0)); pitch = float(q.get("pitch", 0))
        ext = base.copy()
        # camera-frame translation (x right, y down, z forward — OpenCV)
        ext[:3, 3] += ext[:3, :3] @ np.array([dx, dy, dz], np.float32)
        cy, sy = np.cos(yaw), np.sin(yaw)
        cp, sp = np.cos(pitch), np.sin(pitch)
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
        rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]], np.float32)
        ext[:3, :3] = ext[:3, :3] @ ry @ rx
        return ext

    def _record_pose(self, q: dict) -> int | None:
        ext = self._fly_pose(q)
        if ext is None:
            return None
        with self._lock:
            self._poses.append(np.asarray(ext, np.float64).tolist())
            return len(self._poses)

    def _render_fly(self, q: dict) -> bytes | None:
        with self._lock:
            mapper = self._mapper
            intr = self._intrinsic
            depth_range = self._depth_range
        ext = self._fly_pose(q)
        if mapper is None or ext is None:
            return None
        chan = q.get("chan", "rgb")

        from ..mapping import gaussians as gm
        from ..render.renderer import render_view

        attrs = gm.attrs_of(mapper.gm_state, mapper.map_cfg)
        # live-render confidence-threshold filter + scale modifier
        # (`gui.py:836-873` parity). One jitted helper, scalars passed as
        # arrays — new jit programs are ~30-100 s remote compiles on axon.
        conf_min = float(q.get("conf_min", 0))
        scale_mod = float(q.get("scale_mod", 1))
        if conf_min > 0 or scale_mod != 1.0:
            import jax.numpy as jnp

            attrs = _filter_attrs(
                attrs, jnp.float32(conf_min), jnp.float32(scale_mod)
            )
        cam = Camera(extrinsic=ext, intrinsic=intr)
        out, _ = render_view(attrs, cam, self.shape, mapper.raster_cfg)
        if chan == "depth":
            img = _colormap(np.asarray(out.depth[0]), *depth_range)
        elif chan == "confidence":
            img = _colormap(np.asarray(out.confidence[0]), 0, 1)
        elif chan == "opacity":
            img = _colormap(np.asarray(out.opacity[0]), 0, 1)
        elif chan == "normal":
            img = 0.5 * (np.asarray(out.normal).transpose(1, 2, 0) + 1.0)
        elif chan == "d2n":
            from ..core.image_ops import depth_to_normal

            d2n = np.asarray(
                depth_to_normal(out.depth[0], out.opacity[0] > 1e-2, intr)
            )
            img = 0.5 * (d2n + 1.0)
        else:
            img = np.clip(np.asarray(out.rgb).transpose(1, 2, 0), 0, 1)
        return _png_bytes((np.clip(img, 0, 1) * 255).astype(np.uint8))

    def close(self):
        self._server.shutdown()
        self._server.server_close()
