"""Interactive viewer: live camera + toggles over HTTP.

The TPU-native analog of the reference's interactive surface (GLFW window
+ ImGui panels + camera manipulator, ref src/main.cpp:200-264 per-frame
input poll, src/sample_gui.cpp:119-206 live RtxState toggles): a render
thread steps the jitted frame function continuously while a tiny stdlib
HTTP server streams the latest frame and feeds mouse/keyboard input back
into the CameraManipulator and the dynamic RenderParams/TonemapParams
(push-constant analog — updates never recompile).

    python -m eidola_tpu.app.viewer --scene cornell --size 256 --port 8812

Endpoints: GET / (canvas UI), GET /frame.png (latest frame),
GET /stats (fps, camera, params), POST /input (orbit/pan/dolly/reset),
POST /param (dynamic RenderParams/TonemapParams fields).
"""
from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..utils.platform import honor_platform_env

honor_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

_PAGE = """<!doctype html>
<html><head><title>eidola_tpu viewer</title><style>
body { background:#111; color:#ddd; font-family:monospace; margin:16px }
#frame { image-rendering:pixelated; border:1px solid #444; cursor:grab }
#bar { margin:8px 0 } button,input { background:#222; color:#ddd;
border:1px solid #555; margin-right:6px }
</style></head><body>
<div id="bar">
 <b>eidola_tpu</b> <span id="stats"></span><br>
 drag = orbit &middot; shift-drag = pan &middot; wheel = dolly &middot;
 <button onclick="post('/input',{type:'reset'})">reset accum</button>
 exposure <input id="expo" type="range" min="-3" max="3" step="0.1"
  value="0" oninput="post('/param',{name:'exposure',
  value:Math.pow(2,this.value)})">
</div>
<img id="frame" draggable="false">
<script>
const img = document.getElementById('frame');
function refresh(){ img.src = '/frame.png?' + Date.now(); }
img.onload = () => setTimeout(refresh, 60);
img.onerror = () => setTimeout(refresh, 400);
refresh();
setInterval(async () => {
  const s = await (await fetch('/stats')).json();
  document.getElementById('stats').textContent =
    ` ${s.scene} ${s.width}x${s.height} frame ${s.frame} ` +
    `${s.fps.toFixed(1)} fps`;
}, 1000);
function post(u, body){ fetch(u, {method:'POST', body:JSON.stringify(body)}); }
let drag = null;
img.onmousedown = e => { drag = [e.clientX, e.clientY, e.shiftKey]; };
window.onmouseup = () => { drag = null; };
window.onmousemove = e => {
  if (!drag) return;
  const dx = e.clientX - drag[0], dy = e.clientY - drag[1];
  drag = [e.clientX, e.clientY, drag[2]];
  post('/input', drag[2] ? {type:'pan', dx:dx, dy:dy}
                         : {type:'orbit', dx:dx, dy:dy});
};
img.onwheel = e => { e.preventDefault();
  post('/input', {type:'dolly', f: e.deltaY > 0 ? 1.1 : 0.9}); };
</script></body></html>"""


class ViewerState:
    """Shared state between the render thread and the HTTP handlers."""

    def __init__(self, scene, cam, cfg, params, tm, manip):
        self.scene = scene
        self.cfg = cfg
        self.params = params
        self.tm = tm
        self.manip = manip
        self.cam = cam
        self.lock = threading.Lock()
        self.png: bytes = b""
        self.frame = 0
        self.fps = 0.0
        self.reset_requested = False
        self.stop = False
        self.scene_name = ""

    def apply_input(self, msg: dict):
        with self.lock:
            t = msg.get("type")
            if t == "orbit":
                self.cam = self.manip.orbit(
                    -float(msg.get("dx", 0)) * 0.008,
                    float(msg.get("dy", 0)) * 0.008,
                )
            elif t == "pan":
                self.cam = self.manip.pan(
                    -float(msg.get("dx", 0)) * 0.002,
                    float(msg.get("dy", 0)) * 0.002,
                )
            elif t == "dolly":
                self.cam = self.manip.dolly(float(msg.get("f", 1.0)))
            elif t == "reset":
                self.reset_requested = True

    def apply_param(self, msg: dict):
        """Dynamic (no-recompile) parameter update — the push-constant
        analog of the reference's GUI sliders (sample_gui.cpp:119-206)."""
        name = msg.get("name")
        value = msg.get("value")
        with self.lock:
            if hasattr(self.tm, name or ""):
                self.tm = self.tm._replace(
                    **{name: jnp.asarray(value, jnp.float32)}
                )
            elif hasattr(self.params, name or ""):
                self.params = self.params._replace(
                    **{name: jnp.asarray(value, jnp.float32)}
                )


def _encode_png(img01: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        (np.clip(img01, 0, 1) * 255).astype(np.uint8)
    ).save(buf, format="PNG")
    return buf.getvalue()


def render_loop(vs: ViewerState):
    """Continuous frame stepping (the while(!glfwWindowShouldClose) loop,
    ref main.cpp:200-264)."""
    from ..render.frame import init_frame_state, make_step, reset_accumulation

    step = make_step(vs.cfg)
    state = init_frame_state(vs.cfg, vs.cam)
    t_last = time.perf_counter()
    while not vs.stop:
        with vs.lock:
            cam = vs.cam
            params = vs.params
            tm = vs.tm
            if vs.reset_requested:
                state = reset_accumulation(state)
                vs.reset_requested = False
        state, out = step(vs.scene, cam, params, tm, state)
        img = np.asarray(out["image"])
        png = _encode_png(img)
        now = time.perf_counter()
        with vs.lock:
            vs.png = png
            vs.frame += 1
            dt = now - t_last
            vs.fps = 0.9 * vs.fps + 0.1 * (1.0 / max(dt, 1e-6))
        t_last = now


def make_handler(vs: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="text/html"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/":
                self._send(200, _PAGE.encode())
            elif path == "/frame.png":
                with vs.lock:
                    png = vs.png
                if png:
                    self._send(200, png, "image/png")
                else:
                    self._send(503, b"rendering first frame")
            elif path == "/stats":
                # scene statistics panel analog (ref sample_gui.cpp:350-383)
                with vs.lock:
                    body = json.dumps({
                        "scene": vs.scene_name,
                        "width": vs.cfg.width,
                        "height": vs.cfg.height,
                        "frame": vs.frame,
                        "fps": vs.fps,
                        "triangles": int(vs.scene.bvh.n_tris),
                        "bvh_nodes": int(vs.scene.bvh.walk.shape[0]),
                        "materials": int(
                            vs.scene.materials.base_color.shape[0]
                        ),
                        "textures": int(vs.scene.textures.data.shape[0]),
                        "punctual_lights": int(vs.scene.lights.num_punc),
                        "emissive_triangles": int(vs.scene.lights.num_trig),
                    }).encode()
                self._send(200, body, "application/json")
            else:
                self._send(404, b"not found")

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                msg = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                self._send(400, b"bad json")
                return
            if self.path == "/input":
                vs.apply_input(msg)
            elif self.path == "/param":
                vs.apply_param(msg)
            else:
                self._send(404, b"not found")
                return
            self._send(200, b"ok", "text/plain")

    return Handler


def serve(argv=None):
    from ..models.scenes import load_scene
    from ..render.config import RenderConfig, default_params, default_tonemap
    from ..scene.camera import CameraManipulator
    from .headless import _pivot_from_cam

    p = argparse.ArgumentParser(prog="eidola_tpu.app.viewer")
    p.add_argument("-f", "--scene", default="cornell")
    p.add_argument("--size", type=int, nargs="+", default=[256])
    p.add_argument("--port", type=int, default=8812)
    p.add_argument("--max-depth", type=int, default=3)
    p.add_argument("--frames", type=int, default=0,
                   help="stop after N frames (0 = run until killed)")
    args = p.parse_args(argv)

    w = args.size[0]
    h = args.size[1] if len(args.size) > 1 else args.size[0]
    scene, cam = load_scene(args.scene)
    cfg = RenderConfig(
        width=w, height=h, max_depth=args.max_depth,
        env_mode="hdr" if scene.env is not None else "sunsky",
        traversal_max_steps=2048,
    )
    manip = CameraManipulator(
        np.asarray(cam.pos), _pivot_from_cam(cam), aspect=w / h
    )
    manip._cam = cam._replace()
    vs = ViewerState(scene, cam, cfg, default_params(), default_tonemap(),
                     manip)
    vs.scene_name = args.scene

    t = threading.Thread(target=render_loop, args=(vs,), daemon=True)
    t.start()

    srv = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(vs))
    print(f"viewer: http://127.0.0.1:{args.port}/  ({args.scene} {w}x{h})")
    if args.frames:
        # bounded mode for tests/CI: serve until N frames rendered
        srv.timeout = 0.2
        while vs.frame < args.frames:
            srv.handle_request()
        vs.stop = True
        return vs
    try:
        srv.serve_forever()
    finally:
        vs.stop = True


if __name__ == "__main__":
    serve()
