"""Interactive viewer: live camera, pipeline toggles, scene hot-swap.

The TPU-native analog of the reference's interactive surface (GLFW window
+ ImGui panels + camera manipulator, ref src/main.cpp:200-264 per-frame
input poll, src/sample_gui.cpp:119-206 live RtxState toggles,
src/sample_example.cpp:114-158 file-drop loader thread + m_busy gate): a
render thread steps the jitted frame function continuously while a tiny
stdlib HTTP server streams the latest frame and feeds input back.

Three tiers of mutability (SURVEY §5.6):
- dynamic RenderParams/TonemapParams fields: POST /param — traced scalars,
  never recompile (push-constant analog).
- static RenderConfig fields (ReSTIR mode, denoise, max depth, debug
  channel, ...): POST /config — the worker thread compiles the new step
  variant while rendering continues on the old one (`make_step` is
  memoized, so revisiting a config is instant); `busy` is the reference's
  m_busy analog.  This replaces the reference's pipeline rebuild on
  #define-class changes.
- scene / HDR environment: POST /scene — loaded + compiled on the worker
  thread, swapped atomically (ref sample_example.cpp:114-158 onFileDrop).

Interactive descaling: while the mouse drags, frames render at
extent/descale and upscale for display; releasing restores full extent
(ref sample_example.cpp:396-399).

    python -m eidola_tpu.app.viewer --scene cornell --size 256 --port 8812

Endpoints: GET / (canvas UI), GET /frame.png, GET /stats,
POST /input (orbit/pan/dolly/reset/end), POST /param, POST /config,
POST /scene, POST /pick (double-click: trace the pixel ray, report the
hit, recenter the orbit pivot — ref sample_example.cpp:456-497).
"""
from __future__ import annotations

import argparse
import dataclasses
import io
import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..utils.platform import honor_platform_env

honor_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# RenderConfig fields the GUI may flip live (ref sample_gui.cpp:119-206)
_CONFIG_FIELDS = {
    "max_depth": int,
    "restir_mode": int,
    "denoise": bool,
    "denoise_direct_levels": int,
    "denoise_indirect_levels": int,
    "indirect_enabled": bool,
    "debug_mode": int,
    "accumulate": bool,
    "spatial_rounds": int,
    "tonemap_kind": int,
    "primary_seed": bool,
}

_PAGE = """<!doctype html>
<html><head><title>eidola_tpu viewer</title><style>
body { background:#111; color:#ddd; font-family:monospace; margin:16px }
#frame { image-rendering:pixelated; border:1px solid #444; cursor:grab }
#bar { margin:8px 0 } button,input,select { background:#222; color:#ddd;
border:1px solid #555; margin-right:6px }
#busy { color:#fa0 }
</style></head><body>
<div id="bar">
 <b>eidola_tpu</b> <span id="stats"></span> <span id="busy"></span><br>
 drag = orbit &middot; shift-drag = pan &middot; wheel = dolly &middot;
 <button onclick="post('/input',{type:'reset'})">reset accum</button>
 exposure <input id="expo" type="range" min="-3" max="3" step="0.1"
  value="0" oninput="post('/param',{name:'exposure',
  value:Math.pow(2,this.value)})">
 <br>
 <label><input type="checkbox" id="denoise" checked
  onchange="post('/config',{denoise:this.checked})">denoise</label>
 <label><input type="checkbox" id="pseed"
  onchange="post('/config',{primary_seed:this.checked})">seed</label>
 restir <select id="restir"
  onchange="post('/config',{restir_mode:+this.value})">
  <option value="0">off</option><option value="1">RIS</option>
  <option value="2">spatial</option>
  <option value="3" selected>temporal</option>
  <option value="4">spatiotemporal</option></select>
 debug <select id="debug" onchange="post('/config',{debug_mode:+this.value})">
  <option value="0" selected>none</option><option value="1">direct</option>
  <option value="2">indirect</option><option value="3">baseColor</option>
  <option value="4">normal</option><option value="5">depth</option>
  <option value="6">metallic</option><option value="7">emissive</option>
  <option value="8">roughness</option><option value="9">texcoord</option>
 </select>
 depth <input id="depth" type="number" min="1" max="8" value="3"
  style="width:3em" onchange="post('/config',{max_depth:+this.value})">
 <br>
 scene <input id="scene" size="28" placeholder="name or /path/to.glb">
 <button onclick="post('/scene',{scene:
  document.getElementById('scene').value})">load</button>
 hdr <input id="hdr" size="20" placeholder="/path/to.hdr">
 <button onclick="post('/scene',{hdr:
  document.getElementById('hdr').value})">set env</button>
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
  document.getElementById('busy').textContent = s.busy ? '[' + s.busy + ']' : '';
}, 1000);
function post(u, body){ fetch(u, {method:'POST', body:JSON.stringify(body)}); }
let drag = null;
img.onmousedown = e => { drag = [e.clientX, e.clientY, e.shiftKey]; };
window.onmouseup = () => {
  if (drag) post('/input', {type:'end'});
  drag = null;
};
window.onmousemove = e => {
  if (!drag) return;
  const dx = e.clientX - drag[0], dy = e.clientY - drag[1];
  drag = [e.clientX, e.clientY, drag[2]];
  post('/input', drag[2] ? {type:'pan', dx:dx, dy:dy}
                         : {type:'orbit', dx:dx, dy:dy});
};
img.onwheel = e => { e.preventDefault();
  post('/input', {type:'dolly', f: e.deltaY > 0 ? 1.1 : 0.9}); };
img.ondblclick = async e => {
  const r = img.getBoundingClientRect();
  const res = await fetch('/pick', {method:'POST', body:JSON.stringify(
    {fy:(e.clientY - r.top) / r.height, fx:(e.clientX - r.left) / r.width})});
  const p = await res.json();
  document.getElementById('busy').textContent = p.hit
    ? `picked tri ${p.tri_id} mat ${p.material_id} t=${p.t.toFixed(3)}`
    : 'pick: miss';
};
</script></body></html>"""


def _descaled(cfg, d: int):
    """Config at extent/d (multiples of the 8x16 packet tile so the ray
    packets stay dense), ref sample_example.cpp:396-399."""
    if d <= 1:
        return cfg
    w = max((cfg.width // d) // 16 * 16, 16)
    h = max((cfg.height // d) // 16 * 16, 16)
    return dataclasses.replace(cfg, width=w, height=h)


class ViewerState:
    """Shared state between the render thread, the worker thread (config
    compiles + scene loads) and the HTTP handlers."""

    def __init__(self, scene, cam, cfg, params, tm, manip, descale: int = 1):
        self.scene = scene
        self.base_cfg = cfg          # user-selected config
        self.params = params
        self.tm = tm
        self.manip = manip
        self.cam = cam
        self.descale = descale       # interaction descale factor (1 = off)
        self.interacting = False
        self.last_input_t = 0.0
        self.lock = threading.Lock()
        self.png: bytes = b""
        self.frame = 0
        self.fps = 0.0
        self.reset_requested = False
        self.stop = False
        self.scene_name = ""
        # worker plumbing
        self.busy: str = ""          # m_busy analog ("" = idle)
        self.ready_cfgs: set = set()  # configs whose step compiled already
        self.pending_scene: dict | None = None
        self._worker: threading.Thread | None = None
        # progressive preview (VERDICT r4 missing #3): on multi-second
        # frames the viewer serves a cheap descaled frame between full-res
        # frames so the GUI stays interactive at bench scale.  The worker
        # compiles the preview variant from want_cfgs; the render loop
        # engages it when the full frame exceeds the threshold.
        self.want_cfgs: set = set()   # extra variants the worker should compile
        self.preview_ms = float(os.environ.get("EIDOLA_VIEW_PREVIEW_MS", "500"))

    # -- desired active config ---------------------------------------------
    def desired_cfg(self):
        with self.lock:
            base = self.base_cfg
            inter = self.interacting
            if inter and time.time() - self.last_input_t > 0.5:
                self.interacting = inter = False  # missed mouse-up safety
        return _descaled(base, self.descale) if inter else base

    # -- HTTP-facing mutations ----------------------------------------------
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
            if t in ("orbit", "pan", "dolly") and self.descale > 1:
                self.interacting = True
                self.last_input_t = time.time()
            elif t == "end":
                self.interacting = False

    def apply_pick(self, msg: dict) -> dict:
        """Double-click pick: trace the ray under fractional image coords
        (fy, fx in 0..1), log the hit, and recenter the orbit pivot on the
        picked world position (ref sample_example.cpp:456-497
        screenPicking -> CameraManip setLookat on double-click)."""
        from ..render.picker import pick

        fy = min(max(float(msg.get("fy", 0.5)), 0.0), 1.0)
        fx = min(max(float(msg.get("fx", 0.5)), 0.0), 1.0)
        with self.lock:
            scene, cam = self.scene, self.cam
            h, w = self.base_cfg.height, self.base_cfg.width
        res = pick(scene, cam, h, w, fy * (h - 1), fx * (w - 1))
        out = {
            "hit": bool(res.hit),
            "tri_id": int(res.tri_id),
            "material_id": int(res.material_id),
            "t": float(res.t),
            "world_pos": [float(v) for v in res.world_pos],
        }
        if res.hit:
            with self.lock:
                self.cam = self.manip.recenter(res.world_pos)
                self.reset_requested = True
        return out

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

    def apply_config(self, msg: dict) -> bool:
        """Static-config change: swap base_cfg; the render/worker threads
        compile the new variant lazily (reference pipeline rebuild analog,
        sample_gui.cpp:119-206 -> renderer rebuild)."""
        fields = {}
        for k, v in msg.items():
            if k in _CONFIG_FIELDS:
                fields[k] = _CONFIG_FIELDS[k](v)
        if not fields:
            return False
        with self.lock:
            self.base_cfg = dataclasses.replace(self.base_cfg, **fields)
            self.reset_requested = True
        return True

    def apply_scene(self, msg: dict) -> bool:
        """Queue a scene (.glb/.gltf or registry name) or HDR environment
        swap for the worker thread (ref sample_example.cpp:114-158)."""
        if not (msg.get("scene") or msg.get("hdr")):
            return False
        with self.lock:
            self.pending_scene = dict(msg)
        return True


def _load_scene_request(vs: ViewerState, req: dict):
    """Worker-side scene/HDR load + swap (detached loader thread analog)."""
    from ..models.scenes import load_scene
    from ..scene.data import attach_env, env_params
    from ..scene.gltf import load_gltf_scene
    from ..scene.hdr import build_env_map, load_hdr
    from .headless import _pivot_from_cam

    name = req.get("scene")
    hdr = req.get("hdr")
    env = build_env_map(load_hdr(hdr)) if hdr else None
    if name:
        if name.endswith((".glb", ".gltf")):
            scene, cam = load_gltf_scene(name)
        else:
            scene, cam = load_scene(name)
        if env is not None:
            scene = attach_env(scene, env)
        with vs.lock:
            if env is not None:
                vs.params = env_params(vs.params, env)
            vs.scene = scene
            vs.cam = cam
            vs.manip.eye = np.asarray(cam.pos, np.float64)
            vs.manip.center = np.asarray(_pivot_from_cam(cam), np.float64)
            vs.manip._cam = cam._replace()
            vs.scene_name = name
            vs.base_cfg = dataclasses.replace(
                vs.base_cfg,
                env_mode="hdr" if scene.env is not None else "sunsky",
            )
            vs.reset_requested = True
            vs.ready_cfgs.clear()   # new shapes: steps must recompile
    elif env is not None:
        with vs.lock:
            scene = vs.scene
        scene = attach_env(scene, env)
        with vs.lock:
            vs.scene = scene
            vs.params = env_params(vs.params, env)
            vs.base_cfg = dataclasses.replace(vs.base_cfg, env_mode="hdr")
            vs.reset_requested = True
            vs.ready_cfgs.clear()


def _compile_step(vs: ViewerState, cfg):
    """Worker-side compile of a step variant: run one throwaway frame so
    the jit cache is hot before the render thread switches to it."""
    from ..render.frame import init_frame_state, make_step

    step = make_step(cfg)
    with vs.lock:
        scene, cam, params, tm = vs.scene, vs.cam, vs.params, vs.tm
    state = init_frame_state(cfg, cam)
    out_state, out = step(scene, cam, params, tm, state)
    jax.block_until_ready(out["image"])
    with vs.lock:
        vs.ready_cfgs.add(cfg)


def _worker_tick(vs: ViewerState) -> bool:
    """Run one pending worker job (scene load or step compile).  Returns
    True if something was done."""
    with vs.lock:
        req = vs.pending_scene
        vs.pending_scene = None
    if req is not None:
        vs.busy = "loading scene"
        try:
            _load_scene_request(vs, req)
        except Exception as e:  # surface the error, keep rendering
            vs.busy = f"load failed: {e}"
            time.sleep(1.0)
        else:
            vs.busy = ""
        return True
    desired = vs.desired_cfg()
    with vs.lock:
        needs = desired not in vs.ready_cfgs
        extra = next(iter(vs.want_cfgs - vs.ready_cfgs), None)
    if needs or extra is not None:
        vs.busy = "compiling"
        try:
            _compile_step(vs, desired if needs else extra)
        except Exception as e:
            vs.busy = f"compile failed: {e}"
            time.sleep(1.0)
        else:
            vs.busy = ""
        return True
    return False


def worker_loop(vs: ViewerState):
    while not vs.stop:
        if not _worker_tick(vs):
            time.sleep(0.05)


def _encode_png(img01: np.ndarray, upscale: int = 1) -> bytes:
    from PIL import Image

    a = (np.clip(img01, 0, 1) * 255).astype(np.uint8)
    if upscale > 1:
        a = np.repeat(np.repeat(a, upscale, axis=0), upscale, axis=1)
    buf = io.BytesIO()
    Image.fromarray(a).save(buf, format="PNG")
    return buf.getvalue()


def render_loop(vs: ViewerState):
    """Continuous frame stepping (the while(!glfwWindowShouldClose) loop,
    ref main.cpp:200-264).  Uses whichever compiled variant matches the
    desired config; keeps stepping the old one while the worker compiles."""
    from ..render.frame import init_frame_state, make_step, reset_accumulation

    active = vs.desired_cfg()
    _compile_step(vs, active)
    step = make_step(active)
    with vs.lock:
        state = init_frame_state(active, vs.cam)
        scene_obj = vs.scene
    t_last = time.perf_counter()
    last_full_ms = 0.0
    while not vs.stop:
        desired = vs.desired_cfg()
        with vs.lock:
            ready = desired in vs.ready_cfgs
            cam = vs.cam
            params = vs.params
            tm = vs.tm
            scene_now = vs.scene
            if vs.reset_requested:
                vs.reset_requested = False
                state = reset_accumulation(state)
        if (desired != active and ready) or (scene_now is not scene_obj
                                             and ready):
            active = desired
            step = make_step(active)
            state = init_frame_state(active, cam)
            scene_obj = scene_now

        # progressive preview: when the full frame costs more than the
        # threshold, serve a fresh ~1/16-ray descaled frame FIRST so the
        # display tracks camera/params at interactive rates while the
        # full-res frame computes (ref interactive descaling,
        # sample_example.cpp:396-399, extended to static views)
        if last_full_ms > vs.preview_ms and active == vs.base_cfg:
            pcfg = _descaled(active, 4)
            with vs.lock:
                p_ready = pcfg in vs.ready_cfgs
                if not p_ready:
                    vs.want_cfgs.add(pcfg)
            if p_ready and pcfg != active:
                pstep = make_step(pcfg)
                _, pout = pstep(scene_obj, cam, params, tm,
                                init_frame_state(pcfg, cam))
                ppng = _encode_png(
                    np.asarray(pout["image"]),
                    max(vs.base_cfg.width // pcfg.width, 1),
                )
                with vs.lock:
                    vs.png = ppng
        t_full0 = time.perf_counter()
        state, out = step(scene_obj, cam, params, tm, state)
        img = np.asarray(out["image"])
        last_full_ms = (time.perf_counter() - t_full0) * 1e3
        up = vs.base_cfg.width // active.width if active != vs.base_cfg else 1
        png = _encode_png(img, max(up, 1))
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
                    cfg = vs.base_cfg
                    body = json.dumps({
                        "scene": vs.scene_name,
                        "width": cfg.width,
                        "height": cfg.height,
                        "frame": vs.frame,
                        "fps": vs.fps,
                        "busy": vs.busy,
                        "config": {
                            k: getattr(cfg, k) for k in _CONFIG_FIELDS
                        },
                        "triangles": int(vs.scene.bvh.n_tris),
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
            if self.path == "/pick":
                self._send(200, json.dumps(vs.apply_pick(msg)).encode(),
                           "application/json")
                return
            if self.path == "/input":
                vs.apply_input(msg)
            elif self.path == "/param":
                vs.apply_param(msg)
            elif self.path == "/config":
                if not vs.apply_config(msg):
                    self._send(400, b"no known config field")
                    return
            elif self.path == "/scene":
                if not vs.apply_scene(msg):
                    self._send(400, b"need scene or hdr")
                    return
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
    p.add_argument("--descale", type=int, default=2,
                   help="render-extent divisor while dragging (1 = off)")
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
    params = default_params()
    if scene.env is not None:
        from ..scene.data import env_params

        params = env_params(params, scene.env)
    vs = ViewerState(scene, cam, cfg, params, default_tonemap(),
                     manip, descale=args.descale)
    vs.scene_name = args.scene

    t = threading.Thread(target=render_loop, args=(vs,), daemon=True)
    t.start()
    tw = threading.Thread(target=worker_loop, args=(vs,), daemon=True)
    tw.start()

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
