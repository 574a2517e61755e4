"""HDR environment importance sampling
(ref src/hdr_sampling.cpp:56-242; shaders/env_sampling.glsl:38-99).

Load-time (host): read a Radiance .hdr into linear RGB, weight each texel by
luminance * solid angle, and build one alias table over all texels — same
strategy as the reference's createEnvironmentAccel.  Device side: sampling is
two gathers (alias redirect) + a uniform direction within the chosen texel;
evaluation is a bilinear texture lookup by spherical uv.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.alias_table import make_alias_table, sample_alias
from ..ops.math import luminance, spherical_uv, uv_to_dir
from .data import EnvMap

_LUM = np.asarray([0.2126, 0.7152, 0.0722])


def load_hdr(path: str) -> np.ndarray:
    """Read a Radiance .hdr into (H, W, 3) float32 linear RGB
    (ref hdr_sampling.cpp:56-99 via stb_image).  Pure-numpy RGBE decoder
    (flat + new-style RLE scanlines); PIL fallback for other formats."""
    if path.endswith((".hdr", ".pic")):
        return _read_radiance(path)
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return img


def _rgbe_to_float(rgbe: np.ndarray) -> np.ndarray:
    """(..., 4) u8 RGBE -> (..., 3) f32 linear (stb_image semantics)."""
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, np.ldexp(1.0, e - 136), 0.0)  # 2^(e-128-8)
    return (rgbe[..., :3].astype(np.float32)) * scale[..., None]


def _read_radiance(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    # header: lines until blank, then resolution line
    pos = 0
    if not data.startswith((b"#?RADIANCE", b"#?RGBE")):
        raise ValueError(f"{path}: not a Radiance file")
    while True:
        nl = data.index(b"\n", pos)
        line = data[pos:nl]
        pos = nl + 1
        if line == b"":
            break
    nl = data.index(b"\n", pos)
    res = data[pos:nl].split()
    pos = nl + 1
    if len(res) != 4 or res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError(f"{path}: unsupported orientation {res}")
    H, W = int(res[1]), int(res[3])

    out = np.empty((H, W, 4), np.uint8)
    buf = np.frombuffer(data, np.uint8, offset=pos)
    bp = 0
    for y in range(H):
        if W < 8 or W > 0x7FFF or buf[bp] != 2 or buf[bp + 1] != 2:
            # flat (possibly old-RLE-free) scanline
            out[y] = buf[bp : bp + W * 4].reshape(W, 4)
            bp += W * 4
            continue
        assert (int(buf[bp + 2]) << 8 | int(buf[bp + 3])) == W
        bp += 4
        for c in range(4):  # each component RLE'd separately
            x = 0
            while x < W:
                count = int(buf[bp])
                if count > 128:  # run
                    out[y, x : x + count - 128, c] = buf[bp + 1]
                    x += count - 128
                    bp += 2
                else:  # literal
                    out[y, x : x + count, c] = buf[bp + 1 : bp + 1 + count]
                    x += count
                    bp += 1 + count
    return _rgbe_to_float(out)


def write_hdr(path: str, img: np.ndarray) -> None:
    """Write (H, W, 3) f32 linear RGB as a flat Radiance .hdr (for tests and
    HDR frame dumps)."""
    img = np.asarray(img, np.float32)
    H, W = img.shape[:2]
    m = img.max(-1)
    e = np.where(m > 1e-32, np.ceil(np.log2(np.maximum(m, 1e-32))) + 1, 0)
    scale = np.where(m > 1e-32, np.ldexp(1.0, (-e + 8).astype(np.int32)), 0.0)
    rgbe = np.zeros((H, W, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None] + 0.5, 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(m > 1e-32, e + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {H} +X {W}\n".encode())
        f.write(rgbe.tobytes())


def build_env_map(image: np.ndarray) -> EnvMap:
    """Solid-angle-weighted luminance alias map over all texels
    (ref hdr_sampling.cpp:181-242)."""
    image = np.asarray(image, np.float32)
    H, W = image.shape[:2]
    lum = (image[..., :3] * _LUM).sum(-1)
    # equirect texel solid angle: (2pi/W)(pi/H) sin(theta)
    theta = (np.arange(H) + 0.5) / H * np.pi
    sin_t = np.sin(theta)[:, None]
    d_omega = (2.0 * np.pi / W) * (np.pi / H) * sin_t
    weights = lum * d_omega
    table, integral = make_alias_table(weights.ravel())
    average = integral / (4.0 * np.pi)
    from ..utils.transfer import batched_device_put

    return batched_device_put(EnvMap(
        image=np.ascontiguousarray(image[..., :3]),
        table=table,
        integral=np.float32(integral),
        average=np.float32(average),
    ))


def env_eval(env: EnvMap, d, hdr_multiplier=1.0):
    """Radiance along direction d (bilinear; ref pathtrace.glsl:40-47)."""
    H, W = env.image.shape[:2]
    uv = spherical_uv(d)
    x = uv[..., 0] * W - 0.5
    y = uv[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = (x0 + 1) % W
    x0 = x0 % W
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    y0 = jnp.clip(y0, 0, H - 1)
    img = env.image
    c00 = img[y0, x0]
    c01 = img[y0, x1]
    c10 = img[y1, x0]
    c11 = img[y1, x1]
    fx = fx[..., None]
    fy = fy[..., None]
    c = (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy
    return c * hdr_multiplier


def env_pdf(env: EnvMap, d):
    """Solid-angle pdf of env_sample for direction d
    (ref pathtrace.glsl env pdf path)."""
    H, W = env.image.shape[:2]
    uv = spherical_uv(d)
    x = jnp.clip((uv[..., 0] * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip((uv[..., 1] * H).astype(jnp.int32), 0, H - 1)
    flat = y * W + x
    pmf = env.table.pdf[flat]
    theta = (y.astype(jnp.float32) + 0.5) / H * jnp.pi
    d_omega = (2.0 * jnp.pi / W) * (jnp.pi / H) * jnp.maximum(jnp.sin(theta), 1e-6)
    return pmf / d_omega


def env_sample(env: EnvMap, u1, u2, u3, u4, hdr_multiplier=1.0):
    """Draw a direction ~ luminance.  Texel via alias table, then uniform
    within the texel (ref env_sampling.glsl:38-99).

    Returns (dir, pdf_solid_angle, radiance)."""
    H, W = env.image.shape[:2]
    flat, pmf = sample_alias(env.table, u1, u2)
    y = flat // W
    x = flat % W
    # uniform sub-texel position
    u = (x.astype(jnp.float32) + u3) / W
    v = (y.astype(jnp.float32) + u4) / H
    d = uv_to_dir(jnp.stack([u, v], axis=-1))
    theta = (y.astype(jnp.float32) + 0.5) / H * jnp.pi
    d_omega = (2.0 * jnp.pi / W) * (jnp.pi / H) * jnp.maximum(jnp.sin(theta), 1e-6)
    pdf = pmf / d_omega
    rad = env.image[y, x] * hdr_multiplier
    return d, pdf, rad
