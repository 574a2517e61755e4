"""Statistical image golden ON THE TPU HARDWARE PATH (VERDICT r4 weak #5).

The shipped TPU defaults are the bf16 MXU fused drain + staged compaction
+ octant tables — numerics the CPU suite never executes (tests force
JAX_PLATFORMS=cpu and the cols drain).  This test renders the same
config/seed the committed CPU-f32 reference was generated with
(tools/tpu_golden_ref.py) and asserts STATISTICAL bounds: the bf16 drain
has documented ~0.2% mean hit-t error and rare equal-t tie flips
(PERF_NOTES "MT dot precision"), so bit equality is the wrong claim, but
a Mosaic/precision regression (wrong hits, broken epilogue, bad DMA)
moves the image far beyond these bounds.

Run on hardware:  EIDOLA_TEST_TPU=1 python -m pytest tests/test_tpu_golden.py -v
Skipped in the default (CPU) suite.
"""
import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "tpu_stat_cornell.npz")

requires_tpu = pytest.mark.skipif(
    jax.default_backend() in ("cpu",),
    reason="TPU hardware path only (EIDOLA_TEST_TPU=1 on the tunnel)",
)


@requires_tpu
def test_tpu_statistical_golden_cornell():
    assert os.path.exists(GOLDEN), (
        f"missing {GOLDEN}; run JAX_PLATFORMS=cpu tools/tpu_golden_ref.py"
    )
    ref = np.load(GOLDEN)["image"]

    from tools.tpu_golden_ref import FRAMES, render

    img = render(FRAMES)
    assert img.shape == ref.shape
    assert np.isfinite(img).all()

    lum = img @ np.asarray([0.2126, 0.7152, 0.0722], np.float32)
    lum_ref = ref @ np.asarray([0.2126, 0.7152, 0.0722], np.float32)
    mean_rel = abs(lum.mean() - lum_ref.mean()) / max(lum_ref.mean(), 1e-6)
    rmse = float(np.sqrt(np.mean((img - ref) ** 2)))
    # Bounds calibrated on v5 lite (round 5, tools/tpu_golden_bisect.py):
    # measured 4.92% / 0.0318 at the shipped bf16 closest drain — the
    # residual is ~1.4% winner flips on near-tie triangles (refine repairs
    # the winner's t/u/v but not WHICH triangle won; PERF_NOTES "MT dot
    # precision").  The regressions this guards sit far outside: the
    # round-5 false-occlusion bug measured 67% / 0.22, and a broken
    # fold/DMA shifts the whole field.
    assert mean_rel < 0.10, f"mean luminance off by {mean_rel * 100:.2f}%"
    assert rmse < 0.06, f"per-pixel RMSE {rmse:.4f} vs CPU-f32 reference"


@requires_tpu
def test_tpu_exact_golden_cornell():
    """Same render with EIDOLA_MT_PREC=highest (f32 tables + 6-pass MXU
    dot): everything outside the drain dot is identical to the shipped
    config, so a TIGHT bound pins the non-drain TPU numerics (measured
    0.34% / 0.0228 on v5 lite — residual is equal-t tie resolution).
    Needs a fresh process when the default-prec test ran first (MT_PREC
    is import-frozen), hence the subprocess."""
    import subprocess
    import sys as _sys

    env = dict(os.environ)
    env.update(EIDOLA_MT_PREC="highest", EIDOLA_TEST_TPU="1",
               EIDOLA_CHUNK=env.get("EIDOLA_CHUNK_TPU", "4096"))
    code = (
        "import numpy as np\n"
        f"import sys; sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "from tools.tpu_golden_ref import FRAMES, render\n"
        f"ref = np.load({GOLDEN!r})['image']\n"
        "img = render(FRAMES)\n"
        "w = np.asarray([0.2126, 0.7152, 0.0722], np.float32)\n"
        "rel = abs((img @ w).mean() - (ref @ w).mean()) / (ref @ w).mean()\n"
        "rmse = float(np.sqrt(np.mean((img - ref) ** 2)))\n"
        "print('rel', rel, 'rmse', rmse)\n"
        "assert rel < 0.02, rel\n"
        "assert rmse < 0.04, rmse\n"
    )
    r = subprocess.run([_sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
