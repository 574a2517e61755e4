"""Bisect the TPU-vs-CPU golden divergence (tests/test_tpu_golden.py
failed with mean luminance 67% off).  Renders the golden config on the
live device under several traversal-feature settings and prints the mean
luminance vs the committed CPU-f32 reference, so the diverging feature
can be identified.  Each variant is one full compile — keep the list
short.

Run: python tools/tpu_golden_bisect.py
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import os, sys
sys.path.insert(0, %(root)r)
os.environ["EIDOLA_TEST_TPU"] = "1"   # keep hardware platform in the tool
import numpy as np
from tools.tpu_golden_ref import FRAMES, render
ref = np.load(os.path.join(%(root)r, "tests", "golden",
                           "tpu_stat_cornell.npz"))["image"]
img = render(FRAMES)
lw = np.asarray([0.2126, 0.7152, 0.0722], np.float32)
lum, lum_ref = img @ lw, ref @ lw
rel = abs(lum.mean() - lum_ref.mean()) / max(lum_ref.mean(), 1e-6)
rmse = float(np.sqrt(np.mean((img - ref) ** 2)))
print(f"RESULT mean={lum.mean():.5f} ref={lum_ref.mean():.5f} "
      f"rel={rel*100:.2f}%% rmse={rmse:.4f} "
      f"finite={np.isfinite(img).all()}", flush=True)
"""


def run(tag: str, env: dict):
    e = dict(os.environ)
    e.update(env)
    e.setdefault("EIDOLA_CHUNK", "4096")
    print(f"=== {tag}: {env} ===", flush=True)
    r = subprocess.run(
        [sys.executable, "-c", CHILD % {"root": os.path.dirname(HERE)}],
        env=e, capture_output=True, text=True, timeout=1500,
    )
    for line in r.stdout.splitlines():
        if line.startswith("RESULT"):
            print(line, flush=True)
            return
    print(f"FAILED rc={r.returncode}\n{r.stdout[-800:]}\n{r.stderr[-800:]}",
          flush=True)


def main():
    variants = [
        ("tpu defaults (refine on)", {}),
        ("exact f32 MT everywhere", {"EIDOLA_MT_PREC": "highest"}),
        ("no refine (acne repro)", {"EIDOLA_REFINE": "0"}),
        ("cols MT oracle (no fused drain)", {"EIDOLA_MT": "cols"}),
        ("no compaction", {"EIDOLA_COMPACT": "0"}),
        ("no octant tables", {"EIDOLA_OCT": "0"}),
    ]
    if len(sys.argv) > 1:   # select by substring
        variants = [v for v in variants
                    if any(a in v[0] for a in sys.argv[1:])]
    for tag, env in variants:
        run(tag, env)


if __name__ == "__main__":
    main()
