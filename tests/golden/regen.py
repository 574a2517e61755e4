"""Regenerate every golden image in tests/golden/ (CPU, fixed seeds).

Run after an INTENTIONAL estimator change:
    JAX_PLATFORMS=cpu python tests/golden/regen.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the env var alone does not beat a registered TPU plugin (see
# tests/conftest.py) — force it through jax.config too
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tests.test_golden import GOLDEN, GOLDEN_CASES, render_case  # noqa: E402


def main():
    which = sys.argv[1:] or sorted(GOLDEN_CASES)
    for name in which:
        scene_key, cfg_kwargs = GOLDEN_CASES[name]
        img = render_case(scene_key, cfg_kwargs)
        path = os.path.join(GOLDEN, f"{name}.npy")
        np.save(path, img)
        print(f"{name}: mean={img.mean():.4f} max={img.max():.2f} -> {path}")


if __name__ == "__main__":
    main()
