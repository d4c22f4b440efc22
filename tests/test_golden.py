"""Golden-image regression tests (SURVEY.md §4b).

The reference's QA corpus is screenshots checked by eye; here the canonical
preset scenes are rendered deterministically on CPU and compared to
committed goldens by PSNR.  Same platform should be near-exact; the loose
threshold absorbs XLA version / fast-math drift.
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

_CASES = [
    "metal_demo", "glass_demo", "material_showcase", "pt_lit_test",
    "pt_material_matrix", "rt_cornell_box", "denoised_cornell",
    "denoised_metal",
]


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return 99.0
    return 10.0 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("name", _CASES)
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip("golden not generated (run tools/make_golden.py)")
    golden = np.load(path)["img"]

    from tools.make_golden import GOLDEN_H, GOLDEN_W, golden_scenes

    img = np.asarray(golden_scenes(GOLDEN_W, GOLDEN_H)[name]())
    assert img.shape == golden.shape
    psnr = _psnr(img, golden)
    assert psnr >= 35.0, f"{name}: PSNR {psnr:.1f} dB vs golden"
