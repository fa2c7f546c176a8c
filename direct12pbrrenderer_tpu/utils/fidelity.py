"""Image-fidelity metrics + golden-frame regression harness.

The driver-set north star includes "<=1e-3 per-pixel RMSE vs D3D12 reference
frames" (BASELINE.json). The reference renderer itself cannot run here
(Windows/D3D12), so fidelity is tracked two ways:

1. **Golden regression**: deterministic scenes rendered on CPU are pinned as
   PNG goldens in tests/goldens/; any image drift > tolerance fails CI. This
   protects every optimization (Pallas kernels, quad atlases, layout changes)
   against silent divergence.
2. **Cross-implementation checks**: kernel outputs are validated against
   independent scalar transcriptions of the HLSL (BRDF LUT, SH, histogram,
   bloom phases) in their unit tests.

When D3D12 captures become available, `rmse` compares them directly.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    """Per-pixel RMSE over [0,1]-normalized RGB."""
    x = np.asarray(a, np.float32)
    y = np.asarray(b, np.float32)
    if x.dtype != np.float32 or x.max() > 1.5:
        x = x / 255.0
    if y.max() > 1.5:
        y = y / 255.0
    assert x.shape == y.shape, f"shape mismatch {x.shape} vs {y.shape}"
    return float(np.sqrt(np.mean((x.astype(np.float64) - y.astype(np.float64)) ** 2)))


def compare_to_golden(img: np.ndarray, golden_path: str | Path, tol: float,
                      update: bool = False) -> float:
    """Returns the RMSE vs the stored golden; writes the golden when absent
    (first run) or when update=True. Raises AssertionError past tolerance."""
    from PIL import Image

    golden_path = Path(golden_path)
    img = np.asarray(img)
    if update or not golden_path.exists():
        golden_path.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(img).save(golden_path)
        return 0.0
    golden = np.asarray(Image.open(golden_path))
    err = rmse(img, golden)
    assert err <= tol, (
        f"golden mismatch: rmse {err:.6f} > {tol} vs {golden_path}"
    )
    return err
