"""THE one DuckDB-ROUND-compatible rounding kernel.

DuckDB's ROUND(DOUBLE, d) is std::round semantics: half AWAY FROM ZERO at
d digits — pyarrow's pc.round (half-to-even on the scaled value) differs by
an ulp at large magnitudes and Python's round() is banker's. Every operator
that must hash-match a DuckDB oracle (query finalizers, text-stat ratios,
cosine scores) routes through this helper so the rule lives in one place.
"""

from __future__ import annotations

import numpy as np


def round_half_away(values, digits: int) -> np.ndarray:
    """Vectorized ROUND(x, digits), half away from zero, on float64."""
    arr = np.asarray(values, dtype=np.float64)
    scale = 10.0 ** digits
    return np.copysign(np.floor(np.abs(arr) * scale + 0.5), arr) / scale
