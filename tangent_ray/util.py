"""Small shared utilities."""

from __future__ import annotations

import numpy as np


def round_half_away(x, digits: int):
    """Round half away from zero — DuckDB's ``round()`` semantics.

    numpy/pyarrow default to round-half-even, which disagrees with DuckDB on
    exact .5 boundaries (e.g. 0.8203125 at 6 digits); every float column that
    is hash-compared against oracle SQL must round THIS way.
    """
    p = 10.0 ** digits
    a = np.asarray(x, dtype=np.float64)
    return np.sign(a) * np.floor(np.abs(a) * p + 0.5) / p
