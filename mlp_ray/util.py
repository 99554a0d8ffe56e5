"""Small shared helpers."""

from __future__ import annotations

import numpy as np


def round_half_away(x, ndigits: int = 6):
    """Round half away from zero — matches SQL ``round()`` semantics
    (numpy's ``np.round`` is banker's rounding, which would diverge
    from the DuckDB oracle on exact .5 boundaries)."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def round_cols(df, cols, ndigits: int = 6):
    for c in cols:
        df[c] = round_half_away(df[c].to_numpy(dtype=np.float64), ndigits)
    return df
