"""Shape/padding helpers for static-shape (XLA-friendly) kernels."""

from __future__ import annotations

import numpy as np


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_to(arr: np.ndarray, length: int, axis: int = -1, fill=0) -> np.ndarray:
    """Pad ``arr`` along ``axis`` to ``length`` with ``fill``."""
    cur = arr.shape[axis]
    if cur == length:
        return arr
    if cur > length:
        raise ValueError(f"cannot pad axis {axis} from {cur} down to {length}")
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, length - cur)
    return np.pad(arr, widths, constant_values=fill)


def length_bucket(n: int, *, minimum: int = 16) -> int:
    """Static-shape bucket for a sequence length.

    Buckets lengths to {16, 32, 48, 64, 96, 128, 192, 256, 384, 512, ...}
    (x1.5 / x2 ladder) so jit caches a small number of shapes while keeping
    padding waste under ~33%.
    """
    b = minimum
    while b < n:
        b = b * 3 // 2 if (b * 3 // 2) % 16 == 0 else b * 2
        b = round_up(b, 16)
    return b
