"""Static-capacity padding helpers.

XLA compiles one program per distinct input shape; VO loops present new
counts (matches, correspondences, map points) every frame, which without
care recompiles multiple programs per frame (the round-2 feature-VO ran
at 0.012 fps for exactly this reason).  Padding every device call to a
power-of-two capacity with a validity mask/weight bounds the number of
compilations per run by log2(max_count).
"""

import numpy as np


def pow2_cap(n, lo=16):
    """Smallest power of two >= max(n, lo)."""
    return 1 << int(np.ceil(np.log2(max(int(n), lo))))


def pad_rows(arr, cap, fill=0.0):
    """Pad a (n, ...) array with ``fill`` rows up to ``cap``."""
    arr = np.asarray(arr)
    n = arr.shape[0]
    if n == cap:
        return arr
    pad = np.full((cap - n,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def row_mask(n, cap):
    """(cap,) bool mask marking the first n rows valid."""
    m = np.zeros(cap, dtype=bool)
    m[:n] = True
    return m
