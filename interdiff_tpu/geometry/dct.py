"""Orthonormal DCT-II matrices used by the interaction-correction networks.

The reference builds the same matrix with a double Python loop and inverts it
numerically (`interdiff/model/correction_smpl.py:55-67`).  We build it
vectorised in float64 and use the transpose as the exact inverse (the matrix
is orthonormal), casting to the requested dtype at the end.
"""

from __future__ import annotations

import numpy as np


def dct_matrices(n: int, dtype=np.float32) -> tuple[np.ndarray, np.ndarray]:
    """Return ``(dct_m, idct_m)`` of shape [n, n].

    ``dct_m[k, i] = w_k * cos(pi * (i + 1/2) * k / n)`` with
    ``w_0 = sqrt(1/n)`` and ``w_k = sqrt(2/n)`` otherwise — identical to the
    reference's ``get_dct_matrix``.  ``idct_m`` is the inverse; since the
    matrix is orthonormal this is its transpose (the reference computes
    ``np.linalg.inv`` which agrees to ~1e-15).
    """
    k = np.arange(n, dtype=np.float64)[:, None]
    i = np.arange(n, dtype=np.float64)[None, :]
    w = np.full((n, 1), np.sqrt(2.0 / n))
    w[0, 0] = np.sqrt(1.0 / n)
    dct_m = w * np.cos(np.pi * (i + 0.5) * k / n)
    idct_m = dct_m.T.copy()
    return dct_m.astype(dtype), idct_m.astype(dtype)
