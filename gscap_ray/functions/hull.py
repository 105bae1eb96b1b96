"""Exact integer convex hull (Andrew's monotone chain) for the
distributed hull-of-hulls operator.

The engine computes hulls on integer micro-degree coordinates, so every
orientation test is an exact int64 cross product — no float epsilon, and
the SQL oracle (an O(n^3) directed-edge test over the same integers) is
byte-comparable. The distributed shape relies on the extreme-point
identity hull(S) = hull(hull(S_1) ∪ ... ∪ hull(S_k)) for any partition of
S: a point extreme in S is extreme in every subset containing it, so a
per-block chain never discards a global hull vertex and the final chain
over the (tiny) union of block hulls is exact.

The chain is STRICT: collinear boundary points are popped (cross <= 0),
so the output is exactly the set of extreme points. That convention is
consistent under hull-of-hulls (extreme in S => extreme in the block =>
survives the block chain) and matches the oracle's edge test, which
admits collinear points only strictly between the edge endpoints.
"""

from __future__ import annotations

import numpy as np


def convex_hull_ints(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Strict convex hull of integer points; returns (hx, hy) sorted
    lexicographically by (x, y) — a canonical, order-independent layout.

    Duplicates are collapsed first. Degenerate inputs: one distinct point
    returns it; collinear sets return the two extreme endpoints.
    """
    pts = np.stack([np.asarray(x, dtype=np.int64),
                    np.asarray(y, dtype=np.int64)], axis=1)
    pts = np.unique(pts, axis=0)  # sorted by (x, y) — chain's input order
    n = pts.shape[0]
    if n <= 2:
        return pts[:, 0].copy(), pts[:, 1].copy()

    def half(p):
        out = []
        for q in p:
            while len(out) >= 2:
                ox0, oy0 = out[-2]
                ox1, oy1 = out[-1]
                # exact int64: coords are micro-degrees (<2e8), products <4e16
                if (ox1 - ox0) * (q[1] - oy0) - (oy1 - oy0) * (q[0] - ox0) <= 0:
                    out.pop()
                else:
                    break
            out.append((int(q[0]), int(q[1])))
        return out[:-1]  # endpoint belongs to the other half

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.asarray(lower + upper, dtype=np.int64)
    order = np.lexsort((hull[:, 1], hull[:, 0]))
    return hull[order, 0].copy(), hull[order, 1].copy()
