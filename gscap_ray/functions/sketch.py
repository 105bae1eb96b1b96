"""Sketch aggregates: HyperLogLog distinct-count registers.

The reference has no sketches — its distinct counts are exact pandas
``nunique`` (e.g. the daily uniques in gscap/gps.py:1441-1456). The
engine adds an HLL register sketch as the 100-TB-scale distinct path:
per-batch partials collapse rows to at most ``groups x HLL_M`` register
rows, so the single shuffle carries O(groups x m) regardless of input
row count — the canonical partial/combiner shape.

Integer-only construction, chosen for oracle byte-exactness:

- hash: 64-bit md5-derived (``md5_token_hash64`` = DuckDB's
  ``md5_number_lower``), so both engines hash identical bits;
- register = ``h % m`` (m = 256), w = ``h >> 8`` (56 bits);
- rho = trailing zeros of w, + 1, capped at 32 (the *trailing*-zero
  variant: ``popcount(~w & (w-1))`` is branch-free in numpy AND plain
  ``bit_count((~w) & (w - 1))`` in DuckDB; w = 0 wraps to popcount 64
  on both sides and the cap absorbs it — no special case anywhere);
- the emitted statistic is the INTEGER register sum
  ``S = sum_j 2^(32 - M_j)`` with absent registers counting as M_j = 0.
  The float HLL estimate is derivable offline as
  ``alpha_m * m^2 * 2^32 / S`` (alpha_256 = 0.7213/(1 + 1.079/256));
  keeping floats out of the operator output removes all parity risk.
"""

from __future__ import annotations

import numpy as np

HLL_M = 256        # registers (b = 8 index bits)
HLL_RHO_CAP = 32   # max rank; S then fits int64 with huge headroom

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    return _POP8[x.view(np.uint8)].reshape(x.shape[0], 8).sum(
        axis=1, dtype=np.int64)


def hll_rho(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hashes -> (register index, capped trailing-zero rank)."""
    h = np.ascontiguousarray(h, dtype=np.uint64)
    reg = (h % np.uint64(HLL_M)).astype(np.int64)
    w = h >> np.uint64(8)
    tz = _popcount64(~w & (w - np.uint64(1)))  # w=0 wraps to 64, cap absorbs
    rho = np.minimum(tz + 1, HLL_RHO_CAP)
    return reg, rho


def hll_partials(group_codes: np.ndarray, n_groups: int,
                 h: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-batch register partials: (group, reg, rho_max) arrays with at
    most ``n_groups * HLL_M`` rows — the pre-aggregation that keeps the
    shuffle O(groups x m)."""
    reg, rho = hll_rho(h)
    key = group_codes.astype(np.int64) * HLL_M + reg
    acc = np.zeros(n_groups * HLL_M, np.int64)
    np.maximum.at(acc, key, rho)
    nz = np.flatnonzero(acc)
    return nz // HLL_M, nz % HLL_M, acc[nz]


def hll_register_sum(mreg: np.ndarray) -> tuple[int, int]:
    """Fold final per-register maxima into (n_touched_registers, S) where
    S = sum_j 2^(32 - M_j), absent registers contributing 2^32 each."""
    mreg = np.asarray(mreg, np.int64)
    s = int((np.int64(1) << (32 - mreg)).sum())
    s += (HLL_M - mreg.shape[0]) * (1 << 32)
    return int(mreg.shape[0]), s


def hll_estimate(register_sum: int) -> float:
    """The raw HLL cardinality estimate from the integer register sum
    (no small/large-range corrections — documented operator contract)."""
    alpha = 0.7213 / (1.0 + 1.079 / HLL_M)
    return alpha * HLL_M * HLL_M * float(1 << 32) / float(register_sum)
