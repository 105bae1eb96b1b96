"""Machine roofline probe: how does PURE COMPUTE scale 1 -> 8 -> 32
processes on this box, with no Ray, no shuffle, no object store?

Two kernels, fixed work per process, aggregate throughput measured:

- ``bw``: a streaming big-array reduction (DRAM-bandwidth bound) — the
  upper bound any memory-traffic-heavy stage can scale to;
- ``fused``: the flagship's actual per-partition kernel
  (stream_velocity_features + label_core + daily_core_arrays) on a
  synthetic 31k-row partition — what the engine's hot stage does between
  exchanges.

If these kernels themselves stop scaling past ~8 cores, the engine's
8 -> 32 efficiency ceiling is the machine's memory subsystem, not the
engine: a real N -> 4N *node* cluster adds DRAM bandwidth with every node.

Usage: python scripts/roofline_probe.py  ->  one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _bw_worker(reps: int) -> float:
    a = np.arange(32_000_000, dtype=np.float64)  # 256 MB, far beyond LLC
    s = 0.0
    for _ in range(reps):
        s += float(a.sum())
    return s


def _make_partition(n: int = 31_250, hosts: int = 12, seed: int = 5):
    rng = np.random.default_rng(seed)
    hh = np.sort(rng.integers(0, hosts, n))
    ts = np.sort(rng.integers(0, 6 * 86_400_000_000, n)).astype(np.int64)
    # re-sort within host for the stream kernels
    order = np.lexsort((ts, hh))
    lat = rng.uniform(-60, 60, n) + rng.normal(0, 2e-4, n)
    lon = rng.uniform(-170, 170, n) + rng.normal(0, 2e-4, n)
    return hh[order], ts[order], lat, lon


def _fused_worker(reps: int) -> int:
    from gscap_ray.functions.stream import daily_core_arrays, label_core
    from gscap_ray.functions.velocity import stream_velocity_features

    import pandas as pd

    hh, ts, lat, lon = _make_partition()
    bounds = np.flatnonzero(np.diff(hh))
    starts = np.concatenate([[0], bounds + 1])
    ends = np.concatenate([bounds + 1, [hh.shape[0]]])
    rows = 0
    for _ in range(reps):
        for s, e in zip(starts, ends):
            tu, ll, lo = ts[s:e], lat[s:e], lon[s:e]
            disp, td, _v, codes = stream_velocity_features(ll, lo, tu)
            # int cid codes, matching the shipped fused kernel (r4)
            cid, _h, _w, _c = label_core(ll, lo, tu, codes == 1,
                                         build_clusters=False,
                                         return_codes=True)
            dcodes, dates = pd.factorize(tu // np.int64(86_400_000_000), sort=True)
            dd = np.asarray(dates * 86_400_000_000).astype("datetime64[us]") \
                .astype("datetime64[D]")
            daily_core_arrays(tu, ll, lo, td, disp, codes, cid, dcodes, dd)
            rows += e - s
    return rows


def _run(worker, reps: int, nproc: int) -> float:
    t0 = time.time()
    with mp.get_context("spawn").Pool(nproc) as p:
        p.map(worker, [reps] * nproc)
    return time.time() - t0


def main():
    out = {}
    for name, worker, reps in (("bw", _bw_worker, 40), ("fused", _fused_worker, 6)):
        times = {}
        for nproc in (1, 8, 32):
            wall = _run(worker, reps, nproc)
            times[nproc] = wall
        # fixed work per process: throughput(n) = n*W/t(n), so
        # parallel efficiency vs 1 proc = t1/tn and 8->32 eff = t8/t32
        out[name] = {
            "wall_1": round(times[1], 2), "wall_8": round(times[8], 2),
            "wall_32": round(times[32], 2),
            "par_eff_8": round(times[1] / times[8], 3),
            "par_eff_32": round(times[1] / times[32], 3),
            "eff_8_to_32": round(times[8] / times[32], 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
