"""Per-operator ds.stats() audit of the fused flagship at sf0.1.

Prints the stage wall/CPU breakdown the BASELINE.md design audit quotes
(pruned read -> fused geocode+tile+PIP+label+daily kernel -> int-key
exchange). Run on an otherwise-idle box; times are for the audit, the
headline number comes from bench.py.

Usage: python scripts/flagship_stats.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from gscap_ray.pipelines.flagship import daily_features_direct
    from gscap_ray.synth import ensure_pages, generate_polygon_layer

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    n_pages = n_docs * 1600
    n_hosts = max(64, n_pages // 2500)
    pages_dir = ensure_pages(f"/tmp/gscap_bench_pages_{n_pages}", n_pages,
                             n_hosts=n_hosts, days=6, seed=42, files=32)
    polys = generate_polygon_layer(n_hosts=n_hosts, seed=42, extra=100)

    ds = daily_features_direct(pages_dir, polygons=polys)
    t0 = time.time()
    ds = ds.materialize()
    wall = time.time() - t0
    stats = ds.stats()
    print(stats)
    print(f"\n=== wall: {wall:.2f} s, pages: {n_pages}, "
          f"pages/s: {n_pages / wall:,.0f} ===")
    # compact per-stage summary: name, wall-time block
    for m in re.finditer(r"Operator (\d+) (\S+?):.*?\n(.*?)(?=Operator |\Z)",
                         stats, re.S):
        blk = m.group(3)
        tm = re.search(r"\* Remote wall time: .*?, ([\d.]+[a-z]+) total", blk)
        cpu = re.search(r"\* Remote cpu time: .*?, ([\d.]+[a-z]+) total", blk)
        print(f"stage {m.group(1):>2} {m.group(2):<40} "
              f"wall={tm.group(1) if tm else '?':>10} "
              f"cpu={cpu.group(1) if cpu else '?':>10}")
    ray.shutdown()


if __name__ == "__main__":
    main()
