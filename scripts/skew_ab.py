"""Interleaved skew/uniform A/B for the flagship (clean-window evidence).

The in-suite skew ratio pairs a suite-start uniform reading with a
suite-end skew reading, so ~40 queries of object-store pressure and any
co-tenant load land asymmetrically on one side (BASELINE.md r4 notes).
This script interleaves U,S,U,S... in ONE fresh process on prebuilt
worlds (no regeneration inside any timed region) and reports the
paired best-vs-best ratio — the number that actually measures skew cost.

Usage: python scripts/skew_ab.py [reps=3]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")

    from gscap_ray.pipelines.flagship import daily_features_direct
    from gscap_ray.synth import ensure_pages, generate_polygon_layer

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    n_pages = n_docs * 1600
    uni = ensure_pages(f"/tmp/gscap_bench_pages_{n_pages}", n_pages,
                       n_hosts=max(50, n_docs // 160), days=6)
    skew = ensure_pages(f"/tmp/gscap_bench_pages_skew_{n_pages}", n_pages,
                        n_hosts=max(50, n_docs // 160), days=6, hot_frac=0.10)
    polys = generate_polygon_layer(n_hosts=max(50, n_docs // 160))

    # one untimed warmup on each world (worker heap + object-store warmup)
    daily_features_direct(uni, polygons=polys).count()
    daily_features_direct(skew, polygons=polys).count()

    u_times, s_times = [], []
    for _ in range(reps):
        t0 = time.time()
        daily_features_direct(uni, polygons=polys).count()
        u_times.append(round(time.time() - t0, 3))
        t0 = time.time()
        daily_features_direct(skew, polygons=polys).count()
        s_times.append(round(time.time() - t0, 3))

    out = {
        "metric": "skew_ab_paired",
        "n_pages": n_pages,
        "uniform_runs": u_times,
        "skew_runs": s_times,
        "uniform_best": min(u_times),
        "skew_best": min(s_times),
        "skew_ratio_paired": round(min(s_times) / min(u_times), 3),
        "loadavg": list(os.getloadavg()),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
