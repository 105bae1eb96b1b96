"""gscap_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch rebuild of the capabilities of aid4mh/gSCAP (GPS contextual
feature extraction: velocity binning, DBSCAN stay-point clustering, home/work
inference, place-context enrichment, sessionization, longitudinal daily
features) re-expressed as a general engine over Common-Crawl-style web-page
tables (url, warc_ts, html, text, lang) using ray.data.Dataset pipelines:

- vectorized numpy/Arrow kernels inside ``map_batches`` (zero-copy),
- per-key streams via ``groupby(host).map_groups``,
- stateful lookups (point-in-polygon STRtree-grid, kNN, raster tiles,
  gazetteers) as actor pools,
- explicit shuffle/skew handling (salted hot cells, partial aggregation),
- per-partition checkpoint manifests for resumable runs.

No third-party geo libs: H3/S2-style cell encoders, DBSCAN, point-in-polygon
and kNN indexes are implemented from scratch in vectorized numpy.
"""

__version__ = "0.1.0"
