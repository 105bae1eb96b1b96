"""Arrow schemas for the engine's logical tables (SURVEY.md §1.2)."""

from __future__ import annotations

import pyarrow as pa

PAGES = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.large_string()),
    ("lang", pa.string()),
])

GEOCODED = pa.schema(list(PAGES) + [
    ("host", pa.string()),
    ("lat", pa.float64()),
    ("lon", pa.float64()),
])

TILED_EXTRA = [
    ("h3_r7", pa.uint64()),
    ("h3_r8", pa.uint64()),
    ("h3_r9", pa.uint64()),
    ("s2_cell", pa.uint64()),
    ("part_key", pa.uint32()),
]

CLUSTERS = pa.schema([
    ("host", pa.string()),
    ("cid", pa.string()),
    ("lat", pa.float64()),
    ("lon", pa.float64()),
    ("name", pa.string()),
    ("categories", pa.string()),
])

ENTRIES = pa.schema([
    ("host", pa.string()),
    ("cid", pa.string()),
    ("date", pa.string()),
    ("time_in", pa.timestamp("us")),
    ("midpoint", pa.timestamp("us")),
    ("time_out", pa.timestamp("us")),
    ("duration_s", pa.float64()),
    ("pos", pa.int64()),
    ("n_points", pa.int64()),
    ("lat", pa.float64()),
    ("lon", pa.float64()),
    ("local_tz", pa.string()),
])

POLYGONS = pa.schema([
    ("place_id", pa.string()),
    ("name", pa.string()),
    ("major_category", pa.string()),
    ("ring_lat", pa.list_(pa.float64())),
    ("ring_lon", pa.list_(pa.float64())),
])
