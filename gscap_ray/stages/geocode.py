"""Geocode + tile-encode stages (stateless, zero-copy Arrow batches).

M13/C9 in SURVEY.md §2: derive (host, lat, lon) from (url, warc_ts) and
attach hierarchical cell ids. Pure numpy over ``batch_format='pyarrow'``
batches; every input column passes through untouched (byte-identity
invariant for ``text``)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.cells import grid_cell_id, hex_cell_id, s2_cell_id
from ..synth import geocode, hash64

DEFAULT_PARTITIONS = 128


def cluster_cpus(default: int = 8) -> int:
    """Cluster CPU count with a safe fallback — the ONE place the
    `ray.cluster_resources()` probe lives (read_blocks_for and the
    flagship's enrich-pool sizing both scale from it)."""
    import ray

    try:
        return (int(ray.cluster_resources().get("CPU", default))
                if ray.is_initialized() else default)
    except Exception:
        return default


def dataset_num_rows(path: str) -> int:
    """Row count from parquet footers only (no data read)."""
    import pyarrow.dataset as pds

    return sum(f.metadata.num_rows if f.metadata is not None
               else f.count_rows()
               for f in pds.dataset(path, format="parquet").get_fragments())


def read_blocks_for(n_rows: int | None, target_rows: int = 250_000) -> int | None:
    """Read block count sized so the groupby exchange sees FEW, LARGE blocks.

    Ray's sort-based shuffle emits one object per (map block x reduce
    partition); at the default read granularity (224 blocks for the 32-file
    8M-page bench) that is ~50k tiny objects and the exchange spends ~4 s of
    wall at <3% CPU pure object-store/scheduler overhead. Reading at
    ~target_rows rows per block (floored at the cluster CPU count so one map
    wave still fills every core) cut the fused flagship 6.9 s -> 2.2 s at 32
    CPUs (same remote CPU — the win is all exchange overhead). Capped at
    4096: beyond that the sub-object count again dominates and a real
    cluster wants a hierarchical/push-based exchange instead (documented
    partitioning assumption). Returns None (reader default) when the row
    count is unknown."""
    if not n_rows:
        return None
    import math

    ncpus = cluster_cpus()
    by_rows = math.ceil(n_rows / target_rows)
    # clamp: at least one block per core (fill the first map wave), at
    # most 4096 (sub-object count dominates beyond — see docstring). An
    # earlier ncpus*8 middle term silently capped blocks at 8 waves,
    # which at 10^10 rows meant ~150 GB blocks; by_rows must win until
    # the 4096 ceiling so per-block memory stays bounded at ~target_rows
    return max(1, min(max(ncpus, by_rows), 4096))


def partitions_for(n_rows: int | None, target_rows: int = 31_250) -> int:
    """Shuffle partition count derived from input size (VERDICT r1 #5:
    a hardcoded count caps reduce parallelism at cluster scale).

    ~target_rows rows per reduce partition (~32 MB of 1 KB page rows),
    clamped to [64, 1M]; falls back to DEFAULT_PARTITIONS when the size is
    unknown. Deterministic per input, so checkpoint/resume layouts agree
    across runs of the same dataset. Measured on the 8M-page bench at 32
    CPUs: 256 partitions beat 128 by ~8% (smaller reduce groups shrink the
    straggler tail of the fused label+daily stage) and 512+ adds overhead."""
    import math

    if not n_rows:
        return DEFAULT_PARTITIONS
    return max(64, min(1_048_576, math.ceil(n_rows / target_rows)))


def extract_host(urls: np.ndarray) -> np.ndarray:
    """Vectorized host extraction from scheme://host/path urls.

    Splits on '/' and takes element 2 — the SAME rule as
    extract_host_arrow, so the pandas and Arrow paths agree for any
    scheme (the old literal 'https://' strip turned every http:// URL
    into the single pseudo-host 'http:', silently corrupting the
    per-host grouping key and diverging from the fused path)."""
    import pandas as pd

    s = pd.Series(urls, dtype="object").str.split("/", n=3).str[2]
    return s.values


def extract_host_arrow(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Host extraction with Arrow C++ kernels (~10x the pandas str path):
    scheme://host/path -> split on '/' -> element 2."""
    parts = pc.split_pattern(urls, pattern="/", max_splits=3)
    out = pc.list_element(parts, 2)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def geocode_batch(batch: pa.Table) -> pa.Table:
    """Add host, lat, lon columns."""
    urls = batch["url"].to_numpy(zero_copy_only=False)
    hosts = extract_host(urls)
    ts_us = batch["warc_ts"].cast(pa.int64()).to_numpy()
    lat, lon = geocode(hash64(hosts), hash64(urls), ts_us)
    return (batch
            .append_column("host", pa.array(hosts, pa.string()))
            .append_column("lat", pa.array(lat, pa.float64()))
            .append_column("lon", pa.array(lon, pa.float64())))


def _tile_columns(batch: pa.Table, lat, lon, host_h, partitions: int,
                  config=None) -> pa.Table:
    """Shared tile-column appender: hex levels, S2 level and grid cell
    size come from the JobConfig (defaults reproduce the engine's
    canonical h3_r7/8/9 + level-12 S2 + 0.1-degree grid layout)."""
    if config is None:
        from ..config import DEFAULT as config
    for r in config.hex_resolutions:
        batch = batch.append_column(
            f"h3_r{r}", pa.array(hex_cell_id(lat, lon, r), pa.uint64()))
    return (batch
            .append_column("s2_cell", pa.array(
                s2_cell_id(lat, lon, config.s2_level), pa.uint64()))
            .append_column("grid_cell", pa.array(
                grid_cell_id(lat, lon, config.grid_cell_deg), pa.int64()))
            .append_column("host_hash", pa.array(host_h.view(np.int64), pa.int64()))
            .append_column("part_key", pa.array(
                (host_h % np.uint64(partitions)).astype(np.uint32), pa.uint32())))


def tile_batch(batch: pa.Table, partitions: int = DEFAULT_PARTITIONS,
               config=None) -> pa.Table:
    """Add h3_r*/s2_cell/grid_cell and part_key columns (levels from the
    JobConfig; defaults = h3_r7/8/9, S2 level 12, 0.1-degree grid).

    ``part_key`` is the hash-partition of the *host* (the per-stream shuffle
    key) — pages of one host always land in one partition, the unit of
    checkpointing and resume."""
    lat = batch["lat"].to_numpy()
    lon = batch["lon"].to_numpy()
    host_h = hash64(batch["host"].to_numpy(zero_copy_only=False))
    return _tile_columns(batch, lat, lon, host_h, partitions, config)


def geocode_tile_batch(batch: pa.Table, partitions: int = DEFAULT_PARTITIONS,
                       config=None) -> pa.Table:
    """Fused geocode + tile encode: hashes hosts/urls exactly once
    (geocode_batch + tile_batch hash the host column independently; at
    10^7+ rows the duplicate murmur pass is measurable)."""
    from ..synth import geocode, hash64_dictionary

    host_arr = extract_host_arrow(batch["url"])
    host_h = hash64_dictionary(host_arr)  # repetitive column: dict path
    urls = batch["url"].to_numpy(zero_copy_only=False)
    ts_us = batch["warc_ts"].cast(pa.int64()).to_numpy()
    lat, lon = geocode(host_h, hash64(urls), ts_us)
    batch = (batch
             .append_column("host", host_arr)
             .append_column("lat", pa.array(lat, pa.float64()))
             .append_column("lon", pa.array(lon, pa.float64())))
    return _tile_columns(batch, lat, lon, host_h, partitions, config)


def text_hash_batch(batch: pa.Table) -> pa.Table:
    """Attach a deterministic uint64 hash of ``text`` (the byte-identity
    invariant is verified hash-wise at stage boundaries instead of carrying
    the bytes everywhere; SURVEY.md §7 'Wide binary rows')."""
    th = hash64(batch["text"].to_numpy(zero_copy_only=False))
    return batch.append_column("text_hash", pa.array(th, pa.uint64()))
