"""Stateful enrichment stages (actor pools): point-in-polygon context join,
kNN assignment, raster sampling.

Pattern (SURVEY.md §2.3): state (prepared polygon index / reference points /
raster tiles) is built ONCE per actor in ``__init__`` from a broadcast
``ray.put`` object ref, then every ``__call__`` handles one Arrow batch
vectorized. This replaces the reference's per-call HTTP + single-writer
sqlite cache design (gps.py:504-624) with shared-nothing lookups."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.knn import nearest_neighbor
from ..functions.pip import PolygonIndex


class PipEnricher:
    """Adds place_id / place_category via point-in-polygon (J10).

    ``polygons_ref``: ray.ObjectRef of the polygon layer (list of dicts) —
    pass the ref, not the list, so the layer ships once per node, not per
    batch."""

    def __init__(self, polygons_ref, cell_deg: float = 0.25):
        import ray

        obj = ray.get(polygons_ref) if isinstance(polygons_ref, ray.ObjectRef) else polygons_ref
        if isinstance(obj, PipEnricher):
            # prebuilt-index broadcast: the driver builds the grid index
            # ONCE and ray.puts the finished enricher — unpickling it here
            # is ~8x cheaper than rebuilding (measured 57 ms vs 440 ms on
            # the 6.5k-polygon bench layer; x32 workers that was ~27% of
            # the whole enrich stage's remote CPU)
            self.index = obj.index
            self.place_ids = obj.place_ids
            self.categories = obj.categories
            return
        self.index = PolygonIndex(obj, cell_deg=cell_deg)
        self.place_ids = np.array([p["place_id"] for p in obj] + [None], dtype=object)
        self.categories = np.array([p["major_category"] for p in obj] + [None], dtype=object)

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = self.index.query(batch["lat"].to_numpy(), batch["lon"].to_numpy())
        return (batch
                .append_column("place_id", pa.array(self.place_ids[idx], pa.string()))
                .append_column("place_category", pa.array(self.categories[idx], pa.string())))


# driver-side broadcast memo: the context layer is static across pipeline
# launches, so the grid-index build (~0.3 s at 6.5k polygons) and the
# ray.put (~0.2 s) are paid once per (layer, Ray job) instead of once per
# run — both were pure driver-serial time inside every timed pipeline,
# identical at every CPU count (the constant term the scaling ladder sees)
_BROADCAST_CACHE: dict = {}


def broadcast_enricher(polygons, cell_deg: float = 0.25):
    """ray.put of the FINISHED PipEnricher, memoized per layer + session.

    Keyed by ``id(polygons)`` — safe because the cache entry pins the layer
    object itself, so the id can't be recycled while the entry lives (a
    content hash of the 6.5k-polygon bench layer costs ~0.15 s, most of
    what the memo saves) — plus the Ray job id, so a ``ray.shutdown()`` /
    ``ray.init()`` cycle in the same process never hands out a ref from a
    dead session."""
    import ray

    key = (ray.get_runtime_context().get_job_id(), id(polygons), cell_deg)
    hit = _BROADCAST_CACHE.get(key)
    if hit is None:
        hit = (polygons, ray.put(PipEnricher(polygons, cell_deg=cell_deg)))
        _BROADCAST_CACHE[key] = hit
    return hit[1]


# per-worker-process cache for the stateless PIP task variant: the index is
# built at most once per (worker, layer) instead of once per actor, removing
# actor-pool startup from the pipeline entirely (index build is milliseconds
# for layers up to ~10^4 polygons; use the actor PipEnricher above for
# genuinely heavy layers)
# value is (keyed_object, enricher): pinning the keyed object keeps its
# id() from being recycled by a LATER layer deserialized at the same
# address — an id-keyed cache without the pin could serve an enricher
# built from a different polygon layer
_PIP_CACHE: dict = {}


def make_pip_task(polygons_ref, cell_deg: float = 0.25):
    """Returns a plain function for map_batches (stateless tasks)."""
    def pip_task(batch: pa.Table) -> pa.Table:
        is_ref = hasattr(polygons_ref, "binary")
        key = polygons_ref.binary() if is_ref else id(polygons_ref)
        hit = _PIP_CACHE.get(key)
        # ObjectRef binaries are globally unique; id() keys additionally
        # require the pinned object to BE the argument
        if hit is not None and (is_ref or hit[0] is polygons_ref):
            return hit[1](batch)
        enricher = PipEnricher(polygons_ref, cell_deg=cell_deg)
        _PIP_CACHE[key] = (polygons_ref, enricher)
        return enricher(batch)

    return pip_task


class KnnAssigner:
    """Assigns each row the id of its nearest reference point (J1/J3 analog:
    the reference's zipcode-KDTree lookup)."""

    def __init__(self, ref_table_ref, id_col: str = "id",
                 metric: str = "haversine", max_distance: float | None = None,
                 out_col: str = "nn_id"):
        import ray

        ref = ray.get(ref_table_ref) if isinstance(ref_table_ref, ray.ObjectRef) else ref_table_ref
        self.rlat = np.asarray(ref["lat"], dtype=np.float64)
        self.rlon = np.asarray(ref["lon"], dtype=np.float64)
        self.ids = np.asarray(ref[id_col])
        self.metric = metric
        self.max_distance = max_distance
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx, dist = nearest_neighbor(batch["lat"].to_numpy(), batch["lon"].to_numpy(),
                                     self.rlat, self.rlon, metric=self.metric,
                                     max_distance=self.max_distance)
        ids = np.where(idx >= 0, self.ids[np.maximum(idx, 0)], None)
        return (batch
                .append_column(self.out_col, pa.array(ids.astype(object)))
                .append_column(self.out_col + "_dist", pa.array(dist, pa.float64())))


class RasterSampler:
    """Samples a context raster at each point (C10; reference analog: the
    hourly-weather grid lookup, weather.py:405-489). Tiles are built/cached
    per actor."""

    def __init__(self, raster_ref, out_col: str = "raster_value",
                 method: str = "bilinear"):
        import ray

        r = ray.get(raster_ref) if isinstance(raster_ref, ray.ObjectRef) else raster_ref
        self.raster = r
        self.out_col = out_col
        self.method = method

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = self.raster.sample(batch["lat"].to_numpy(), batch["lon"].to_numpy(),
                               method=self.method)
        return batch.append_column(self.out_col, pa.array(v, pa.float64()))
