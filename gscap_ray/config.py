"""Job configuration + stage extension surface.

Reference analog: the ``~/.gscapConfig`` key=value loader (utils.py:27-46,
254-284) and the tunable-parameter dicts threaded through the pipeline
(DBSCAN params gps.py:1804-1828, fence gps.py:1103, impute freq
gps.py:1653, min_distance gps.py:1507). Here it is a plain frozen
dataclass — no hidden global state, trivially serialized to workers.

Wiring: the flagship entry points (``labeled_pages``,
``daily_features_direct``, ``run_checkpointed``) take ``config=`` and
thread eps / min_samples / fence_m into the per-partition labeler and
partitions / s2_level / hex_resolutions / grid_cell_deg into the tile
stage. ``distributed_dbscan`` and the per-stream library functions
(``clusters_with_context``, ``impute_stationary``,
``next_phase_clusters``) take the remaining knobs directly as keyword
arguments — pass ``config.impute_freq`` etc. at the call site.

Extension surface (SURVEY.md §2.11): any callable accepted by
``map_batches`` / ``map_groups`` is a stage; ``CONTEXT_LAYERS`` is the
registry for pluggable context layers (the reference's ``ApiSource`` enum
analog, gps.py:639-650) — register a loader returning the broadcastable
layer object consumed by stages/enrich.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable


@dataclass(frozen=True)
class JobConfig:
    # DBSCAN (reference defaults gps.py:1823-1826)
    eps: float = 0.005
    min_samples: int = 100
    # fences / distances (gps.py:1103, gps.py:1507, gps.py:1156)
    fence_m: float = 500.0
    next_phase_min_distance_m: float = 100.0
    home_work_max_km: float = 161.0
    # impute (gps.py:1653)
    impute_freq: str = "10Min"
    # engine layout: None -> derived from input size
    # (stages.geocode.partitions_for; ~62.5k rows per reduce partition)
    partitions: int | None = None
    s2_level: int = 12
    hex_resolutions: tuple[int, ...] = (7, 8, 9)
    grid_cell_deg: float = 0.1
    # distributed DBSCAN
    dbscan_cell_factor: float = 64.0


DEFAULT = JobConfig()

# name -> zero-arg loader returning a broadcastable context-layer object
CONTEXT_LAYERS: dict[str, Callable[[], Any]] = {}


def register_context_layer(name: str, loader: Callable[[], Any]) -> None:
    CONTEXT_LAYERS[name] = loader


def load_context_layer(name: str) -> Any:
    return CONTEXT_LAYERS[name]()


# builtin layers
def _builtin_polygons():
    from .synth import generate_polygon_layer

    return generate_polygon_layer()


def _builtin_raster():
    from .functions.raster import RasterLayer

    return RasterLayer(seed=42)


def _builtin_gazetteer():
    from .functions import gazetteer

    return gazetteer


register_context_layer("polygons", _builtin_polygons)
register_context_layer("raster", _builtin_raster)
register_context_layer("gazetteer", _builtin_gazetteer)
