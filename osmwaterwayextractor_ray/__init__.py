"""osmwaterwayextractor_ray — a from-scratch Ray-Data-native geospatial engine.

Re-expresses the query/data-processing capabilities of the reference
OSMWaterWayExtractor (single-file multiprocessing CLI, see SURVEY.md) as
idiomatic `ray.data.Dataset` pipelines: zero-copy Arrow `map_batches`
stages, actor pools for stateful extractors, `groupby(cell)` shuffles with
explicit salting/halo handling, broadcast small-side joins, and
parameter-hashed Parquet checkpoints.

Layout:
  functions/  pure vectorized kernels (hashing, geodesy, geometry, width, text, cells)
  state/      union-find and other per-partition state containers
  stages/     Dataset -> Dataset transforms (clean, intersect, endpoints, cluster, edges, ...)
  sources/    readers + deterministic synthetic input derivations
  pipelines/  end-to-end compositions (waterway graph, geo points, spatial joins)
"""

from osmwaterwayextractor_ray.config import Config

__all__ = ["Config"]
__version__ = "0.1.0"
