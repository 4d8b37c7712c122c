"""Waterway-table readers for user-supplied Parquet.

Accepted input schemas (auto-detected):
  A. engine-native: way_id:int64, lats:list<double>, lons:list<double>,
     name:string, wtype:string, width:string
  B. reference-shaped: id:int64, coordinates:list<struct<lat,lon>> (or
     list<list<double>> pairs), tags:map<string,string> — the dict shape
     the reference's WaterwayHandler emits (osm_waterway_extractor.py
     :1405-1409), flattened to the named columns with the same tag
     projection the reference applies at edge-creation time (:2591-2595).

Both paths prune columns at the read and apply the reference's
waterway-type tag filter (:1390) as a vectorized predicate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmwaterwayextractor_ray.config import Config
from osmwaterwayextractor_ray.stages._arrow import waterways_table


def read_waterways(path: str, config: Config | None = None):
    import pyarrow.parquet as pq
    import ray.data as rd

    config = config or Config()
    schema = pq.read_schema(path) if path.endswith(".parquet") else None
    names = set(schema.names) if schema is not None else set()

    if {"way_id", "lats", "lons"} <= names:
        ds = rd.read_parquet(path)
        allowed = set(config.waterway_types)

        def tag_filter(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.is_in(batch["wtype"], value_set=pa.array(sorted(allowed))))

        return ds.map_batches(tag_filter, batch_format="pyarrow")

    # reference-shaped
    ds = rd.read_parquet(path)
    allowed = set(config.waterway_types)

    def convert(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        way_ids, flat_lat, flat_lon, offsets = [], [], [], [0]
        names_, wtypes, widths = [], [], []
        for r in rows:
            tags = r.get("tags") or {}
            if isinstance(tags, list):  # map type arrives as list of kv structs
                tags = {kv["key"]: kv["value"] for kv in tags}
            wtype = tags.get("waterway", "")
            if wtype not in allowed:
                continue
            coords = r.get("coordinates") or []
            if coords and isinstance(coords[0], dict):
                pts = [(c["lat"], c["lon"]) for c in coords]
            else:
                pts = [(c[0], c[1]) for c in coords]
            if len(pts) < 2:
                continue  # ref WaterwayHandler skips <2-point ways (:1411-1414)
            for la, lo in pts:
                flat_lat.append(float(la))
                flat_lon.append(float(lo))
            offsets.append(len(flat_lat))
            way_ids.append(int(r["id"]))
            names_.append(tags.get("name", ""))
            wtypes.append(wtype)
            widths.append(tags.get("width", ""))
        return waterways_table(
            np.asarray(way_ids, dtype=np.int64),
            flat_lat,
            flat_lon,
            np.asarray(offsets, dtype=np.int64),
            names_,
            wtypes,
            widths,
        )

    return ds.map_batches(convert, batch_format="pyarrow")


def read_pq(path: str, columns=None, **kwargs):
    """``ray.data.read_parquet`` with the file's pandas metadata stripped
    from the schema. Pandas-written parquet carries an unhashable
    metadata dict that makes every downstream sort/groupby block
    concatenation log "Failed to hash the schemas (for deduplication)"
    (hundreds of lines per bench run, flagged by review twice) AND
    disables Ray's schema dedup. Passing an explicit metadata-free
    schema fixes it at the read operator itself — a downstream
    replace_schema_metadata map cannot (the read's own SplitBlocks
    already warns). All engine parquet reads go through here."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    sch = pq.read_schema(path).remove_metadata()
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns, schema=sch, **kwargs)
