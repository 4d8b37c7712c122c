"""Small pyarrow helpers shared by the stages (zero-copy list-column access)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_column(batch: pa.Table, name: str) -> tuple[np.ndarray, np.ndarray]:
    """Return (flat_values float64, offsets int64) of a list<double> column,
    zero-copy where Arrow allows."""
    col = batch.column(name)
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.LargeListArray):
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    # Arrow list arrays may have a non-zero start offset after slicing.
    if offsets[0] != 0:
        values = values[offsets[0] : offsets[-1]]
        offsets = offsets - offsets[0]
    return values, offsets


def make_list_array(values: np.ndarray, offsets: np.ndarray) -> pa.ListArray:
    return pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32) if offsets[-1] < 2**31 else offsets, type=pa.int32()),
        pa.array(values, type=pa.float64()),
    )


def str_column(batch: pa.Table, name: str) -> list[str]:
    col = batch.column(name)
    return ["" if v is None else v for v in col.to_pylist()]


def np_column(batch: pa.Table, name: str, dtype=np.float64) -> np.ndarray:
    col = batch.column(name)
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.to_numpy(zero_copy_only=False).astype(dtype)


def empty_waterways_table() -> pa.Table:
    return pa.table(
        {
            "way_id": pa.array([], type=pa.int64()),
            "lats": pa.array([], type=pa.list_(pa.float64())),
            "lons": pa.array([], type=pa.list_(pa.float64())),
            "name": pa.array([], type=pa.string()),
            "wtype": pa.array([], type=pa.string()),
            "width": pa.array([], type=pa.string()),
        }
    )


def waterways_table(
    way_ids, flat_lats, flat_lons, offsets, names, wtypes, widths
) -> pa.Table:
    return pa.table(
        {
            "way_id": pa.array(np.asarray(way_ids, dtype=np.int64), type=pa.int64()),
            "lats": make_list_array(np.asarray(flat_lats, dtype=np.float64), offsets),
            "lons": make_list_array(np.asarray(flat_lons, dtype=np.float64), offsets),
            "name": pa.array(list(names), type=pa.string()),
            "wtype": pa.array(list(wtypes), type=pa.string()),
            "width": pa.array(list(widths), type=pa.string()),
        }
    )
