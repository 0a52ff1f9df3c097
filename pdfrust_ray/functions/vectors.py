"""Arrow <-> numpy embedding-column helpers.

An embedding column arrives as `list<float>` (or `fixed_size_list`).
Loading it via `.to_pylist()` materializes a Python list-of-lists per
batch — a real hot-path cost. These helpers go Arrow buffer -> numpy
directly: for fixed_size_list it's a zero-copy reshape; for variable
lists with uniform lengths it's a reshape of the flat values buffer
after an offsets check.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def embedding_matrix(col, dtype=np.float64) -> np.ndarray:
    """Return an [n, d] numpy matrix from a list-typed Arrow column.

    Accepts Array or ChunkedArray of list<float*> / fixed_size_list.
    Raises on nulls or ragged lengths (embedding tables are dense).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if col.null_count:
        raise ValueError("embedding column contains nulls")
    t = col.type
    if pa.types.is_fixed_size_list(t):
        d = t.list_size
        vals = col.values.to_numpy(zero_copy_only=False)
        return vals.reshape(n, d).astype(dtype, copy=False)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError("embedding column has ragged list lengths")
    vals = col.values.to_numpy(zero_copy_only=False)
    # a sliced ListArray's values buffer may carry data outside
    # [offsets[0], offsets[-1]); slice before reshaping
    return vals[offsets[0] : offsets[-1]].reshape(n, d).astype(dtype, copy=False)


def int_column(col, dtype=np.int64) -> np.ndarray:
    """Numeric Arrow column -> numpy without a Python-list detour."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False).astype(dtype, copy=False)
