"""Arrow list-column -> numpy matrix extraction for the embedding family.

The hot path for ANN / embedding near-dup is turning a `list<float>` /
`fixed_size_list<float>` column into an (n, d) float matrix. Doing that
via ``to_pylist()`` materializes n Python lists of d Python floats per
batch — the dominant cost at scale. This helper reads the Arrow buffers
directly: FixedSizeList flattens and reshapes with zero copies; a plain
List column takes the same path after a vectorized rectangularity check
on its offsets; only genuinely ragged input falls back to ``to_pylist``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def vec_matrix(col: pa.Array | pa.ChunkedArray,
               dtype=np.float64) -> np.ndarray:
    """(n, d) matrix from an embedding column without Python-object
    materialization. Zero-copy from the Arrow value buffer up to the
    final dtype cast (free when the buffer is already ``dtype``).

    Empty-block contract: ``fixed_size_list`` keeps its dimension —
    shape ``(0, list_size)`` — but a plain (variable-length) list column
    with zero rows carries no width information in Arrow, so the result
    is ``(0, 0)``. Callers that matmul against a ``(d, k)`` matrix must
    guard ``num_rows == 0`` before calling (all in-repo callers do)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    t = col.type
    if pa.types.is_fixed_size_list(t) and col.null_count == 0:
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(n, t.list_size).astype(dtype, copy=False)
    if (pa.types.is_list(t) or pa.types.is_large_list(t)) \
            and col.null_count == 0:
        offs = np.asarray(col.offsets)
        widths = np.diff(offs)
        if n == 0:
            return np.empty((0, 0), dtype=dtype)
        if (widths == widths[0]).all():
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(n, int(widths[0])).astype(dtype, copy=False)
    # ragged / nullable fallback — correctness path, not the hot path
    return np.asarray(col.to_pylist(), dtype=dtype)
