"""Date arithmetic helpers (SURVEY §2.2 T-20/T-21).

``roll_back_weekend`` re-derives the reference's trade-date weekend
rollback (``get_trade_date``, reference api/src/etl/base/extractor.py:81-93):
Saturday -> Friday, Sunday -> Friday, weekdays unchanged. Vectorized over
an Arrow timestamp/date column.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def roll_back_weekend(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Roll Saturday/Sunday back to the preceding Friday.

    Uses ISO day of week (Mon=1..Sun=7): subtract (dow - 5) days when
    dow > 5.
    """
    dow = pc.day_of_week(col, count_from_zero=False, week_start=1)  # Mon=1
    over = pc.subtract(pc.cast(dow, pa.int64()), 5)
    days_back = pc.if_else(pc.greater(over, 0), over, 0)
    # timestamp arithmetic: subtract days as duration
    us = pc.multiply(pc.cast(days_back, pa.int64()),
                     86_400_000_000)  # days -> microseconds
    return pc.subtract(pc.cast(col, pa.timestamp("us")),
                       pc.cast(us, pa.duration("us")))
