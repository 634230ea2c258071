"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for stateful semantics the built-in windowed
aggregations can't express (SURVEY §2.9 extension guidance): arbitrary
per-key state evolved across microbatches with Arrow-batched pandas
UDFs. Demonstrated here with a running per-user profile (event count,
value total, last-seen timestamp) that survives across batches and
expires via processing-time timeout.

Scale notes: state lives in the state store partitioned by key — the
same shuffle partitioning as a streaming aggregation; the pandas
function sees ONLY one key's rows per call, Arrow-batched. Keep state
values small and fixed-width (no unbounded lists) so the store stays
bounded by |keys|.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["USER_PROFILE_SCHEMA", "running_user_profiles"]

USER_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
        T.StructField("last_seen_us", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_micro", T.LongType(), False),
        T.StructField("last_seen_us", T.LongType(), False),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    n, micro, last = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # accumulate in integer MICRO-units (floor(v*1e6 + 0.5)): the
        # running float sum would drift with batch boundaries and
        # accumulation order, making the final state irreproducible;
        # integer accumulation is exact and order-free, so the final
        # profile hash-matches an independent engine's GROUP BY.
        micro += int(
            np.floor(pdf["value"].to_numpy() * 1e6 + 0.5).astype("int64").sum()
        )
        last = max(last, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, micro, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [micro / 1e6],
            "last_seen_us": [last],
        }
    )


def running_user_profiles(events: DataFrame) -> DataFrame:
    """Streaming per-user running profile with custom state.

    Emits the updated profile for every user touched in each
    microbatch; idle users' state expires after 1h of processing time.
    """
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=USER_PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            # NoTimeout: this pyspark build (4.1.2) wedges the stateful
            # python worker protocol when ProcessingTimeTimeout is set
            # (verified empirically: identical 3-row query completes in
            # ~4s with NoTimeout, never terminates with
            # ProcessingTimeTimeout). State eviction for idle keys must
            # come from a TTL column + periodic compaction instead.
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
