"""Custom stateful streaming operators (applyInPandasWithState).

``streaming_dedup`` is the streaming twin of the batch exact-dedup
operator: the first document seen for each content hash is emitted, every
later duplicate (same micro-batch or any later one) is dropped. State per
key is a single boolean — at corpus scale the state store holds one entry
per distinct document, the minimum possible for exact streaming dedup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Emit each distinct document once (first occurrence by arrival);
    drop duplicates across the whole stream using keyed state."""
    out_schema = T.StructType(
        [
            T.StructField("content_hash", T.StringType()),
            T.StructField(id_col, T.LongType()),
            T.StructField(text_col, T.StringType()),
        ]
    )
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # this content already emitted in an earlier batch
        first = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.iloc[[0]][["content_hash", id_col, text_col]]
        if first is not None:
            state.update((True,))
            yield first

    keyed = stream.withColumn(
        "content_hash", F.sha2(F.col(text_col).cast("binary"), 256)
    )
    return keyed.groupBy("content_hash").applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(agg: DataFrame, query_name: str) -> DataFrame:
    """availableNow drain for append-mode stateful streams (unique per-run
    sink name + post-drain cleanup — see windows.drain_available_now)."""
    from pcap_converter_spark.streaming.windows import drain_available_now

    return drain_available_now(agg, query_name, "append")
