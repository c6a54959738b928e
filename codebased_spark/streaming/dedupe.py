"""Streaming exact deduplication (SURVEY.md §2.5 / LLM-pipeline ops).

The streaming twin of operators/dedup.exact_duplicates: a document
stream is deduplicated on its content digest with BOUNDED state —
``dropDuplicatesWithinWatermark`` keeps a digest in state only until
the watermark passes its admission time plus the lateness allowance,
so state is O(digests seen within the watermark horizon), not O(all
digests ever) (the unbounded-state trap of a naive dropDuplicates on
a stream).

Semantics (pinned by test): the FIRST arrival of a digest is emitted;
re-arrivals within the watermark horizon are dropped; once the
watermark passes and the digest's state is evicted, the same content
is admitted again — exactly the "dedup within a freshness window"
contract an always-on ingestion pipeline wants (a re-crawled page
months later SHOULD re-enter curation).

Scale: one shuffle on the 16-byte digest (never the text), state in
the state store partitioned the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    delay: str = "30 minutes",
    text_col: str = "text",
) -> DataFrame:
    """First-arrival-wins exact dedup over a document stream. Returns
    the input rows plus their ``digest`` column, duplicates within the
    watermark horizon removed."""
    return (
        docs.withColumn(
            "digest", F.md5(F.coalesce(F.col(text_col), F.lit("")))
        )
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["digest"])
    )
