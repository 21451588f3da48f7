"""Referential integrity: foreign keys with no match in a dimension table.

Expressed as LEFT ANTI joins (SURVEY.md §2.3). The dimension side (media
catalog, customer dim) is broadcast when it fits — at 10^12 fact rows the fact
side must never shuffle for this check. For a dimension too big to broadcast,
the anti-join falls back to sort-merge where AQE's skew splitting applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dangling_refs(fact: DataFrame, fk: str, dim: DataFrame, pk: str,
                  broadcast_dim: bool = True,
                  distinct_dim: bool = False) -> DataFrame:
    """Rows of ``fact`` whose non-null ``fk`` has no match in ``dim.pk``.

    ``distinct_dim`` defaults to OFF (round 6): a LEFT ANTI join drops a row
    on ANY match, so de-duplicating the dim side never changes the result —
    it only pays an extra full shuffle+aggregate of the dim per run
    (measured ~1 s per pass on the 1.5M-ref bench catalog). Referential
    targets are primary keys, i.e. already unique; flip it on only for a
    dup-heavy dim where shrinking the broadcast/build side is worth the
    distinct's shuffle."""
    d = dim.select(F.col(pk).alias(fk))
    if distinct_dim:
        d = d.distinct()
    if broadcast_dim:
        d = F.broadcast(d)
    return fact.where(F.col(fk).isNotNull()).join(d, on=fk, how="left_anti")


def referential_violations_spans(docs: DataFrame, catalog: DataFrame,
                                 broadcast_dim: bool = True) -> DataFrame:
    """Interleaved-docs spans whose media_ref is absent from the media catalog.

    Output is violation-row shaped (error_type='referential'), one row per
    dangling span, with the exact field path ``spans[i].media_ref``.
    """
    spans = (docs
             .select("doc_id", F.posexplode("spans").alias("i", "span"))
             .select("doc_id", "i", F.col("span.media_ref").alias("media_ref"))
             .where(F.col("media_ref").isNotNull()))
    dangling = dangling_refs(spans, "media_ref", catalog, "media_ref",
                             broadcast_dim=broadcast_dim)
    return dangling.select(
        "doc_id",
        F.concat(F.lit("spans["), F.col("i").cast("string"),
                 F.lit("].media_ref")).alias("field"),
        F.lit("referential").alias("error_type"),
        F.lit("media_ref present in catalog").alias("expected"),
        F.col("media_ref").alias("actual"),
    )
