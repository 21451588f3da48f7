"""The reference's analytics-dashboard queries as library functions.

Maps SURVEY.md §2.4 A1–A10 (/root/reference/streamlit_ev/app/validation_report.py)
onto DataFrame operations over a violations/log table — or any event log with
(ts, event_name-ish, status-ish, id-ish) columns. Each is a single declarative
plan: partition-pruned date filter (A1), hash aggregations with partial
(map-side) combine (A6-A8), and derived columns (A9). No collects, no loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def date_range_scan(df: DataFrame, ts_col: str, start: str, end: str,
                    projection: list[str] | None = None) -> DataFrame:
    """A1: WHERE date BETWEEN — prunes partitions/row-groups when ts is the
    partition or sort column; explicit projection for column pruning."""
    out = df.where(F.col(ts_col).cast("date").between(F.lit(start), F.lit(end)))
    return out.select(*projection) if projection else out


def distinct_names(df: DataFrame, name_col: str) -> DataFrame:
    """A2: sorted distinct event names."""
    return df.select(name_col).distinct().orderBy(name_col)


def failures_per_day(df: DataFrame, ts_col: str, name_col: str,
                     is_error: Column) -> DataFrame:
    """A4+A5+A6: error rows per day × event name."""
    return (df.where(is_error)
            .groupBy(F.date_trunc("day", F.col(ts_col)).alias("date"),
                     F.col(name_col).alias("event_name"))
            .agg(F.count(F.lit(1)).alias("failures"))
            .orderBy("date", "event_name"))


def daily_error_rate(df: DataFrame, ts_col: str, id_col: str,
                     is_error: Column, approx: bool = False) -> DataFrame:
    """A7+A8+A9: per-day distinct ids, distinct error ids, error rate %.

    ``approx=True`` swaps exact countDistinct for HLL — the 10^12-row path
    (A7's n_unique does not scale exactly; SURVEY.md §2.4)."""
    total = (F.approx_count_distinct(id_col) if approx
             else F.countDistinct(id_col))
    err_id = F.when(is_error, F.col(id_col))
    errors = (F.approx_count_distinct(err_id) if approx
              else F.countDistinct(err_id))
    return (df.groupBy(F.date_trunc("day", F.col(ts_col)).alias("date"))
            .agg(total.alias("total_events"), errors.alias("error_events"))
            .withColumn("error_rate",
                        F.round(F.col("error_events") / F.col("total_events")
                                * 100, 6))
            .orderBy("date"))


def membership_filter(df: DataFrame, name_col: str, selected: list[str]) -> DataFrame:
    """A3: event_name ∈ selected."""
    return df.where(F.col(name_col).isin(selected))


def report_date_label(col: Column) -> Column:
    """F10: the dashboard's strftime('%b %d') axis label
    (validation_report.py:138-139) — 'Jan 05' style, locale-stable."""
    return F.date_format(col, "MMM dd")
