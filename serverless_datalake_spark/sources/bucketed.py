"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the lineitem⋈orders shuffle is the single largest data
movement in the warehouse. Writing both tables bucketed by the join
key (same bucket count) pre-co-locates matching keys: the sort-merge
join then reads bucket i of each side on the same executor — zero
Exchange in the plan (tests pin this). This is the Spark analog of
the reference's static partition-key co-location idea (SURVEY.md §4)
applied to joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed managed table (Hive-style layout in the
    session warehouse). Sorting within buckets lets the join skip its
    sort phase too."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    w = w.sortBy(sort_col or bucket_col)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key])
