"""Dashboard read path (reference §3.3: services/visualization/ —
Streamlit over exported CSV/JSON results).

The reference lists S3 prefixes, loads results CSV + metadata JSON
into pandas, and aggregates driver-locally (visualization/helpers.py:
20-114, 236-319). Spark restatement: read the pipeline's exported
result tables (partition layout replaces prefix listing), compute the
same aggregations as DataFrames, and ``cache()`` the hot frame (the
st.cache_data TTL analog). Everything here is a small declarative
plan over already-aggregated outputs — cheap at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_results(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    """Discover + load a pipeline run's exports (helpers.py:74-114).
    The cluster-results frame is cached: every dashboard panel reads it.
    """
    res = {
        "cluster_results": spark.read.option("header", True)
        .csv(f"{out_dir}/cluster_results")
        .withColumn("cluster", F.col("cluster").cast("int"))
        .cache(),
        "cluster_report": spark.read.json(f"{out_dir}/cluster_report"),
        "utterances": spark.read.parquet(f"{out_dir}/utterances"),
    }
    return res


def cluster_size_distribution(results: DataFrame) -> DataFrame:
    """A11: cluster label value_counts (helpers.py:236-251)."""
    return results.groupBy("cluster").count().orderBy("cluster")


def cluster_box_stats(
    assigned: DataFrame, value_col: str, cluster_col: str = "cluster"
) -> DataFrame:
    """A12: per-cluster quartiles of a metric (helpers.py:253-268)."""
    q = F.percentile(F.col(value_col).cast("double"), F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75)]))
    return assigned.groupBy(cluster_col).agg(
        q[0].alias("p25"), q[1].alias("p50"), q[2].alias("p75"),
        F.count("*").alias("n"),
    )


def term_trend(utterances: DataFrame) -> DataFrame:
    """A13: per-term rollup across analyses (helpers.py:271-319):
    cases, utterances, words per term, ordered by term."""
    return (
        utterances.groupBy("term")
        .agg(
            F.countDistinct("case_id").alias("n_cases"),
            F.count("*").alias("n_utterances"),
            F.sum("word_count").alias("total_words"),
        )
        .orderBy("term")
    )


def representative_table(
    results: DataFrame, report: DataFrame
) -> DataFrame:
    """J6: join representatives back to their result rows
    (visualization/helpers.py:165-186) — semi-join shape on the id."""
    reps = report.select(
        F.col("cluster").cast("int").alias("cluster"),
        F.get_json_object("report_json", "$.representative_id").alias("case_id"),
    )
    return results.join(reps, ["cluster", "case_id"], "inner")
