"""Dashboard read-path tests over a real pipeline run's exports."""

from __future__ import annotations

import pytest

from scotustician_spark.pipeline import run_pipeline
from scotustician_spark.visualization import (
    cluster_box_stats,
    cluster_size_distribution,
    load_results,
    representative_table,
    term_trend,
)
from tests.fixtures_oa import make_corpus, write_corpus_json


@pytest.fixture(scope="module")
def outputs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("viz")
    write_corpus_json(make_corpus(n_docs=9, seed=13), str(d / "corpus"))
    run_pipeline(spark, str(d / "corpus"), out_dir=str(d / "out"), n_clusters=3)
    return load_results(spark, str(d / "out"))


def test_cluster_sizes(outputs):
    sizes = cluster_size_distribution(outputs["cluster_results"]).collect()
    assert sum(r["count"] for r in sizes) == 9
    assert all(r["count"] >= 1 for r in sizes)


def test_term_trend(outputs):
    trend = term_trend(outputs["utterances"]).collect()
    assert sum(r["n_cases"] for r in trend) == 9
    assert [r["term"] for r in trend] == sorted(r["term"] for r in trend)


def test_box_stats(outputs, spark):
    per_case = (
        outputs["utterances"]
        .groupBy("case_id")
        .count()
        .join(outputs["cluster_results"], "case_id")
    )
    stats = cluster_box_stats(per_case, "count").collect()
    for r in stats:
        assert r["p25"] <= r["p50"] <= r["p75"]


def test_representative_table(outputs):
    reps = representative_table(
        outputs["cluster_results"], outputs["cluster_report"]
    ).collect()
    # one representative row per cluster, and it is a member of the cluster
    assert len(reps) == outputs["cluster_report"].count()


def test_dashboard_server_serves_panels(spark, outputs, tmp_path_factory):
    """The stdlib serving surface: panels materialize once, JSON and
    HTML endpoints serve them, unknown panels 404."""
    import json
    import urllib.request

    from scotustician_spark.serving import DashboardServer

    panels = {
        "cluster_sizes": cluster_size_distribution(outputs["cluster_results"]),
        "term_trend": term_trend(outputs["utterances"]),
    }
    srv = DashboardServer(panels, port=0)
    srv.start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        health = json.load(urllib.request.urlopen(f"{base}/healthz"))
        assert health["ok"] and health["panels"] == ["cluster_sizes", "term_trend"]
        sizes = json.load(urllib.request.urlopen(f"{base}/api/panel/cluster_sizes"))
        assert sizes["columns"] == ["cluster", "count"]
        assert sum(r[1] for r in sizes["rows"]) == 9
        page = urllib.request.urlopen(f"{base}/").read().decode()
        assert "cluster_sizes" in page and "<table" in page
        try:
            urllib.request.urlopen(f"{base}/api/panel/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()


def test_build_panels_composes_all(spark, outputs, tmp_path_factory):
    """build_panels wires the full reference panel set over a real run
    directory (same exports load_results reads)."""
    from scotustician_spark.serving import build_panels

    d = tmp_path_factory.mktemp("viz2")
    write_corpus_json(make_corpus(n_docs=6, seed=5), str(d / "corpus"))
    run_pipeline(spark, str(d / "corpus"), out_dir=str(d / "out"), n_clusters=2)
    panels = build_panels(spark, str(d / "out"))
    assert set(panels) == {"cluster_sizes", "term_trend", "representatives"}
    assert panels["cluster_sizes"].count() >= 1
    assert panels["representatives"].count() >= 1
