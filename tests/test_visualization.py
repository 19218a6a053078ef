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


def test_dashboard_html_renders_all_panels(spark, outputs, tmp_path_factory):
    """Static chart page: KPI tiles, three SVG charts, scatter legend
    with the Other fold, table views, and the live-server composition
    (the rendered page replaces the bare index at /)."""
    import urllib.request

    from pyspark.sql import functions as F

    from scotustician_spark.dashboard import (
        dashboard_panels,
        dashboard_summary_json,
        render_dashboard_html,
    )
    from scotustician_spark.serving import DashboardServer

    proj = outputs["cluster_results"].select(
        (F.xxhash64("case_id") % 100).cast("double").alias("x"),
        (F.xxhash64("case_id", "cluster") % 100).cast("double").alias("y"),
        "cluster",
    )
    panels = dashboard_panels(
        outputs["cluster_results"],
        outputs["cluster_report"],
        outputs["utterances"],
        projection=proj,
    )
    assert panels["totals"]["n_cases"] == 9
    assert sum(n for _, n in panels["sizes"]) == 9
    for r in panels["box"]:
        assert r["p25"] <= r["p50"] <= r["p75"]

    page = render_dashboard_html(panels)
    assert page.count('class="card tile"') == 4
    assert page.count("<svg") >= 4  # columns, range, line, scatter
    assert 'class="legend"' in page and ">Other</span>" in page
    assert page.count("table view") >= 3  # no value is hover-gated
    assert "NaN" not in page and "None<" not in page

    import json

    summary = json.loads(dashboard_summary_json(panels))
    assert summary["total_cases"] == 9
    assert summary["clusters_found"] == len(panels["sizes"])

    srv = DashboardServer(
        {"cluster_sizes": outputs["cluster_results"].groupBy("cluster").count()},
        port=0,
        index_html=page,
    )
    srv.start()
    try:
        got = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/"
        ).read().decode()
        assert got == page  # chart page replaced the bare-table index
        api = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/api/panels"
        ).read()
        assert b"cluster_sizes" in api  # JSON API still live beside it
    finally:
        srv.stop()


def test_dashboard_escapes_untrusted_labels():
    """Cluster labels and representative fields are untrusted data:
    script tags must come out entity-escaped everywhere they land."""
    from scotustician_spark.dashboard import render_dashboard_html

    evil = "<script>alert(1)</script>"
    panels = {
        "totals": {
            "n_cases": 1, "n_clusters": 1,
            "total_tokens": 10.0, "avg_tokens": 10.0,
        },
        "sizes": [(evil, 1)],
        "box": [],
        "trend": [(evil, 1, 2, 3)],
        "reps": [{"cluster": evil, "case_id": evil}],
        "scatter": [(0.0, 1.0, evil), (1.0, 0.0, "b")],
        "scatter_capped": True,
    }
    page = render_dashboard_html(panels, title=evil)
    assert "<script>alert" not in page
    assert "&lt;script&gt;" in page
    assert "deterministic sample" in page


def test_write_dashboard_end_to_end(spark, tmp_path_factory):
    """write_dashboard over a real run directory produces a
    self-contained file (no external fetches)."""
    from scotustician_spark.dashboard import write_dashboard

    d = tmp_path_factory.mktemp("dash")
    write_corpus_json(make_corpus(n_docs=6, seed=7), str(d / "corpus"))
    run_pipeline(spark, str(d / "corpus"), out_dir=str(d / "out"), n_clusters=2)
    path = write_dashboard(spark, str(d / "out"), str(d / "dash.html"))
    page = open(path).read()
    assert page.startswith("<!doctype html>")
    assert "http://" not in page and "https://" not in page  # self-contained
    assert "no projection exported" in page  # absent panel degrades politely
