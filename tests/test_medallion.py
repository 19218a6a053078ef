"""Medallion-layer differential tests: the IDENTICAL model SQL runs on
Spark (temp views) and DuckDB (over the same parquet inputs) — the
strongest form of the dbt-test analog."""

from __future__ import annotations

import duckdb
import pytest

from scotustician_spark.documents import (
    assemble_section_chunks,
    classify_speaker_role,
    flatten_utterances,
    read_oa_json,
    split_quarantine,
)
from scotustician_spark.documents.medallion import (
    MODELS,
    register_models,
    run_data_tests,
)
from scotustician_spark.testing import compare_spark_duckdb
from tests.fixtures_oa import make_corpus, write_corpus_json


@pytest.fixture(scope="module")
def model_env(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("medallion")
    write_corpus_json(make_corpus(n_docs=8, seed=11), str(d / "corpus"))
    valid, _ = split_quarantine(read_oa_json(spark, str(d / "corpus")))
    utt = classify_speaker_role(flatten_utterances(valid))
    chunks = assemble_section_chunks(utt)
    upath, cpath = str(d / "utterances.parquet"), str(d / "chunks.parquet")
    utt.write.mode("overwrite").parquet(upath)
    chunks.write.mode("overwrite").parquet(cpath)
    # both engines read the SAME parquet
    u = spark.read.parquet(upath)
    c = spark.read.parquet(cpath)
    models = register_models(spark, u, c)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW utterances AS SELECT * FROM read_parquet('{upath}/*.parquet')")
    con.execute(f"CREATE VIEW chunks AS SELECT * FROM read_parquet('{cpath}/*.parquet')")
    for name, sql in MODELS.items():
        con.execute(f"CREATE VIEW {name} AS {sql}")
    return models, con


@pytest.mark.parametrize("model", list(MODELS))
def test_model_matches_duckdb(model, model_env):
    models, con = model_env
    problems = compare_spark_duckdb(models[model], con, f"SELECT * FROM {model}")
    assert not problems, f"{model}: {problems}"


def test_data_tests_pass(spark, model_env):
    assert all(v == 0 for v in run_data_tests(spark).values())


def test_gold_rows_nonempty(model_env):
    models, _ = model_env
    assert models["gold_speaker_analytics"].count() > 0
    assert models["gold_oral_arguments_analytics"].count() > 0


def test_get_term_year_macro(spark):
    from scotustician_spark.documents.medallion import register_sql_macros

    register_sql_macros(spark)
    row = spark.sql(
        "SELECT get_term_year('2023-fall') a, get_term_year('OT2019') b, "
        "get_term_year('junk') c"
    ).collect()[0]
    assert (row["a"], row["b"], row["c"]) == (2023, 2019, None)
