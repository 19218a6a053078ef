"""Unit tests for the text-analysis function library."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from scotustician_spark.functions import text as T

DOCS = [
    (0, "The cat sat on the mat and looked at the dog."),
    (1, "el perro es un animal que vive en la casa"),
    (2, ""),
    (3, "word"),
    (4, "  spaced   out\ttokens\nhere  "),
]


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(DOCS, "id int, text string")


def test_tokens_and_counts(tdf):
    rows = {r["id"]: r for r in tdf.select(
        "id", T.tokens("text").alias("toks"), T.token_count("text").alias("n")
    ).collect()}
    assert rows[0]["n"] == 11
    assert rows[2]["toks"] == [] and rows[2]["n"] == 0
    assert rows[3]["toks"] == ["word"]
    assert rows[4]["toks"] == ["spaced", "out", "tokens", "here"]


def test_lang_id(tdf):
    rows = {r["id"]: r["lang"] for r in tdf.select(
        "id", T.lang_id("text").alias("lang")).collect()}
    assert rows[0] == "en"
    assert rows[1] == "es"
    assert rows[2] == "und"


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, " HELLO\tWORLD ")],
        "id int, text string",
    )
    fps = [r["fp"] for r in df.select(T.fingerprint("text").alias("fp")).collect()]
    assert len(set(fps)) == 1
    assert fps[0] == hashlib.md5(b"hello world").hexdigest()


def test_word_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b")], "id int, text string")
    rows = {r["id"]: r["sh"] for r in df.select(
        "id", T.word_shingles("text", 3).alias("sh")).collect()}
    assert rows[1] == ["a b c", "b c d"]
    assert rows[2] == ["a b"]  # short doc → whole-text shingle


def test_quality_score_bounds(tdf):
    rows = tdf.select(T.quality_score("text").alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_stopword_ratio_null_on_empty(tdf):
    rows = {r["id"]: r["sr"] for r in tdf.select(
        "id", T.stopword_ratio("text").alias("sr")).collect()}
    assert rows[2] is None  # 0/0 guarded by nullif
    assert rows[0] is not None and rows[0] > 0.3


def test_tfidf_top_terms_matches_pure_python(spark):
    import math

    from scotustician_spark.operators.tfidf import tfidf_top_terms

    docs = [
        (1, "apple banana apple cherry"),
        (2, "banana cherry cherry dog"),
        (3, "apple dog dog dog elephant"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["doc_freq"])
        for r in tfidf_top_terms(df, k=2).collect()
    }

    # pure-python oracle
    toks = {d: t.split() for d, t in docs}
    n = len(docs)
    dfreq: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            dfreq[term] = dfreq.get(term, 0) + 1
    expected = {}
    for d, t in toks.items():
        tf = {w: t.count(w) for w in set(t)}
        scored = sorted(
            tf, key=lambda w: (-tf[w] * math.log((n + 1) / (dfreq[w] + 1)), w)
        )
        for rank, w in enumerate(scored[:2], 1):
            expected[(d, rank)] = (w, tf[w], dfreq[w])
    assert got == expected


def test_split_with_offsets_udtf(spark):
    from scotustician_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "One two. Three!  Four? five"), (2, None), (3, "")],
        "id long, text string",
    )
    df.createOrReplaceTempView("udtf_in")
    rows = spark.sql(
        "SELECT id, piece_idx, piece, char_start, char_end "
        "FROM udtf_in, LATERAL split_with_offsets(text)"
    ).collect()
    got = [(r["id"], r["piece_idx"], r["piece"]) for r in rows]
    assert got == [
        (1, 0, "One two."),
        (1, 1, "Three!"),
        (1, 2, "Four?"),
        (1, 3, "five"),
    ]  # null/empty rows emit nothing
    # offsets index into the ORIGINAL string (double space preserved)
    text = "One two. Three!  Four? five"
    for r in rows:
        assert text[r["char_start"] : r["char_end"]] == r["piece"]


def test_bm25_scores_hand_computed(spark):
    import math

    from scotustician_spark.operators.tfidf import bm25_scores

    # corpus: 3 docs + a null; term "cat": df=2, N=4
    df = spark.createDataFrame(
        [
            (1, "cat sat on the mat"),   # dl=5, tf(cat)=1
            (2, "cat cat everywhere"),   # dl=3, tf=2
            (3, "dogs only here"),       # dl=3, tf=0
            (4, None),                   # dl=0 -> score 0
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bm25_scores(df, ["cat"]).collect()}
    n, k1, b = 4, 1.2, 0.75
    avgdl = (5 + 3 + 3 + 0) / 4
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))

    def s(tf, dl):
        return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert abs(out[1]["bm25"] - s(1, 5)) < 1e-12
    assert abs(out[2]["bm25"] - s(2, 3)) < 1e-12
    assert out[3]["bm25"] == 0.0
    assert out[4]["bm25"] == 0.0 and out[4]["dl"] == 0
    assert out[2]["n_matches"] == 2
    # higher term frequency at shorter length must outrank
    assert out[2]["bm25"] > out[1]["bm25"]


def test_unpivot_csv_line_polymorphic_schema(spark):
    """analyze() computes the output schema from the constant header at
    PLAN time — different headers, different relations, no casts."""
    from scotustician_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    df = spark.sql(
        "SELECT t.* FROM VALUES ('1, x'), ('2, y'), (NULL) AS v(line), "
        "LATERAL unpivot_csv_line('id, name', line) t"
    )
    assert df.columns == ["id", "name"]
    rows = sorted((r.id, r.name) for r in df.collect())
    assert rows == [("1", "x"), ("2", "y")]

    wide = spark.sql(
        "SELECT t.* FROM VALUES ('a,b,c') AS v(line), "
        "LATERAL unpivot_csv_line('c1,c2,c3,c4', line) t"
    )
    assert wide.columns == ["c1", "c2", "c3", "c4"]
    assert wide.collect()[0].asDict() == {
        "c1": "a", "c2": "b", "c3": "c", "c4": None
    }


def test_bpe_apply_matches_pure_python_reference(spark, tmp_path):
    """bpe_apply_tokenize == a pure-Python BPE: mine top-K adjacent
    pairs, apply each merge in rank order with left-to-right
    non-overlapping scans (Sennrich reference semantics)."""
    import pyspark.sql.functions as F

    from scotustician_spark.plans.vectors_text import (
        _BPE_K,
        bpe_apply_tokenize,
    )

    texts = [
        "the cat sat on the mat",
        "the cat ate the cat food",
        "on the mat on the mat on the mat",
        "a a a a a",          # self-adjacent chain: left-to-right pairing
        "solo",               # single token: nothing to merge
        "",                   # empty: 0 tokens
        "the cat the cat the cat and the cat",
    ]
    rows = [(i, t, "s", 0) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, label int"
    )
    d = str(tmp_path)
    df.write.parquet(f"{d}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_bpe_tokens"], r["n_merges_applied"])
        for r in bpe_apply_tokenize(spark, d).collect()
    }

    # pure-Python twin
    toks = [t.split() for t in texts]
    from collections import Counter

    pc = Counter()
    for ts in toks:
        for a, b in zip(ts, ts[1:]):
            pc[(a, b)] += 1
    merges = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_K]
    for i, ts in enumerate(toks):
        seq = list(ts)
        for (a, b), _ in merges:
            out, j = [], 0
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                    out.append(seq[j] + "~" + seq[j + 1])
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seq = out
        assert got[i] == (len(ts), len(seq), len(ts) - len(seq)), (
            i, texts[i], seq, got[i]
        )
    assert got[4] == (1, 1, 0) and got[5] == (0, 0, 0)
    # the chain doc really merged left-to-right: "a a a a a" -> 3
    assert got[3][1] == 3
