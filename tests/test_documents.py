"""Document pipeline differential tests: Spark flatten/chunks/XML vs a
pure-Python reference-faithful oracle on synthetic nested JSON."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

from scotustician_spark.documents import (
    assemble_section_chunks,
    classify_speaker_role,
    flatten_utterances,
    read_oa_json,
    split_quarantine,
    transcript_to_xml,
)
from tests.fixtures_oa import make_corpus, oracle_flatten, write_corpus_json

DOCS = make_corpus(n_docs=6, seed=7)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("oa_corpus")
    write_corpus_json(DOCS, str(d), junk=2)
    return str(d)


@pytest.fixture(scope="module")
def utterances(spark, corpus_dir):
    valid, _ = split_quarantine(read_oa_json(spark, corpus_dir))
    return flatten_utterances(valid).cache()


def test_quarantine_split(spark, corpus_dir):
    docs = read_oa_json(spark, corpus_dir)
    valid, junk = split_quarantine(docs)
    assert valid.count() == len(DOCS)
    assert junk.count() == 2
    assert junk.filter(F.col("_corrupt_record").isNotNull()).count() == 2


def test_flatten_matches_oracle(utterances):
    exp = oracle_flatten(DOCS)
    got = {
        (r["case_id"], r["utterance_index"]): r
        for r in utterances.collect()
    }
    assert len(got) == len(exp)
    for e in exp:
        g = got[(e["case_id"], e["utterance_index"])]
        for k in e:
            assert g[k] == e[k], f"{k} mismatch at {e['case_id']}#{e['utterance_index']}: {g[k]} != {e[k]}"


def test_flatten_multiple_oa_per_case(spark, tmp_path):
    # a case argued twice has two OA documents with the same case_id;
    # indexes and char offsets must reset per document (oa_id), exactly
    # like the reference's per-file triple loop — partitioning the
    # windows by case_id alone made them nondeterministic here
    from tests.fixtures_oa import make_doc
    import random

    rng = random.Random(11)
    d1, d2 = make_doc(50, 3, rng), make_doc(51, 2, rng)
    d2["case_id"] = d1["case_id"]
    d2["term"] = d1["term"]
    docs = [d1, d2]
    path = str(tmp_path / "multi_oa")
    write_corpus_json(docs, path)
    valid, _ = split_quarantine(read_oa_json(spark, path))
    got = {
        (r["oa_id"], r["utterance_index"]): r
        for r in flatten_utterances(valid).collect()
    }
    exp = oracle_flatten(docs)
    assert len(got) == len(exp)
    for e in exp:
        g = got[(e["oa_id"], e["utterance_index"])]
        for k in e:
            assert g[k] == e[k], f"{k} @ {e['oa_id']}#{e['utterance_index']}"
    # XML serializes per OA document: the twice-argued case yields two
    # rows, each internally ordered by its own utterance indexes
    xml_rows = transcript_to_xml(flatten_utterances(valid)).collect()
    assert sorted(r["oa_id"] for r in xml_rows) == sorted(d["id"] for d in docs)
    assert all(r["case_id"] == d1["case_id"] for r in xml_rows)


def test_flatten_null_turns_keeps_valid_sections(spark, tmp_path):
    """Round-6 review: F.flatten returns NULL when ANY element array
    is NULL, so one section with turns=null used to null the WHOLE
    document's utterance array — every valid section silently lost.
    Null turns/text_blocks must behave as empty (nothing to iterate),
    and tab/newline-edged text must not gain a phantom token in the
    min_words gate or word_count."""
    from tests.fixtures_oa import make_doc
    import random

    doc = make_doc(60, 2, random.Random(3))

    def blk(text, t0=0.0):
        return {"start": t0, "stop": t0 + 1, "byte_start": 0,
                "byte_stop": len(text), "text": text}

    spk = {"ID": 1, "name": "Justice Roe", "roles": ["scotus_justice"]}
    good_turn = {
        "start": 0.0, "stop": 2.0, "speaker": spk,
        "text_blocks": [blk("the question presented is hard"),
                        blk("short one", 1.0)],  # < 4 words: filtered
    }
    none_blocks_turn = {
        "start": 2.0, "stop": 3.0, "speaker": spk, "text_blocks": None
    }
    doc["transcript"]["sections"] = [
        {"start": 0.0, "stop": 3.0, "byte_start": 0, "byte_stop": 1,
         "turns": [good_turn, none_blocks_turn]},
        {"start": 3.0, "stop": 4.0, "byte_start": 0, "byte_stop": 1,
         "turns": None},  # whole section's turns missing
    ]
    n_valid = 1  # only the >=4-word block in the good turn survives
    path = str(tmp_path / "nullsec")
    write_corpus_json([doc], path)
    valid, junk = split_quarantine(read_oa_json(spark, path))
    assert valid.count() == 1 and junk.count() == 0
    rows = flatten_utterances(valid).collect()
    assert len(rows) == n_valid and n_valid > 0  # valid sections kept
    # dense re-numbering still holds after the null sections vanish
    assert sorted(r["utterance_index"] for r in rows) == list(range(n_valid))


def test_flatten_word_count_ignores_edge_whitespace(spark, tmp_path):
    from tests.fixtures_oa import make_doc
    import random

    doc = make_doc(61, 1, random.Random(5))
    blocks = doc["transcript"]["sections"][0]["turns"][0]["text_blocks"]
    blocks[0]["text"] = "\tone two three"  # 3 words, tab-edged
    path = str(tmp_path / "tabedge")
    write_corpus_json([doc], path)
    valid, _ = split_quarantine(read_oa_json(spark, path))
    out = {r["text"]: r for r in flatten_utterances(valid, min_words=4).collect()}
    # 3 real words: the min_words=4 gate must DROP it (trim+split
    # counted the phantom empty token as a 4th word and kept it)
    assert "\tone two three" not in out
    kept = {r["text"]: r for r in flatten_utterances(valid, min_words=3).collect()}
    assert kept["\tone two three"]["word_count"] == 3


def test_flatten_plan_has_single_shuffle(spark, corpus_dir):
    # the fused HOF flatten must not shuffle; only the offset/index
    # windows exchange by case_id (shared partitioning → one Exchange)
    valid, _ = split_quarantine(read_oa_json(spark, corpus_dir))
    # min_words=2 ≠ the cached fixture's lineage, so the cache manager
    # can't substitute an InMemoryRelation (whose printout re-nests the
    # cached plan and would double-count)
    fresh = flatten_utterances(valid, min_words=2)
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_speaker_role_classification(utterances):
    roles = {
        r["speaker_name"]: r["speaker_role"]
        for r in classify_speaker_role(utterances).select("speaker_name", "speaker_role").distinct().collect()
    }
    for name, role in roles.items():
        if "Justice" in name:
            assert role == "Justice", (name, role)
        else:
            assert role == "Attorney", (name, role)


def test_section_chunks(utterances):
    exp_rows = oracle_flatten(DOCS)
    chunks = {
        (r["case_id"], r["section_id"]): r
        for r in assemble_section_chunks(utterances).collect()
    }
    # build oracle chunk text per (case, section) in utterance order
    from collections import defaultdict

    exp = defaultdict(list)
    for e in sorted(exp_rows, key=lambda e: (e["case_id"], e["utterance_index"])):
        exp[(e["case_id"], e["section_id"])].append(
            (f"{e['speaker_name']}: {e['text']}", e["word_count"], e["utterance_index"])
        )
    assert set(chunks) == set(exp)
    for key, lines in exp.items():
        c = chunks[key]
        assert c["chunk_text"] == "\n".join(l for l, _, _ in lines)
        assert c["word_count"] == sum(w for _, w, _ in lines)
        assert c["utterance_count"] == len(lines)
        assert c["first_utterance_index"] == min(i for _, _, i in lines)
        assert c["last_utterance_index"] == max(i for _, _, i in lines)
        assert c["token_count"] >= c["word_count"]  # BPE-ish ≥ whitespace


def test_chunk_char_truncation(utterances):
    trunc = assemble_section_chunks(utterances, max_chars=50)
    assert trunc.filter(F.length("chunk_text") > 50).count() == 0


def test_xml_roundtrip(utterances):
    exp = oracle_flatten(DOCS)
    xml_rows = {r["case_id"]: r["xml"] for r in transcript_to_xml(utterances).collect()}
    by_case = {}
    for e in exp:
        by_case.setdefault(e["case_id"], []).append(e)
    assert set(xml_rows) == set(by_case)
    for case_id, xml in xml_rows.items():
        root = ET.fromstring(xml)  # well-formed
        assert root.tag == "transcript" and root.get("case_id") == case_id
        utts = root.findall("utterance")
        exp_utts = sorted(by_case[case_id], key=lambda e: e["utterance_index"])
        assert len(utts) == len(exp_utts)
        for el, e in zip(utts, exp_utts):
            assert el.text == e["text"]
            assert el.get("speaker") == e["speaker_name"]
            assert int(el.get("index")) == e["utterance_index"]


def test_xml_native_parse_roundtrip(spark):
    """transcript_to_xml → from_xml-based parse must reproduce the
    utterance relation (escape/unescape lossless, order preserved)."""
    from scotustician_spark.documents.flatten import flatten_utterances
    from scotustician_spark.documents.schema import OA_DOCUMENT
    from scotustician_spark.documents.xml_sink import (
        parse_transcript_xml,
        transcript_to_xml,
    )
    from tests.fixtures_oa import make_corpus

    docs = make_corpus(n_docs=3, seed=11)
    df = spark.createDataFrame(docs, OA_DOCUMENT)
    utt = flatten_utterances(df)
    xml = transcript_to_xml(utt)
    back = parse_transcript_xml(xml)
    want = {
        (r["case_id"], r["utterance_index"]): (
            r["section_id"],
            r["speaker_name"],
            r["text"],
        )
        for r in utt.collect()
    }
    got = {
        (r["case_id"], r["utterance_index"]): (
            r["section_id"],
            r["speaker_name"],
            r["text"],
        )
        for r in back.collect()
    }
    assert got == want and len(got) > 0
