"""Deterministic synthetic oral-argument documents shaped like the
reference's nested Oyez JSON (SURVEY §1.1), plus a pure-Python oracle
flattener that mirrors the reference's triple loop
(helpers.py:137-176) for differential testing.
"""

from __future__ import annotations

import json
import random


def make_doc(case_no: int, n_sections: int, rng: random.Random) -> dict:
    words = ["justice", "counsel", "court", "argument", "the", "a", "question",
             "statute", "record", "petitioner", "respondent", "because"]
    t = 0.0
    sections = []
    for _ in range(n_sections):
        turns = []
        for ti in range(rng.randint(1, 4)):
            blocks = []
            for _ in range(rng.randint(1, 3)):
                n = rng.randint(1, 9)  # some blocks fall under the >3-word filter
                text = " ".join(rng.choice(words) for _ in range(n))
                blocks.append(
                    {"start": round(t, 3), "stop": round(t + n * 0.4, 3),
                     "byte_start": 0, "byte_stop": len(text), "text": text}
                )
                t += n * 0.4
            speaker = (
                {"ID": 100 + ti, "name": f"Justice Roe{ti}", "roles": ["scotus_justice"]}
                if ti % 2 == 0
                else {"ID": 200 + ti, "name": f"Adv Doe{ti}", "roles": ["attorney"]}
            )
            turns.append({"start": blocks[0]["start"], "stop": blocks[-1]["stop"],
                          "speaker": speaker, "text_blocks": blocks})
        sections.append({"start": turns[0]["start"], "stop": turns[-1]["stop"],
                         "byte_start": 0, "byte_stop": 1, "turns": turns})
    return {
        "id": f"oa_{case_no}",
        "title": f"Case {case_no} v. Test",
        "term": str(2020 + case_no % 3),
        "case_id": f"{2020 + case_no % 3}_c{case_no}",
        "docket_number": f"{case_no}-123",
        "session": "october",
        "transcript": {"title": f"Case {case_no}", "duration": round(t, 3),
                        "sections": sections},
    }


def make_corpus(n_docs: int = 6, seed: int = 7) -> list[dict]:
    rng = random.Random(seed)
    return [make_doc(i, rng.randint(1, 4), rng) for i in range(n_docs)]


def write_corpus_json(docs: list[dict], dirpath: str, junk: int = 0) -> None:
    """One pretty-printed JSON file per doc (multiLine read path), plus
    optional syntactically-broken files for quarantine tests."""
    import os

    os.makedirs(dirpath, exist_ok=True)
    for d in docs:
        with open(os.path.join(dirpath, f"{d['id']}.json"), "w") as f:
            json.dump(d, f, indent=1)
    for j in range(junk):
        with open(os.path.join(dirpath, f"junk_{j}.json"), "w") as f:
            f.write('{"id": "broken", "transcript": [unclosed')


def oracle_flatten(docs: list[dict], min_words: int = 4) -> list[dict]:
    """Reference-faithful triple loop: kept utterances with dense index
    and running char offsets (+1 separator), per case."""
    out = []
    for d in docs:
        idx, offset = 0, 0
        for si, s in enumerate(d["transcript"]["sections"]):
            for ti, turn in enumerate(s["turns"]):
                for bi, b in enumerate(turn["text_blocks"]):
                    if len(b["text"].split()) < min_words:
                        continue
                    out.append(
                        {
                            "case_id": d["case_id"],
                            "oa_id": d["id"],
                            "term": d["term"],
                            "section_id": si,
                            "turn_pos": ti,
                            "block_pos": bi,
                            "utterance_index": idx,
                            "speaker_name": turn["speaker"]["name"],
                            "text": b["text"],
                            "word_count": len(b["text"].split()),
                            "char_start": offset,
                            "char_end": offset + len(b["text"]),
                            "start_time_ms": int(b["start"] * 1000),
                            "end_time_ms": int(b["stop"] * 1000),
                        }
                    )
                    offset += len(b["text"]) + 1
                    idx += 1
    return out
