"""Golden tests for E4 candidate-span generation/scoring (operators/spans.py):
hand-replayed md5 logits pin the score decomposition, offsets pin the char
arithmetic — mirroring the reference's golden-tensor tests for
MentionScoresHead (bela/task/joint_el_task.py:168-305)."""

import hashlib

from pyspark.sql import functions as F

from bela_spark.operators.spans import candidate_spans, pruned_spans, token_table


def _logit(tag, doc_id, pos, token):
    h = hashlib.md5(f"{tag}:{doc_id}:{pos}:{token}".encode()).hexdigest()
    noise = int(h[:6], 16) % 1000
    if tag == "s":
        return noise + (1500 if pos % 7 == 1 else 0)
    if tag == "e":
        return noise + (1500 if pos % 7 == 2 else 0)
    return noise - 500  # centered mention logit (log-prob analogue)


def _records(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, norm string")
    return df.withColumn("tokens", F.split("norm", " "))


def test_token_table_offsets_and_prefix_sums(spark):
    t = {
        r["pos"]: r
        for r in token_table(_records(spark, [(7, "aa bb cc")])).collect()
    }
    assert [(t[p]["char_start"], t[p]["char_end"]) for p in (1, 2, 3)] == [
        (1, 2), (4, 5), (7, 8)
    ]
    assert t[2]["mcum"] == _logit("m", 7, 1, "aa") + _logit("m", 7, 2, "bb")


def test_candidate_spans_exact_scores(spark):
    tok = token_table(_records(spark, [(7, "aa bb cc")]))
    out = {
        (r["start_pos"], r["end_pos"]): r for r in candidate_spans(tok).collect()
    }
    # all s <= e pairs within max_len: 6 spans for 3 tokens
    assert set(out) == {(1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (3, 3)}
    toks = {1: "aa", 2: "bb", 3: "cc"}
    for (s, e), row in out.items():
        want = (
            _logit("s", 7, s, toks[s])
            + _logit("e", 7, e, toks[e])
            + sum(_logit("m", 7, p, toks[p]) for p in range(s, e + 1))
        )
        assert row["score"] == want, (s, e)
    # char coordinates: span (1,2) covers "aa bb" (1-based substring semantics)
    assert (out[(1, 2)]["offset"], out[(1, 2)]["length"]) == (1, 5)
    assert (out[(2, 3)]["offset"], out[(2, 3)]["length"]) == (4, 5)


def test_candidate_spans_respects_max_len_and_doc_edge(spark):
    text = " ".join(f"t{i}" for i in range(15))
    cand = candidate_spans(token_table(_records(spark, [(1, text)])), max_len=10)
    rows = cand.collect()
    assert max(r["n_tokens"] for r in rows) == 10
    assert max(r["end_pos"] for r in rows) == 15  # join drops spans past seqlen
    # count: sum over s of min(10, 15 - s + 1)
    assert len(rows) == sum(min(10, 15 - s + 1) for s in range(1, 16))


def test_pruned_spans_total_order(spark):
    tok = token_table(_records(spark, [(1, "x y z w"), (2, "p q")]))
    pruned = pruned_spans(candidate_spans(tok), k=3)
    per_doc = {}
    for r in pruned.collect():
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rows in per_doc.items():
        rows.sort(key=lambda r: r["rank"])
        assert len(rows) <= 3
        keys = [(-r["score"], r["offset"], r["length"]) for r in rows]
        assert keys == sorted(keys)
