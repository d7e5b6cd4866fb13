"""Chunking (operators/chunking.py) and intra-document repetition metrics
(functions/text.repetition_metrics) — the training-window and
boilerplate-screen ops of the pipeline surface."""

import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.functions.text import repetition_metrics
from spark_streaming_sql_s3_connector_spark.operators.chunking import chunk_documents


def _chunks(spark, text, chunk_tokens=8, overlap=2):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return chunk_documents(
        df, "text", "doc_id", chunk_tokens=chunk_tokens, overlap_tokens=overlap
    ).orderBy("chunk_idx").collect()


def test_chunk_coverage_and_overlap(spark):
    toks = [f"t{i}" for i in range(20)]
    rows = _chunks(spark, " ".join(toks), chunk_tokens=8, overlap=2)  # step 6
    # starts 0, 6, 12 — a start at 18 would add zero new tokens (the
    # window [18,20) sits inside chunk 2's [12,20)) and is suppressed
    assert [r.chunk_idx for r in rows] == [0, 1, 2]
    # every token appears in at least one chunk, in order
    covered = []
    for r in rows:
        covered.extend(r.chunk_text.split())
    assert set(covered) == set(toks)
    # consecutive chunks share exactly `overlap` tokens (full chunks)
    c0, c1 = rows[0].chunk_text.split(), rows[1].chunk_text.split()
    assert c0[-2:] == c1[:2]
    assert all(r.chunk_n_tokens > 0 for r in rows)
    # a doc whose tail DOES add new tokens keeps its short final chunk
    rows2 = _chunks(spark, " ".join(f"u{i}" for i in range(21)), chunk_tokens=8, overlap=2)
    assert [r.chunk_n_tokens for r in rows2] == [8, 8, 8, 3]


def test_chunk_no_fully_contained_tail(spark):
    # the registry's exact parameters: 64-token doc, chunk 64, overlap 16
    # must yield ONE chunk (a start at 48 would duplicate tokens 49-64)
    rows = _chunks(spark, " ".join(f"v{i}" for i in range(64)), chunk_tokens=64, overlap=16)
    assert [r.chunk_n_tokens for r in rows] == [64]
    # every emitted chunk contributes at least one previously-unseen token
    for n in range(1, 60):
        rows = _chunks(spark, " ".join(f"w{i}" for i in range(n)), chunk_tokens=8, overlap=3)
        seen = 0
        for r in rows:
            assert seen < n, f"n={n}: chunk {r.chunk_idx} adds nothing"
            seen = max(seen, r.chunk_idx * 5 + r.chunk_n_tokens)
        assert seen == n, f"n={n}: coverage gap"


def test_chunk_short_and_empty_docs(spark):
    assert len(_chunks(spark, "only three tokens")) == 1
    assert _chunks(spark, "only three tokens")[0].chunk_text == "only three tokens"
    assert _chunks(spark, "") == []
    assert _chunks(spark, "   ") == []


def test_chunk_exact_multiple_has_no_empty_tail(spark):
    # 12 tokens, chunk 6, overlap 0: exactly 2 chunks
    rows = _chunks(spark, " ".join(f"x{i}" for i in range(12)), chunk_tokens=6, overlap=0)
    assert [r.chunk_n_tokens for r in rows] == [6, 6]


def test_chunk_determinism_and_validation(spark):
    a = _chunks(spark, "a b c d e f g h i j")
    b = _chunks(spark, "a b c d e f g h i j")
    assert [(r.chunk_idx, r.chunk_text) for r in a] == [
        (r.chunk_idx, r.chunk_text) for r in b
    ]
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap_tokens=4)
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap_tokens=-1)


def _rep(spark, text):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    m = repetition_metrics(F.col("text"))
    return df.select(
        m["n_lines"].alias("nl"),
        m["n_distinct_lines"].alias("ndl"),
        m["dup_line_frac"].alias("dlf"),
        m["n_paras"].alias("np"),
        m["dup_para_frac"].alias("dpf"),
    ).collect()[0]


def test_repetition_duplicate_lines(spark):
    r = _rep(spark, "nav bar\ncontent one\nnav bar\ncontent two\nnav bar\n")
    assert (r.nl, r.ndl) == (5, 3)
    assert r.dlf == pytest.approx(2 / 5)


def test_repetition_clean_and_empty(spark):
    r = _rep(spark, "alpha\nbeta\ngamma")
    assert r.dlf == 0.0 and r.nl == 3
    r2 = _rep(spark, "")
    assert (r2.nl, r2.dlf, r2.dpf) == (0, 0.0, 0.0)
    # whitespace-only lines don't count
    r3 = _rep(spark, "a\n   \n\na")
    assert (r3.nl, r3.ndl) == (2, 1) and r3.dlf == pytest.approx(0.5)


def test_repetition_paragraphs(spark):
    text = "para one line\nstill para one\n\npara two\n\npara one line\nstill para one"
    r = _rep(spark, text)
    assert r.np == 3
    assert r.dpf == pytest.approx(1 / 3)


@pytest.mark.parametrize(
    "chunk_tokens,overlap",
    [(8, 2), (8, 0), (5, 4), (64, 16), (3, 1), (2, 0)],
)
def test_chunk_reconstruction_law_sweep(spark, chunk_tokens, overlap):
    """For every doc length 0..40: the original token list equals
    chunk[0] ++ chunk[i][overlap:] for i >= 1 — chunks cover every token
    exactly once outside the declared overlaps, at any (size, overlap)."""
    docs = [(n, " ".join(f"w{n}_{i}" for i in range(n))) for n in range(41)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = chunk_documents(
        df, "text", "doc_id", chunk_tokens=chunk_tokens, overlap_tokens=overlap
    ).collect()
    by_doc: dict[int, dict[int, list[str]]] = {}
    for r in rows:
        toks = r.chunk_text.split() if r.chunk_text else []
        assert r.chunk_n_tokens == len(toks)
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = toks
    for n, text in docs:
        expected = text.split()
        chunks = by_doc.get(n, {})
        if n == 0:
            assert chunks == {}
            continue
        assert sorted(chunks) == list(range(len(chunks)))  # contiguous idx
        rebuilt = list(chunks[0])
        for i in range(1, len(chunks)):
            rebuilt.extend(chunks[i][overlap:])
        assert rebuilt == expected, (n, chunk_tokens, overlap)


def test_redact_pii(spark):
    from spark_streaming_sql_s3_connector_spark.functions.text import (
        pii_counts,
        redact_pii,
    )

    cases = [
        # url redacted BEFORE email: the address inside the query string
        # must not split the URL match
        (1, "see https://x.org/?mail=a@b.com for info", "see <URL> for info"),
        (2, "mail me at jane.doe+spam@corp.example.co", "mail me at <EMAIL>"),
        (3, "server 192.168.0.1 and 10.0.0.255 up", "server <IP> and <IP> up"),
        (4, "no pii here at all", "no pii here at all"),
        (5, "a@b.io then http://c.io then 1.2.3.4", "<EMAIL> then <URL> then <IP>"),
    ]
    df = spark.createDataFrame(cases, ["id", "text", "expected"])
    c = pii_counts(F.col("text"))
    got = df.select(
        "id",
        "expected",
        redact_pii(F.col("text")).alias("red"),
        c["url"].alias("nu"),
        c["email"].alias("ne"),
        c["ipv4"].alias("ni"),
    ).collect()
    for r in got:
        assert r.red == r.expected, r.id
    by_id = {r.id: r for r in got}
    assert (by_id[1].nu, by_id[1].ne) == (1, 1)  # counts audit pre-redaction
    assert by_id[3].ni == 2
    assert (by_id[4].nu, by_id[4].ne, by_id[4].ni) == (0, 0, 0)


# ------------------------------------------------- Gopher rule gate ----

from spark_streaming_sql_s3_connector_spark.functions.text import (  # noqa: E402
    gopher_rules,
)


def _gate(spark, text, min_words=3):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    rules = gopher_rules(F.col("text"), min_words=min_words)
    return df.select(*[c.alias(k) for k, c in rules.items()]).collect()[0]


def test_gopher_clean_doc_passes_all(spark):
    r = _gate(spark, "the cat and the dog walk to have fun with all of that")
    assert all(v for v in r.asDict().values()), r


def test_gopher_word_count_bounds(spark):
    assert not _gate(spark, "the of and", min_words=4).rule_word_count
    assert _gate(spark, "the of and that", min_words=4).rule_word_count
    assert not _gate(spark, "", min_words=1).rule_word_count
    assert not _gate(spark, None, min_words=1).gopher_keep


def test_gopher_mean_word_len(spark):
    # mean 1 char: too short; supercalifragilistic mean > 10: too long
    assert not _gate(spark, "a b c d e f").rule_mean_word_len
    assert not _gate(
        spark, "supercalifragilistic expialidocious extraordinarily"
    ).rule_mean_word_len
    assert _gate(spark, "the cat and dog have fun").rule_mean_word_len


def test_gopher_alpha_and_stops(spark):
    r = _gate(spark, "12 34 56 78 90 11")
    assert not r.rule_alpha_words and not r.rule_stop_words
    r2 = _gate(spark, "the dog 12 and cat run")
    assert r2.rule_alpha_words  # 5/6 words alphabetic > 80%? 5*5 >= 4*6
    assert r2.rule_stop_words  # 'the' + 'and'


def test_gopher_symbol_ratio(spark):
    assert not _gate(spark, "the # cat # and # dog #").rule_symbol_ratio
    assert _gate(
        spark, " ".join(["the cat and dog have fun here now ok yes"] * 2)
    ).rule_symbol_ratio
    # ellipsis symbols count /3 chars
    assert not _gate(spark, "wait... the... cat... and...").rule_symbol_ratio


def test_gopher_line_shape_rules(spark):
    bullets = "\n".join(["- item one"] * 5 + ["the cat and dog"])
    assert not _gate(spark, bullets).rule_bullet_lines
    ells = "\n".join(["the cat walks..."] * 5 + ["the dog"])
    assert not _gate(spark, ells).rule_ellipsis_lines
    dup = "\n".join(["same line here"] * 6 + ["unique one"])
    r = _gate(spark, dup)
    assert not r.rule_dup_lines
    clean = "\n".join(f"line number {i} of the doc" for i in range(6))
    assert _gate(spark, clean).rule_dup_lines


def test_gopher_keep_is_conjunction(spark):
    r = _gate(spark, "the # cat # and # dog #")
    d = r.asDict()
    keep = d.pop("gopher_keep")
    assert keep == all(d.values())


def test_gopher_plan_no_shuffle(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rules = gopher_rules(F.col("text"))
    plan = (
        docs.select("doc_id", *[c.alias(k) for k, c in rules.items()])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ----------------------------------------------------- C4 rule gate ----

from spark_streaming_sql_s3_connector_spark.functions.text import (  # noqa: E402
    c4_rules,
)


def _c4(spark, text, **kw):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    rules = c4_rules(F.col("text"), **kw)
    return df.select(*[c.alias(k) for k, c in rules.items()]).collect()[0]


def test_c4_policy_phrases_and_braces(spark):
    assert not _c4(spark, "read our Privacy Policy today").rule_no_policy
    assert not _c4(spark, "enable JavaScript to continue").rule_no_policy
    assert not _c4(spark, "function f() { return 1; }").rule_no_braces
    clean = _c4(spark, "the cat sat on the mat.")
    assert clean.rule_no_policy and clean.rule_no_braces


def test_c4_min_words_and_terminal_lines(spark):
    r = _c4(spark, "one two three", min_words=5)
    assert not r.rule_min_words and not r.c4_keep
    t = _c4(spark, 'A line ends here.\nAnd this one!\nno punct line\nQuoted."')
    assert t.n_terminal_lines == 3
    gated = _c4(
        spark, "no punctuation at all\nstill none", min_sentence_lines=1
    )
    assert not gated.rule_terminal_lines and not gated.c4_keep


def test_c4_null_and_keep_conjunction(spark):
    r = _c4(spark, None, min_words=1)
    assert not r.rule_min_words and not r.c4_keep
    ok = _c4(spark, "the cat sat on the mat and slept well.", min_words=5)
    d = ok.asDict()
    keep = d.pop("c4_keep")
    d.pop("n_terminal_lines")
    assert keep == all(d.values()) == True  # noqa: E712


def test_c4_plan_no_shuffle(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rules = c4_rules(F.col("text"))
    plan = (
        docs.select("doc_id", *[c.alias(k) for k, c in rules.items()])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
