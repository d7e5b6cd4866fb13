"""URL canonicalization + cross-doc boilerplate laws."""

import duckdb
import pytest
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.functions.web import (
    canonical_url,
    canonical_url_duckdb_sql,
)
from spark_streaming_sql_s3_connector_spark.operators.web import (
    boilerplate_profile,
    line_doc_frequency,
    lined_text,
    strip_boilerplate,
)

URL_CASES = [
    # (raw, canonical)
    ("HTTPS://Example.COM/Path/?utm_source=x&id=3#frag",
     "https://example.com/Path?id=3"),
    ("https://example.com:443/a/", "https://example.com/a"),
    ("http://example.com:80/", "http://example.com"),
    ("https://example.com/a?gclid=abc&b=2&utm_medium=email",
     "https://example.com/a?b=2"),
    ("https://example.com/a?utm_source=x", "https://example.com/a"),
    ("https://example.com/a?x=1&&y=2", "https://example.com/a?x=1&y=2"),
    ("https://example.com", "https://example.com"),
    ("  https://example.com/a  ", "https://example.com/a"),
    ("not a url at all", "not a url at all"),
    ("ftp://Files.Example.com/Dir/", "ftp://files.example.com/Dir"),
    # port anchoring: longer ports must never lose a ':443'/':80' prefix
    ("http://host:8080/x", "http://host:8080/x"),
    ("https://h:4433/a", "https://h:4433/a"),
    ("https://example.com:443", "https://example.com"),
    # tracking-param anchoring: names merely containing the tracking
    # names are different parameters and survive
    ("https://h/a?xgclid=5", "https://h/a?xgclid=5"),
    ("https://h/a?myfbclid=2&b=1", "https://h/a?myfbclid=2&b=1"),
    ("https://h/gclid=path/seg", "https://h/gclid=path/seg"),
    ("https://h/a?utm_a=1&utm_b=2&b=3", "https://h/a?b=3"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(URL_CASES)],
                               "id int, url string")
    got = {r.id: r.c for r in df.select("id", canonical_url(F.col("url")).alias("c")).collect()}
    for i, (raw, want) in enumerate(URL_CASES):
        assert got[i] == want, (raw, got[i], want)


def test_canonical_url_duckdb_parity(spark):
    con = duckdb.connect()
    expr = canonical_url_duckdb_sql("url")
    for raw, want in URL_CASES:
        (duck,) = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS url)", [raw]
        ).fetchone()
        assert duck == want, (raw, duck, want)


@pytest.fixture(scope="module")
def web_docs(spark):
    nav = "Home | About | Contact"
    cookie = "We use cookies"
    rows = [
        (1, f"{nav}\nUnique article one\n{cookie}"),
        (2, f"{nav}\nAnother story here\n{cookie}\nExtra line two"),
        (3, f"{nav}\nThird text body"),
        (4, "Totally standalone document"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_line_doc_frequency(spark, web_docs):
    freq = {r.line: r.doc_freq for r in line_doc_frequency(web_docs, "text", "doc_id").collect()}
    assert freq["Home | About | Contact"] == 3
    assert freq["We use cookies"] == 2
    assert freq["Unique article one"] == 1


def test_boilerplate_profile(spark, web_docs):
    prof = {r.doc_id: r for r in
            boilerplate_profile(web_docs, "text", "doc_id", min_doc_freq=2).collect()}
    assert prof[1].n_boilerplate_lines == 2       # nav + cookie
    assert prof[1].n_distinct_lines == 3
    assert prof[1].boilerplate_frac == pytest.approx(2 / 3)
    assert prof[3].n_boilerplate_lines == 1       # nav only
    assert prof[4].n_boilerplate_lines == 0
    assert prof[5].n_distinct_lines == 0 and prof[5].boilerplate_frac == 0.0
    with pytest.raises(ValueError):
        boilerplate_profile(web_docs, "text", "doc_id", min_doc_freq=1)


def test_strip_boilerplate_preserves_order(spark, web_docs):
    out = {r.doc_id: r.clean_text for r in
           strip_boilerplate(web_docs, "text", "doc_id", min_doc_freq=2).collect()}
    assert out[1] == "Unique article one"
    assert out[2] == "Another story here\nExtra line two"
    assert out[3] == "Third text body"
    assert out[4] == "Totally standalone document"
    assert out[5] == ""


def test_strip_keeps_in_doc_duplicates_of_unique_lines(spark):
    df = spark.createDataFrame(
        [(1, "same line\nsame line\nother"), (2, "unrelated")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.clean_text for r in
           strip_boilerplate(df, "text", "doc_id").collect()}
    # 'same line' repeats IN doc 1 but is in only one doc -> kept, both copies
    assert out[1] == "same line\nsame line\nother"


def test_lined_text_matches_repetition_convention(spark):
    df = spark.createDataFrame([(1, "One. Two. Three.")], "doc_id bigint, text string")
    out = df.select(lined_text(F.col("text")).alias("t")).collect()[0].t
    assert out == "One.\nTwo.\nThree."


def test_canonical_url_randomized_cross_engine_parity(spark):
    """300 seeded random URL-ish strings (plus pathological separator
    soup) through BOTH engines' chains — any divergence in regex
    semantics between Java and RE2 shows up here, not in production."""
    import random

    rng = random.Random(0xC0FFEE)
    frags = [
        "http://", "https://", "HTTPS://", "ftp://", "", "Example.COM",
        "WWW.site.org", ":443", ":80", ":8080", "/Path", "/a/b/", "/",
        "?", "&", "utm_source=x", "utm_campaign=Y", "gclid=123",
        "fbclid=z9", "id=3", "q=Hello", "#frag", "#", "plain text",
        "//", "???", "&&&", "a=b&utm_x=1&c=d",
    ]
    cases = []
    for _ in range(300):
        n = rng.randint(1, 6)
        cases.append("".join(rng.choice(frags) for _ in range(n)))
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "id int, url string"
    )
    got = {
        r.id: r.c
        for r in df.select("id", canonical_url(F.col("url")).alias("c")).collect()
    }
    con = duckdb.connect()
    expr = canonical_url_duckdb_sql("url")
    for i, raw in enumerate(cases):
        (duck,) = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS url)", [raw]
        ).fetchone()
        assert got[i] == duck, (raw, got[i], duck)


def test_dedup_lines_keep_first_semantics(spark):
    from spark_streaming_sql_s3_connector_spark.operators.web import (
        dedup_lines_keep_first,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha\nbeta\nalpha"),      # in-doc repeat: later copy drops
            (2, "beta\ngamma"),             # 'beta' already seen in doc 1
            (3, "  beta  \ndelta"),         # trims before matching
            (4, ""),                        # no lines at all
            (5, "gamma"),                   # seen in doc 2
        ],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: (r.deduped_text, r.n_kept_lines)
        for r in dedup_lines_keep_first(df, "text", "doc_id").collect()
    }
    assert out[1] == ("alpha\nbeta", 2)   # global firsts live here
    assert out[2] == ("gamma", 1)         # beta dropped, gamma first
    assert out[3] == ("delta", 1)
    assert out[4] == ("", 0)
    assert out[5] == ("", 0)              # entire doc was already seen


def test_dedup_lines_keep_first_vs_strip_boilerplate(spark):
    """keep-first keeps ONE copy of a cross-doc line; boilerplate strip
    removes them ALL — the two operators must disagree exactly there."""
    from spark_streaming_sql_s3_connector_spark.operators.web import (
        dedup_lines_keep_first,
        strip_boilerplate,
    )

    df = spark.createDataFrame(
        [(1, "shared\nuniq1"), (2, "shared\nuniq2")],
        "doc_id bigint, text string",
    )
    kf = {
        r.doc_id: r.deduped_text
        for r in dedup_lines_keep_first(df, "text", "doc_id").collect()
    }
    sb = {
        r.doc_id: r.clean_text
        for r in strip_boilerplate(df, "text", "doc_id").collect()
    }
    assert kf == {1: "shared\nuniq1", 2: "uniq2"}
    assert sb == {1: "uniq1", 2: "uniq2"}


def test_normalize_text_cross_engine_parity(spark):
    """Randomized unicode parity: the Spark chain (NFC → lower → sigma
    fold → accent strip) must be byte-identical to the DuckDB oracle
    chain across composed/decomposed accents, fullwidth forms, dotted
    capital I, final sigma, ligatures, and random combining marks."""
    import random

    import duckdb

    from spark_streaming_sql_s3_connector_spark.functions.text import (
        normalize_text,
        normalize_text_duckdb_sql,
    )

    rng = random.Random(6)
    atoms = [
        "Café", "café", "café", "№5", "ﬁle", "ĆañÓn", "naïve",
        "İstanbul", "ΑΣ", "ΣΟΦΟΣ.", "ΑΎΡΙΟ", "ß", "ẞ", "ＡＢＣ１２３",
        "Ĳssel", "ǅungla", "é́", "é́", "ȺB", "Hello WORLD Ω",
    ]
    rows = [
        (i, " ".join(rng.choice(atoms) for _ in range(rng.randint(1, 6))))
        for i in range(60)
    ] + [(60, None), (61, "")]
    df = spark.createDataFrame(rows, "id bigint, t string")
    got = {
        r.id: r.n for r in df.select("id", normalize_text(F.col("t")).alias("n")).collect()
    }
    con = duckdb.connect()
    expr = normalize_text_duckdb_sql("t")
    for i, t in rows:
        want = con.execute(f"SELECT {expr} FROM (SELECT ?::VARCHAR AS t)", [t]).fetchone()[0]
        assert got[i] == want, (i, t, got[i], want)


def test_normalize_text_preserves_fullwidth(spark):
    """Compatibility folding is documented OUT of scope (the chain is
    NFC, canonical-only; DuckDB has no nfkc_normalize so oracle parity
    wins): both engines must PRESERVE fullwidth forms, merely
    lowercasing them. Pins the agreed behavior so a future NFKC switch
    can't land without an engine-parity plan."""
    import duckdb

    from spark_streaming_sql_s3_connector_spark.functions.text import (
        normalize_text,
        normalize_text_duckdb_sql,
    )

    df = spark.createDataFrame([(1, "ＡＢＣ１２３ x")], "id bigint, t string")
    (got,) = df.select(normalize_text(F.col("t")).alias("n")).collect()
    assert got.n == "ａｂｃ１２３ x"  # fullwidth survives, lowercased
    con = duckdb.connect()
    expr = normalize_text_duckdb_sql("t")
    want = con.execute(
        f"SELECT {expr} FROM (SELECT 'ＡＢＣ１２３ x'::VARCHAR AS t)"
    ).fetchone()[0]
    assert got.n == want


def test_dedup_lines_keep_first_randomized_vs_reference(spark):
    """Seeded randomized corpora vs a pure-python reference: global
    keep-first over (doc_id, pos) order, blanks dropped, trims applied —
    the full operator contract on inputs the examples don't cover
    (heavy cross-doc repetition, whitespace-only lines, dup-in-same-doc
    tails)."""
    import random

    from spark_streaming_sql_s3_connector_spark.operators.web import (
        dedup_lines_keep_first,
    )

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        vocab = [f"line{j}" for j in range(8)] + ["  ", "", " padded "]
        rows = [
            (i, "\n".join(rng.choice(vocab) for _ in range(rng.randint(0, 6))))
            for i in range(25)
        ]
        # python reference
        seen, want = set(), {}
        for i, text in sorted(rows):
            kept = []
            for line in text.split("\n"):
                t = line.strip()
                if not t or t in seen:
                    continue
                seen.add(t)
                kept.append(t)
            want[i] = ("\n".join(kept), len(kept))
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            r.doc_id: (r.deduped_text, r.n_kept_lines)
            for r in dedup_lines_keep_first(df, "text", "doc_id").collect()
        }
        assert got == want, f"seed {seed}"


def test_source_curation_gate_and_filter_laws(spark):
    """source_stats/gate_sources/filter_docs_by_source: exact counts,
    corpus-wide dup attribution (cross-source copies count against BOTH
    sources), NULL-text docs count toward n_docs but never as dups, and
    the broadcast-semi-join filter keeps exactly the passing sources'
    docs."""
    from pyspark.sql import functions as F

    from spark_streaming_sql_s3_connector_spark.operators.web import (
        filter_docs_by_source,
        gate_sources,
        source_stats,
    )

    rows = [
        (1, "good text with plenty of distinct words here", "a"),
        (2, "good text with plenty of distinct words here", "b"),  # cross-src copy
        (3, "other decent content entirely fresh wording", "a"),
        (4, None, "a"),                                            # NULL text
        (5, "!!!! ???? !!!! ????", "b"),                           # junk
        (6, "solo doc for source c quite reasonable", "c"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    stats = {r.source: r for r in source_stats(df, "text", "doc_id", "source").collect()}
    assert stats["a"].n_docs == 3 and stats["b"].n_docs == 2 and stats["c"].n_docs == 1
    assert stats["a"].n_dup_docs == 1 and stats["b"].n_dup_docs == 1  # both sides
    assert stats["c"].n_dup_docs == 0
    gated = gate_sources(
        source_stats(df, "text", "doc_id", "source"),
        min_docs=2, min_mean_quality=0.0, max_dup_rate=1.0,
    )
    verdicts = {r.source: r.passes for r in gated.collect()}
    assert verdicts == {"a": True, "b": True, "c": False}  # c: too few docs
    kept = filter_docs_by_source(df, "source", gated)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2, 3, 4, 5]
    # the filter never shuffles the corpus: verdicts broadcast
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


# --- inter-source overlap matrix (r8) ---


def test_source_overlap_planted(spark):
    from spark_streaming_sql_s3_connector_spark.operators.web import (
        source_overlap_matrix,
    )

    rows = [
        # src A and B share exactly the shingle set of "x y z" (1 gram);
        # C shares nothing
        (1, "x y z", "A"),
        (2, "x y z extra words here", "B"),
        (3, "totally different content here now", "C"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap_matrix(df, "text", "source").collect()
    }
    assert set(got) == {("A", "B")}  # no shared grams with C -> no row
    ab = got[("A", "B")]
    assert ab["n_shared"] == 1  # "x y z"
    assert ab["size_a"] == 1 and ab["size_b"] == 4
    assert abs(ab["jaccard"] - 1 / 4) < 1e-9
    assert abs(ab["overlap"] - 1.0) < 1e-9


def test_source_overlap_ordering_and_bounds(spark):
    from spark_streaming_sql_s3_connector_spark.operators.web import (
        source_overlap_matrix,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = source_overlap_matrix(docs, "text", "source").collect()
    assert rows
    for r in rows:
        assert r["source_a"] < r["source_b"]  # unordered pairs, once
        assert 0 < r["n_shared"] <= min(r["size_a"], r["size_b"])
        assert 0.0 <= r["jaccard"] <= r["overlap"] <= 1.0


def test_source_overlap_stop_shingle_cap(spark):
    from spark_streaming_sql_s3_connector_spark.operators.web import (
        source_overlap_matrix,
    )

    # one gram shared by ALL groups; cap below the group count drops it
    rows = [(i, "common gram here", f"s{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    full = source_overlap_matrix(df, "text", "source").count()
    capped = source_overlap_matrix(
        df, "text", "source", max_groups_per_shingle=3
    ).count()
    assert full == 15  # C(6,2)
    assert capped == 0
