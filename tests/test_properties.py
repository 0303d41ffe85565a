"""Property-based tests (hypothesis): invariants that hold for ARBITRARY
input text, not just fixtures -- the SURVEY.md §5 property-test leg.

Each example runs a Spark job, so example counts are kept small; the
properties are chosen so a single counterexample would indicate a real
parity/invariant bug, not a flake.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sentiment_analysis_data_pipeline_spark.functions import dialect as D
from sentiment_analysis_data_pipeline_spark.functions import text as TX
from sentiment_analysis_data_pipeline_spark.functions.sentiment import _py_kernel, _py_tokens
from sentiment_analysis_data_pipeline_spark.plans.pipeline import sentiment_enrich

# ASCII-ish corpus: printable chars the analyzer is defined over. (Unicode
# case-mapping parity between JVM/Python/DuckDB is out of scope -- the
# engine's corpora are BMP/ASCII per FIXTURES.md.)
TEXTS = st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80),
    min_size=1,
    max_size=8,
)


@settings(max_examples=8, deadline=None)
@given(TEXTS)
def test_tokenizer_parity_spark_vs_python(spark, texts):
    """The Python reimplementation used by the pandas kernel and the SQL
    tokenizer must agree on arbitrary printable input."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", F.expr(TX.tokenize(D.SPARK, "coalesce(t, '')")).alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_tokens(t), repr(t)


@settings(max_examples=8, deadline=None)
@given(TEXTS)
def test_kernel_invariants(spark, texts):
    """Scores bounded, confidence = |avg|, label consistent with threshold,
    and native == python kernel on arbitrary input."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = sentiment_enrich(df, "coalesce(text, '')").collect()
    for r in rows:
        assert -1.0 <= r["vader_compound"] <= 1.0
        assert -1.0 <= r["textblob_polarity"] <= 1.0
        assert r["confidence"] == abs(r["avg_score"])
        expected = (
            "positive" if r["avg_score"] >= 0.1 else "negative" if r["avg_score"] <= -0.1 else "neutral"
        )
        assert r["overall"] == expected
        vc, tb = _py_kernel(texts[r["doc_id"]])
        assert r["vader_compound"] == vc and r["textblob_polarity"] == tb


@settings(max_examples=6, deadline=None)
@given(TEXTS)
def test_quality_score_bounded(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = df.select(F.expr(TX.quality_score(D.SPARK, "coalesce(text, '')")).alias("q")).collect()
    for r in rows:
        assert 0.0 <= r["q"] <= 1.0


@settings(max_examples=6, deadline=None)
@given(TEXTS)
def test_pii_scrub_cross_engine_parity(spark, texts):
    """PII redaction (counts + scrubbed text) agrees between Spark and
    DuckDB on arbitrary printable text with synthetic PII spliced in --
    the regex dialects (Java vs RE2) must behave identically over the
    patterns the engine uses."""
    import duckdb

    salted = [
        f"{t} reach me at u{i}@ex.org / +1-555-000-{1000 + i} from 10.1.{i % 256}.9"
        for i, t in enumerate(texts)
    ]

    def one(d: str, s: str) -> str:
        lit = s.replace("'", "''")
        if d == D.SPARK:
            lit = lit.replace("\\", "\\\\")
        red = f"'{lit}'"
        for pat, tag in TX.PII_TAGS:
            red = D.regexp_replace_rx(d, red, pat, tag)
        counts = ", ".join(
            D.regexp_count(d, f"'{lit}'", pat) + f" AS c{j}"
            for j, (pat, _) in enumerate(TX.PII_TAGS)
        )
        return f"SELECT {red} AS red, {counts}"

    con = duckdb.connect()
    for s in salted:
        srow = spark.sql(one(D.SPARK, s)).collect()[0]
        drow = con.sql(one(D.DUCKDB, s)).fetchone()
        assert (srow["red"], srow["c0"], srow["c1"], srow["c2"]) == drow, repr(s)


@settings(max_examples=6, deadline=None)
@given(TEXTS)
def test_perplexity_bands_cross_engine_on_random_corpora(spark, texts):
    """The bigram-LM band rollup must hash-agree between Spark and DuckDB
    on ARBITRARY printable corpora, not just the driver fixtures (the ln
    quantization + exact-count parity claim, stress-tested)."""
    import shutil
    import tempfile

    import duckdb

    from sentiment_analysis_data_pipeline_spark.queries import (
        _perplexity_bands_sql,
        q_perplexity_bands,
    )

    out = tempfile.mkdtemp(prefix="ppl-prop-")
    try:
        df = spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        df.write.parquet(f"{out}/documents.parquet")
        got = sorted(
            (r["band"], r["n_docs"], r["n_bigrams"])
            for r in q_perplexity_bands(spark, out).collect()
        )
        con = duckdb.connect()
        con.execute(
            # Spark writes the table as a directory of part files
            f"CREATE VIEW documents AS SELECT * FROM '{out}/documents.parquet/*.parquet'"
        )
        want = sorted(
            (r[0], r[1], r[2])
            for r in con.execute(_perplexity_bands_sql(D.DUCKDB)).fetchall()
        )
        assert got == want, texts
    finally:
        shutil.rmtree(out, ignore_errors=True)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=4), min_size=2, max_size=40))
def test_temperature_targets_invariants(spark, srcs):
    """Random source histograms: targets never exceed half the corpus
    (+1 per-source floor slack), kept == min(n, target), kept ids are a
    prefix of the md5 ranking (checksum replica)."""
    import hashlib
    import math
    import shutil
    import tempfile

    from sentiment_analysis_data_pipeline_spark.queries import (
        _TEMP_Q,
        q_temperature_resample,
    )

    out = tempfile.mkdtemp(prefix="temp-prop-")
    try:
        rows = [(i, f"d{i}", "en", f"s{g}", 5) for i, g in enumerate(srcs)]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{out}/documents.parquet")
        got = q_temperature_resample(spark, out).collect()
        total = len(srcs)
        assert sum(r["target"] for r in got) <= total / 2 + len(got)
        by_src: dict[str, list[int]] = {}
        for i, g in enumerate(srcs):
            by_src.setdefault(f"s{g}", []).append(i)
        w = {s: math.floor(math.sqrt(len(ids)) * float(_TEMP_Q)) for s, ids in by_src.items()}
        tw = sum(w.values())
        for r in got:
            ids = by_src[r["source"]]
            assert r["n_docs"] == len(ids)
            assert r["target"] == math.floor((w[r["source"]] * float(total)) / (2.0 * tw))
            assert r["kept"] == min(r["n_docs"], r["target"])
            ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
            assert r["kept_id_sum"] == sum(ranked[: r["target"]])
    finally:
        shutil.rmtree(out, ignore_errors=True)


# Round-7: word pool heavy in idiom constituents, so generated sentences
# constantly form/break idiom sequences, overlapping occurrences, idioms
# adjacent to negators/boosters/'but', and consumed-position edge cases --
# paths uniform random text essentially never hits.
IDIOM_POOL = [
    "cut", "the", "mustard", "hand", "to", "mouth", "back", "handed",
    "blow", "blowing", "smoke", "upper", "break", "a", "leg", "cooking",
    "with", "gas", "in", "black", "red", "on", "ball", "under", "weather",
    "shit", "bomb", "bad", "ass", "bus", "stop", "yeah", "right", "kiss",
    "of", "death", "die", "for", "beating", "broken", "heart",
    "good", "great", "terrible", "love", "hate", "not", "never", "very",
    "so", "kind", "sort", "but", "without", "doubt", "fine",
]
IDIOM_TEXTS = st.lists(
    st.lists(st.sampled_from(IDIOM_POOL), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(IDIOM_TEXTS)
def test_idiom_kernel_parity_on_adversarial_sequences(spark, texts):
    """The SQL kernel's idiom mechanics (end-position weight, consumed
    positions, but-clause over idioms) must agree bit-for-bit with the
    Python replica on sentences DENSE in idiom fragments."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = sentiment_enrich(df, "coalesce(text, '')").collect()
    for r in rows:
        vc, tb = _py_kernel(texts[r["doc_id"]])
        assert r["vader_compound"] == vc, texts[r["doc_id"]]
        assert r["textblob_polarity"] == tb, texts[r["doc_id"]]
