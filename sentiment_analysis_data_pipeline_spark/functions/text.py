"""Text scalar functions: sanitize, assemble, truncate, tokenize, stats,
language ID, quality score, fingerprints.

Reference provenance (SURVEY.md §2.7):
  F1  text assembly      dags/sentiment_analysis_dag.py:65-67
  F2  truncation         dags/sentiment_analysis_dag.py:121
  F4  sanitize           utilities/data_validator.py:41
  F12 word/char stats    configs/elasticsearch_config.py:78-82 (declared there,
                         never computed by the reference; computed for real here)
  Q3  analyzed tokens    configs/elasticsearch_config.py:94-112 (english
                         analyzer: lowercase + stopword removal)

Every function emits SQL in both dialects (see dialect.py) so the DuckDB
oracle runs literally the same computation. All are pure column expressions:
JVM-side, whole-stage-codegen'd, zero Python in the hot path.
"""

from __future__ import annotations

from . import dialect as D

# English stopword subset of the ES 'english' analyzer's default list
# (reference configs/elasticsearch_config.py:100-104 uses the lucene english
# stop set; this is the classic lucene list).
STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if", "in",
    "into", "is", "it", "no", "not", "of", "on", "or", "such", "that", "the",
    "their", "then", "there", "these", "they", "this", "to", "was", "will", "with",
]

# Per-language marker words for the n-gram/stopword language-ID heuristic
# (north-star text-analysis op; deterministic, SQL-expressible).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "for", "with"],
    "es": ["el", "la", "los", "las", "de", "que", "es", "por"],
    "fr": ["le", "la", "les", "des", "est", "que", "pour", "dans"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "zh": ["de5", "shi4", "bu4", "le5", "wo3", "ni3", "ta1", "men5"],
}


def sanitize(d: str, expr: str) -> str:
    """F4: drop NUL bytes, trim whitespace (utilities/data_validator.py:41).

    Spark SQL string literals process backslash escapes (so the regex needs
    a doubled backslash); DuckDB literals do not.
    """
    pattern = "\\\\x00" if d == D.SPARK else "\\x00"
    return f"trim({D.regexp_replace_all(d, expr, pattern, '')})"


def assemble_text(d: str, title: str, description: str, content: str, content_cap: int = 500) -> str:
    """F1: title + ' ' + description + ' ' + content[:500].

    concat_ws skips NULLs in both dialects, matching the reference's
    ``article.get(field, '')`` defaulting (dags/sentiment_analysis_dag.py:65-67).
    Both Spark substring and DuckDB substr count codepoints, like the Python
    slice ``content[:500]`` (SURVEY.md §7 parity note).
    """
    return f"concat_ws(' ', {title}, {description}, substring({content}, 1, {content_cap}))"


def truncate(d: str, expr: str, n: int = 1000) -> str:
    """F2: content[:1000] for the analytic doc (dags/sentiment_analysis_dag.py:121)."""
    return f"substring({expr}, 1, {n})"


def tokenize(d: str, expr: str) -> str:
    """Lowercase, split on runs of non-alphanumerics, drop empties.

    The engine's analyzer (SURVEY.md §2.8 Q3): replaces the ES english
    analyzer's tokenization stage. Emits array<string>.

    One SPLIT on the complement class, not replace-then-split: the two
    forms emit the identical token stream (every non-[a-z0-9] char is a
    separator either way; edge empties are filtered), but Java's
    regexp_replace walks Matcher.appendReplacement per match -- measured
    ~40 us/row on 300-char text (7.4 s for a 200k-row scan) vs 0.25 s for
    the single split. This is the hot inner loop of the whole search /
    text-analysis family.
    """
    arr = (
        f"split(lower({expr}), '[^a-z0-9]+')"
        if d == D.SPARK
        else f"regexp_split_to_array(lower({expr}), '[^a-z0-9]+')"
    )
    return D.arr_filter(d, arr, "t -> t <> ''")


# Suffix-strip stemmer rules: a Porter subset (steps 1a, 1b, 5a) applied as
# a sequential regexp_replace chain, identical in both engines. Each tuple is
# (pattern, keep-group?) -- the replacement keeps capture group 1 (dialect
# syntax differs: Java's $1 vs RE2's \1) plus the literal tail given.
# Covers the high-frequency inflections the ES english analyzer's stemmer
# normalizes (configs/elasticsearch_config.py:94-112): plurals (-sses, -ies,
# -s), participles with a vowel-bearing stem (-ing, -ed), and the final -e
# (so "merging", "merges", "merged", "merge" all stem to "merg"). Full
# Porter's measure/cvc refinements are intentionally out of scope -- both
# engines (and the driver-side query analyzer) run this exact chain, so
# search parity is structural.
STEM_RULES: list[tuple[str, str]] = [
    ("sses$", "'ss'"),  # classes -> class
    ("([a-z])ies$", "G1i"),  # stories -> stori
    ("([a-rt-z0-9])s$", "G1"),  # windows -> window (not -ss)
    ("([a-z]*[aeiou][a-z]*)ing$", "G1"),  # merging -> merg (king stays)
    ("([a-z]*[aeiou][a-z]*)ed$", "G1"),  # merged -> merg (red stays)
    ("([a-z][a-z][a-z]+)e$", "G1"),  # merge -> merg (the stays)
]


def stem(d: str, expr: str) -> str:
    """One analyzed token -> its stem, as a nested regexp_replace chain."""
    g1 = "$1" if d == D.SPARK else "\\1"
    e = expr
    for pat, rep in STEM_RULES:
        lit = rep.replace("G1", g1) if rep.startswith("G1") else rep.strip("'")
        e = f"regexp_replace({e}, '{pat}', '{lit}')"
    return e


def stem_py(t: str) -> str:
    """Driver-side mirror of `stem` (for tiny query strings)."""
    import re

    for pat, rep in STEM_RULES:
        t = re.sub(pat, rep.replace("G1", "\\1").strip("'"), t)
    return t


def analyzed_tokens(d: str, expr: str) -> str:
    """Q3 analyzer: tokenize + stopword removal + stemming -- the three
    stages of the reference's ES english analyzer
    (configs/elasticsearch_config.py:94-112)."""
    stop = D.arr_literal(d, STOPWORDS)
    filtered = D.arr_filter(d, tokenize(d, expr), f"t -> not {D.arr_contains(d, stop, 't')}")
    return D.arr_transform(d, filtered, f"t -> {stem(d, 't')}")


def word_count(d: str, expr: str) -> str:
    """F12 stats.word_count: whitespace token count."""
    return f"cast({D.arr_size(d, tokenize(d, expr))} as int)"


def char_count(d: str, expr: str) -> str:
    """F12 stats.char_count."""
    return f"cast(length({expr}) as int)"


def has_content(d: str, expr: str) -> str:
    """F12 stats.has_content: non-null, non-blank."""
    return f"({expr} is not null and trim({expr}) <> '')"


def lang_scores(d: str, tokens_expr: str) -> dict[str, str]:
    """Per-language marker-hit counts over a token array."""
    out = {}
    for lang, markers in LANG_MARKERS.items():
        lst = D.arr_literal(d, markers)
        out[lang] = D.arr_size(d, D.arr_filter(d, tokens_expr, f"t -> {D.arr_contains(d, lst, 't')}"))
    return out


def lang_id(d: str, tokens_expr: str) -> str:
    """Deterministic argmax over marker-hit counts; ties broken by the fixed
    language order; 'und' when no marker hits at all.

    Spark side: argmax via array_max over (score, order-precedence, lang)
    structs -- struct ordering compares score first, then precedence (first
    language in the fixed order carries the highest value, so it wins
    ties), so `.l` of the max IS the argmax. Each per-language score HOF
    appears ONCE. The previous form inlined `greatest(all scores)` into
    every CASE branch -- an O(L^2) expression (6.1 KB of SQL, ~30 HOF
    filters) whose fused whole-stage-codegen method was big enough that
    HotSpot C2 compile churn made the first ~20 executions of any query
    embedding it swing 2-5x (BENCH_r05 flagged filter_reasons unstable;
    root-caused round 6, see PLANS.md). The DuckDB oracle keeps the
    explicit inlined-argmax CASE: identical semantics, and oracle-side
    expression size is irrelevant."""
    scores = lang_scores(d, tokens_expr)
    langs = list(LANG_MARKERS)
    if d == D.SPARK:
        # the sentinel (s=0, precedence above every language, 'und') wins
        # exactly when no language scored a hit -- so ONE array_max
        # occurrence yields the answer directly, and each per-language
        # score HOF appears (and is evaluated) exactly once. The first
        # shipped form wrote `case when (m).s > 0 then (m).l` with m
        # inlined twice: 2x the HOF work per row, measured +60% on
        # curation_pipeline at sf0.1. Precedence still encodes the fixed
        # language order for ties between languages.
        structs = ", ".join(
            f"struct({scores[lang]} AS s, {len(langs) - i} AS p, '{lang}' AS l)"
            for i, lang in enumerate(langs)
        )
        sentinel = f"struct(0 AS s, {len(langs) + 1} AS p, 'und' AS l)"
        return f"(array_max(array({sentinel}, {structs}))).l"
    greatest = f"greatest({', '.join(scores[lang] for lang in langs)})"
    whens = " ".join(f"when {scores[lang]} = __mx and __mx > 0 then '{lang}'" for lang in langs)
    # DuckDB lacks let-bindings in scalar expressions; inline the max.
    expr = f"case {whens} else 'und' end"
    return expr.replace("__mx", greatest)


def punct_ratio(d: str, expr: str) -> str:
    """Fraction of characters that are not [a-z0-9 ] after lowercasing.
    Exact parity: single division of two exact ints. Counted with
    regexp_count, not replace-to-empty-and-diff-lengths: the class is
    single-char so match count == removed length, and Java's
    regexp_replace walks appendReplacement per match (the tokenize()
    finding -- ~40 us/row on punctuated text)."""
    n_bad = D.regexp_count(d, f"lower({expr})", "[^a-z0-9 ]")
    return (
        f"case when length({expr}) = 0 or {expr} is null then 0.0 "
        f"else cast({n_bad} as double) / cast(length({expr}) as double) end"
    )


def stopword_ratio(d: str, expr: str) -> str:
    stop = D.arr_literal(d, STOPWORDS)
    toks = tokenize(d, expr)
    hits = D.arr_size(d, D.arr_filter(d, toks, f"t -> {D.arr_contains(d, stop, 't')}"))
    n = D.arr_size(d, toks)
    return f"case when {n} = 0 then 0.0 else cast({hits} as double) / cast({n} as double) end"


def quality_score(d: str, expr: str) -> str:
    """Composite document-quality heuristic in [0,1] (north-star text-analysis
    op): rewards reasonable length and some stopword mass, penalizes heavy
    punctuation. Dyadic weights (0.5/0.25/0.25) keep cross-engine sums exact.
    """
    wc = word_count(d, expr)
    len_term = f"least(cast({wc} as double) / 64.0, 1.0)"
    stop_term = f"least({stopword_ratio(d, expr)} * 4.0, 1.0)"
    punct_term = f"(1.0 - least({punct_ratio(d, expr)} * 4.0, 1.0))"
    return f"(0.5 * {len_term} + 0.25 * {stop_term} + 0.25 * {punct_term})"


def ngrams(d: str, tokens_expr: str, n: int = 3) -> str:
    """Word n-gram (shingle) array from a token array: join of each window of
    n consecutive tokens with '_'. Empty array when fewer than n tokens."""
    size = D.arr_size(d, tokens_expr)
    if d == D.SPARK:
        # zip_with over shifted slices: one string concat per element, ~4x
        # faster than per-index slice+array_join under Spark's interpreted
        # higher-order-function evaluation (measured at sf0.1)
        m = f"{size} - {n - 1}"
        acc = f"slice({tokens_expr}, 1, {m})"
        for j in range(2, n + 1):
            acc = f"zip_with({acc}, slice({tokens_expr}, {j}, {m}), (a, b) -> concat(a, '_', b))"
        return f"case when {size} >= {n} then {acc} else array() end"
    seq = f"case when {size} >= {n} then range(1, {size} - {n - 1} + 1) else cast([] as bigint[]) end"
    window = f"list_aggregate(list_slice({tokens_expr}, i, i + {n - 1}), 'string_agg', '_')"
    return D.arr_transform(d, seq, f"i -> {window}")


# PII patterns (portable across Java regex and RE2): the redaction pass a
# pretraining pipeline runs before anything else sees the text. Used by both
# the oracle-checked pii_redact query and the batch/streaming scrub operator.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?\d[\d-]{7,}\d"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_TAGS: list[tuple[str, str]] = [
    (PII_EMAIL, "[EMAIL]"),
    (PII_PHONE, "[PHONE]"),
    (PII_IP, "[IP]"),
]


def fingerprint(d: str, expr: str) -> str:
    """Document fingerprint: md5 over the sorted distinct token set -- the
    classic key-collapsing fingerprint (case/punct/word-order insensitive).
    North-star text-analysis op; md5 is identical in both dialects."""
    toks = D.arr_distinct(d, tokenize(d, expr))
    sorted_toks = f"array_sort({toks})" if d == D.SPARK else f"list_sort({toks})"
    return f"md5({D.arr_join(d, sorted_toks, ' ')})"
