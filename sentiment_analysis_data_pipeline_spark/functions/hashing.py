"""Hash-based functions: surrogate ids, MinHash signatures, SimHash,
band keys for LSH.

Reference provenance: the reference's only hash use is the md5 surrogate id
for ES documents (database/elasticsearch_handler.py:95-101,
dags/sentiment_analysis_dag.py:118) -- F3 in SURVEY.md §2.7. The MinHash /
SimHash machinery is the north-star dedup extension (SURVEY.md §7 phase 7),
built on the same portable md5 primitive so the DuckDB oracle can replay it
exactly.

Portability trick: both Spark and DuckDB expose md5() -> lowercase hex. A
fixed-width hex substring compares lexicographically exactly like its numeric
value, so "min over 15-hex-char strings" IS MinHash without any bigint hex
parsing (which the two dialects do differently).
"""

from __future__ import annotations

from . import dialect as D

HEX_WIDTH = 15  # 60 bits of the md5; fixed width => lexicographic == numeric


def md5_id(d: str, url_expr: str, title_expr: str) -> str:
    """F3: md5(url), falling back to md5(title) when url is null/empty
    (database/elasticsearch_handler.py:95-101)."""
    return f"md5(coalesce(nullif({url_expr}, ''), {title_expr}, ''))"


def hex_to_bigint(d: str, hex_expr: str, ndigits: int) -> str:
    """Parse a fixed-width lowercase-hex substring into BIGINT, portably.

    Spark has conv(); DuckDB has neither conv nor 0x-string casts, so the
    shared form is an unrolled positional polynomial over strpos -- identical
    surface in both dialects, pure integer ops.
    """
    # power-of-16 literals must be BIGINT: small powers fit int32 and
    # int32 * digit overflows under ANSI mode
    terms = " + ".join(
        f"({hex_digit_val(d, f'substring({hex_expr}, {j + 1}, 1)')}) * cast({16 ** (ndigits - 1 - j)} as bigint)"
        for j in range(ndigits)
    )
    return f"({terms})"


def md5_array(d: str, arr_expr: str) -> str:
    """One md5 hex per array element -- compute ONCE upstream, reuse below."""
    return D.arr_transform(d, arr_expr, "s -> md5(s)")


def hash_halves_cols(d: str, hex_col: str = "h") -> tuple[str, str]:
    """(h1, h2) scalar expressions over one md5-hex COLUMN: the two 56-bit
    integer halves, the inputs to Kirsch-Mitzenmacher double hashing.

    Column (not array-lambda) form on purpose: scalar projections run inside
    whole-stage codegen; Spark evaluates higher-order-function lambdas
    interpreted, ~10x slower for this polynomial (measured at sf0.1).
    """
    return (
        hex_to_bigint(d, hex_col, 14),
        hex_to_bigint(d, f"substring({hex_col}, 15, 14)", 14),
    )


def km_minhash_aggs(k: int = 16) -> list[str]:
    """MinHash signature as k aggregate expressions over exploded
    (doc, h1, h2) rows: min(h1 + i*h2) AS m{i}.

    Broder's MinHash (Broder 1997, 'On the resemblance and containment of
    documents'): P[min_h(A) = min_h(B)] = Jaccard(A, B). The k family members
    use Kirsch-Mitzenmacher double hashing (Kirsch & Mitzenmacher 2006):
    g_i(x) = h1(x) + i*h2(x) -- ONE md5 per shingle total, then k integer
    combinations. h1 < 2^56 and i*h2 <= 15*2^56 < 2^60: far from BIGINT
    overflow (ANSI mode would throw).

    Aggregate (not array-fold) form on purpose: min() gets map-side partial
    aggregation, so the groupBy(doc) shuffle moves one row per doc per
    partition -- the scale-correct shape -- and the arithmetic stays inside
    whole-stage codegen. Identical SQL text works in both dialects.
    """
    return [f"min(h1 + {i} * h2) AS m{i}" for i in range(k)]


def band_keys_from_members(d: str, bands: int, rows: int) -> str:
    """LSH band-key array over signature columns m0..m{bands*rows-1}:
    'b<i>|' || md5 of the comma-joined band slice. Docs sharing >= 1 band key
    become candidate pairs; k=16, b=4, r=4 puts the Jaccard S-curve threshold
    near (1/b)^(1/r) ~ 0.7."""
    cast_t = "string" if d == D.SPARK else "varchar"
    keys = []
    for b in range(bands):
        joined = ", ".join(f"cast(m{b * rows + j} as {cast_t})" for j in range(rows))
        keys.append(f"concat('b{b}|', md5(concat_ws(',', {joined})))")
    return f"array({', '.join(keys)})" if d == D.SPARK else f"[{', '.join(keys)}]"


def hex_digit_val(d: str, digit_expr: str) -> str:
    """Value 0-15 of one lowercase hex digit, via position in a constant --
    identical surface in both dialects."""
    return f"({D.str_pos(d, chr(39) + '0123456789abcdef' + chr(39), digit_expr)} - 1)"


def simhash(d: str, hashes_expr: str, bits: int = 32) -> str:
    """SimHash (Charikar 2002) over PRE-HASHED tokens (array of md5 hex
    strings -- md5_array computed once upstream), `bits` wide (default 32 =
    the first 8 hex digits of each token's hash).

    For each bit position i: sum over tokens of (+1 if bit set else -1); the
    fingerprint bit is 1 iff the sum is positive. Returned as a bit-string
    ('0'/'1' chars, fixed width) so Hamming distance is a simple
    character-compare in both dialects. Bit extraction is pure integer math
    shared by both dialects: (hexdigit div 2^shift) % 2.
    """
    assert bits % 4 == 0
    bit_exprs = []
    for i in range(bits):
        pos = i // 4 + 1
        shift = 3 - (i % 4)
        dv = hex_digit_val(d, f"substring(t, {pos}, 1)")
        bit = f"(({D.int_div(d, dv, str(2 ** shift))}) % 2)"
        contrib = f"case when {bit} = 1 then 1 else -1 end"
        s = D.arr_sum_double(d, D.arr_transform(d, hashes_expr, f"t -> cast({contrib} as double)"))
        bit_exprs.append(f"case when ({s}) > 0 then '1' else '0' end")
    return f"concat({', '.join(bit_exprs)})"


def simhash_sum_aggs(d: str, token_hash_col: str = "th", bits: int = 64) -> list[str]:
    """SimHash bit-plane sums as aggregate expressions over EXPLODED
    (doc, token-md5-hex) rows: sum over tokens of +1/-1 per bit position.

    This is the scale shape of `simhash`: the fragment form runs one
    interpreted array-lambda pass per bit (32-64 full passes over the token
    array per document under Spark's HOF evaluation); this form is a single
    explode + one groupBy(doc) with `bits` integer sum aggregates -- all
    whole-stage codegen, map-side partial aggregation, one row per doc on
    the shuffle. Integer sums, so cross-engine exactness is trivial."""
    out = []
    for i in range(bits):
        pos = i // 4 + 1
        shift = 3 - (i % 4)
        dv = hex_digit_val(d, f"substring({token_hash_col}, {pos}, 1)")
        bit = f"(({D.int_div(d, dv, str(2 ** shift))}) % 2)"
        out.append(f"sum(case when {bit} = 1 then 1 else -1 end) AS sb{i}")
    return out


def simhash_from_sums(bits: int = 64, prefix: str = "sb") -> str:
    """Assemble the bit-string fingerprint from the sb{i} sum columns.
    coalesce(0) keeps zero-token documents (which never reach the exploded
    aggregation and re-enter via a left join) on the all-zeros fingerprint
    the fragment form gives them."""
    parts = ", ".join(
        f"case when coalesce({prefix}{i}, 0) > 0 then '1' else '0' end"
        for i in range(bits)
    )
    return f"concat({parts})"


def packed_from_sums(bits: int = 64, prefix: str = "sb") -> str:
    """Spark-only: assemble the fingerprint as ONE packed BIGINT from the
    sb{i} sum columns (bit i set <=> sb{i} > 0, same bit<->position mapping
    as simhash_from_sums' bit-string: string position i+1 == bit i). Bitwise
    shiftleft/OR only -- no arithmetic, so ANSI overflow rules never apply
    even for bit 63 (the sign bit). The packed form exists for the pair
    phase: hamming = bit_count(a ^ b) instead of 2*bits substring compares,
    and candidate blocks are shift+mask ints instead of string concats. The
    DuckDB oracle keeps the bit-string form; parity is by value."""
    terms = " | ".join(
        f"(case when coalesce({prefix}{i}, 0) > 0 then shiftleft(cast(1 as bigint), {i}) else cast(0 as bigint) end)"
        for i in range(bits)
    )
    return f"({terms})"


def hamming_bits(d: str, a: str, b: str, bits: int = 32) -> str:
    """Hamming distance between two equal-width '0'/'1' bit-strings."""
    terms = " + ".join(
        f"(case when substring({a}, {i}, 1) <> substring({b}, {i}, 1) then 1 else 0 end)"
        for i in range(1, bits + 1)
    )
    return f"({terms})"
