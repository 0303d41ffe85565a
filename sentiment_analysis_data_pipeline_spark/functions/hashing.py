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


def minhash_element(d: str, shingle_var: str, seed: int) -> str:
    """One hash-family member: first HEX_WIDTH hex chars of md5(seed || '_' || shingle)."""
    return f"substring(md5(concat('{seed}_', {shingle_var})), 1, {HEX_WIDTH})"


def minhash_signature(d: str, shingles_expr: str, k: int = 16) -> str:
    """MinHash signature: array of k per-seed minima over the shingle set.

    Broder's MinHash (Broder 1997, 'On the resemblance and containment of
    documents'): P[min_h(A) = min_h(B)] = Jaccard(A, B). k independent hash
    family members are simulated by seeding md5.

    Returns array<string> of length k (elements null iff shingle set empty --
    filter empties upstream). Computed entirely with higher-order functions:
    no explode, no shuffle, no Python.
    """
    members = ", ".join(
        D.arr_min(d, D.arr_transform(d, shingles_expr, f"s -> {minhash_element(d, 's', seed)}"))
        for seed in range(k)
    )
    return f"array({members})" if d == D.SPARK else f"[{members}]"


def band_keys(d: str, signature_expr: str, bands: int, rows: int) -> str:
    """LSH banding: split the k=bands*rows signature into `bands` groups and
    hash each group to one bucket key 'b<i>|<md5 of the band slice>'.

    Docs sharing >= 1 band key become candidate pairs; with k=16, b=4, r=4
    the usual S-curve puts the match threshold around j ~ (1/b)^(1/r) ~ 0.7.
    """
    keys = ", ".join(
        f"concat('b{b}|', md5({D.arr_join(d, D.arr_slice(d, signature_expr, b * rows + 1, rows), ',')}))"
        for b in range(bands)
    )
    return f"array({keys})" if d == D.SPARK else f"[{keys}]"


def hex_digit_val(d: str, digit_expr: str) -> str:
    """Value 0-15 of one lowercase hex digit, via position in a constant --
    identical surface in both dialects."""
    return f"({D.str_pos(d, chr(39) + '0123456789abcdef' + chr(39), digit_expr)} - 1)"


def simhash(d: str, tokens_expr: str, bits: int = 32) -> str:
    """SimHash (Charikar 2002) over a token array, `bits` wide (default 32 =
    the first 8 hex digits of each token's md5).

    For each bit position i: sum over tokens of (+1 if bit set else -1); the
    fingerprint bit is 1 iff the sum is positive. Returned as a bit-string
    ('0'/'1' chars, fixed width) so Hamming distance is a simple
    character-compare in both dialects.
    """
    assert bits % 4 == 0
    ndigits = bits // 4
    # per token, per bit: ((hexdigit >> (3 - i % 4)) & 1) via arithmetic that
    # both dialects share: (v div 2^shift) % 2
    digit = f"substring(md5(t), {{pos}}, 1)"
    bit_exprs = []
    for i in range(bits):
        pos = i // 4 + 1
        shift = 3 - (i % 4)
        dv = hex_digit_val(d, digit.format(pos=pos))
        bit = f"(({D.int_div(d, dv, str(2 ** shift))}) % 2)"
        contrib = f"case when {bit} = 1 then 1 else -1 end"
        s = D.arr_sum_double(d, D.arr_transform(d, tokens_expr, f"t -> cast({contrib} as double)"))
        bit_exprs.append(f"case when ({s}) > 0 then '1' else '0' end")
    return f"concat({', '.join(bit_exprs)})"


def hamming_bits(d: str, a: str, b: str, bits: int = 32) -> str:
    """Hamming distance between two equal-width '0'/'1' bit-strings."""
    terms = " + ".join(
        f"(case when substring({a}, {i}, 1) <> substring({b}, {i}, 1) then 1 else 0 end)"
        for i in range(1, bits + 1)
    )
    return f"({terms})"
