"""Text-analysis primitives: tokenization, shingling, and a cross-engine
stable hash (SURVEY §2 C-IX).

The hash primitive is the foundation of every dedup/fingerprint operator
here: a 60-bit integer from an md5 prefix, reduced mod the Mersenne prime
2^31-1. md5 is available and bit-identical in Spark, DuckDB, and Python, so
pipelines built on it are reproducible across engines — unlike xxhash64 /
murmur, which are engine-specific. (Spark's xxhash64 is the faster choice
when cross-engine reproducibility doesn't matter; both run JVM-side.)

Everything in this module is built from `pyspark.sql.functions` expressions —
no Python UDFs — so the whole pipeline stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Modulus for all hash arithmetic: Mersenne prime 2^31 - 1. Keeping hashes
# < 2^31 lets (a * h + b) stay under 2^62 — no int64 overflow on any engine.
MERSENNE_P = 2_147_483_647


def stable_hash60(col: Column | str) -> Column:
    """60-bit integer hash of a string via md5 prefix (engine-portable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def stable_hash_mod(col: Column | str, p: int = MERSENNE_P) -> Column:
    """`stable_hash60` reduced into [0, p)."""
    return stable_hash60(col) % F.lit(p)


def sql_stable_hash_mod(expr: str, p: int = MERSENNE_P) -> str:
    """DuckDB twin of :func:`stable_hash_mod`."""
    return f"(CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT) % {p})"


def winnow_select_expr(text_col: str, k: int = 8, w: int = 4) -> str:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03 —
    the MOSS algorithm) as ONE pure column expression string:

    1. every char k-gram hashes via the engine-portable md5-prefix hash;
    2. every window of ``w`` consecutive hashes selects its MINIMUM, ties
       broken by the RIGHTMOST position (the paper's rule — it maximizes
       the chance adjacent windows agree, which is what bounds the
       fingerprint density at ~2/(w+1));
    3. identical selections from adjacent windows collapse
       (array_distinct), leaving the fingerprint set.

    Returns a struct<hs: array<bigint>, picks: array<int>> expression —
    the k-gram hash list plus the distinct selected positions (the
    fingerprint at position p is hs[p]). Guarantee
    (the reason winnowing beats "every i-th hash" sampling): any match of
    length ≥ w + k - 1 between two documents shares at least one selected
    fingerprint, making the fingerprint sets a sound containment filter.
    Map-only at any corpus size — no shuffle anywhere."""
    h = (
        f"CAST(conv(substr(md5(substr({text_col}, CAST(i AS INT), {k})), "
        "1, 15), 16, 10) AS BIGINT)"
    )
    kg = (
        f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)), "
        f"i -> {h})"
    )
    # Per-window work is UNROLLED over the fixed w and emits PLAIN INT
    # positions (no slice()/filter()/struct allocations per window — the
    # slice-based formulation spent its time allocating w-element arrays
    # per window in the interpreted HOF evaluator, and struct-typed picks
    # paid again in array_distinct; together ~6x slower at sf0.1).
    # try_element_at past the array end is NULL; least() ignores NULLs,
    # and a NULL comparison falls through the CASE, so the final short
    # window degrades correctly. The one-element transform(array(m))[0]
    # wrapper binds the window minimum once.
    elems = [f"try_element_at(hs, CAST(i + {j} AS INT))" for j in range(w)]
    m_expr = "least(" + ", ".join(elems) + ")"
    # rightmost occurrence of the minimum: check offsets high → low
    pos_cases = " ".join(
        f"WHEN {elems[j]} = m THEN CAST(i + {j} AS INT)"
        for j in range(w - 1, -1, -1)
    )
    return f"""
    transform(array({kg}), hs ->
      named_struct(
        'hs', hs,
        'picks', array_distinct(
          transform(sequence(1, greatest(size(hs) - {w - 1}, 1)), i ->
            transform(array({m_expr}), m -> CASE {pos_cases} END)[0]))
      )
    )[0]
    """


def sql_winnow_kgrams(text_col: str, k: int = 8) -> str:
    """DuckDB twin of the k-gram hash list."""
    return (
        f"list_transform(generate_series(1, greatest(length({text_col}) - "
        f"{k - 1}, 1)), i -> CAST(('0x' || substr(md5(substr({text_col}, "
        f"CAST(i AS INT), {k})), 1, 15)) AS BIGINT))"
    )


def sql_winnow_picks(hs_col: str, w: int = 4) -> str:
    """DuckDB twin of the winnowing selection: distinct rightmost-argmin
    positions over every w-window of ``hs_col``."""
    win = (
        f"{hs_col}[CAST(i AS INT):CAST(least(i + {w - 1}, "
        f"len({hs_col})) AS INT)]"
    )
    pos = (
        f"CAST(i AS INT) - 1 + list_max(list_filter("
        f"generate_series(1, len({win})), "
        f"j -> {win}[CAST(j AS INT)] = list_min({win})))"
    )
    return (
        f"list_distinct(list_transform(generate_series(1, "
        f"greatest(len({hs_col}) - {w - 1}, 1)), i -> {pos}))"
    )


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (fixture documents are space-separated words)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string>: position i joins tokens
    [i, i+n). Documents shorter than n tokens yield their whole text."""
    toks = tokens(col)
    make = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return make


def sql_shingles(expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`shingles` (1-based inclusive list slicing)."""
    return (
        f"list_transform(generate_series(1, greatest(len(string_split({expr}, ' ')) - {n - 1}, 1)), "
        f"i -> array_to_string(string_split({expr}, ' ')[i:i+{n - 1}], ' '))"
    )


# -- HTML -> text extraction (the web-corpus conversion stage) --------------

# Order matters: container payloads (script/style) and comments vanish
# BEFORE the generic tag strip (else "<script>a<b</script>" leaves "a<b"
# half-stripped); entities decode AFTER tags (else "&lt;p&gt;" becomes a
# strippable tag); "&amp;" decodes LAST (else "&amp;lt;" double-decodes).
_HTML_STRIP_RULES: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]+>", " "),
]
_HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def html_to_text(col: Column | str) -> Column:
    """Extract visible text from HTML markup — the conversion stage every
    web-scale training corpus runs before any quality/dedup step. Pure
    column expressions (regexp_replace chain, JVM-side, whole-stage
    codegen): script/style payloads and comments removed, tags stripped,
    the five standard entities decoded, whitespace collapsed. Regex-based
    by design (a KB-scale header parse, not a DOM): the same class of
    extractor CCNet/C4 used at crawl scale; a full DOM/boilerplate model
    (trafilatura-style) is a model choice, not an engine primitive."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in _HTML_STRIP_RULES:
        c = F.regexp_replace(c, pat, rep)
    for ent, ch in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def sql_html_to_text(expr: str) -> str:
    """DuckDB twin of :func:`html_to_text` (RE2 and Java regex agree on
    every construct used: inline (?is), non-greedy spans, classes)."""
    out = expr
    for pat, rep in _HTML_STRIP_RULES:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{rep}', 'g')"
    for ent, ch in _HTML_ENTITIES:
        e = ent.replace("'", "''")
        c = ch.replace("'", "''")
        out = f"replace({out}, '{e}', '{c}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"
