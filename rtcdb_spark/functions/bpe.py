"""Byte-pair-encoding tokenizer: distributed vocabulary aggregation, exact
deterministic merge training, map-only corpus tokenization.

Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
Subword Units", ACL) train BPE on a WORD-FREQUENCY table, not the raw
corpus — the step every production tokenizer pipeline (HF tokenizers,
SentencePiece's BPE mode) shares. That factoring is what makes the
operator scale-honest at 100 TB:

1. the corpus-sized work is ONE distributed aggregate (lowercased alpha
   runs → word counts, map-side combined);
2. the vocabulary is capped to its top-V heavy hitters
   (TakeOrderedAndProject — deterministic (count desc, word asc) order),
   bounded metadata that legitimately collects to the driver;
3. merge training is O(V·K) pure Python on that bounded table — exact,
   with deterministic tie-breaks (max pair count, then lexicographic
   pair), so any two runs and any partitioning produce identical merges;
4. applying the learned merges back over the corpus is map-only: the
   merge list broadcasts (KBs) and an Arrow-batched pandas UDF tokenizes
   each document independently.

The reference has no text processing at all; this is north-star C-IX
surface (the brief's "token counting (whitespace + a BPE-ish regex)"
upgraded to a real trained subword tokenizer).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORD_RE = re.compile(r"[a-z]+")
_END = "</w>"  # end-of-word marker, per the original BPE formulation


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed (word, count) table over lowercased alpha runs — the
    only corpus-sized stage of BPE training."""
    return (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_merges(
    vocab: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Exact BPE merge training over a (word, count) vocabulary.

    Each word starts as its characters plus the end-of-word marker; every
    round counts adjacent symbol pairs weighted by word frequency and
    merges the argmax pair (ties broken by lexicographic pair order, so
    training is fully deterministic). Stops early when no pair occurs
    twice."""
    seqs: list[tuple[list[str], int]] = [
        (list(w) + [_END], c) for w, c in vocab
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, cnt in seqs:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _n = best
        merges.append((a, b))
        merged = a + b
        new_seqs = []
        for sym, cnt in seqs:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_seqs.append((out, cnt))
        seqs = new_seqs
    return merges


def apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one word with a learned merge list, in merge-priority
    order (earlier merges apply first — the standard BPE apply rule)."""
    sym = list(word) + [_END]
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
        if len(sym) == 1:
            break
    return sym


def sql_merge_replay_ctes(
    merges: list[tuple[str, str]], src: str, word_col: str = "word"
) -> tuple[str, str]:
    """DuckDB twin of :func:`apply_merges`: a CTE chain that replays a
    literal merge list greedily left-to-right over every word in ``src``.

    Returns ``(cte_body, last_cte_name)``; the final CTE holds
    ``(word, s)`` where ``s`` is the space-separated symbol string with one
    leading and one trailing space (token count = #spaces - 1).

    Exactness argument (unit-pinned against :func:`apply_merges`,
    including a==b merges): one merge step is three ``replace`` calls —

    1. double every separator space, so every symbol boundary holds TWO
       spaces and adjacent pattern matches stop competing for a shared
       boundary character;
    2. replace ``' a  b '`` with ``' ab '``: the single-space anchors
       bind to the INNER space of each boundary, so any two adjacent
       occurrences (including self-runs like ``e e e e``) each still see
       their own anchor, and SQL replace's left-to-right scan is exactly
       BPE's greedy order;
    3. collapse the remaining double spaces back to singles (the
       construction never yields more than two in a row).

    Symbols never contain spaces or quotes (``[a-z]+`` and ``</w>``), so
    both the replace patterns and the SQL literals are injection-free —
    asserted below. Kept as chained CTEs (depth 3 per merge) because
    DuckDB's expression binder caps nesting at 128.
    """
    for a, b in merges:
        for s in (a, b):
            assert s and " " not in s and "'" not in s, f"unsafe symbol {s!r}"
    parts = [
        f"m0 AS (SELECT {word_col} AS word, ' ' || "
        f"regexp_replace({word_col}, '(.)', '\\1 ', 'g') || '</w> ' AS s "
        f"FROM {src})"
    ]
    for i, (a, b) in enumerate(merges):
        parts.append(
            f"m{i + 1} AS (SELECT word, replace(replace(replace(s, ' ', "
            f"'  '), ' {a}  {b} ', ' {a}{b} '), '  ', ' ') AS s FROM m{i})"
        )
    return ",\n".join(parts), f"m{len(merges)}"


def tokenize_with_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Map-only corpus tokenization with a trained merge list: Arrow-batched
    pandas UDF, merges shipped once per executor in the closure (KBs).
    Emits per-doc subword/word counts and the compression ratio BPE
    training is judged by."""
    import pandas as pd

    merges_local = list(merges)

    def process(batches):
        cache: dict[str, int] = {}
        for pdf in batches:
            n_sub, n_words, n_chars = [], [], []
            for text in pdf[text_col]:
                words = _WORD_RE.findall(str(text).lower())
                total = 0
                for w in words:
                    if w not in cache:
                        cache[w] = len(apply_merges(w, merges_local))
                    total += cache[w]
                n_sub.append(total)
                n_words.append(len(words))
                n_chars.append(sum(len(w) for w in words))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_subword_tokens": pd.array(n_sub, dtype="Int64"),
                    "n_words": pd.array(n_words, dtype="Int64"),
                    "n_word_chars": pd.array(n_chars, dtype="Int64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        process,
        f"{id_col} long, n_subword_tokens long, n_words long, n_word_chars long",
    )
