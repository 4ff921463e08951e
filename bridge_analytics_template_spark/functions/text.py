"""Text-analysis expression library (SURVEY.md §2.11 L4; north-star "text
analysis").

All pure Catalyst expressions (split / higher-order array functions /
regexp) — no Python in the row path, so these run inside whole-stage codegen
and scale linearly with input bytes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish surface tokenization: letter runs, digit runs, single punctuation.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Minimal stopword panels for the n-gram language-ID heuristic. Tiny on
#: purpose: language ID at 100 TB is a per-row expression over the first
#: K tokens, not a model inference.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "mit"),
    "es": ("el", "la", "de", "y", "es", "un", "en", "que"),
    "fr": ("le", "la", "et", "de", "est", "un", "une", "dans"),
}


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokens of lowercased, trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), r"\s+")


def regex_tokens(col: Column | str) -> Column:
    """BPE-ish tokens (letters / digits / punctuation as separate tokens)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(TOKEN_REGEX), 0)


def token_count(col: Column | str) -> Column:
    return F.size(ws_tokens(col))


def word_shingles(tokens: Column, n: int) -> Column:
    """Word n-gram shingles from a token array, via higher-order functions:
    ``transform(sequence(1, len-n+1), i -> concat(t[i], ' ', t[i+1], ...))``.
    Empty result when the document has fewer than ``n`` tokens.

    The gram is built from ``n`` ``element_at`` lookups concatenated with
    literal spaces, NOT ``concat_ws(' ', slice(t, i, n))``: the slice form
    allocates an n-element array per gram inside the (interpreted) lambda
    and ran ~9x slower on the winnowing profile (r10, measured at sf0.1:
    3.13 s → 0.34 s for the 4-gram build, byte-identical output).

    PRECONDITION (ADVICE r10): the token array must be NULL-FREE —
    ``concat`` yields a NULL gram if ANY element is NULL, where the old
    ``concat_ws`` skipped NULLs. Every caller in this repo feeds
    ``split()``-produced arrays, which never contain NULLs; a caller
    with a hand-built array must filter NULL tokens first (do NOT paper
    over it with coalesce here — a silent empty-string token would
    corrupt gram identity).

    CALLER NOTE: the token expression is referenced ``n + 2`` times, so
    pass a MATERIALIZED column (select the token array first), not an
    inline ``ws_tokens(...)`` — otherwise the tokenizer may re-run per
    reference (the _shingle_arrays lesson).

    The short-doc case must be guarded BEFORE building the index sequence:
    ``sequence(1, 0)`` in Spark is the *descending* [1, 0], which would emit
    bogus shingles instead of none."""
    length = F.size(tokens)
    idx = F.sequence(F.lit(1), length - (n - 1))

    def gram(i: Column) -> Column:
        parts: list[Column] = [F.element_at(tokens, i)]
        for j in range(1, n):
            parts.append(F.lit(" "))
            parts.append(F.element_at(tokens, i + j))
        return F.concat(*parts)

    shingles = F.transform(idx, gram)
    return F.when(length >= n, shingles).otherwise(F.array().cast("array<string>"))


def hashed_word_shingles_expr(w: int, th_col: str = "th", distinct: bool = True) -> str:
    """SQL expression: DISTINCT hashed word *w*-grams over a token-hash
    array column (``xxhash64`` per token), combined in-row with
    position-dependent rotations — ``h(t_i) ^ rotl(h(t_{i+1}), 13) ^ ...``
    — so equal word sequences map to equal longs without ever building the
    gram STRING. UNPADDED: a doc shorter than the gram width yields an
    empty array, exactly like :func:`word_shingles` (contrast the padded
    form inside ``llm/dedup._shingle_arrays``, where short docs must stay
    matchable). Joins/aggregates over these 8-byte longs replace the
    ~(6·w)-byte gram strings; collisions are the documented 2^-64
    llm_ngram_jaccard trade (r10: measured 3.4x on llm_decontaminate's
    noop-isolated cost)."""

    def rot(e: str, r: int) -> str:
        r = r % 64
        return f"(shiftleft({e}, {r}) | shiftrightunsigned({e}, {(64 - r) % 64}))"

    terms = [f"element_at({th_col}, i)"] + [
        rot(f"element_at({th_col}, i + {j})", 13 * j) for j in range(1, w)
    ]
    inner = (
        f"transform(sequence(1, size({th_col}) - {w - 1}), i -> {' ^ '.join(terms)})"
    )
    if distinct:
        inner = f"array_distinct({inner})"
    return (
        f"CASE WHEN size({th_col}) >= {w} THEN {inner} "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )


def punct_count(col: Column | str) -> Column:
    """Punctuation characters, counted by deletion (regex parity with
    DuckDB's 'g'-flagged regexp_replace)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, r"[^A-Za-z0-9\s]", ""))


def digit_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    digits = F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return digits.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


def stopword_hits(tokens: Column, lang: str) -> Column:
    """Occurrences (with multiplicity) of the language's stopwords."""
    panel = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(panel, t)))


def language_id(col: Column | str) -> Column:
    """Deterministic stopword-panel language ID: the language whose panel
    hits the most tokens; 'und' (undetermined) when no panel hits. Ties
    break by language code order (deterministic)."""
    toks = ws_tokens(col)
    scored = None
    for lang in sorted(STOPWORDS):
        hits = stopword_hits(toks, lang)
        entry = F.struct(hits.alias("hits"), F.lit(lang).alias("lang"))
        scored = entry if scored is None else F.when(hits > scored["hits"], entry).otherwise(scored)
    return F.when(scored["hits"] > 0, scored["lang"]).otherwise(F.lit("und"))


def token_length_sum(tokens: Column) -> Column:
    """Total characters across tokens, via a higher-order fold (codegen'd)."""
    return F.aggregate(tokens, F.lit(0), lambda acc, t: acc + F.length(t))


def alpha_ratio(col: Column | str) -> Column:
    """Fraction of characters that are ASCII letters."""
    c = F.col(col) if isinstance(col, str) else col
    letters = F.length(c) - F.length(F.regexp_replace(c, r"[A-Za-z]", ""))
    return letters.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


def normalized_fingerprint(col: Column | str) -> Column:
    """Document fingerprint: lowercase, strip non-alphanumerics, collapse
    whitespace, md5. Equal fingerprints ⇔ near-identical text modulo
    formatting — the cheap first tier of the dedup cascade."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", ""), r"\s+", " "))
    return F.md5(normalized)
