"""Text-analysis column functions for the training-data pipeline.

All built-in ``F.*`` expressions (JVM-side) — these run at 100 TB inside the
scan stage with no Python boundary. Deterministic by construction so results
can be verified against a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny deterministic stopword lists for the n-gram/stopword language-ID
#: heuristic. Chosen to be discriminative for the test corpus languages.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "es": ["el", "la", "de", "que", "los", "una", "es", "las"],
    "de": ["der", "die", "und", "das", "den", "von", "ist", "ein"],
}

#: English stopwords used by the quality-score heuristic.
QUALITY_STOPWORDS = LANG_STOPWORDS["en"] + ["it", "for", "on", "with", "as"]


def normalize_text(text: Column) -> Column:
    """Lowercase, strip non-alphanumerics to spaces, collapse whitespace.
    The canonical form used for fingerprinting and shingling."""
    lowered = F.lower(text)
    stripped = F.regexp_replace(lowered, r"[^a-z0-9\s]", " ")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text → array<string>.
    Empty or whitespace-only text → empty array (not ['']).

    Implemented as a post-split filter rather than a trim-equals-empty
    guard: ``F.trim`` strips only ASCII spaces, so a tab/newline-only
    document slips past the guard and splits into phantom '' tokens —
    the filter drops every empty token regardless of which whitespace
    produced it, exactly matching the oracles'
    ``list_filter(regexp_split_to_array(...), _t -> _t <> '')``."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def bind_once(value: Column, fn) -> Column:
    """Evaluate ``value`` once per row and hand it to ``fn`` as a lambda
    variable (public: plan modules use this for the same reason).

    Higher-order-function lambdas re-evaluate *captured* outer expressions
    on every element; a lambda variable is a plain attribute lookup. Binding
    via a 1-element array turns O(len · cost(value)) into O(cost(value)) —
    for ngrams over normalized text that is the difference between 2 regex
    passes per document and 2 regex passes per *character*.
    """
    return F.element_at(F.transform(F.array(value), fn), 1)


# internal shorthand predating the public name
_bind = bind_once


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Character n-gram shingles of the normalized text → array<string>
    (with duplicates; wrap in ``F.array_distinct`` for a shingle *set*).

    Split-to-chars + O(1) ``element_at`` per position: ``substr(s, i, n)``
    inside a lambda re-scans the string's bytes to find char offset *i*
    (UTF8String has no char index), making the obvious construction
    O(len²) per document. Splitting once and concatenating n array
    elements per position is O(len·n). Measured 2.2× faster on the
    document corpus. The char array is ``_bind``-ed so normalize+split
    run once per row, not once per shingle position.
    """
    # positions 1 .. len-n+1 (empty when text shorter than n)
    return _bind(
        F.split(normalize_text(text), ""),
        lambda cs: F.when(F.size(cs) < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(cs) - F.lit(n - 1)),
                lambda i: F.concat(*[F.element_at(cs, i + F.lit(k)) for k in range(n)]),
            )
        ),
    )


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles ('a b c' style) → array<string> with duplicates.
    Token array ``_bind``-ed: split/normalize run once per row."""
    return _bind(
        tokens(normalize_text(text)),
        lambda tk: F.when(F.size(tk) < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(tk) - F.lit(n)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(tk, i + F.lit(k + 1)) for k in range(n)]
                ),
            )
        ),
    )


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English) stopwords, 6 decimal places."""
    stopwords = stopwords or QUALITY_STOPWORDS
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(stopwords)))
    return F.round(hits / F.greatest(F.size(toks), F.lit(1)), 6)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space, 6 dp."""
    n = F.length(text)
    clean = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    return F.round(clean / F.greatest(n, F.lit(1)), 6)


def quality_score(text: Column) -> Column:
    """Composite [0,1] document-quality heuristic: rewards mid-length docs
    and stopword presence, penalizes punctuation soup. Deterministic."""
    length_term = F.least(token_count(text) / F.lit(200.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 4, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    return F.round((length_term + stop_term + punct_term) / 3, 6)


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts over the token set."""
    toks = tokens(normalize_text(text))

    # single-arg lambda factory: a two-arg lambda would make F.filter pass
    # the element *index* as the second argument
    def hit_counter(sw: list[str]):
        return lambda tok: tok.isin(sw)

    return {
        lang: F.size(F.filter(toks, hit_counter(sw)))
        for lang, sw in LANG_STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword hits;
    'und' when no stopword from any list appears. Ties break by the fixed
    language order en > fr > es > de (deterministic).

    The token array is ``_bind``-ed once: the argmax when/greatest chain
    repeats each language's score subtree several times, and without the
    bind every repetition would re-run the normalize+split regexes.
    """

    def argmax(tk: Column) -> Column:
        def hit_counter(sw: list[str]):
            return lambda tok: tok.isin(sw)

        scores = {
            lang: F.size(F.filter(tk, hit_counter(sw)))
            for lang, sw in LANG_STOPWORDS.items()
        }
        best_lang = F.lit("und")
        best_score = F.lit(0)
        for lang in ["de", "es", "fr", "en"]:  # reverse priority; later wins ties
            s = scores[lang]
            cond = s >= F.greatest(best_score, F.lit(1))
            best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
            best_score = F.greatest(best_score, s)
        return best_lang

    return _bind(tokens(normalize_text(text)), argmax)


def doc_fingerprint(text: Column) -> Column:
    """MD5 of the normalized text — exact-duplicate fingerprint that is
    robust to case/punctuation/whitespace variation."""
    return F.md5(normalize_text(text))


def hash64(s: Column) -> Column:
    """Deterministic 64-bit signed hash of a string via the first 16 hex
    chars of md5 — engine-portable (same arithmetic is expressible in any
    SQL dialect), unlike Spark's murmur ``F.hash``."""
    return F.conv(F.substring(F.md5(s), 1, 16), 16, 10).cast("decimal(20,0)")


def simhash64(text: Column, ngram: int = 3) -> Column:
    """64-bit SimHash over word n-grams → 16-char hex fingerprint.

    Classic construction: hash each shingle to 64 bits; for each bit
    position sum +1/-1 votes across shingles; the fingerprint bit is the
    vote's sign. Single-pass ``F.aggregate`` with an array<int> accumulator
    of the 64 vote counters — pure JVM higher-order functions, no UDF, so
    at 100 TB this stays inside the project stage.
    """
    shingles = F.array_distinct(word_ngrams(text, ngram))
    hashes = F.transform(shingles, lambda s: F.substring(F.md5(s), 1, 16))
    zeros = F.array_repeat(F.lit(0), 64)
    positions = F.sequence(F.lit(0), F.lit(63))

    def votes_for(h: Column) -> Column:
        # bit b of the 64-bit hex hash: nibble = hex digit b//4; then
        # (nibble >> (3 - b%4)) & 1, done with div/mod arithmetic.
        return F.transform(
            positions,
            lambda b: (
                F.floor(
                    F.conv(F.substring(h, (F.floor(b / 4) + 1).cast("int"), 1), 16, 10).cast("int")
                    / F.pow(F.lit(2.0), (3 - b % 4).cast("double"))
                ).cast("int")
                % 2
            )
            * 2
            - 1,
        )

    counts = F.aggregate(
        hashes, zeros, lambda acc, h: F.zip_with(acc, votes_for(h), lambda a, v: a + v)
    )

    # _bind the vote counters: the 16-nibble transform references them 64
    # times, and a captured (non-bound) `counts` would re-run the whole
    # aggregate once per reference.
    def to_hex(c: Column) -> Column:
        def bit(i: Column, k: int) -> Column:
            return F.when(F.element_at(c, (i * 4 + k).cast("int")) > 0, 1).otherwise(0)

        nibbles = F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: F.lower(
                F.conv(
                    (bit(i, 1) * 8 + bit(i, 2) * 4 + bit(i, 3) * 2 + bit(i, 4)).cast(
                        "string"
                    ),
                    10,
                    16,
                )
            ),
        )
        return F.array_join(nibbles, "")

    return _bind(counts, to_hex)
