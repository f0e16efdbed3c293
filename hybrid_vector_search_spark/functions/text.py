"""Text-analysis columns for large-scale training-data pipelines.

Builders return JVM-side ``Column`` expressions (built-in functions) so
they stay inside whole-stage codegen and scan at full parquet speed; at
100 TB these run as pure map-side work with no shuffle. Exception: string
kernels where per-element interpreted lambdas lose to Arrow batches
(``shingles``) are vectorized pandas UDFs with a pure-SQL ``*_hof``
fallback. Every computation is mirrored exactly by an ANSI-SQL fragment in
plans/registry.py for the DuckDB oracle.

Operators: language-ID (marker-word n-gram heuristic), quality scoring
(length / punctuation / stopword / token-shape ratios), token counting
(whitespace + BPE-ish regex), document fingerprinting (normalized md5 and
shingle sets for MinHash — see operators/dedup.py).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Marker stopwords per language — tiny, deterministic, shared verbatim with
# the SQL oracle. (A real pipeline would load larger lists; the operator
# shape — per-language token-hit scoring + argmax — is the same.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "to", "a"),
    "es": ("el", "la", "los", "que", "y", "un"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "les", "des", "et", "est", "une"),
}

STOPWORDS: tuple[str, ...] = tuple(
    sorted({w for ws in LANG_MARKERS.values() for w in ws})
)

# BPE-ish tokenizer: letter runs | digit runs | single non-space symbol.
# Simple character classes behave identically in Java regex (Spark) and
# DuckDB's RE2.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def ws_tokens(text: Column | str) -> Column:
    """Whitespace tokenization of lowercased text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), "\\s+")


def ws_token_count(text: Column | str) -> Column:
    return F.size(ws_tokens(text))


def bpe_token_count(text: Column | str) -> Column:
    """Count of BPE-ish regex tokens (reference-free; regexp_count is
    codegen'd JVM work)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE))


def _marker_hits(tokens: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*markers)))


def lang_id(text: Column | str) -> Column:
    """Marker-word language ID: per-language token-hit counts, argmax with
    fixed priority en > es > de > fr; CJK characters short-circuit to zh;
    no hits at all → 'und'."""
    c = F.col(text) if isinstance(text, str) else text
    toks = ws_tokens(c)
    hits = {lang: _marker_hits(toks, ms) for lang, ms in LANG_MARKERS.items()}
    has_cjk = F.regexp_count(c, F.lit("[\\x{4e00}-\\x{9fff}]")) > 0
    en, es, de, fr = hits["en"], hits["es"], hits["de"], hits["fr"]
    return (
        F.when(has_cjk, F.lit("zh"))
        .when((en + es + de + fr) == 0, F.lit("und"))
        .when((en >= es) & (en >= de) & (en >= fr), F.lit("en"))
        .when((es >= de) & (es >= fr), F.lit("es"))
        .when(de >= fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def punct_ratio(text: Column | str) -> Column:
    """Punctuation characters / total characters."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    punct = F.length(F.regexp_replace(c, "[^.,;:!?'\"()-]", ""))
    return F.when(n > 0, punct / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text: Column | str) -> Column:
    """Stopword tokens / total tokens."""
    toks = ws_tokens(text)
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.when(n > 0, hits / n.cast("double")).otherwise(F.lit(0.0))


def mean_token_len(text: Column | str) -> Column:
    toks = ws_tokens(text)
    n = F.size(toks)
    total = F.aggregate(
        toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t)
    )
    return F.when(n > 0, total / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1]:

    * length component — saturating ramp to 1.0 at ≥200 chars;
    * token-shape component — mean token length in a sane band [3, 10];
    * stopword component — natural text has some stopwords (ratio capped);
    * punctuation penalty — heavy punctuation marks boilerplate.

    Pure arithmetic over the ratio columns; identical formula in SQL.
    """
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c).cast("double")
    len_c = F.least(n / F.lit(200.0), F.lit(1.0))
    mtl = mean_token_len(c)
    shape_c = F.when((mtl >= 3.0) & (mtl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    stop_c = F.least(stopword_ratio(c) * 4.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - punct_ratio(c) * 5.0, F.lit(0.0))
    return (len_c * 0.3 + shape_c * 0.3 + stop_c * 0.2) * punct_pen + punct_pen * 0.2


def normalized_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace,
    trim."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))


def fingerprint_md5(text: Column | str) -> Column:
    """Content fingerprint: md5 of the normalized text — portable across
    engines (identical hex in Spark and DuckDB), used for exact dedup."""
    return F.md5(normalized_text(text))


def bigram_repetition(text: Column | str) -> Column:
    """Duplicate-bigram ratio — the Gopher/C4-style within-document
    repetition signal: ``1 − distinct adjacent word-bigrams / total
    bigrams`` over whitespace tokens of the lowercased trimmed text.
    0.0 = no repeated bigram; → 1.0 for looping boilerplate. NULL for
    documents with fewer than two tokens (no bigram exists).

    Pure JVM higher-order functions (transform/sequence/array_distinct)
    — no Python in the plan; the ratio is a pure function of two ints so
    both engines compute the identical double. Tokens come from
    :func:`normalized_text` split on single spaces — the same
    collapse-then-split both the SQL twin and the fingerprint path use
    (a bare ``split(trim(x), '\\s+')`` leaves a phantom empty token when
    the text starts with a newline/tab, because trim strips spaces
    only).

    The token array is BOUND as a lambda variable (transform over a
    1-element array) before any per-bigram work: referencing the split
    Column directly inside the inner lambda would inline the whole
    split expression into every element_at — Catalyst does not factor
    common subexpressions out of higher-order lambdas, and the
    re-tokenize-per-bigram plan measured 13.5 s vs ~0.5 s at sf0.1."""

    def ratio(t: Column) -> Column:
        n = F.size(t)
        bg = F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i + 1), F.element_at(t, i + 2)
            ),
        )
        return F.when(
            n >= 2,
            F.lit(1.0)
            - F.size(F.array_distinct(bg)).cast("double")
            / (n - 1).cast("double"),
        )

    toks = F.split(normalized_text(text), " ")
    return F.element_at(F.transform(F.array(toks), ratio), 1)


# PII patterns chosen for engine parity: every construct ([...], {m,},
# \b, literal text) means the same thing to Java regex (Spark) and RE2
# (DuckDB), so both engines count and redact identically. The phone
# pattern is the North-American fictional 555 exchange — the scrub
# demonstrates the mechanism; a production tagger swaps in its own
# pattern set (and jurisdictional rules) here.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"


def pii_counts(text: Column | str) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in the text — JVM ``regexp_count``."""
    c = F.col(text) if isinstance(text, str) else text
    return (
        F.regexp_count(c, F.lit(EMAIL_RE)),
        F.regexp_count(c, F.lit(PHONE_RE)),
    )


def redact_pii(text: Column | str) -> Column:
    """Replace emails/phones with typed placeholder tokens — the
    standard curation scrub that keeps document structure (and token
    counts roughly stable) while removing the identifier itself."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )


def bigram_repetition_sql(col: str = "text") -> str:
    """DuckDB twin of :func:`bigram_repetition` (1-based list indexing;
    ``range(1, len)`` is stop-exclusive → positions 1..len−1)."""
    t = (
        f"string_split(trim(regexp_replace(lower({col}), '\\s+', ' ', 'g')), ' ')"
    )
    bg = f"list_transform(range(1, len({t})), i -> {t}[i] || ' ' || {t}[i+1])"
    return (
        f"CASE WHEN len({t}) >= 2 THEN "
        f"1.0 - len(list_distinct({bg}))::DOUBLE / (len({t}) - 1) END"
    )


_WS = re.compile(r"\s+")


def py_shingles(s: str | None, n: int) -> list[str] | None:
    """Distinct word n-grams (first-occurrence order) of one normalized
    text — the single Python shingle kernel shared by :func:`shingles`
    and :func:`shingle_rows` so every caller has identical semantics.
    Returns None for None input (matches the SQL form)."""
    if s is None:
        return None
    toks = _WS.sub(" ", s.lower()).strip().split(" ")
    m = max(len(toks) - n, 0) + 1
    return list(dict.fromkeys(" ".join(toks[i : i + n]) for i in range(m)))


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct, first-occurrence order) of the
    normalized text — the dedup unit for MinHash/Jaccard.

    Arrow-batched UDF: plain Python slicing per document. The pure-SQL
    form (:func:`shingles_hof`) needs an interpreted slice+array_join
    lambda per position, which profiled ~20× slower — n-gram assembly
    is a string kernel, not relational work, so the UDF is the right
    side of the JVM/Python boundary here.

    CAVEAT: do NOT ``F.explode`` this column — Catalyst's Python-UDF
    extraction leaves a dead duplicate ArrowEvalPython below the Generate
    (measured ~2× the UDF cost); use :func:`shingle_rows` when the next
    step is an exploded inverted index.
    """
    c = F.col(text) if isinstance(text, str) else text

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _shingles(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in it:
            yield pd.Series([py_shingles(s, n) for s in batch])

    return _shingles(c)


def shingle_rows(
    docs, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
):
    """Exploded shingle inverted index ``(id, n_sh, g)`` — one row per
    distinct n-gram per document, with the document's shingle-set size
    carried inline.

    One ``mapInPandas`` pass replaces UDF→Generate: shingle assembly and
    the explode happen in the same Arrow batch, avoiding both the dead
    duplicate ArrowEvalPython that Generate-over-a-UDF-column plans
    execute and the intermediate array materialization. Null texts yield
    no rows (a null shingle set has nothing to invert).
    """
    schema = T.StructType(
        [
            next(f for f in docs.schema.fields if f.name == id_col),
            T.StructField("n_sh", T.IntegerType(), False),
            T.StructField("g", T.StringType(), False),
        ]
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list = []
            sizes: list[int] = []
            grams: list[str] = []
            for did, s in zip(pdf[id_col], pdf[text_col]):
                g = py_shingles(s, n)
                if not g:
                    continue
                ids.extend([did] * len(g))
                sizes.extend([len(g)] * len(g))
                grams.extend(g)
            yield pd.DataFrame({id_col: ids, "n_sh": sizes, "g": grams})

    return docs.select(id_col, text_col).mapInPandas(gen, schema)


def shingles_hof(text: Column | str, n: int = 3) -> Column:
    """Pure-SQL shingle builder (sequence+transform, no Python) — kept as
    the codegen-only fallback; same semantics as :func:`shingles`."""
    toks = F.split(normalized_text(text), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    return F.array_distinct(grams)


# ------------------------------------------------------ SQL oracle mirrors
def lang_id_sql(col: str = "text") -> str:
    """DuckDB fragment computing exactly lang_id()."""
    def hits(markers: tuple[str, ...]) -> str:
        lst = ", ".join(f"'{w}'" for w in markers)
        return (
            f"len(list_filter(regexp_split_to_array(lower(trim({col})), '\\s+'),"
            f" t -> t IN ({lst})))"
        )

    en, es, de, fr = (hits(LANG_MARKERS[l]) for l in ("en", "es", "de", "fr"))
    return f"""CASE
  WHEN regexp_matches({col}, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
  WHEN ({en}) + ({es}) + ({de}) + ({fr}) = 0 THEN 'und'
  WHEN ({en}) >= ({es}) AND ({en}) >= ({de}) AND ({en}) >= ({fr}) THEN 'en'
  WHEN ({es}) >= ({de}) AND ({es}) >= ({fr}) THEN 'es'
  WHEN ({de}) >= ({fr}) THEN 'de'
  ELSE 'fr' END"""


def stopword_ratio_sql(col: str = "text") -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS)
    toks = f"regexp_split_to_array(lower(trim({col})), '\\s+')"
    return (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"len(list_filter({toks}, t -> t IN ({lst})))::DOUBLE / len({toks}) "
        "ELSE 0.0 END"
    )


def punct_ratio_sql(col: str = "text") -> str:
    return (
        f"CASE WHEN length({col}) > 0 THEN "
        f"length(regexp_replace({col}, '[^.,;:!?''\"()-]', '', 'g'))::DOUBLE"
        f" / length({col}) ELSE 0.0 END"
    )


def mean_token_len_sql(col: str = "text") -> str:
    toks = f"regexp_split_to_array(lower(trim({col})), '\\s+')"
    return (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"list_sum(list_transform({toks}, t -> length(t)))::DOUBLE / len({toks}) "
        "ELSE 0.0 END"
    )


def quality_score_sql(col: str = "text") -> str:
    mtl = mean_token_len_sql(col)
    return f"""(
  LEAST(length({col})::DOUBLE / 200.0, 1.0) * 0.3
  + (CASE WHEN ({mtl}) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.3
  + LEAST(({stopword_ratio_sql(col)}) * 4.0, 1.0) * 0.2
) * GREATEST(1.0 - ({punct_ratio_sql(col)}) * 5.0, 0.0)
+ GREATEST(1.0 - ({punct_ratio_sql(col)}) * 5.0, 0.0) * 0.2"""


def fingerprint_md5_sql(col: str = "text") -> str:
    return f"md5(trim(regexp_replace(lower({col}), '\\s+', ' ', 'g')))"


# --------------------------------------------- BPE merge application (r15)
#
# The ENGINE-EXACT merge-application semantics is "chained literal
# replace": merge k rewrites every leftmost-non-overlapping occurrence
# of ' lhs rhs ' in the space-padded symbol string to ' lhs_rhs ',
# merges applied in rank order, each exactly once (the semantics
# text_bpe_merges trains under, bit-identical in the JVM, DuckDB, and
# Python str.replace — the r14 replace-parity probe). The unrolled
# expression form costs plan depth LINEAR in K; this kernel is the
# scale path: identical answers (pytest-pinned against brute
# str.replace, hash-pinned in text_bpe_encode_vocab), cost flat in
# TABLE SIZE because inapplicable merges are never touched — a
# min-heap holds only ranks whose pair is currently adjacent, and
# applying one merge is one left-to-right pass.
#
# The one subtlety replicated from the padded-string form: a match
# consumes its TRAILING delimiter space, so the pair starting at the
# symbol immediately after a merged occurrence cannot match in the
# same pass (' a b a b ' --(a,b)--> ' ab a b ', NOT ' ab ab ') — the
# pass below copies that blocked symbol verbatim.


def bpe_chained_encode(
    symbols: list[str],
    rank_of: dict[tuple[str, str], int],
    pair_at: list[tuple[str, str]],
    joiner: str = "_",
) -> list[str]:
    """Apply a ranked merge table to one symbol sequence under chained
    leftmost-non-overlapping-replace semantics; returns the merged
    symbol list. ``rank_of`` maps (lhs, rhs) → rank (0-based, first
    occurrence wins); ``pair_at[rank]`` is the inverse."""
    import heapq

    cur = -1
    heap = [
        rank_of[p] for p in zip(symbols, symbols[1:]) if p in rank_of
    ]
    heapq.heapify(heap)
    while heap:
        r = heapq.heappop(heap)
        if r <= cur:
            continue  # stale duplicate of an already-passed rank
        lhs, rhs = pair_at[r]
        out: list[str] = []
        i, n, applied = 0, len(symbols), False
        while i < n:
            if (
                i + 1 < n
                and symbols[i] == lhs
                and symbols[i + 1] == rhs
            ):
                out.append(lhs + joiner + rhs)
                applied = True
                if i + 2 < n:
                    # the blocked pair: its leading delimiter was
                    # consumed as this match's trailing space
                    out.append(symbols[i + 2])
                i += 3
            else:
                out.append(symbols[i])
                i += 1
        cur = r
        if applied:
            symbols = out
            for p in zip(symbols, symbols[1:]):
                rr = rank_of.get(p)
                if rr is not None and rr > r:
                    heapq.heappush(heap, rr)
    return symbols


def bpe_encode_token_counts(
    merges: list[tuple[str, str]], text_col: str = "s", id_col: str = "doc_id"
):
    """``mapInPandas`` factory: (id, normalized text) batches → (id,
    n_tok) under the broadcast merge table. The merge table rides the
    task closure (bounded: K rows of short strings — the same
    broadcast-small-side rule as every candidate join); each Arrow
    batch pays one dict build, then per-row cost is independent of K."""
    rank_of: dict[tuple[str, str], int] = {}
    for lhs, rhs in merges:
        rank_of.setdefault((lhs, rhs), len(rank_of))
    pair_at = [p for p, _ in sorted(rank_of.items(), key=lambda kv: kv[1])]

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            n_tok = [
                len(bpe_chained_encode(s.split(), rank_of, pair_at))
                for s in pdf[text_col].tolist()
            ]
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "n_tok": n_tok}
            )

    return run
