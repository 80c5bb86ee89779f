"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting, PII
scrubbing, span-level exact dedup, Gopher-style repetition stats,
benchmark contamination checking.

All Catalyst-first: counts/ratios are JVM expressions over the shared
tokenizer; the only pandas UDF is the rolling-hash fingerprint (numeric
numpy over JVM-computed token hashes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from prow_jobs_scraper_spark.functions.tokenize import tokenize_column

# Tiny deterministic stopword profiles for n-gram-heuristic language ID.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "une", "dans"],
    "es": ["el", "la", "los", "las", "es", "una", "para", "por", "con"],
}

EN_STOPWORDS = _LANG_MARKERS["en"] + [
    "a", "an", "as", "at", "by", "be", "are", "was", "on", "or", "this",
]


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens, engine tokens, and a BPE-ish subword estimate
    (chars/4 heuristic + punctuation splits) — all Catalyst expressions."""
    toks = tokenize_column(F.col(text_col))
    ws = F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda s: s != ""))
    bpe_ish = F.ceil(F.length(F.col(text_col)) / F.lit(4.0)).cast("long")
    return df.withColumns({
        "n_ws_tokens": ws,
        "n_tokens": F.size(toks),
        "n_bpe_est": bpe_ish,
    })


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite [0,1] score:
    length, alpha ratio, punctuation ratio, stopword ratio, mean word
    length, repetition ratio (distinct/total tokens)."""
    toks = tokenize_column(F.col(text_col))
    n_chars = F.length(F.coalesce(F.col(text_col), F.lit("")))
    n_alpha = F.length(F.regexp_replace(
        F.coalesce(F.col(text_col), F.lit("")), r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(
        F.coalesce(F.col(text_col), F.lit("")), r"[^!-/:-@\[-`{-~]", ""))
    n_tok = F.size(toks)
    n_stop = F.size(F.array_intersect(toks, F.array(
        *[F.lit(w) for w in EN_STOPWORDS])))
    distinct_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)) / n_tok).otherwise(F.lit(0.0))
    out = df.withColumns({
        "n_chars": n_chars,
        "alpha_ratio": F.when(n_chars > 0, n_alpha / n_chars).otherwise(0.0),
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0),
        "stopword_ratio": F.when(n_tok > 0, n_stop / n_tok).otherwise(0.0),
        "mean_word_len": F.when(n_tok > 0, F.aggregate(
            toks, F.lit(0), lambda a, t: a + F.length(t)) / n_tok).otherwise(0.0),
        "distinct_ratio": distinct_ratio,
    })
    score = (
        F.least(F.col("n_chars") / F.lit(500.0), F.lit(1.0)) * 0.25
        + F.col("alpha_ratio") * 0.25
        + (F.lit(1.0) - F.least(F.col("punct_ratio") * 4, F.lit(1.0))) * 0.2
        + F.least(F.col("stopword_ratio") * 5, F.lit(1.0)) * 0.1
        + F.col("distinct_ratio") * 0.2
    )
    return out.withColumn("quality_score", score)


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/stopword-heuristic language ID: score each language profile
    by marker-token hit count (array_intersect per profile — pure
    Catalyst); 'und' (undetermined) when nothing matches."""
    toks = F.array_distinct(tokenize_column(F.col(text_col)))
    scores = F.array(*[
        F.struct(
            F.size(F.array_intersect(
                toks, F.array(*[F.lit(w) for w in words]))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in _LANG_MARKERS.items()
    ])
    best = F.array_max(scores)
    return df.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                window: int = 4, hash_expr=None) -> DataFrame:
    """Rolling-hash document fingerprint (winnowing-style): min rolling
    polynomial hash over token-hash windows. Token hashes come from a
    Catalyst expression; the pandas UDF is numeric numpy only.

    ``hash_expr``: token Column -> int64 hash Column; defaults to
    xxhash64 (fastest). Pass ``dedup.md5_token_hash`` to make the whole
    pipeline replicable in DuckDB SQL (the driver oracle) — the
    polynomial min-hash itself is hash-agnostic."""
    w = window

    @F.pandas_udf(T.LongType())
    def fp(token_hashes: pd.Series) -> pd.Series:
        # batch-vectorized (no per-row Python, same reduceat pattern as
        # simhash/minhash): flatten every doc's token hashes, compute all
        # rolling-window polynomial hashes in one pass, then per-doc
        # minima via minimum.reduceat. The polynomial hash of a window is
        # Σ h[j]·base^(w−1−j) in uint64 wraparound; docs shorter than the
        # window use one window of their full length (same formula).
        base = np.uint64(1099511628211)
        lens = token_hashes.map(
            lambda x: 0 if x is None else len(x)).to_numpy(dtype=np.int64)
        out = np.zeros(lens.size, dtype=np.int64)

        # ---- docs with >= w tokens: shared sliding_window_view pass
        long_rows = np.flatnonzero(lens >= w)
        if long_rows.size:
            llens = lens[long_rows]
            flat = np.concatenate(
                [np.asarray(token_hashes.iloc[i], dtype=np.int64)
                 for i in long_rows]).astype(np.uint64)
            starts = np.concatenate(([0], np.cumsum(llens)[:-1]))
            powers = base ** np.arange(w - 1, -1, -1, dtype=np.uint64)
            wins = np.lib.stride_tricks.sliding_window_view(flat, w)
            hashes = (wins * powers[None, :]).sum(axis=1, dtype=np.uint64)
            # windows that straddle a doc boundary must never win the
            # min: doc i's windows are [starts[i], starts[i]+len−w], the
            # trailing w−1 window slots before each next doc are invalid
            ends = starts + llens
            bad = (ends[:-1, None] - w + 1
                   + np.arange(w - 1, dtype=np.int64)[None, :]).ravel()
            hashes[bad[(bad >= 0) & (bad < hashes.size)]] = np.uint64(
                0xFFFFFFFFFFFFFFFF)
            out[long_rows] = np.minimum.reduceat(
                hashes, starts).astype(np.int64)

        # ---- short docs (0 < len < w): one window of the full doc
        short_rows = np.flatnonzero((lens > 0) & (lens < w))
        if short_rows.size:
            slens = lens[short_rows]
            flat = np.concatenate(
                [np.asarray(token_hashes.iloc[i], dtype=np.int64)
                 for i in short_rows]).astype(np.uint64)
            starts = np.concatenate(([0], np.cumsum(slens)[:-1]))
            pos = np.arange(flat.size, dtype=np.int64) - np.repeat(
                starts, slens)
            exp = np.repeat(slens, slens) - 1 - pos  # base^(len−1−j)
            powlut = base ** np.arange(w, dtype=np.uint64)
            out[short_rows] = np.add.reduceat(
                flat * powlut[exp], starts).astype(np.int64)
        return pd.Series(out)

    hf = hash_expr if hash_expr is not None else F.xxhash64
    token_hashes = F.transform(
        tokenize_column(F.col(text_col)), lambda t: hf(t)
    )
    return df.withColumn("fingerprint", fp(token_hashes))

# PII categories scrubbed in ORDER (an email must be masked before the
# URL pass so `user@host` inside a URL can't double-count; the IPv4 pass
# runs after URLs so `http://1.2.3.4/` counts as a URL, not an IP). The
# patterns stay inside the regex subset Java (Spark) and RE2 (DuckDB
# oracle) agree on: no backrefs, no lookaround.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # US-style phone formats: optional +1, (NNN) or NNN area code,
    # -/./space separators — (555) 123-4567, 555.123.4567,
    # +1 555-123-4567, 555 123 4567. Bare 10-digit runs (5551234567)
    # are deliberately NOT matched: numeric IDs in logs/corpora make
    # them a false-positive trap (documented coverage boundary).
    ("phone",
     r"(\+1[-. ]?)?(\(\d{3}\)[-. ]?|\b\d{3}[-. ])\d{3}[-. ]\d{4}\b",
     "<PHONE>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect-and-mask PII for training-data sanitization: emails, URLs,
    IPv4 addresses, US-style phone numbers — the categories every
    web-scale pipeline scrubs before training. Adds one ``n_<kind>``
    count per category and ``<text_col>_scrubbed`` with matches replaced
    by typed mask tokens.

    Pure Catalyst (``regexp_count``/``regexp_replace`` chained in
    category order, each category counted on the PREVIOUS category's
    scrubbed text so counts and masks tell one consistent story) — no
    Python in the row path, fully predicate-pushdown-friendly, and
    embarrassingly parallel at any scale."""
    cur = F.coalesce(F.col(text_col), F.lit(""))
    cols: dict[str, object] = {}
    for kind, pat, mask in PII_PATTERNS:
        cols[f"n_{kind}s"] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, mask)
    cols[f"{text_col}_scrubbed"] = cur
    return df.withColumns(cols)


def _ngram_col(toks, n: int):
    """Space-joined token n-grams as an array<string> Column (empty when
    the doc has fewer than ``n`` tokens — guarded because F.sequence
    counts DOWN when start > stop)."""
    m = F.size(toks)
    return F.when(
        m >= n,
        F.transform(F.sequence(F.lit(1), m - n + 1),
                    lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def _dup_fracs(arr):
    """(dup_frac, dup_char_frac) for an array column: the fraction of
    occurrences (resp. characters) beyond each distinct value's first —
    the standard implementation of Gopher's duplicate line / paragraph
    fractions ((total - distinct) / total)."""
    cnt = F.size(arr)
    dcnt = F.size(F.array_distinct(arr))
    chars = F.aggregate(arr, F.lit(0).cast("long"),
                        lambda a, x: a + F.length(x))
    dchars = F.aggregate(F.array_distinct(arr), F.lit(0).cast("long"),
                         lambda a, x: a + F.length(x))
    frac = F.when(cnt > 0, (cnt - dcnt) / cnt).otherwise(F.lit(0.0))
    cfrac = F.when(chars > 0, (chars - dchars) / chars).otherwise(F.lit(0.0))
    return frac, cfrac


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
) -> DataFrame:
    """Gopher repetition quality rules (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", appendix A1.1 — the public MassiveWeb
    filter set): per-document duplicate-line / duplicate-paragraph
    fractions, top-n-gram character coverage, and duplicate-n-gram
    occurrence fractions. Training pipelines drop documents above
    thresholds on these (e.g. dup_line_frac > 0.30,
    top_2gram_char_frac > 0.20).

    Emitted columns:

    - ``n_lines``, ``dup_line_frac``, ``dup_line_char_frac`` — lines =
      non-empty ``\\n`` splits; frac = (total - distinct) / total
      occurrences (resp. characters).
    - ``dup_para_frac``, ``dup_para_char_frac`` — paragraphs = non-empty
      ``\\n\\n+`` splits.
    - ``top_{n}gram_char_frac`` for n in ``top_ns`` — occurrences of the
      single most frequent token n-gram × its joined character length /
      document characters (ties break on the lexicographically greatest
      gram, deterministic). Documented deviation from Gopher: the gram's
      character length is measured on the space-joined token form, not
      the raw source span (identical on single-spaced text). Matches
      the de-facto public implementation (datatrove's
      GopherRepetitionFilter): occurrences are NOT union-coalesced, so
      heavily self-overlapping repeats can push the value above 1.0.
    - ``dup_{n}gram_frac`` for n in ``dup_ns`` — fraction of n-gram
      OCCURRENCES whose gram appears more than once in the document.
      Documented deviation: Gopher measures the union of characters
      covered by duplicated n-grams; the occurrence fraction is the
      standard SQL-replayable simplification and orders documents the
      same way.

    Scale shape: every statistic is a pure Catalyst higher-order-function
    expression over the tokenizer output — map-side, zero shuffle, zero
    Python, embarrassingly parallel at any corpus size. Sorting each
    doc's n-gram array costs O(t log t) per doc. Intermediates (token
    array, sorted gram arrays, run starts) are materialized as LAYERED
    projection columns rather than inlined subexpressions — a lambda
    that references an inlined `array_sort(...)` subtree duplicates it
    at every reference and the optimizer/codegen cost explodes
    combinatorially (measured: minutes per 500 docs inlined, sub-second
    layered).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))

    def _seq1(m):
        # 1..m as an array (F.sequence counts DOWN when m < start, so
        # guard the empty case explicitly).
        return F.when(m > 0, F.sequence(F.lit(1), m)).otherwise(
            F.array().cast("array<int>"))

    all_ns = sorted(set(top_ns) | set(dup_ns))
    # layer 0: token array, lines, paragraphs, char count
    out = df.withColumns({
        "__rs_toks": tokenize_column(F.col(text_col)),
        "__rs_nchars": F.length(text),
        "__rs_lines": F.filter(F.split(text, r"\n"),
                               lambda x: F.trim(x) != ""),
        "__rs_paras": F.filter(F.split(text, r"\n\n+"),
                               lambda x: F.trim(x) != ""),
    })
    # layer 1: sorted n-gram arrays
    out = out.withColumns({
        f"__rs_s{n}": F.array_sort(_ngram_col(F.col("__rs_toks"), n))
        for n in all_ns
    })
    # layer 2: run starts in each sorted array (top_ns only). F.get is
    # 0-based and NULL on out-of-bounds (ANSI-safe at the edges).
    def _starts(n):
        s = F.col(f"__rs_s{n}")
        return F.filter(
            _seq1(F.size(s)),
            lambda i: (i == 1) | (F.get(s, i - 1) != F.get(s, i - 2)),
        )

    out = out.withColumns({f"__rs_st{n}": _starts(n) for n in top_ns})

    line_frac, line_cfrac = _dup_fracs(F.col("__rs_lines"))
    para_frac, para_cfrac = _dup_fracs(F.col("__rs_paras"))
    cols: dict[str, object] = {
        "n_lines": F.size("__rs_lines"),
        "dup_line_frac": line_frac,
        "dup_line_char_frac": line_cfrac,
        "dup_para_frac": para_frac,
        "dup_para_char_frac": para_cfrac,
    }
    n_chars = F.col("__rs_nchars")

    for n in top_ns:
        s, starts = F.col(f"__rs_s{n}"), F.col(f"__rs_st{n}")
        m = F.size(s)
        # runs = (next start - start) -> (run length, gram) structs;
        # array_max picks (max count, then max gram)
        ends = F.concat(F.slice(starts, 2, F.size(starts)),
                        F.array(m + 1))
        runs = F.zip_with(starts, ends, lambda a, b: b - a)
        best = F.array_max(F.zip_with(
            runs,
            F.transform(starts, lambda i: F.get(s, i - 1)),
            lambda r, g: F.struct(r.alias("cnt"), g.alias("gram")),
        ))
        cols[f"top_{n}gram_char_frac"] = F.when(
            (m > 0) & (n_chars > 0),
            best["cnt"] * F.length(best["gram"]) / n_chars,
        ).otherwise(F.lit(0.0))

    for n in dup_ns:
        s = F.col(f"__rs_s{n}")
        m = F.size(s)
        dup_occ = F.size(F.filter(
            _seq1(m),
            lambda i: ((i > 1) & (F.get(s, i - 1) == F.get(s, i - 2)))
            | ((i < m) & (F.get(s, i - 1) == F.get(s, i))),
        ))
        cols[f"dup_{n}gram_frac"] = F.when(
            m > 0, dup_occ / m).otherwise(F.lit(0.0))

    out = out.withColumns(cols)
    return out.drop("__rs_toks", "__rs_nchars", "__rs_lines", "__rs_paras",
                    *[f"__rs_s{n}" for n in all_ns],
                    *[f"__rs_st{n}" for n in top_ns])


def contamination_check(
    df: DataFrame,
    benchmark_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 / PaLM rule, public in both
    papers' appendices): flag training documents sharing any exact
    ``n``-gram (default 13, the published choice) with an evaluation
    benchmark, so contaminated docs can be dropped before training.

    Returns one row per input document: ``(id_col, n_grams,
    n_contaminated, contaminated_frac, is_contaminated)`` where
    ``n_contaminated`` counts the document's n-gram OCCURRENCES found in
    the benchmark's n-gram set and ``is_contaminated`` = any hit.

    Scale shape (the part that matters at 100 TB): benchmark suites are
    tiny (10^5-10^7 grams) next to the corpus, so the benchmark side is
    shingled, made distinct, and **broadcast** — the corpus-side explode
    + join runs entirely map-side (no corpus shuffle), and the per-doc
    re-aggregation partially aggregates map-side to ONE row per document
    before its doc_id-keyed exchange. Join key is (xxhash64(gram), gram):
    the 8-byte hash prunes comparisons, the gram string keeps the match
    exact. No Python anywhere in the row path.
    """
    # layered projections (NOT one inlined expression): `__grams`
    # materializes once per row, so size() and explode() reference an
    # attribute instead of re-evaluating the tokenize-per-slice subtree
    # — the same combinatorial-blowup guard repetition_stats documents
    # (measured here: 230 s -> seconds at sf0.1)
    doc_grams = (
        df.select(F.col(id_col),
                  tokenize_column(F.col(text_col)).alias("__toks"))
        .select(id_col, _ngram_col(F.col("__toks"), n).alias("__grams"))
        .select(
            F.col(id_col),
            F.size("__grams").alias("n_grams"),
            F.explode_outer("__grams").alias("__g"),
        )
    )
    bench = (
        benchmark_df
        .select(tokenize_column(F.col(bench_text_col)).alias("__toks"))
        .select(_ngram_col(F.col("__toks"), n).alias("__grams"))
        .select(F.explode("__grams").alias("__g"))
        .distinct()
        .select(F.xxhash64("__g").alias("__h"), "__g",
                F.lit(1).alias("__hit"))
    )
    joined = doc_grams.join(
        F.broadcast(bench),
        on=(F.xxhash64(doc_grams["__g"]) == bench["__h"])
        & (doc_grams["__g"] == bench["__g"]),
        how="left",
    )
    out = joined.groupBy(id_col).agg(
        F.first("n_grams").alias("n_grams"),
        F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_contaminated"),
    )
    frac = F.when(
        F.col("n_grams") > 0,
        F.col("n_contaminated") / F.col("n_grams"),
    ).otherwise(F.lit(0.0))
    return out.select(
        id_col, "n_grams", "n_contaminated",
        frac.alias("contaminated_frac"),
        (F.col("n_contaminated") > 0).alias("is_contaminated"),
    )


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 20,
) -> DataFrame:
    """Span-level exact dedup (the C4 / "Deduplicating Training Data
    Makes Language Models Better" shape, done at fixed token-chunk
    granularity): split every document into consecutive
    ``chunk_tokens``-token chunks, drop every chunk whose exact token
    sequence already appeared earlier in the corpus (keep-first by
    (id, chunk position)), and rebuild the surviving text.

    Returns one row per non-empty document: ``(id_col, n_chunks,
    n_dup_chunks, text_deduped)``.

    Scale shape: chunking is a map-side explode (no state), the
    keep-first decision is ONE window shuffle keyed by
    (chunk-hash, chunk) — the hash prefix keeps key comparison cheap
    while the full chunk string keeps the dedup exact (at 10^12 turns
    switch the key to hash-only and accept the 2^-64 collision rate) —
    and the rebuild is a per-doc aggregation co-partitioned with
    nothing: no driver-side seen-set, no iterative passes."""
    toks = tokenize_column(F.col(text_col))
    base = (df.select(F.col(id_col), toks.alias("__toks"))
            .withColumn("__n", F.size("__toks"))
            .where(F.col("__n") > 0))
    chunks = base.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.col("__n") - 1,
                             F.lit(int(chunk_tokens)))).alias("__start"),
        "__toks",
    ).select(
        id_col,
        (F.col("__start") / chunk_tokens).cast("long").alias("chunk_idx"),
        F.array_join(F.slice(F.col("__toks"), F.col("__start") + 1,
                             int(chunk_tokens)), " ").alias("chunk"),
    )
    w = Window.partitionBy(F.xxhash64("chunk"), F.col("chunk")).orderBy(
        F.col(id_col), F.col("chunk_idx"))
    ranked = chunks.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("__rn") > 1).cast("long")).alias("n_dup_chunks"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.when(F.col("__rn") == 1,
                               F.struct("chunk_idx", "chunk")))),
                    lambda x: x["chunk"],
                ), " ").alias("text_deduped"),
        )
    )
