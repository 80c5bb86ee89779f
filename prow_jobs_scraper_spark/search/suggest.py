"""ES term suggester ("did you mean") — spell-correction candidates
from the corpus vocabulary.

Reference surface: the ES ``suggest`` request block with a ``term``
suggester per entry (the reference's OpenSearch cluster exposes it on
every index; the engine covers the request shape its clients would
send). Grammar::

    {"suggest": {<name>: {"text": str,
                          "term": {"field": field,
                                   "size": int,              -- 5
                                   "sort": "score"|"frequency",
                                   "suggest_mode":
                                       "missing"|"popular"|"always",
                                   "max_edits": 1|2,         -- 2
                                   "prefix_length": int,     -- 1
                                   "min_word_length": int,   -- 4
                                   "min_doc_freq": int}}}}   -- 1

Semantics (the Lucene DirectSpellChecker rules, with documented
deviations):

- The text analyzes through the engine tokenizer; each DISTINCT token
  becomes one suggestion group (ES emits one entry per token
  occurrence with offsets — collapsed here, offsets are meaningless
  on the engine's side of the wire).
- Candidates are vocabulary terms (distinct corpus tokens / the index
  terms dim) within ``max_edits`` Levenshtein of the token, sharing
  its first ``prefix_length`` characters, different from it, with
  ``df >= min_doc_freq``. Tokens shorter than ``min_word_length``
  produce no suggestions. ``suggest_mode``: ``missing`` suggests only
  for tokens absent from the vocabulary (the ES default), ``popular``
  only candidates strictly more frequent than the token, ``always``
  unconditionally.
- Score = ``1 - distance / min(len(token), len(candidate))`` — the
  Lucene LevensteinDistance similarity. ``sort: score`` orders by
  (score desc, df desc, term asc); ``sort: frequency`` by (df desc,
  score desc, term asc); ``size`` cuts per token. The term-asc
  tiebreak is a determinism deviation from ES's internal ordering.

Scale: candidate generation is VOCABULARY-sized (distinct tokens /
terms dim — index metadata), never corpus-sized; length + prefix
bounds prune before the Levenshtein; the per-token rank is a window
over candidate rows only. The naive path pays one corpus scan for
(term, df); the indexed path reads the terms dim and resolves df for
the few survivors through the driver-side postings df cache.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from prow_jobs_scraper_spark.functions.tokenize import (
    tokenize_column,
    tokenize_text,
)
from prow_jobs_scraper_spark.search.dsl import DslError

_TERM_KEYS = {"field", "size", "sort", "suggest_mode", "max_edits",
              "prefix_length", "min_word_length", "min_doc_freq"}

_SUGG_SCHEMA = StructType([
    StructField("sugg", StringType()),
    StructField("pos", LongType()),
    StructField("token", StringType()),
])


def _parse_term_suggester(name: str, body: dict):
    """One named suggest entry -> (name, tokens, options dict)."""
    if not isinstance(body, dict):
        raise DslError(f"bad suggest entry {name!r}: {body!r}")
    unknown = set(body) - {"text", "term"}
    if unknown:
        raise DslError(
            f"unsupported suggest keys in {name!r}: {sorted(unknown)} "
            f"(term suggester only; phrase/completion are out of "
            f"grammar)")
    if "term" not in body or not isinstance(body["term"], dict):
        raise DslError(f"suggest entry {name!r} needs a term block")
    if "text" not in body or not isinstance(body["text"], str):
        raise DslError(f"suggest entry {name!r} needs text")
    term = body["term"]
    unknown = set(term) - _TERM_KEYS
    if unknown:
        raise DslError(
            f"unsupported term suggester options in {name!r}: "
            f"{sorted(unknown)}")
    if "field" not in term or not isinstance(term["field"], str):
        raise DslError(f"term suggester {name!r} needs a field")
    opts = {
        "field": term["field"],
        "size": term.get("size", 5),
        "sort": term.get("sort", "score"),
        "suggest_mode": term.get("suggest_mode", "missing"),
        "max_edits": term.get("max_edits", 2),
        "prefix_length": term.get("prefix_length", 1),
        "min_word_length": term.get("min_word_length", 4),
        "min_doc_freq": term.get("min_doc_freq", 1),
    }
    for k, lo, hi in (("size", 1, None), ("max_edits", 1, 2),
                      ("prefix_length", 0, None),
                      ("min_word_length", 1, None),
                      ("min_doc_freq", 1, None)):
        v = opts[k]
        if isinstance(v, bool) or not isinstance(v, int) or v < lo \
                or (hi is not None and v > hi):
            raise DslError(
                f"{k} must be an int in "
                f"[{lo}, {hi if hi is not None else 'inf'}], got {v!r}")
    if opts["sort"] not in ("score", "frequency"):
        raise DslError(f"sort must be score|frequency, got "
                       f"{opts['sort']!r}")
    if opts["suggest_mode"] not in ("missing", "popular", "always"):
        raise DslError(
            f"suggest_mode must be missing|popular|always, got "
            f"{opts['suggest_mode']!r}")
    toks = tokenize_text(body["text"])
    if not toks:
        raise DslError(f"suggest entry {name!r} text must analyze to "
                       f"at least one term")
    return name, toks, opts


def parse_suggest(request: dict) -> list:
    """The ES ``{"suggest": {...}}`` envelope (or the bare inner dict)
    -> [(name, tokens, opts), ...] in insertion order."""
    if not isinstance(request, dict) or not request:
        raise DslError("suggest request must be a non-empty dict")
    body = request.get("suggest", request)
    if not isinstance(body, dict) or not body:
        raise DslError("suggest request must be a non-empty dict")
    return [_parse_term_suggester(n, b) for n, b in body.items()]


def _token_frame(spark: SparkSession, entries) -> DataFrame:
    """(sugg, pos, token) rows for every distinct token of every
    entry — tiny (a handful of rows), broadcast into the vocab join."""
    rows = []
    for name, toks, _ in entries:
        seen = {}
        for t in toks:
            if t not in seen:
                seen[t] = len(seen)
        rows.extend((name, pos, t) for t, pos in seen.items())
    return spark.createDataFrame(rows, _SUGG_SCHEMA)


def _suggest_over_vocab(spark: SparkSession, entries,
                        vocab_df: DataFrame) -> DataFrame:
    """Shared kernel: rank candidates of a ``(term, df)`` vocabulary
    frame per (entry, token). ONE broadcast join tokens x vocab per
    entry with length/prefix pruning BEFORE the levenshtein; the
    token's own df (suggest_mode missing/popular) rides the SAME join
    as the distance-0 row and spreads via a per-token window — no
    second vocabulary pass, no corpus re-scan (plan-gated). Candidate
    rows only ever number |tokens| x |edit-ball|, never the corpus."""
    out = []
    toks_df = _token_frame(spark, entries)
    for name, _toks, opts in entries:
        mine = F.broadcast(
            toks_df.where(F.col("sugg") == name)
            .where(F.length("token") >= opts["min_word_length"]))
        t, c = F.col("token"), F.col("term")
        # the join bounds ADMIT the token's own vocab row (distance 0)
        # on purpose — it carries self-df for the mode filters
        cond = ((F.length(c) >= F.length(t) - opts["max_edits"])
                & (F.length(c) <= F.length(t) + opts["max_edits"]))
        if opts["prefix_length"]:
            cond = cond & (F.substring(c, 1, opts["prefix_length"])
                           == F.substring(t, 1, opts["prefix_length"]))
        j = (vocab_df.join(mine, cond)
             .withColumn("__d", F.levenshtein(c, t))
             .where(F.col("__d") <= opts["max_edits"]))
        wp = Window.partitionBy("sugg", "token")
        j = j.withColumn(
            "self_df",
            F.coalesce(
                F.max(F.when(F.col("__d") == 0, F.col("df"))).over(wp),
                F.lit(0)))
        cand = (j.where(F.col("__d") >= 1)
                .where(F.col("df") >= opts["min_doc_freq"]))
        if opts["suggest_mode"] == "missing":
            cand = cand.where(F.col("self_df") == 0)
        elif opts["suggest_mode"] == "popular":
            cand = cand.where(F.col("df") > F.col("self_df"))
        score = (F.lit(1.0) - F.col("__d")
                 / F.least(F.length(t), F.length(c)).cast("double"))
        cand = cand.withColumn("__score", score)
        order = ([F.desc("__score"), F.desc("df"), F.asc("term")]
                 if opts["sort"] == "score"
                 else [F.desc("df"), F.desc("__score"), F.asc("term")])
        w = wp.orderBy(*order)
        out.append(
            cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= opts["size"])
            .select("sugg", "pos", "token", "rank",
                    F.col("term").alias("suggestion"),
                    F.round("__score", 6).alias("score"),
                    F.col("df").cast("long").alias("freq")))
    return (reduce(DataFrame.unionByName, out)
            .orderBy("sugg", "pos", "rank").drop("pos"))


def suggest_terms(docs_df: DataFrame, request: dict) -> DataFrame:
    """Naive executor: vocabulary = the corpus' distinct tokens with
    df = number of docs containing the term — ONE corpus agg, then the
    vocabulary-sized ranking kernel. -> (sugg, token, rank,
    suggestion, score, freq) ordered (entry, token position, rank)."""
    entries = parse_suggest(request)
    fields = {o["field"] for _, _, o in entries}
    vocabs = {}
    for fld in fields:
        if fld not in docs_df.columns:
            raise DslError(f"suggest field {fld!r} is not a column")
        vocabs[fld] = (
            docs_df.select(F.explode(F.array_distinct(
                tokenize_column(F.col(fld)))).alias("term"))
            .groupBy("term").agg(F.count(F.lit(1)).alias("df")))
    spark = docs_df.sparkSession
    parts = [
        _suggest_over_vocab(spark, [e], vocabs[e[2]["field"]])
        for e in entries]
    return reduce(DataFrame.unionByName, parts)


def suggest_terms_indexed(
    spark: SparkSession,
    index_dir: str | list[str],
    request: dict,
) -> DataFrame:
    """Indexed executor: candidate strings from the segments' terms dim
    (index metadata), df for the FEW levenshtein survivors through the
    driver-side postings df cache — the corpus is never read. Must stay
    row-identical to :func:`suggest_terms` on the union corpus
    (pytest-gated)."""
    from prow_jobs_scraper_spark.functions.xxh64 import (  # noqa: PLC0415
        term_id_py,
    )
    from prow_jobs_scraper_spark.index.build import (  # noqa: PLC0415
        IndexPaths,
    )
    from prow_jobs_scraper_spark.search.dsl import (  # noqa: PLC0415
        _INDEXED_TEXT_FIELD,
        _df_stats_multi,
        _load_segments,
    )

    entries = parse_suggest(request)
    other = {o["field"] for _, _, o in entries} - {_INDEXED_TEXT_FIELD}
    if other:
        raise DslError(
            f"the compressed index holds the {_INDEXED_TEXT_FIELD!r} "
            f"field only; suggest targets {sorted(other)}")
    dirs, metas, _n_docs, _avgdl = _load_segments(index_dir)
    terms = reduce(
        DataFrame.unionByName,
        [spark.read.parquet(IndexPaths(d).terms).select("term")
         for d in dirs]).distinct()
    # prune to the union edit-ball before any df work: length bounds +
    # shared-prefix alternatives, then exact levenshtein
    want = set()
    conds = []
    for _name, toks, opts in entries:
        for t in set(toks):
            if len(t) < opts["min_word_length"]:
                continue
            tl, me, pl = F.lit(t), opts["max_edits"], opts["prefix_length"]
            c = F.col("term")
            cond = ((F.length(c) >= len(t) - me)
                    & (F.length(c) <= len(t) + me)
                    & (F.levenshtein(c, tl) <= me))
            if pl:
                cond = cond & (F.substring(c, 1, pl) == t[:pl])
            conds.append(cond | (c == tl))  # keep t itself for self_df
            want.add(t)
    if not conds:
        empty = _suggest_over_vocab(
            spark, entries,
            spark.createDataFrame([], "term string, df long"))
        return empty
    ball = terms.where(reduce(lambda a, b: a | b, conds))
    cand_terms = [r["term"] for r in ball.collect()]
    df_of = _df_stats_multi(spark, dirs, metas,
                            [term_id_py(t) for t in cand_terms])
    vocab = spark.createDataFrame(
        [(t, int(df_of.get(term_id_py(t), 0))) for t in cand_terms]
        or [("", 0)], "term string, df long")
    vocab = vocab.where(F.col("df") > 0)
    return _suggest_over_vocab(spark, entries, vocab)
