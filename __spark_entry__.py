"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k on sf0.001 documents.
``queries()`` — one entry per implemented operator from SURVEY.md §2 plus
the training-data-pipeline extras; each callable takes (spark, sf_dir).
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents. Keys without an
oracle are genuinely non-SQL-expressible (hash-based LSH, compressed-index
internals, multimodal UDF plumbing) and get the weaker rows-only check.

Column names and (rounded) values are aligned pairwise: every computed
column is aliased identically on both sides; floating aggregates are
rounded on both sides; explicit ``rank`` columns preserve order info
through the driver's order-insensitive hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9_]+"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Fan a small single-file scan out across the cluster before
    per-doc-heavy stages (signatures, pandas UDFs): the sf documents
    table is ONE unsplittable parquet file, so every downstream map
    stage would otherwise run serially in 1 task (measured 2x on the
    minhash entry). No-op when the scan already has enough splits —
    i.e. never fires on a real at-scale corpus, where a repartition
    would be a full-corpus shuffle."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 4):
        return df.repartition(target)
    return df


def _toks(col):
    from prow_jobs_scraper_spark.functions.tokenize import tokenize_column

    return tokenize_column(col)


# --------------------------------------------------------------------------
# entry
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: conjunctive BM25 top-10 (P11 + our engine's core) on the
    sf0.001 documents table."""
    return _bm25_topk(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# query implementations (Spark side)
# --------------------------------------------------------------------------

def _bm25_topk(spark, sf_dir):
    """Flagship BM25 top-k, BOTH match semantics in one union frame
    (in-window coverage for P11 and its disjunctive variant): mode
    'and' = every query term required (the reference's operator:and,
    query.py:47-74); mode 'or' = ES match default, any term scores.
    The compressed path answers 'or' with MaxScore/block-max pruning
    (search/compressed.py::_wand_or_topk, rank-identity pytest-gated);
    this oracle-checked entry runs the naive DataFrame plans."""
    from prow_jobs_scraper_spark.search.naive import naive_bm25_topk

    docs = _t(spark, sf_dir, "documents")
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    parts = []
    for op in ("and", "or"):
        topk = naive_bm25_topk(docs, "key agg", 10, operator=op)
        parts.append(topk.select(
            F.lit(op).alias("mode"), "doc_id",
            F.row_number().over(w).alias("rank"),
            F.round("score", 4).alias("score")))
    return parts[0].unionByName(parts[1])


def _bm25_topk_or(spark, sf_dir):
    """P11 disjunctive variant — ES ``match`` DEFAULT semantics (the
    reference pins operator:and, query.py:47-74; the engine supports
    both): docs containing ANY query term score, sum over terms present.
    The compressed path answers this with MaxScore/block-max pruning
    (search/compressed.py::_wand_or_topk, rank-identity pytest-gated);
    this oracle-checked entry runs the naive DataFrame plan."""
    from prow_jobs_scraper_spark.search.naive import naive_bm25_topk

    docs = _t(spark, sf_dir, "documents")
    topk = naive_bm25_topk(docs, "key agg", 10, operator="or")
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.select(
        "doc_id", F.row_number().over(w).alias("rank"),
        F.round("score", 4).alias("score"),
    )


def _bm25_filtered_topk(spark, sf_dir):
    """The reference's REAL query shape — ES bool: full-text match +
    filter clause (query.py:28-99 pairs every match with time/term
    filters). ES semantics exactly: idf/avgdl/n_docs stay corpus-global
    (filter context never affects scores); the filter restricts which
    docs may enter the top-k. The compressed-index equivalent is
    search_topk_filtered (pytest-gated vs the numpy oracle); this
    oracle-checked entry runs the naive plan."""
    from prow_jobs_scraper_spark.search.naive import naive_bm25_topk

    docs = _t(spark, sf_dir, "documents")
    topk = naive_bm25_topk(docs, "key agg", 10, operator="or",
                           post_filter="lang = 'en'")
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.select(
        "doc_id", F.row_number().over(w).alias("rank"),
        F.round("score", 4).alias("score"),
    )


def _phrase_match(spark, sf_dir):
    """ES ``match_phrase`` shape, oracle-checked — BOTH variants in one
    union frame, tagged by ``mode``:

    - ``exact``: phrase tokens ADJACENT and IN ORDER (slop 0);
      adjacency = substring containment over the space-joined token
      array — replicated exactly in the DuckDB oracle via
      array_to_string + position().
    - ``slop2``: ES ``"slop": 2`` — the Lucene sloppy-phrase rule (an
      assignment of positions to phrase slots with displacement range
      <= 2; transposed terms qualify, the ES-documented example) via
      the shared nested-exists predicate
      (search/compressed.py sloppy_exists_expr); the DuckDB oracle
      replays the same rule with nested list_filter lambdas.

    - ``span_ord`` / ``span_unord`` (round 5, closing): ES
      ``span_near`` over the same two terms at slop 2 — the Lucene
      SpanNearQuery WINDOW rule (ordered: p0 < p1 with p1-p0-1 <= slop;
      unordered: either direction — search/compressed.py
      span_exists_expr), a different qualifying set than the sloppy-
      phrase displacement rule on the same inputs; the DuckDB twin
      replays both windows with list_filter lambdas.
    - ``span_first3`` / ``span_or`` (round 5, resumed closing):
      Lucene SpanFirstQuery ('hash' ending at position <= 3, i.e.
      within the first three tokens, scored by its own BM25) and the
      span_or union of that clause with the ORDERED slop-2 window
      (bool-should msm=1 desugar — matched children's scores SUM);
      twins replay list_position and the full-join score sum.
    - ``iv_any`` (round 5, resumed closing): ES ``intervals`` —
      any_of over (ordered max_gaps-2 "table hash", plain "scan");
      gaps = width - k is the SAME arithmetic as the span window
      (search/dsl.py _parse_intervals), twin = window set score
      FULL JOIN a dedicated 'scan' BM25 CTE.

    Scoring is slop-independent (BM25 over the phrase's distinct terms,
    corpus-global stats). The index-accelerated twins (search_phrase /
    search_dsl_indexed, corpus re-check AND positions-sidecar paths)
    are pytest-gated rank-identical to these plans (tests/test_dsl.py
    sloppy-phrase + span_near entries)."""
    from prow_jobs_scraper_spark.search.dsl import search_dsl
    from prow_jobs_scraper_spark.search.naive import naive_phrase_topk

    docs = _t(spark, sf_dir, "documents")
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    exact = naive_phrase_topk(docs, "table hash", 10).select(
        F.lit("exact").alias("mode"), "doc_id",
        F.row_number().over(w).alias("rank"),
        F.round("score", 4).alias("score"))
    sloppy_q = {"query": {"match_phrase": {
        "text": {"query": "table hash", "slop": 2}}}}
    sloppy = search_dsl(docs, sloppy_q, 10).select(
        F.lit("slop2").alias("mode"), "doc_id",
        F.row_number().over(w).alias("rank"),
        F.round("score", 4).alias("score"))
    out = exact.unionByName(sloppy)
    for mode, in_order in (("span_ord", True), ("span_unord", False)):
        q = {"query": {"span_near": {
            "clauses": [{"span_term": {"text": "table"}},
                        {"span_term": {"text": "hash"}}],
            "slop": 2, "in_order": in_order}}}
        out = out.unionByName(search_dsl(docs, q, 10).select(
            F.lit(mode).alias("mode"), "doc_id",
            F.row_number().over(w).alias("rank"),
            F.round("score", 4).alias("score")))
    # span_first (round 5, resumed closing): Lucene SpanFirstQuery —
    # 'hash' must occur at 0-based position p with p+1 <= 3 (i.e.
    # within the first three tokens); score = the term's BM25
    # (search/dsl.py _parse_span span_first branch)
    sf_child = {"span_first": {
        "match": {"span_term": {"text": "hash"}}, "end": 3}}
    out = out.unionByName(search_dsl(docs, {"query": sf_child},
                                     10).select(
        F.lit("span_first3").alias("mode"), "doc_id",
        F.row_number().over(w).alias("rank"),
        F.round("score", 4).alias("score")))
    # span_or (round 5, resumed closing): any child span matches,
    # scores sum over the matched children (the bool-should msm=1
    # desugar, search/dsl.py _span_or_as_bool) — children = the
    # span_first above + the ORDERED slop-2 window, so a doc matching
    # both sums both contributions
    qso = {"query": {"span_or": {"clauses": [
        sf_child,
        {"span_near": {"clauses": [{"span_term": {"text": "table"}},
                                   {"span_term": {"text": "hash"}}],
                       "slop": 2, "in_order": True}}]}}}
    out = out.unionByName(search_dsl(docs, qso, 10).select(
        F.lit("span_or").alias("mode"), "doc_id",
        F.row_number().over(w).alias("rank"),
        F.round("score", 4).alias("score")))
    # intervals (round 5, resumed closing): the ES-7+ proximity query
    # — any_of over (ordered max_gaps-2 window on "table hash", plain
    # "scan") desugared onto the span/bool machinery (search/dsl.py
    # _parse_intervals: gaps = width - k, identical arithmetic to
    # span_exists_expr); matched children's scores sum
    qiv = {"query": {"intervals": {"text": {"any_of": {"intervals": [
        {"match": {"query": "table hash", "max_gaps": 2,
                   "ordered": True}},
        {"match": {"query": "scan"}}]}}}}}
    out = out.unionByName(search_dsl(docs, qiv, 10).select(
        F.lit("iv_any").alias("mode"), "doc_id",
        F.row_number().over(w).alias("rank"),
        F.round("score", 4).alias("score")))
    # span_not (round 5, this session): Lucene SpanNotQuery — a 'hash'
    # occurrence survives unless 'table' occurs in [p-1, p] (pre=1,
    # post=0: "hash not immediately preceded by table"; distinct terms
    # never share a position, so post=0 is inert here). Score = the
    # include term's BM25 (search/dsl.py _parse_span span_not branch,
    # predicate search/compressed.py span_not_exists_expr)
    qsn = {"query": {"span_not": {
        "include": {"span_term": {"text": "hash"}},
        "exclude": {"span_term": {"text": "table"}},
        "pre": 1, "post": 0}}}
    out = out.unionByName(search_dsl(docs, qsn, 10).select(
        F.lit("span_not").alias("mode"), "doc_id",
        F.row_number().over(w).alias("rank"),
        F.round("score", 4).alias("score")))
    return out


def _query_string_topk(spark, sf_dir):
    """ES ``query_string`` + ``simple_query_string`` (round 5),
    oracle-checked — one union frame, tagged by ``mode``:

    - ``qs``: ``key AND (agg OR hash) -"table hash"`` — explicit AND,
      parenthesized OR group, Lucene-flat phrase negation (group-level
      must_not). Desugars (search/query_string.py) to must=[key,
      bool-should(agg|hash)] + must_not=[phrase] on the engine's own
      bool grammar, so scoring = bm25(key) + matched-should
      contributions, qualification excludes adjacent "table hash".
    - ``sqs``: ``key +agg | hash`` (simple_query_string: ``+``=AND,
      ``|``=OR) — should=[bool-must(key,agg), hash] with
      minimum_should_match 1.

    Both run the naive one-pass executor; the indexed twin is
    pytest-gated rank-identical (tests/test_dsl.py query-string
    entries)."""
    from prow_jobs_scraper_spark.search.dsl import search_dsl

    docs = _t(spark, sf_dir, "documents")
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    qs = {"query": {"query_string": {
        "query": 'key AND (agg OR hash) -"table hash"'}}}
    sqs = {"query": {"simple_query_string": {
        "query": "key +agg | hash", "fields": ["text"]}}}
    a = search_dsl(docs, qs, 10).select(
        F.lit("qs").alias("mode"), "doc_id",
        F.row_number().over(w).alias("rank"),
        F.round("score", 4).alias("score"))
    b = search_dsl(docs, sqs, 10).select(
        F.lit("sqs").alias("mode"), "doc_id",
        F.row_number().over(w).alias("rank"),
        F.round("score", 4).alias("score"))
    return a.unionByName(b)


_BOOL_DSL_QUERY = {"query": {"bool": {
    "must": [{"match": {"text": {"query": "key agg", "operator": "or"}}}],
    "should": [{"match": {"text": "hash"}}],
    "must_not": [{"match_phrase": {"text": "table hash"}}],
    "filter": [{"term": {"lang": "en"}},
               {"range": {"n_chars": {"gte": 100}}}],
}}}


def _bool_dsl_topk(spark, sf_dir):
    """Full ES bool-query DSL, oracle-checked: the reference's raw query
    JSON shape (src/jobsautoreport/query.py:28-99 pairs match clauses
    with term/range filters) executed VERBATIM by the engine's DSL
    compiler (search/dsl.py) — must (scored, operator:or) + should
    (score boost when matched) + must_not (phrase exclusion) + filter
    (term + range, never affects scores) in ONE map-side scoring pass.
    The index-accelerated twin (search_dsl_indexed) is pytest-gated
    rank-identical to this plan (tests/test_dsl.py)."""
    from prow_jobs_scraper_spark.search.dsl import search_dsl

    docs = _t(spark, sf_dir, "documents")
    topk = search_dsl(docs, _BOOL_DSL_QUERY, 10)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.select(
        "doc_id", F.row_number().over(w).alias("rank"),
        F.round("score", 4).alias("score"),
    )


_NESTED_BOOL_QUERY = {"query": {"bool": {
    # bool-in-bool (round 4): a should-group inside must (scored), and a
    # CONJUNCTIVE exclusion inside must_not — "contains 'hash' AND is
    # German" — which a flat bool cannot express (flat must_not clauses
    # exclude independently)
    "must": [{"bool": {"should": [
        {"match": {"text": {"query": "key", "operator": "and"}}},
        {"match": {"text": {"query": "agg", "operator": "and"}}},
    ], "minimum_should_match": 1}}],
    "must_not": [{"bool": {
        "must": [{"match": {"text": {"query": "hash",
                                     "operator": "and"}}}],
        "filter": [{"term": {"lang": "de"}}],
    }}],
    "filter": [{"range": {"n_chars": {"gte": 100}}}],
}}}


def _nested_bool_topk(spark, sf_dir):
    """Nested ES bool queries, oracle-checked: child bools compile
    recursively (search/dsl.py parse_query) — the shapes a programmatic
    ES client emits, with the reference's flat queries
    (src/jobsautoreport/query.py:28-99) as the degenerate case. The
    must-child is a should-group (score = sum of matched children,
    gated by its own minimum_should_match); the must_not-child is a
    CONJUNCTIVE exclusion (text match AND metadata term) that flat
    must_not semantics cannot express. Still ONE map-side scoring pass
    (the tree folds into row expressions); the indexed twin is
    pytest-gated rank-identical (tests/test_dsl.py)."""
    from prow_jobs_scraper_spark.search.dsl import search_dsl

    docs = _t(spark, sf_dir, "documents")
    topk = search_dsl(docs, _NESTED_BOOL_QUERY, 10)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.select(
        "doc_id", F.row_number().over(w).alias("rank"),
        F.round("score", 4).alias("score"),
    )


_DISMAX_QUERY = {"query": {"bool": {
    # dis_max in must: best-matching child wins, the other contributes
    # via tie_breaker; a META clause in should counts toward
    # minimum_should_match (score 0) — both round-4 grammar closures
    "must": [{"dis_max": {"queries": [
        {"match": {"text": {"query": "key agg", "operator": "or"}}},
        {"match": {"text": "hash"}},
    ], "tie_breaker": 0.3}}],
    "should": [{"range": {"n_chars": {"gte": 400}}}],
    "minimum_should_match": 1,
}}}


def _dismax_topk(spark, sf_dir):
    """ES disjunction-max scoring, oracle-checked — two modes in one
    union frame:

    - ``dismax``: dis_max + metadata-in-should — score = best matched
      child + 0.3 x the other (search/dsl.py DisMax — the rule
      multi_match type=best_fields desugars into), the range clause in
      should gating via minimum_should_match without touching scores.
    - ``fuzzy`` (round 5): ``{"fuzzy": {"text": {"value": "mash",
      "fuzziness": 2}}}`` — expansions from the corpus vocabulary
      within Levenshtein 2 ('hash' at 1, 'fast' at 2 — two terms with
      DIFFERENT scores, so the dis_max-over-expansions rule
      discriminates), scored as the best matched expansion
      (search/dsl.py FuzzyClause/_resolve_fuzzy; deviation from
      Lucene's blended-freq rewrite documented there). The DuckDB twin
      computes the expansion set with ITS OWN levenshtein over the
      distinct tokens.
    - ``regexp`` (round 5): a Lucene-anchored ``regexp`` leaf in
      filter context gating a scored match — the predicate string
      (``regexp_extract(col, '^(?:...)$', 0) = col``) is dialect-shared
      on purpose, so the DuckDB twin replays it VERBATIM
      (search/dsl.py _compile_meta/_validate_regex_subset).
    - ``cscore`` (round 5): ``constant_score`` pinning every
      qualifying doc (token membership AND a regexp on ``lang``) to
      exactly boost=2.5 — rank degenerates to doc_id order, so the
      value check is the qualifying SET + the pinned score.
    - ``pprefix`` (round 5): ``match_phrase_prefix`` — 'hash s' with
      max_expansions=4 expands against the vocabulary to the FIRST
      four 's*' terms in term order (the Lucene term-dict rule) and
      scores as the best completed exact phrase (search/dsl.py
      PhrasePrefixClause). The DuckDB twin derives the SAME expansion
      set from its own distinct-token scan and replays the
      adjacency-gated BM25 max.
    - ``boosting`` (round 5): demote-without-exclude — docs matching
      'key agg' (or) keep their BM25 score, multiplied by 0.3 when
      they ALSO contain 'hash' (search/dsl.py QuerySpec.boosting;
      must_not could only DROP them). The twin reuses the same
      per-term score CTE: score = s1 * CASE WHEN m2>0 THEN 0.3 END.
    - ``fscore`` (round 5): ``function_score`` — the 'key agg' BM25
      score multiplied by a per-doc factor combining (score_mode=sum)
      a weight-2 function gated by a regexp filter on ``source`` and
      an unfiltered ``field_value_factor`` log1p(0.01 x n_chars)
      (search/dsl.py FunctionScore/_fscore_factor). The twin replays
      the factor arithmetic verbatim over the same ``sc`` CTE — the
      value SQL is dialect-shared by construction.
    - ``sscore`` (round 5, resumed closing): ``script_score`` — a
      painless-subset script (``_score * Math.log(2 + doc['n_chars']
      .value / params.d)``) compiled to ONE Catalyst expression
      (search/dsl.py _compile_score_script; params resolve to
      literals at compile time, negative results raise). The twin
      replays the arithmetic over the shared ``sc`` CTE.

    - ``mbp`` (round 5): ``match_bool_prefix`` — 'hash' as a term
      match OR the first four 's*' expansions (the ES bool desugar;
      same text as ``pprefix`` but union semantics, so the two modes
      discriminate adjacency vs disjunction).
    - ``ci`` (round 5, resumed closing): the ES 7.10+
      ``case_insensitive`` long-form knob — an UPPERCASE term filter
      and an UPPERCASE wildcard must_not against the all-lowercase
      lang/source columns, each matching only because of the flag
      (search/dsl.py _meta_value_ci; lower()-both-sides predicates,
      dialect-shared, twin replays them verbatim).
    - ``rankf`` (round 5): ``rank_feature`` saturation on ``n_chars``
      in a should — BM25('hash') + n_chars/(n_chars+100), the ES
      feature-boost idiom (desugars onto function_score,
      search/dsl.py _parse_rank_feature; NULL/<=0 features never
      match).
    - ``distf`` (round 5): ``distance_feature`` date recency over the
      events table — 2d/(2d + |ts - origin|) on the filtered set at
      second resolution (search/dsl.py _parse_distance_feature); the
      DuckDB twin replays it with epoch().

    - ``pinned`` (round 5, resumed closing): docs [5, 3] pinned above
      the organic 'hash' ranking at the BASE - rank*STEP score ladder
      (search/dsl.py _desugar_pinned); the twin replays the ladder as
      a CASE over the shared ``hb`` CTE.
    - ``wrap`` (round 5, resumed closing): the dismax query base64-
      encoded through the ES ``wrapper`` escape hatch — must reproduce
      the 'dismax' rows verbatim (search/dsl.py _unwrap_wrapper).
    - ``tset`` (round 5, resumed closing): ``terms_set`` — Lucene
      CoveringQuery over {key, agg, hash} whose PER-DOC minimum comes
      from the painless-subset script Math.min(params.num_terms,
      doc['n_chars'].value / 300) truncated to long and clamped >= 1;
      score = sum of the MATCHED terms' BM25 (search/dsl.py
      _parse_terms_set / TermsSetClause).

    Still ONE map-side scoring pass each; the indexed twins are
    pytest-gated rank-identical (tests/test_dsl.py)."""
    from prow_jobs_scraper_spark.search.dsl import search_dsl

    docs = _t(spark, sf_dir, "documents")
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))

    def mode(name, q):
        return search_dsl(docs, q, 10).select(
            F.lit(name).alias("mode"), "doc_id",
            F.row_number().over(w).alias("rank"),
            F.round("score", 4).alias("score"))

    out = mode("dismax", _DISMAX_QUERY)
    out = out.unionByName(mode("fuzzy", {"query": {"fuzzy": {
        "text": {"value": "mash", "fuzziness": 2}}}}))
    out = out.unionByName(mode("regexp", {"query": {"bool": {
        "must": [{"match": {"text": {"query": "key agg",
                                     "operator": "or"}}}],
        "filter": [{"regexp": {"source": "src1[0-9]"}}],
    }}}))
    out = out.unionByName(mode("cscore", {"query": {"constant_score": {
        "filter": {"bool": {"filter": [
            {"match": {"text": "hash"}},
            {"regexp": {"lang": "(en|e[a-z])"}},
        ]}},
        "boost": 2.5}}}))
    out = out.unionByName(mode("pprefix", {"query": {
        "match_phrase_prefix": {"text": {"query": "hash s",
                                         "max_expansions": 4}}}}))
    out = out.unionByName(mode("boosting", {"query": {"boosting": {
        "positive": {"match": {"text": {"query": "key agg",
                                        "operator": "or"}}},
        "negative": {"match": {"text": "hash"}},
        "negative_boost": 0.3}}}))
    out = out.unionByName(mode("fscore", {"query": {"function_score": {
        "query": {"match": {"text": {"query": "key agg",
                                     "operator": "or"}}},
        "functions": [
            {"filter": {"regexp": {"source": "src1[0-9]"}},
             "weight": 2.0},
            {"field_value_factor": {"field": "n_chars", "factor": 0.01,
                                    "modifier": "log1p", "missing": 1}},
        ],
        "score_mode": "sum", "boost_mode": "multiply"}}}))
    # script_score (round 5, resumed closing): a painless-subset
    # script compiled to one Catalyst expression (search/dsl.py
    # _compile_score_script) — score = _score * ln(2 + n_chars/100);
    # the DuckDB twin replays the arithmetic verbatim over the shared
    # sc CTE (ln == Math.log, both natural; round(,4) absorbs libm ulp)
    out = out.unionByName(mode("sscore", {"query": {"script_score": {
        "query": {"match": {"text": {"query": "key agg",
                                     "operator": "or"}}},
        "script": {"source": "_score * Math.log(2 + "
                             "doc['n_chars'].value / params.d)",
                   "params": {"d": 100}}}}}))
    # match_bool_prefix (round 5): 'hash' as a term match OR the first
    # four 's*' vocabulary terms (desugar onto the bool grammar,
    # search/dsl.py _desugar_match_bool_prefix) — same text as the
    # pprefix mode but UNION semantics instead of adjacency
    out = out.unionByName(mode("mbp", {"query": {"match_bool_prefix": {
        "text": {"query": "hash s", "max_expansions": 4}}}}))
    # case_insensitive (round 5, resumed closing): UPPERCASE query
    # values against all-lowercase metadata — the term filter and the
    # wildcard must_not each match ONLY because of the flag
    # (search/dsl.py _meta_value_ci; predicate = lower() both sides,
    # dialect-shared, replayed verbatim in the twin)
    out = out.unionByName(mode("ci", {"query": {"bool": {
        "must": [{"match": {"text": {"query": "key agg",
                                     "operator": "or"}}}],
        "filter": [{"term": {"lang": {"value": "EN",
                                      "case_insensitive": True}}}],
        "must_not": [{"wildcard": {"source": {
            "value": "SRC1*", "case_insensitive": True}}}],
    }}}))
    # rank_feature (round 5): saturation on n_chars riding a should —
    # score = hash BM25 + n_chars/(n_chars+100) (desugars onto
    # function_score, search/dsl.py _parse_rank_feature)
    out = out.unionByName(mode("rankf", {"query": {"bool": {
        "must": [{"match": {"text": "hash"}}],
        "should": [{"rank_feature": {"field": "n_chars",
                                     "saturation": {"pivot": 100}}}],
    }}}))
    # distance_feature (round 5): date recency on the events table —
    # score = 2d/(2d + |ts - origin|) over the filtered set
    # (search/dsl.py _parse_distance_feature; second resolution)
    ev = _t(spark, sf_dir, "events").withColumnRenamed(
        "event_id", "doc_id")
    out = out.unionByName(
        search_dsl(ev, {"query": {"bool": {
            "must": [{"distance_feature": {
                "field": "ts", "origin": "2024-01-15T00:00:00",
                "pivot": "2d"}}],
            "filter": [{"term": {"event_type": "error"}}]}}}, 10).select(
            F.lit("distf").alias("mode"), "doc_id",
            F.row_number().over(w).alias("rank"),
            F.round("score", 4).alias("score")))
    # pinned (round 5, resumed closing): docs 5 and 3 rank first at
    # the engine's BASE - rank*STEP ladder (5 ALSO matches the organic
    # 'hash' query — its BM25 add vanishes below the double ulp at
    # BASE, identically in both engines; 3 qualifies via its pin
    # alone); the organic ranking follows minus the pinned docs
    out = out.unionByName(mode("pinned", {"query": {"pinned": {
        "ids": [5, 3], "organic": {"match": {"text": "hash"}}}}}))
    # wrapper (round 5, resumed closing): the dismax query shipped
    # base64-encoded — must reproduce the 'dismax' mode rows verbatim
    import base64 as _b64  # noqa: PLC0415
    import json as _json  # noqa: PLC0415
    out = out.unionByName(mode("wrap", {"query": {"wrapper": {
        "query": _b64.b64encode(
            _json.dumps(_DISMAX_QUERY["query"]).encode()).decode()}}}))
    # terms_set (round 5, resumed closing): Lucene CoveringQuery — the
    # per-doc minimum_should_match comes from the painless-subset
    # script Math.min(params.num_terms, doc['n_chars'].value/params.d)
    # (truncated to long, clamped >= 1 like CoveringScorer), score =
    # sum of the MATCHED terms' BM25 over {key, agg, hash}
    # (search/dsl.py _parse_terms_set / TermsSetClause)
    out = out.unionByName(mode("tset", {"query": {"terms_set": {"text": {
        "terms": ["key", "agg", "hash"],
        "minimum_should_match_script": {
            "source": "Math.min(params.num_terms, "
                      "doc['n_chars'].value / params.d)",
            "params": {"d": 300}},
    }}}}))
    return out


_MULTI_MATCH_QUERY = {"query": {"multi_match": {
    "query": "src3 key", "fields": ["text", "source"],
    "type": "most_fields"}}}


_MLT_QUERY = {"query": {"more_like_this": {
    # tf>=2 candidates: hash/join/data (scan and the fall out at tf=1);
    # every survivor clears min_doc_freq=5 in this corpus, so the
    # DuckDB twin's selection CTE must reproduce the same three-term
    # tf*idf ranking before any score agrees
    "fields": ["text"],
    "like": "hash hash join join scan the data data",
}}}


def _multi_match_topk(spark, sf_dir):
    """Cross-field and like-text retrieval, oracle-checked — two modes
    in one union frame:

    - ``fields``: ES multi_match type=most_fields over TWO fields —
      per-field BM25 with each field's OWN corpus stats (df/avgdl),
      summed when matched — the ES-documented bool-should desugaring
      (search/dsl.py _parse_multi_match). 'src3' only matches in
      `source`, 'key' only in `text`, so the check is genuinely
      cross-field.
    - ``mlt`` (round 5): ES more_like_this — the like-text's
      distinctive terms (tf >= min_term_freq, df >= min_doc_freq,
      tf*idf-ranked, capped) resolve against corpus stats and desugar
      to a bool-should under minimum_should_match (search/dsl.py
      MltClause/_resolve_mlt). The DuckDB twin replays the ENTIRE
      selection pipeline in SQL — like-bag tf, corpus df, the idf
      ranking, the msm floor — then the BM25 should-sum."""
    from prow_jobs_scraper_spark.search.dsl import search_dsl

    docs = _t(spark, sf_dir, "documents")
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    a = search_dsl(docs, _MULTI_MATCH_QUERY, 10).select(
        F.lit("fields").alias("mode"), "doc_id",
        F.row_number().over(w).alias("rank"),
        F.round("score", 4).alias("score"))
    b = search_dsl(docs, _MLT_QUERY, 10).select(
        F.lit("mlt").alias("mode"), "doc_id",
        F.row_number().over(w).alias("rank"),
        F.round("score", 4).alias("score"))
    return a.unionByName(b)


_SCAN_QUERY = {"query": {"bool": {
    "must": [{"match": {"text": {"query": "key agg", "operator": "or"}}}],
    "filter": [{"term": {"lang": "en"}},
               {"range": {"n_chars": {"gte": 100}}}],
}}}


def _dsl_scan(spark, sf_dir):
    """ES helpers.scan shape — the reference's PRIMARY access pattern
    (src/prowjobsscraper/event.py:221-227 dedup window,
    src/jobsautoreport/query.py:137 report hits,
    src/elasticsearch_cleanup/main.py:113 full-index sweep): the FULL
    qualifying set of a bool query as doc rows — no top-k, no score.
    One distributed filtered scan instead of scroll pagination; at
    10^12 turns this stays a single Spark job, not 10^9 round-trips."""
    from prow_jobs_scraper_spark.search.dsl import scan_dsl

    docs = _t(spark, sf_dir, "documents")
    return scan_dsl(docs, _SCAN_QUERY).select("doc_id", "lang", "n_chars")


def _search_after_page(spark, sf_dir):
    """ES search_after deep paging: page 2 (rows 6-10) of the ranking,
    reached by chasing the cursor from page 1 — O(size) per page where
    `from` pays O(from+size). The cursor is the VERBATIM [score,
    doc_id] of page 1's last hit (float64 round-trip, as ES echoes sort
    values); the oracle is LIMIT 5 OFFSET 5 of the one-shot ordering,
    so the driver value-checks the cursor math end-to-end."""
    from prow_jobs_scraper_spark.search.dsl import execute_request

    docs = _t(spark, sf_dir, "documents")
    q = {"query": {"match": {"text": {"query": "key agg",
                                      "operator": "or"}}}}
    p1 = execute_request(docs, {**q, "size": 5}).toPandas()  # 5 rows
    after = [float(p1["score"].iloc[-1]), int(p1["doc_id"].iloc[-1])]
    p2 = execute_request(docs, {**q, "size": 5, "search_after": after})
    return p2.select("doc_id", F.round("score", 4).alias("score"))


def _dsl_count(spark, sf_dir):
    """ES _count endpoint: the bool query's qualifying-set size, no
    scoring, no top-k — one map-side-partial count over the scan."""
    from prow_jobs_scraper_spark.search.dsl import count_dsl

    docs = _t(spark, sf_dir, "documents")
    return count_dsl(docs, _SCAN_QUERY)


def _cleanup_duplicates(spark, sf_dir):
    """The reference's elasticsearch_cleanup tool end-to-end
    (src/elasticsearch_cleanup/main.py:30-107): copy the documents table
    to a scratch dir, delete every row whose (lang, source) pair was
    already seen — keeper = lowest doc_id, the deterministic stand-in
    for the script's first-scanned-wins — then return the SURVIVING
    table, so the oracle value-checks the actual on-disk mutation
    (dedup + bulk delete + staged-swap commit), not just a projection."""
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415
    import uuid  # noqa: PLC0415

    from prow_jobs_scraper_spark.sources.readers import cleanup_duplicates

    tmp = os.path.join(tempfile.gettempdir(),
                       f"cleanup_{uuid.uuid4().hex[:8]}")
    _t(spark, sf_dir, "documents").write.mode("overwrite").parquet(tmp)
    cleanup_duplicates(spark, tmp, ["lang", "source"],
                       order_col="doc_id", id_col="doc_id")
    out = spark.read.parquet(tmp).select("doc_id", "lang", "source")
    rows = out.collect()  # survivors: |lang × source| rows, KBs
    shutil.rmtree(tmp)
    return spark.createDataFrame(rows, out.schema)


def _pricing_summary(spark, sf_dir):
    # A1/A3/A7: grouped multi-metric agg + derived columns (TPC-H Q1 shape)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _top_failing_users(spark, sf_dir):
    # T2: top-N by composite key (failure_rate, failures, key).
    # Sorts on the UNROUNDED rate — same key as the oracle; the rounded
    # column is display-only. orderBy().limit() compiles to
    # TakeOrderedAndProject (a partial top-N per partition, no global
    # single-partition window sort); rank is then assigned on the
    # already-limited 10-row frame.
    ev = _t(spark, sf_dir, "events")
    m = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("errors"),
        F.count(F.lit(1)).alias("total"),
    ).withColumn("rate_raw", F.col("errors") / F.col("total"))
    top = (
        m.where(F.col("errors") > 0)
        .orderBy(F.desc("rate_raw"), F.desc("errors"), F.desc("user_id"))
        .limit(10)
    )
    w = Window.orderBy(F.desc("rate_raw"), F.desc("errors"), F.desc("user_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("user_id", "errors", "total",
                F.round("rate_raw", 6).alias("error_rate"), "rank")
    )


def _anti_join_customers(spark, sf_dir):
    # J1/U1: anti-join — customers that never ordered
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


def _cost_by_segment(spark, sf_dir):
    # J5/A5: broadcast dim join + grouped sum
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("segment_value"),
             F.count(F.lit(1)).alias("n_orders"))
    )


def _top_revenue_orders(spark, sf_dir):
    # J4 + T3: join-aggregate cost per key, top-5 with tie-break
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r"))
    # top-N via TakeOrderedAndProject, then rank over the 5-row result
    top = rev.orderBy(F.desc("r"), F.asc("l_orderkey")).limit(5)
    w = Window.orderBy(F.desc("r"), F.asc("l_orderkey"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(F.col("l_orderkey").alias("orderkey"), "rank",
                F.round("r", 2).alias("revenue"))
    )


def _flakiness_users(spark, sf_dir):
    # W1: the reference's flakiness window op over event streams
    from prow_jobs_scraper_spark.operators.analytics import flakiness

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("name"),
        F.when(F.col("event_type") == "error", "failure")
         .otherwise("success").alias("state"),
        F.col("ts").alias("start_time"),
        F.col("event_id").alias("tiebreak"),
    )
    out = flakiness(ev, order_cols=["start_time", "tiebreak"])
    return out.select(F.col("name").cast("long").alias("user_id"),
                      F.round("flakiness", 6).alias("flakiness"))


def _dedup_keep_first(spark, sf_dir):
    # W2: keep-first dedup by comparison fields, shortest id
    from prow_jobs_scraper_spark.operators.analytics import dedup_keep_first

    d = _t(spark, sf_dir, "documents").withColumn(
        "id", F.col("doc_id").cast("string"))
    out = dedup_keep_first(d, ["lang", "source"], "id")
    return out.select("lang", "source", "doc_id")


def _trends_weekly(spark, sf_dir):
    # A9: report-over-report delta via adjacent tumbling windows
    ev = _t(spark, sf_dir, "events")
    weekly = ev.groupBy(
        F.date_trunc("week", F.col("ts")).alias("week"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("week")
    return weekly.select(
        "week", "event_type", "n",
        (F.col("n") - F.coalesce(F.lag("n").over(w), F.lit(0))).alias("delta"),
    )


def _weekly_partition_names(spark, sf_dir):
    # F10/S9: weekly time-partition key (the reference's weekly indices)
    from prow_jobs_scraper_spark.functions.scalars import weekly_index_name

    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(weekly_index_name("events", F.col("ts")).alias("index_name"))
        .groupBy("index_name").agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _time_range_filter(spark, sf_dir):
    # P3/P4/P9: membership + contains + time-range predicates
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where(
            F.col("ts").between("2024-01-08 00:00:00", "2024-01-21 23:59:59")
            & F.col("event_type").isin("error", "purchase")
            & F.col("props").contains("7")
        )
        .select("event_id", "event_type", F.round("value", 2).alias("value"))
    )


def _boolean_flag_filter(spark, sf_dir):
    """P5: boolean-flag predicate — the reference's is_bandwidth_usage
    flag shape (equinix_usages.py:53-54): the flag is materialized as a
    real boolean column and the filter is on the COLUMN, not the
    underlying expression."""
    ev = _t(spark, sf_dir, "events")
    flagged = ev.withColumn("is_error", F.col("event_type") == "error")
    return flagged.where(F.col("is_error")).select(
        "event_id", "user_id", "is_error")


def _regex_filter(spark, sf_dir):
    # P2: regex predicate pushed into the scan
    d = _t(spark, sf_dir, "documents")
    return d.where(F.col("text").rlike("spark.*join")).select("doc_id", "n_chars")


def _classifier(spark, sf_dir):
    # P6/P7/P8: conjunctive/disjunctive classifier chain
    d = _t(spark, sf_dir, "documents")
    cls = (
        F.when(F.col("text").contains("spark") & (F.col("lang") == "en"),
               "spark_en")
        .when(F.col("source").isin("src0", "src1"), "early_src")
        .when(F.col("text").contains("join") | F.col("text").contains("query"),
              "sqlish")
        .otherwise("other")
    )
    return d.select(cls.alias("doc_class")).groupBy("doc_class").agg(
        F.count(F.lit(1)).alias("n"))


def _conjunctive_match(spark, sf_dir):
    # P11 brute-force semantics: doc matches iff ALL query terms present
    d = _t(spark, sf_dir, "documents")
    toks = _toks(F.col("text"))
    return d.where(
        F.array_contains(toks, "key") & F.array_contains(toks, "agg")
        & F.array_contains(toks, "row")
    ).select("doc_id")


def _exact_dedup(spark, sf_dir):
    from prow_jobs_scraper_spark.operators.dedup import exact_dedup

    d = _t(spark, sf_dir, "documents")
    return exact_dedup(d).select("doc_id")


def _unigram_jaccard(spark, sf_dir):
    # token-set Jaccard near-dup pairs (exact verification path).
    # _spread: 17x measured at sf0.1 — the tokenize/explode stages were
    # serial on the single-file scan
    from prow_jobs_scraper_spark.operators.dedup import ngram_jaccard_pairs

    d = _spread(spark, _t(spark, sf_dir, "documents"))
    out = ngram_jaccard_pairs(d, shingle_n=1, threshold=0.5)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def _token_counts(spark, sf_dir):
    from prow_jobs_scraper_spark.operators.textqc import token_count

    d = _t(spark, sf_dir, "documents")
    out = token_count(d)
    return out.select(
        "doc_id",
        F.col("n_ws_tokens").cast("long").alias("n_ws_tokens"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_bpe_est").cast("long").alias("n_bpe_est"),
    )


def _quality(spark, sf_dir):
    """ONE-SCAN per-document QC feature row (round 5): quality features
    + token counts + language ID computed together — the shape a real
    training pipeline uses (one pass over 100 TB emitting every per-doc
    feature, all pure Catalyst, zero shuffle). Folds the formerly
    separate token_counts / language_id driver rows (operators/
    textqc.py quality_score, token_count, language_id); their individual
    entries stay at the contract tail."""
    from prow_jobs_scraper_spark.operators.textqc import (
        language_id,
        quality_score,
        token_count,
    )

    d = _t(spark, sf_dir, "documents")
    out = language_id(token_count(quality_score(d)))
    return out.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round("alpha_ratio", 6).alias("alpha_ratio"),
        F.round("distinct_ratio", 6).alias("distinct_ratio"),
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.col("n_ws_tokens").cast("long").alias("n_ws_tokens"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_bpe_est").cast("long").alias("n_bpe_est"),
        "lang_pred",
    )


def _language_id(spark, sf_dir):
    from prow_jobs_scraper_spark.operators.textqc import language_id

    d = _t(spark, sf_dir, "documents")
    return language_id(d).select("doc_id", "lang_pred")


def _repetition_qc(spark, sf_dir):
    """Gopher repetition quality rules (Rae et al. 2021 A1.1 /
    datatrove's GopherRepetitionFilter), oracle-checked: duplicate-line
    and duplicate-paragraph fractions, top-{2,3,4}-gram character
    coverage, duplicate-{5,10}-gram occurrence fractions
    (operators/textqc.py repetition_stats — pure Catalyst higher-order
    array expressions, map-side, zero shuffle). The documents text is
    single-line word soup, so multi-line structure is synthesized
    deterministically per doc_id residue class: a duplicated full line
    (%4), a distinct 40-char prefix line (%6), a repeated paragraph
    (%5, duplicated again at %10)."""
    from prow_jobs_scraper_spark.operators.textqc import repetition_stats

    d = _spread(spark, _t(spark, sf_dir, "documents"))
    aug = d.select("doc_id", F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("\n"), F.col("text"))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 6 == 0,
               F.concat(F.lit("\n"), F.substring(F.col("text"), 1, 40))
               ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0,
               F.lit("\n\npara two repeated here")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 10 == 0,
               F.lit("\n\npara two repeated here")).otherwise(F.lit("")),
    ).alias("text"))
    out = repetition_stats(aug)
    return out.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.round("dup_line_frac", 6).alias("dup_line_frac"),
        F.round("dup_line_char_frac", 6).alias("dup_line_char_frac"),
        F.round("dup_para_frac", 6).alias("dup_para_frac"),
        F.round("dup_para_char_frac", 6).alias("dup_para_char_frac"),
        F.round("top_2gram_char_frac", 6).alias("top_2gram_char_frac"),
        F.round("top_3gram_char_frac", 6).alias("top_3gram_char_frac"),
        F.round("top_4gram_char_frac", 6).alias("top_4gram_char_frac"),
        F.round("dup_5gram_frac", 6).alias("dup_5gram_frac"),
        F.round("dup_10gram_frac", 6).alias("dup_10gram_frac"),
    )


def _contamination_check(spark, sf_dir):
    """Benchmark decontamination (the GPT-3 / PaLM 13-gram rule),
    oracle-checked: every document's 13-gram occurrences are tested for
    membership in a benchmark gram set and contaminated docs flagged
    (operators/textqc.py contamination_check — benchmark side shingled,
    distinct, BROADCAST; corpus explode+join stays map-side, per-doc
    re-agg partially aggregates before its doc_id exchange). The
    benchmark is synthesized deterministically: the first-20-token
    prefix of every doc_id % 37 == 0 document — so those docs are
    contaminated by construction and the tiny shared vocabulary gives
    genuine cross-doc hits."""
    from prow_jobs_scraper_spark.functions.tokenize import tokenize_column
    from prow_jobs_scraper_spark.operators.textqc import contamination_check

    d = _spread(spark, _t(spark, sf_dir, "documents"))
    bench = d.where(F.col("doc_id") % 37 == 0).select(
        F.array_join(F.slice(tokenize_column(F.col("text")), 1, 20),
                     " ").alias("text"))
    out = contamination_check(d, bench, n=13)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_contaminated").cast("long").alias("n_contaminated"),
        F.round("contaminated_frac", 6).alias("contaminated_frac"),
        "is_contaminated",
    )


def _pii_scrub(spark, sf_dir):
    """PII scrubbing for training-data sanitization, oracle-checked:
    emails/URLs/IPv4s/phones detected in category order and masked
    (operators/textqc.py pii_scrub — pure Catalyst regexp_count +
    regexp_replace, patterns inside the Java/RE2 shared subset so the
    DuckDB oracle replays them verbatim). The documents text is word
    soup, so deterministic PII is injected per doc_id residue class and
    the scrubbed text is value-checked by md5."""
    from prow_jobs_scraper_spark.operators.textqc import pii_scrub

    d = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    aug = d.select("doc_id", F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(" contact user"), sid,
                        F.lit("@example.com"))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit(" see https://data.example.com/d/"),
                        sid)).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit(" from 10.0."),
                        (F.col("doc_id") % 256).cast("string"),
                        F.lit(".7"))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0,
               F.lit(" call 555-000-1234")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0,
               F.lit(" or (555) 000-9876")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 13 == 0,
               F.lit(" cell +1 555.222.3333")).otherwise(F.lit("")),
    ).alias("text"))
    return pii_scrub(aug).select(
        "doc_id", "n_emails", "n_urls", "n_ipv4s", "n_phones",
        F.md5("text_scrubbed").alias("scrub_md5"))


def _span_dedup(spark, sf_dir):
    """Span-level exact dedup (C4 / Lee et al. shape), oracle-checked:
    20-token chunks deduped corpus-wide keep-first over documents UNION
    a relabeled copy of the first 50 docs (guaranteed duplicated spans),
    rebuilt text value-checked by md5 (operators/textqc.py span_dedup —
    map-side explode + ONE window shuffle on (chunk hash, chunk), no
    driver-side state)."""
    from prow_jobs_scraper_spark.operators.textqc import span_dedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = (d.where(F.col("doc_id") < 50)
              .select((F.col("doc_id") + (1 << 40)).alias("doc_id"), "text"))
    out = span_dedup(d.unionByName(copies), chunk_tokens=20)
    return out.select("doc_id", "n_chunks", "n_dup_chunks",
                      F.md5("text_deduped").alias("dedup_md5"))


def _search_aggs_range(spark, sf_dir):
    """ES range + filters bucket aggs and the stats metric in one
    oracle-checked row (search/dsl.py _apply_multibucket_agg /
    _stats_exprs): range buckets over purchase values (from-inclusive /
    to-exclusive, ES default keys) with a stats leaf, plus a filters
    agg (named metadata predicates incl. match_all — multi-membership:
    one doc may land in several buckets). Each is a map-side bucket
    fan-out (explode over per-row when() structs, no join, no second
    scan) + ONE grouped aggregation."""
    from prow_jobs_scraper_spark.search.dsl import dsl_aggregate

    ev = _t(spark, sf_dir, "events")
    r1 = dsl_aggregate(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {"by_value": {
            "range": {"field": "value", "ranges": [
                {"to": 10}, {"from": 10, "to": 100}, {"from": 100}]},
            "aggs": {"v": {"stats": {"field": "value"}}}}},
    }).select(
        F.lit("range").alias("shape"), "key", "doc_count", "v_count",
        F.round("v_min", 4).alias("v_min"),
        F.round("v_max", 4).alias("v_max"),
        F.round("v_avg", 4).alias("v_avg"),
        F.round("v_sum", 4).alias("v_sum"))
    r2 = dsl_aggregate(ev, {
        "aggs": {"groups": {"filters": {"filters": {
            "errors": {"term": {"event_type": "error"}},
            "big": {"range": {"value": {"gte": 100}}},
            "all": {"match_all": {}},
        }}}},
    }).select(
        F.lit("filters").alias("shape"), "key", "doc_count",
        F.lit(None).cast("long").alias("v_count"),
        *[F.lit(None).cast("double").alias(c)
          for c in ("v_min", "v_max", "v_avg", "v_sum")])
    # terms `missing` + `min_doc_count` (round 5): NULLs are synthesized
    # on a doc_id residue class (the sf tables carry none), bucketed
    # under "none", and min_doc_count 30 prunes every real source (25
    # docs each at sf0.01) while keeping the missing bucket — both knobs
    # discriminate
    d = _t(spark, sf_dir, "documents").withColumn(
        "source",
        F.when(F.col("doc_id") % 5 == 0, F.lit(None))
        .otherwise(F.col("source")))
    r3 = dsl_aggregate(d, {
        "aggs": {"by_source": {"terms": {
            "field": "source", "size": 100, "missing": "none",
            "min_doc_count": 30}}},
    }).select(
        F.lit("terms_missing").alias("shape"), "key", "doc_count",
        F.lit(None).cast("long").alias("v_count"),
        *[F.lit(None).cast("double").alias(c)
          for c in ("v_min", "v_max", "v_avg", "v_sum")])
    return r1.unionByName(r2).unionByName(r3)


def _search_aggs_metrics(spark, sf_dir):
    """Round-5 aggs surface in one oracle-checked union frame, all over
    a query window expressed in ES DATE MATH (``2024-01-08||/w`` /
    ``+1w/w`` — resolved at compile time to portable literals,
    search/dsl.py _resolve_date_math):

    - ``histogram`` buckets (interval 50, ``min_doc_count`` 2 — prunes
      real buckets at sf0.01) — shape='histogram';
    - ``percentiles`` (EXACT interpolated, flattened then unpivoted;
      ES is TDigest-approximate — documented deviation) —
      shape='percentile', DuckDB twin = quantile_cont;
    - ``cardinality`` (EXACT distinct count; ES is HLL-approximate) —
      shape='cardinality', DuckDB twin = count(DISTINCT ..).
    - parent PIPELINE aggs (round 5): weekly date_histogram carrying
      ``cumulative_sum`` on _count and ``derivative`` on the avg
      metric (search/dsl.py _split_pipeline/_pipeline_path; window
      over bucket-cardinality rows, never corpus rows) —
      shape='pipeline', doc_count=running count, val=avg delta (first
      bucket NULL — ES omits it); DuckDB twin = sum/lag OVER.
    - ``composite`` (round 5): the PAGINATED multi-source bucket agg —
      page after {et:'error', u:100} of the (event_type, user_id)
      bucket space, size 5, with a max leaf (search/dsl.py
      _apply_composite; the after cut is a map-side row predicate, so
      deep pages never shuffle passed buckets) — shape='composite',
      key='et|u'; DuckDB twin = lexicographic WHERE + GROUP BY +
      ORDER + LIMIT.
    - SIBLING pipelines (round 5): ``avg_bucket`` on _count
      (shape='sibling', constant val per bucket row) + ``stats_bucket``
      on the avg metric unpivoted to five rows (shape='sibling_stats');
      DuckDB twin = window/aggregate over the cut bucket list.
    - ``significant_terms`` (round 5): JLH-scored over-representation
      of event types in the window vs the whole table
      (shape='sig', key='<term>|<bg_count>', val=score).
    - ``rare_terms`` (round 5, exact vs ES's CuckooFilter): customers
      with <= 2 orders (shape='rare', val=max price metric).
    - ``global`` bucket (round 5): terms over the WHOLE table under a
      restrictive query (shape='global').
    - ``bucket_sort`` (round 5): the terms buckets re-sorted by their
      avg metric with from/size paging (shape='bsort', val=avg).
    - ``extended_stats`` (round 5): eight stats unpivoted
      (shape='estats'); ``adjacency_matrix`` (round 5): singles +
      alphabetical pairwise intersections (shape='adjacency');
      ``weighted_avg`` (round 5): lineitem price by quantity
      (shape='wavg').
    - ``bucket_script`` + ``bucket_selector`` (round 5, closing):
      per-bucket painless arithmetic compiled to the shared
      Spark-SQL∩DuckDB subset, selector drops below-threshold buckets
      (shape='bscript', val=scripted ratio).
    - ``min_doc_count: 0`` gap filling + ``extended_bounds`` (round 5,
      closing): daily histogram emitting zero-count days 3 days past
      each end of the window, cumulative_sum over the FILLED sequence
      (shape='gapfill', val=running count).
    - ``percentile_ranks`` (round 5, closing): EXACT pct of values <=
      v, unpivoted (shape='prank').
    - metric ``missing`` (round 5, resumed closing): NULL-field docs
      count as the substitute value (search/dsl.py _fill_missing — one
      coalesce, no extra scan). The window has no natural NULLs, so a
      val2 column NULLs out the 'error' events first; avg/p50 with
      fill 0 and value_count (shape='mmiss') plus a terms bucket whose
      avg-fill sub-agg pins the all-NULL 'error' bucket at exactly 0
      (shape='mmiss_terms'); DuckDB twin = the same CASE + coalesce.
    - ``time_zone`` (round 5, resumed closing): daily buckets on
      America/New_York local midnights keyed by their UTC instants
      (search/dsl.py _tz_date_trunc; shape='tzday' — keys land on
      04:00/05:00 UTC, discriminating from plain 'day'); twin =
      session-independent chained timezone() conversions.
    - ``multi_terms`` (round 5, resumed closing): compound
      (event_type, user_id) buckets flattened to the pipe-joined
      key_as_string ES itself returns (search/dsl.py
      _multi_terms_key), count-desc order so the size-12 cut is
      integer-deterministic, avg metric riding (shape='mterms').
    - ``boxplot`` (shape='bxp', EXACT quartiles vs ES TDigest),
      ``median_absolute_deviation`` bare (shape='mad', broadcast
      two-stage) and per-event_type (shape='mad_terms', co-partitioned
      window median), ``string_stats`` (shape='sstats', length stats +
      Shannon character entropy), terms ``include``/``exclude``
      (shape='tincl', anchored regexes, exclude wins), and
      ``top_metrics`` (shapes 'tmx'/'tmxt', the winning doc's metric
      values by sort, struct-ordered deterministic tiebreak), and
      ``normalize`` (shape='nrm', percent_of_sum on counts + z-score
      on the day-bucket avg, key='<day>|<which>') — all round 5,
      resumed closing; twins = quantile_cont / a join-median / the
      entropy formula / the same anchored-regex idiom /
      ORDER-BY-replayed winners / window-function normalizations.
    """
    from prow_jobs_scraper_spark.search.dsl import dsl_aggregate

    ev = _t(spark, sf_dir, "events")
    q = {"query": {"range": {"ts": {"gte": "2024-01-08||/w",
                                    "lt": "2024-01-20||+1w/w"}}}}
    nd = F.lit(None).cast("double")
    h = dsl_aggregate(ev, {**q, "aggs": {"h": {"histogram": {
        "field": "value", "interval": 50, "min_doc_count": 2}}}}).select(
        F.lit("histogram").alias("shape"),
        F.col("key").cast("string").alias("key"),
        "doc_count", nd.alias("val"))
    p = dsl_aggregate(ev, {**q, "aggs": {"v": {"percentiles": {
        "field": "value", "percents": [25, 50, 75, 95]}}}}).select(
        F.expr("stack(4, 'p25', v_p25, 'p50', v_p50, 'p75', v_p75, "
               "'p95', v_p95) AS (key, val)")).select(
        F.lit("percentile").alias("shape"), "key",
        F.lit(None).cast("long").alias("doc_count"),
        F.round("val", 6).alias("val"))
    c = dsl_aggregate(ev, {**q, "aggs": {"u": {"cardinality": {
        "field": "user_id"}}}}).select(
        F.lit("cardinality").alias("shape"),
        F.lit("user_id").alias("key"),
        F.col("u").cast("long").alias("doc_count"), nd.alias("val"))
    pl = dsl_aggregate(ev, {**q, "aggs": {"wk": {
        "date_histogram": {"field": "ts", "calendar_interval": "week"},
        "aggs": {"av": {"avg": {"field": "value"}},
                 "running": {"cumulative_sum": {"buckets_path": "_count"}},
                 "delta": {"derivative": {"buckets_path": "av"}}}}}}
    ).select(
        F.lit("pipeline").alias("shape"),
        F.col("key").cast("string").alias("key"),
        F.col("running").cast("long").alias("doc_count"),
        F.round("delta", 6).alias("val"))
    co = dsl_aggregate(ev, {**q, "aggs": {"pairs": {
        "composite": {
            "sources": [{"et": {"terms": {"field": "event_type"}}},
                        {"u": {"terms": {"field": "user_id"}}}],
            "size": 5, "after": {"et": "error", "u": 100}},
        "aggs": {"mx": {"max": {"field": "value"}}}}}}
    ).select(
        F.lit("composite").alias("shape"),
        F.concat_ws("|", "et", F.col("u").cast("string")).alias("key"),
        "doc_count", F.round("mx", 6).alias("val"))
    # SIBLING pipelines (round 5): avg_bucket on _count + stats_bucket
    # on the avg metric next to a terms agg — computed over the FINAL
    # bucket list, flattened as constant columns (search/dsl.py
    # _apply_siblings); the stats_bucket row unpivots once
    sbf = dsl_aggregate(ev, {**q, "aggs": {
        "et": {"terms": {"field": "event_type"},
               "aggs": {"av": {"avg": {"field": "value"}}}},
        "mean_sz": {"avg_bucket": {"buckets_path": "et>_count"}},
        "spread": {"stats_bucket": {"buckets_path": "et>av"}},
    }})
    sb = sbf.select(F.lit("sibling").alias("shape"), "key", "doc_count",
                    F.round("mean_sz", 6).alias("val"))
    sb2 = (sbf.limit(1).select(F.expr(
        "stack(5, 'count', CAST(spread_count AS DOUBLE), "
        "'min', spread_min, 'max', spread_max, "
        "'avg', spread_avg, 'sum', spread_sum) AS (key, val)"))
        .select(F.lit("sibling_stats").alias("shape"), "key",
                F.lit(None).cast("long").alias("doc_count"),
                F.round("val", 6).alias("val")))
    # significant_terms (round 5): event types over-represented in the
    # date-math window vs the whole table, JLH-scored (search/dsl.py
    # _apply_significant_terms); bg_count value-checked inside the key
    sg = dsl_aggregate(ev, {**q, "aggs": {"sig": {
        "significant_terms": {"field": "event_type"}}}}).select(
        F.lit("sig").alias("shape"),
        F.concat_ws("|", "key",
                    F.col("bg_count").cast("string")).alias("key"),
        "doc_count", F.round("score", 6).alias("val"))
    # rare_terms (round 5, EXACT where ES is CuckooFilter-approximate):
    # customers with <= 2 orders, a max metric riding along
    od = _t(spark, sf_dir, "orders")
    rr = dsl_aggregate(od, {"aggs": {"r": {
        "rare_terms": {"field": "o_custkey", "max_doc_count": 2},
        "aggs": {"mx": {"max": {"field": "o_totalprice"}}}}}}).select(
        F.lit("rare").alias("shape"),
        F.col("key").cast("string").alias("key"),
        "doc_count", F.round("mx", 6).alias("val"))
    # global bucket (round 5): sub-agg over the WHOLE table under a
    # restrictive query — the ES all-docs-context escape hatch
    gl = dsl_aggregate(ev, {"query": {"term": {"event_type": "error"}},
                            "aggs": {"g": {"global": {}, "aggs": {
                                "et": {"terms": {
                                    "field": "event_type"}}}}}}).select(
        F.lit("global").alias("shape"), "key", "doc_count",
        nd.alias("val"))
    # bucket_sort (round 5): re-sort the terms buckets by the avg
    # metric with from/size paging (search/dsl.py _parse_bucket_sort)
    bs = dsl_aggregate(ev, {**q, "aggs": {"bt": {
        "terms": {"field": "event_type"},
        "aggs": {"av": {"avg": {"field": "value"}},
                 "pg": {"bucket_sort": {"sort": [{"av": "desc"}],
                                        "from": 1, "size": 3}}}}}}
    ).select(
        F.lit("bsort").alias("shape"), "key", "doc_count",
        F.round("av", 6).alias("val"))
    # extended_stats (round 5): eight flattened stats of the window's
    # value column, unpivoted (round 3: sum_of_squares is ~1e9 at
    # sf0.01 — coarser rounding absorbs summation-order ulps)
    es2 = dsl_aggregate(ev, {**q, "aggs": {"x": {
        "extended_stats": {"field": "value"}}}}).select(F.expr(
        "stack(8, 'count', CAST(x_count AS DOUBLE), 'min', x_min, "
        "'max', x_max, 'avg', x_avg, 'sum', x_sum, "
        "'sum_of_squares', x_sum_of_squares, 'variance', x_variance, "
        "'std_deviation', x_std_deviation) AS (key, val)")).select(
        F.lit("estats").alias("shape"), "key",
        F.lit(None).cast("long").alias("doc_count"),
        F.round("val", 3).alias("val"))
    # adjacency_matrix (round 5): singles + pairwise intersections,
    # key-sorted, non-empty only (search/dsl.py _apply_multibucket_agg)
    aj = dsl_aggregate(ev, {**q, "aggs": {"adj": {"adjacency_matrix": {
        "filters": {
            "err": {"term": {"event_type": "error"}},
            "hi": {"range": {"value": {"gte": 400}}},
            "wk1": {"range": {"ts": {"lt": "2024-01-15"}}},
        }}}}}).select(
        F.lit("adjacency").alias("shape"), "key", "doc_count",
        nd.alias("val"))
    # weighted_avg (round 5): lineitem price weighted by quantity
    li = _t(spark, sf_dir, "lineitem")
    wa = dsl_aggregate(li, {"aggs": {"wv": {"weighted_avg": {
        "value": {"field": "l_extendedprice"},
        "weight": {"field": "l_quantity"}}}}}).select(
        F.lit("wavg").alias("shape"),
        F.lit("price_by_qty").alias("key"),
        F.lit(None).cast("long").alias("doc_count"),
        F.round("wv", 4).alias("val"))
    # bucket_script + bucket_selector (round 5, closing): per-bucket
    # painless arithmetic compiled to the shared Spark-SQL∩DuckDB
    # subset (search/dsl.py _compile_bucket_script) — the twin replays
    # the same expression; the selector threshold sits between the
    # sf0.01 window's 2nd and 3rd counts so it value-checks real drops
    bsc = dsl_aggregate(ev, {**q, "aggs": {"bt": {
        "terms": {"field": "event_type"},
        "aggs": {"av": {"avg": {"field": "value"}},
                 "ratio": {"bucket_script": {
                     "buckets_path": {"a": "av", "c": "_count"},
                     "script": "params.a / params.c * 10"}},
                 "keep": {"bucket_selector": {
                     "buckets_path": {"c": "_count"},
                     "script": "params.c > 930"}}}}}}).select(
        F.lit("bscript").alias("shape"), "key", "doc_count",
        F.round("ratio", 6).alias("val"))
    # min_doc_count 0 gap filling (round 5, closing): daily histogram
    # over the window with extended_bounds pushing 3 days past each
    # end — the filled zero-count days carry the running sum forward
    # (search/dsl.py _gap_fill; pipelines see the FILLED sequence)
    gf = dsl_aggregate(ev, {**q, "aggs": {"d": {
        "date_histogram": {"field": "ts", "calendar_interval": "day",
                           "min_doc_count": 0,
                           "extended_bounds": {"min": "2024-01-05",
                                               "max": "2024-01-24"}},
        "aggs": {"run": {"cumulative_sum": {
            "buckets_path": "_count"}}}}}}).select(
        F.lit("gapfill").alias("shape"),
        F.col("key").cast("string").alias("key"),
        "doc_count", F.col("run").cast("double").alias("val"))
    # percentile_ranks (round 5, closing): EXACT pct of values <= v
    # (ES TDigest-interpolates — documented deviation), unpivoted
    pr = dsl_aggregate(ev, {**q, "aggs": {"r": {"percentile_ranks": {
        "field": "value", "values": [100, 250.5]}}}}).select(
        F.expr("stack(2, 'le100', r_100, 'le250_5', r_250_5) "
               "AS (key, val)")).select(
        F.lit("prank").alias("shape"), "key",
        F.lit(None).cast("long").alias("doc_count"),
        F.round("val", 6).alias("val"))
    # metric `missing` (round 5, resumed closing): synthesize NULLs
    # (no natural ones in events) by NULLing value on 'error' rows,
    # then fill with 0 — avg / exact p50 / value_count, and a terms
    # bucket where the all-NULL 'error' bucket averages exactly 0
    ev2 = ev.withColumn(
        "val2", F.when(F.col("event_type") != "error", F.col("value")))
    nl = F.lit(None).cast("long")
    mm = (dsl_aggregate(ev2, {**q, "aggs": {"a": {
            "avg": {"field": "val2", "missing": 0}}}}).select(
            F.lit("mmiss").alias("shape"), F.lit("avg0").alias("key"),
            nl.alias("doc_count"), F.round("a", 6).alias("val"))
        .unionByName(dsl_aggregate(ev2, {**q, "aggs": {"a": {
            "percentiles": {"field": "val2", "percents": [50],
                            "missing": 0}}}}).select(
            F.lit("mmiss").alias("shape"), F.lit("p50").alias("key"),
            nl.alias("doc_count"), F.round("a_p50", 6).alias("val")))
        .unionByName(dsl_aggregate(ev2, {**q, "aggs": {"a": {
            "value_count": {"field": "val2", "missing": 0}}}}).select(
            F.lit("mmiss").alias("shape"), F.lit("vc").alias("key"),
            F.col("a").alias("doc_count"), nd.alias("val"))))
    mmt = dsl_aggregate(ev2, {**q, "aggs": {"et": {
        "terms": {"field": "event_type"},
        "aggs": {"a": {"avg": {"field": "val2",
                               "missing": 0}}}}}}).select(
        F.lit("mmiss_terms").alias("shape"), "key", "doc_count",
        F.round("a", 6).alias("val"))
    # date_histogram time_zone (round 5, resumed closing): daily
    # buckets on America/New_York LOCAL midnights keyed by their UTC
    # instants (search/dsl.py _tz_date_trunc — every key lands on a
    # 04:00/05:00 UTC boundary, so the mode discriminates from plain
    # 'day'); the DuckDB twin chains timezone() conversions in a
    # session-TimeZone-independent form
    tzb = dsl_aggregate(ev, {**q, "aggs": {"d": {
        "date_histogram": {"field": "ts", "calendar_interval": "day",
                           "time_zone": "America/New_York"}}}}).select(
        F.lit("tzday").alias("shape"),
        F.col("key").cast("string").alias("key"),
        "doc_count", nd.alias("val"))
    # multi_terms (round 5, resumed closing): compound (event_type,
    # user_id) buckets flattened to the pipe-joined key_as_string ES
    # itself returns (search/dsl.py _multi_terms_key); count-desc order
    # keeps the size-12 cut integer-deterministic across engines, the
    # avg metric rides as val; twin = GROUP BY the concatenated key
    mt = dsl_aggregate(ev, {**q, "aggs": {"g": {
        "multi_terms": {"terms": [{"field": "event_type"},
                                  {"field": "user_id"}],
                        "size": 12, "min_doc_count": 2},
        "aggs": {"m": {"avg": {"field": "value"}}}}}}).select(
        F.lit("mterms").alias("shape"), "key", "doc_count",
        F.round("m", 6).alias("val"))
    # boxplot / MAD / string_stats / terms include-exclude (round 5,
    # resumed closing): EXACT quartiles, exact median-absolute-
    # deviation (bare broadcast two-stage + per-bucket window median),
    # character-entropy string stats, and pre-pipeline term filtering
    # — twins replay via quantile_cont / a join-median / the entropy
    # formula / the same anchored-regex idiom
    bx = dsl_aggregate(ev, {**q, "aggs": {"b": {
        "boxplot": {"field": "value"}}}}).select(F.expr(
            "stack(5, 'min', b_min, 'q1', b_q1, 'q2', b_q2, "
            "'q3', b_q3, 'max', b_max) AS (key, val)")).select(
        F.lit("bxp").alias("shape"), "key", nl.alias("doc_count"),
        F.round("val", 6).alias("val"))
    md = dsl_aggregate(ev, {**q, "aggs": {"mad": {
        "median_absolute_deviation": {"field": "value"}}}}).select(
        F.lit("mad").alias("shape"), F.lit("value").alias("key"),
        nl.alias("doc_count"), F.round("mad", 6).alias("val"))
    mdt = dsl_aggregate(ev, {**q, "aggs": {"et": {
        "terms": {"field": "event_type"},
        "aggs": {"mad": {"median_absolute_deviation": {
            "field": "value"}}}}}}).select(
        F.lit("mad_terms").alias("shape"), "key", "doc_count",
        F.round("mad", 6).alias("val"))
    sst = dsl_aggregate(ev, {**q, "aggs": {"s": {
        "string_stats": {"field": "event_type"}}}}).select(F.expr(
            "stack(5, 'count', CAST(s_count AS DOUBLE), "
            "'min_length', CAST(s_min_length AS DOUBLE), "
            "'max_length', CAST(s_max_length AS DOUBLE), "
            "'avg_length', s_avg_length, 'entropy', s_entropy) "
            "AS (key, val)")).select(
        F.lit("sstats").alias("shape"), "key", nl.alias("doc_count"),
        F.round("val", 6).alias("val"))
    ti = dsl_aggregate(ev, {**q, "aggs": {"a": {"terms": {
        "field": "event_type", "size": 100,
        "include": "(view|click|signup)",
        "exclude": "click"}}}}).select(
        F.lit("tincl").alias("shape"), "key", "doc_count",
        nd.alias("val"))
    # normalize (round 5, resumed closing): per-bucket value rescaled
    # by bucket-list statistics — percent_of_sum on _count + z-score
    # (population) on avg(value) over the day histogram; the twin
    # replays both as duckdb window functions
    nrm = dsl_aggregate(ev, {**q, "aggs": {"d": {
        "date_histogram": {"field": "ts", "calendar_interval": "day"},
        "aggs": {"m": {"avg": {"field": "value"}},
                 "pos": {"normalize": {"buckets_path": "_count",
                                       "method": "percent_of_sum"}},
                 "zs": {"normalize": {"buckets_path": "m",
                                      "method": "z-score"}}}}}}).select(
        F.col("key").cast("string").alias("k2"), "doc_count",
        F.expr("stack(2, 'pos', pos, 'zs', zs) AS (which, val)")).select(
        F.lit("nrm").alias("shape"),
        F.concat_ws("|", "k2", "which").alias("key"),
        "doc_count", F.round("val", 6).alias("val"))
    # top_metrics (round 5, resumed closing): the winning document's
    # metric values by sort — bare (two metrics from the SAME doc) and
    # per-event_type; the twin replays the engine's deterministic
    # struct tiebreak as ORDER BY ts, value (ts is unique at sf0.01,
    # so the tiebreak is inert but kept in lockstep)
    tm = dsl_aggregate(ev, {**q, "aggs": {"t": {"top_metrics": {
        "metrics": [{"field": "value"}, {"field": "user_id"}],
        "sort": {"ts": "desc"}}}}}).select(F.expr(
            "stack(2, 'value', t_value, "
            "'user_id', CAST(t_user_id AS DOUBLE)) AS (key, val)"
        )).select(
        F.lit("tmx").alias("shape"), "key", nl.alias("doc_count"),
        F.round("val", 6).alias("val"))
    tmt = dsl_aggregate(ev, {**q, "aggs": {"et": {
        "terms": {"field": "event_type", "size": 100},
        "aggs": {"t": {"top_metrics": {
            "metrics": {"field": "value"},
            "sort": {"ts": "asc"}}}}}}}).select(
        F.lit("tmxt").alias("shape"), "key", "doc_count",
        F.round("t_value", 6).alias("val"))
    # auto_date_histogram (round 5, resumed closing): the engine
    # resolves the ES rounding ladder from the window's ts bounds —
    # target 20 picks 1d here (12h would need 28 buckets) — then runs
    # the exact gap-filled fixed-interval path (search/dsl.py
    # _resolve_auto_interval). The chosen label is pinned by embedding
    # it in the key, so a ladder drift hash-mismatches; the twin
    # replays the contiguous day sequence between the observed bounds
    au = dsl_aggregate(ev, {**q, "aggs": {"d": {
        "auto_date_histogram": {"field": "ts", "buckets": 20}}}}
    ).select(
        F.lit("auto").alias("shape"),
        F.concat_ws("|", "interval",
                    F.col("key").cast("string")).alias("key"),
        "doc_count", nd.alias("val"))
    # matrix_stats (round 5, this session): the ES matrix aggregations
    # module — per-field moments + pairwise SAMPLE covariance /
    # correlation over (value, v2=user_id%50; small magnitudes keep
    # round(·,6) safely clear of cross-engine ulp noise), melted to
    # key='field|other|stat' (search/dsl.py _apply_matrix_stats —
    # closed-form raw moments, Pearson kurtosis, the twin replays the
    # identical arithmetic)
    ms = dsl_aggregate(
        ev.withColumn("v2", (F.col("user_id") % 50).cast("double")),
        {**q, "aggs": {"m": {"matrix_stats": {
            "fields": ["value", "v2"]}}}},
    ).select(
        "field", "other", "doc_count",
        F.expr("stack(6, 'mean', mean, 'var', variance, "
               "'skew', skewness, 'kurt', kurtosis, "
               "'cov', covariance, 'corr', correlation) AS (stat, v)"),
    ).select(
        F.lit("mstat").alias("shape"),
        F.concat_ws("|", "field", "other", "stat").alias("key"),
        "doc_count", F.round("v", 6).alias("val"))
    # scripted sources (round 5, this session): a terms bucket KEYED by
    # a painless-subset script with a scripted avg metric riding
    # (search/dsl.py _agg_script_col — one Catalyst expression each,
    # params resolved to literals); count-desc/key-asc order keeps the
    # size cut integer-deterministic; the twin replays the arithmetic
    ssc = dsl_aggregate(ev, {**q, "aggs": {"b": {
        "terms": {"script": "doc['user_id'].value * 2 + 1", "size": 7},
        "aggs": {"av": {"avg": {"script": {
            "source": "doc['value'].value * params.w + 2",
            "params": {"w": 3}}}}}}}}).select(
        F.lit("sscript").alias("shape"),
        F.col("key").cast("string").alias("key"),
        "doc_count", F.round("av", 6).alias("val"))
    return (h.unionByName(p).unionByName(c)
            .unionByName(pl).unionByName(co).unionByName(sb)
            .unionByName(sb2).unionByName(sg).unionByName(rr)
            .unionByName(gl).unionByName(bs).unionByName(es2)
            .unionByName(aj).unionByName(wa).unionByName(bsc)
            .unionByName(gf).unionByName(pr).unionByName(mm)
            .unionByName(mmt).unionByName(tzb).unionByName(mt)
            .unionByName(bx).unionByName(md).unionByName(mdt)
            .unionByName(sst).unionByName(ti)
            .unionByName(tm).unionByName(tmt).unionByName(nrm)
            .unionByName(au).unionByName(ms).unionByName(ssc))


def _similarity_topk(spark, sf_dir):
    from prow_jobs_scraper_spark.operators.similarity import brute_force_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select("embedding").first()[0]
    topk = brute_force_topk(e, [float(x) for x in q], 10)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return topk.select("vec_id", F.row_number().over(w).alias("rank"),
                       F.round("cosine", 4).alias("cosine"))


def _search_aggs_weekly(spark, sf_dir):
    """ES `aggs` block pushed into the engine, oracle-checked: the
    reference queries jobs in a period then computes per-period metrics
    client-side (src/jobsautoreport/query.py:28-45 + report.py); here
    the same request — bool filter (terms + range, ES filter context)
    with a date_histogram bucket agg and an avg sub-metric — runs as
    ONE grouped Spark aggregation (map-side partial agg; the shuffle
    carries one row per (partition, week), never per event)."""
    from prow_jobs_scraper_spark.search.dsl import dsl_aggregate

    ev = _t(spark, sf_dir, "events")
    req = {
        "query": {"bool": {"filter": [
            {"terms": {"event_type": ["error", "purchase"]}},
            {"range": {"ts": {"gte": "2024-01-01"}}},
        ]}},
        "aggs": {"per_week": {
            "date_histogram": {"field": "ts", "calendar_interval": "week"},
            "aggs": {"avg_value": {"avg": {"field": "value"}}},
        }},
    }
    out = dsl_aggregate(ev, req)
    return out.select(F.col("key").alias("week"), "doc_count",
                      F.round("avg_value", 6).alias("avg_value"))


def _hybrid_rrf_topk(spark, sf_dir):
    """Hybrid retrieval, oracle-checked: BM25 (ES `match`, operator:or)
    over documents + exact cosine over the aligned embeddings table,
    fused with Reciprocal Rank Fusion (Cormack et al., c=60 — the ES
    8.x `rrf` rank constructor shape). Fusion cost is O(k_each) per
    list, never corpus-sized; the retrieval sides carry the engine's
    scale designs (search/hybrid.py docstring)."""
    from prow_jobs_scraper_spark.search.hybrid import hybrid_topk

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    topk = hybrid_topk(docs, emb, "key agg", [float(x) for x in q],
                       k=10, k_each=20)
    w = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return topk.select(
        "doc_id", F.row_number().over(w).alias("rank"),
        F.round("rrf_score", 6).alias("rrf_score"), "n_lists")


def _enrich_orders(spark, sf_dir):
    # J3: enrichment left-outer join (metadata attach), broadcast dim
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .select("o_orderkey", "c_name", "c_mktsegment",
                F.round("o_totalprice", 2).alias("totalprice"))
    )


def _first_match_enrich(spark, sf_dir):
    # J6: self-join first-match — each error event borrows the value of its
    # user's earliest purchase (the bandwidth-usage interval fix-up shape,
    # reference equinix_usages.py:119-176), as min_by agg + broadcast join
    ev = _t(spark, sf_dir, "events")
    first_buy = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id", "value")).alias("fp"))
        .select("user_id", F.col("fp.value").alias("first_purchase_value"))
    )
    return (
        ev.where(F.col("event_type") == "error")
        .join(F.broadcast(first_buy), "user_id", "left")
        .select("event_id", "user_id",
                F.round(F.coalesce("first_purchase_value", F.lit(0.0)), 2)
                 .alias("first_purchase_value"))
    )


def _order_lineitems_denorm(spark, sf_dir):
    # J7: denormalization join — embed the parent order's fields in each
    # line item (the StepEvent-embeds-JobDetails shape, event.py:119-129)
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    o = _t(spark, sf_dir, "orders")
    nested = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber",
        F.struct(
            F.col("o_orderdate").alias("order_date"),
            F.col("o_totalprice").alias("totalprice"),
        ).alias("order"),
    )
    return nested.select(
        "l_orderkey", "l_linenumber", F.col("order.order_date").alias("order_date"),
        F.round("order.totalprice", 2).alias("totalprice"),
    )


def _global_revenue(spark, sf_dir):
    # A6: global scalar aggregate
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
         .alias("total_revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


def _event_state_counts(spark, sf_dir):
    # A8: grouped counts by state
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


def _customer_ids_derived(spark, sf_dir):
    # F1/F2: prefix strip + startswith (the job-name → context derivation
    # shape, reference prowjob.py:87-149)
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "^Customer#", "").cast("long").alias("cust_num"),
        F.col("c_name").startswith("Customer#").alias("name_ok"),
    )


def _priority_labels(spark, sf_dir):
    # F3/F6: split+last-element + replace (build_id-from-name shape,
    # reference equinix_usages.py:46-48)
    o = _t(spark, sf_dir, "orders")
    label = F.element_at(F.split("o_orderpriority", "-"), -1)
    return o.select(
        "o_orderkey", label.alias("label"),
        F.regexp_replace(label, " ", "_").alias("label_norm"),
    )


def _brand_share_others(spark, sf_dir):
    # F18: threshold bucketing — brands under 2% revenue share fold into
    # 'Others' (the pie-chart tail agg, reference slack_report.py:264-293)
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r"))
    )
    total = Window.partitionBy()
    bucket = F.when(F.col("r") / F.sum("r").over(total) > 0.02, F.col("p_brand")) \
              .otherwise(F.lit("Others"))
    return (
        rev.select(bucket.alias("bucket"), "r")
        .groupBy("bucket").agg(F.round(F.sum("r"), 2).alias("revenue"))
    )


def _order_ship_overlap(spark, sf_dir):
    # P10/P12: interval-overlap filter — order interval [orderdate,
    # last shipdate] overlaps 1996 (usage-window shape, query.py:76-99)
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    spans = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("last_ship"))
    return (
        o.join(spans, o.o_orderkey == spans.l_orderkey)
        .where((F.col("o_orderdate") <= "1996-12-31")
               & (F.col("last_ship") >= "1996-01-01"))
        .select("o_orderkey", "o_orderdate", "last_ship")
    )


def _union_event_streams(spark, sf_dir):
    # U2/U3: tagged union-all of two filtered streams + distinct users
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "error").select(
        "event_id", F.lit("err").alias("tag"))
    b = ev.where(F.col("event_type") == "purchase").select(
        "event_id", F.lit("buy").alias("tag"))
    return a.unionByName(b)


def _composite_anti_join(spark, sf_dir):
    # J2: anti-join on a composite key — (user_id, event_type) combos in
    # week 2+ never seen in week 1 (the (name, plan) usage dedup shape,
    # reference scraper.py:41-47,59-64)
    ev = _t(spark, sf_dir, "events")
    wk1 = ev.where(F.col("ts") < "2024-01-08").select(
        "user_id", "event_type").distinct()
    later = ev.where(F.col("ts") >= "2024-01-08").select(
        "user_id", "event_type").distinct()
    return later.join(wk1, ["user_id", "event_type"], "left_anti")


def _url_paths(spark, sf_dir):
    # F4: URL path suffix — '/'.join(path.split('/')[4:]) (the GCS
    # artifact-path derivation, reference utils.py:8-15)
    from prow_jobs_scraper_spark.functions.scalars import url_path_suffix

    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "error")
    url = F.concat_ws(
        "/", F.lit("https://storage.example.com/v1/b"),
        F.col("event_type"), F.col("user_id").cast("string"),
        F.lit("artifacts"), F.col("event_id").cast("string"))
    return ev.select(
        "event_id", url_path_suffix(url, skip=4).alias("artifact_path"))


def _distinct_users(spark, sf_dir):
    # A2/U3: distinct key-set construction
    ev = _t(spark, sf_dir, "events")
    return ev.select("user_id").distinct()


def _trivial_filters_suite(spark, sf_dir):
    """Ten long-green trivial operators value-checked in ONE driver
    row — the driver's CORRECTNESS artifact records only the first 50
    ``queries()`` entries, so this keeps every SURVEY §2 operator
    hard-signal-checked while the individual entries stay at the
    contract tail for API users. Rows are normalized to
    (shape, k, v) strings; the oracle wraps the individual oracle
    SQLs verbatim, so value agreement is inherited, not re-derived.
    Shapes: P5 boolean-flag, P2 regex, U2 union-all, F4 url slice,
    F1/F2 prefix strip + startswith, A2/U3 distinct keys, P3/P4/P9
    time-range+membership+contains, P6/P7/P8 classifier chain, F3/F6
    split+replace priority labels, F5/F10/S9 weekly partition names,
    A6 global scalar aggregate."""
    from functools import reduce as _reduce

    parts = [
        _global_revenue(spark, sf_dir).select(
            F.lit("revenue").alias("shape"),
            F.round(F.col("total_revenue") * 100, 0).cast("long")
            .cast("string").alias("k"),
            F.col("n_lineitems").cast("string").alias("v")),
        _priority_labels(spark, sf_dir).select(
            F.lit("priority").alias("shape"),
            F.col("o_orderkey").cast("string").alias("k"),
            F.concat(F.col("label"), F.lit(":"),
                     F.col("label_norm")).alias("v")),
        _weekly_partition_names(spark, sf_dir).select(
            F.lit("weekly").alias("shape"),
            F.col("index_name").alias("k"),
            F.col("n_docs").cast("string").alias("v")),
        _time_range_filter(spark, sf_dir).select(
            F.lit("timerange").alias("shape"),
            F.col("event_id").cast("string").alias("k"),
            F.concat(F.col("event_type"), F.lit(":"),
                     F.round(F.col("value") * 100, 0).cast("long")
                     .cast("string")).alias("v")),
        _classifier(spark, sf_dir).select(
            F.lit("classifier").alias("shape"),
            F.col("doc_class").alias("k"),
            F.col("n").cast("string").alias("v")),
        _boolean_flag_filter(spark, sf_dir).select(
            F.lit("bool_flag").alias("shape"),
            F.col("event_id").cast("string").alias("k"),
            F.col("user_id").cast("string").alias("v")),
        _regex_filter(spark, sf_dir).select(
            F.lit("regex").alias("shape"),
            F.col("doc_id").cast("string").alias("k"),
            F.col("n_chars").cast("string").alias("v")),
        _union_event_streams(spark, sf_dir).select(
            F.lit("union").alias("shape"),
            F.col("event_id").cast("string").alias("k"),
            F.col("tag").alias("v")),
        _url_paths(spark, sf_dir).select(
            F.lit("url").alias("shape"),
            F.col("event_id").cast("string").alias("k"),
            F.col("artifact_path").alias("v")),
        _customer_ids_derived(spark, sf_dir).select(
            F.lit("prefix").alias("shape"),
            F.col("c_custkey").cast("string").alias("k"),
            F.concat(F.col("cust_num").cast("string"), F.lit(":"),
                     F.col("name_ok").cast("string")).alias("v")),
        _distinct_users(spark, sf_dir).select(
            F.lit("distinct").alias("shape"),
            F.col("user_id").cast("string").alias("k"),
            F.lit("").alias("v")),
    ]
    return _reduce(DataFrame.unionByName, parts)


def _embedding_dedup_pairs(spark, sf_dir):
    # embedding-cosine near-dup, exact all-pairs baseline (the
    # verification-grade path; the LSH-bucketed scale path is exercised
    # by the rows-only lsh_ann_topk entry). Threshold 0.45 sits just
    # under the synthetic corpus's max pairwise cosine so the check has
    # actual rows to compare.
    e = _t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a = v.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = v.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    cos = dot / (norm(F.col("va")) * norm(F.col("vb")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= 0.45)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )


# ---- rows-only entries (non-SQL-expressible; weaker check acknowledged) --


def _doc_fingerprints(spark, sf_dir):
    """Winnowing fingerprint, ORACLE-checked: min rolling polynomial
    hash (base 1099511628211, uint64 wraparound) over 4-token windows of
    the md5-derived 60-bit token hash (dedup.md5_token_hash —
    byte-identical in DuckDB), so the full vectorized pipeline
    (sliding_window_view + reduceat in the UDF) is replicated in SQL
    with HUGEINT mod-2^64 arithmetic."""
    from prow_jobs_scraper_spark.operators.dedup import md5_token_hash
    from prow_jobs_scraper_spark.operators.textqc import fingerprint

    d = _spread(spark, _t(spark, sf_dir, "documents"))
    return fingerprint(d, hash_expr=md5_token_hash).select(
        "doc_id", "fingerprint")

def _minhash_candidates(spark, sf_dir):
    """MinHash-LSH candidates, exact-verified: banded signatures over
    3-gram shingles generate candidate pairs (64 hashes × 32 bands,
    banding s-curve threshold ≈ 0.17 — far below the verify bar), then
    each candidate's TRUE 3-gram jaccard is computed
    (exact_jaccard_for_pairs) and pairs ≥ 0.5 emitted. The oracle is the
    exact all-pairs 3-gram jaccard at the same threshold, so the driver
    check is a 100%-recall gate on the LSH candidate generator (a missed
    true pair would show as a missing row). Candidates come from
    minhash_band_candidates — (id_a, id_b) only, signatures never enter
    the pair shuffle."""
    from prow_jobs_scraper_spark.operators.dedup import (
        exact_jaccard_for_pairs,
        minhash_band_candidates,
    )

    d = _spread(spark, _t(spark, sf_dir, "documents"))
    cands = minhash_band_candidates(d, n_hashes=64, bands=32, shingle_n=3)
    out = exact_jaccard_for_pairs(d, cands, shingle_n=3)
    return (
        out.where(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def _dedup_clusters(spark, sf_dir):
    """Near-duplicate CLUSTERING end-to-end, oracle-checked: the
    MinHash-LSH candidate pairs (exact-verified at jaccard >= 0.5, the
    same pipeline as the minhash_candidates entry) feed connected
    components (alternating large-star/small-star, Kiveris et al. SoCC
    2014 — diameter-independent O(log² n) rounds), and every document
    gets (cluster_id = component min, is_canonical) — the standard last
    stage of a corpus dedup pipeline: pairs -> components -> keep one
    doc per cluster. The DuckDB oracle recomputes the exact pair set in
    SQL and closes it with a recursive CTE, so the component labels are
    value-checked, not rows-only."""
    from prow_jobs_scraper_spark.operators.dedup import (
        dedup_clusters,
        exact_jaccard_for_pairs,
        minhash_band_candidates,
    )

    d = _spread(spark, _t(spark, sf_dir, "documents"))
    cands = minhash_band_candidates(d, n_hashes=64, bands=32, shingle_n=3)
    pairs = (exact_jaccard_for_pairs(d, cands, shingle_n=3)
             .where(F.col("jaccard") >= 0.5))
    return dedup_clusters(d, pairs)


def _simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs over an md5-derived 60-bit token hash —
    byte-identical in DuckDB, so the oracle replicates the FULL pipeline
    in SQL (tf-weighted ±1 bit votes → sign → fingerprint → Hamming ≤ 3
    self-join): fingerprinting, banding recall, and the hamming verify
    are all value-checked, not rows-only. The default engine path keeps
    xxhash64 (faster; tested in tests/test_dedup_similarity.py)."""
    from prow_jobs_scraper_spark.operators.dedup import (
        md5_token_hash,
        simhash_near_dup_pairs,
    )

    d = _spread(spark, _t(spark, sf_dir, "documents"))
    return simhash_near_dup_pairs(d, max_hamming=3,
                                  hash_expr=md5_token_hash, n_bits=60)


def _ivf_ann_topk(spark, sf_dir):
    """IVF ANN over the PERSISTED index layout: one build pass writes the
    corpus partitioned by inverted list (+ centroids sidecar); the probe
    is a partition-pruned read of the n_probe nearest lists with exact
    cosine rescoring. centroids="head" (lowest ids) so the DuckDB oracle
    can replicate the full IVF semantics — centroid pick, assignment,
    probe selection, rescoring — in plain SQL (oracle-checked, not
    rows-only)."""
    import tempfile  # noqa: PLC0415

    from prow_jobs_scraper_spark.operators.similarity import (
        build_ivf_index,
        ivf_probe_topk,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select("embedding").first()[0]
    d = tempfile.mkdtemp(prefix="entry_ivf_")
    build_ivf_index(e, d, n_lists=16, centroids="head")
    topk = ivf_probe_topk(spark, d, [float(x) for x in q], 10, n_probe=4)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return topk.select("vec_id", F.row_number().over(w).alias("rank"),
                       F.round("cosine", 4).alias("cosine"))


def _ivfpq_ann_topk(spark, sf_dir):
    """IVF-PQ ANN (Jégou et al., PAMI 2011) end-to-end, oracle-checked:
    residual-encode each row against its list centroid, ADC-scan ONLY
    (vec_id, pq_code) over the probed lists, keep k·refine candidates
    by approximate score, exact-rescore their full vectors, top-k.

    To make the WHOLE pipeline value-checkable in plain SQL, the entry
    uses pre-trained SCALAR-QUANTIZATION codebooks (m = dim, one dim
    per subspace, a fixed 256-point grid on [-1, 1]) and head
    centroids — every stage (assignment, residual, nearest-grid encode,
    ADC lookup sum, refine cut, rescore) is closed-form, so the DuckDB
    oracle replicates it exactly. The k-means-trained codebooks of
    train_pq run the SAME engine path and are pytest-gated instead
    (seed-pinned recall@10 >= 0.8 vs brute force, bit-exact rescore)."""
    import tempfile  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    from prow_jobs_scraper_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_probe_topk,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select("embedding").first()[0]
    dim = len(q)
    books = np.zeros((dim, 256, 1))
    books[:, :, 0] = np.linspace(-1.0, 1.0, 256)
    d = tempfile.mkdtemp(prefix="entry_ivfpq_")
    build_ivfpq_index(e, d, n_lists=16, m=dim, centroids="head",
                      codebooks=books)
    topk = ivfpq_probe_topk(spark, d, [float(x) for x in q], 10,
                            n_probe=4, refine=4)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return topk.select("vec_id", F.row_number().over(w).alias("rank"),
                       F.round("cosine", 4).alias("cosine"))


def _lsh_ann_topk(spark, sf_dir):
    """LSH ANN over the PERSISTED index layout: signatures written
    bucket-partitioned once; the probe reads only buckets within Hamming
    ≤ multi_probe of the query signature (partition-pruned), then exact
    cosine rescoring. The oracle recomputes the same signatures in SQL
    from the seeded hyperplane literals, so the driver verifies the full
    ANN semantics — bucketing + pruning + rescoring. Mode 'brute'
    (round 5, in-window again after the queries() growth pushed the
    standalone similarity_topk past the driver's 50-row cap) is the
    exact brute-force cosine baseline over the same query vector —
    the recall yardstick every ANN variant is measured against.

    Modes 'knn_cos'/'knn_l2' (round 5, resumed closing) drive the ES 8
    ``_search`` ``knn`` section (search/dsl.py _parse_knn/_knn_hits)
    over the same embeddings: knn_cos applies the ES PRE-filter
    (label >= 1, qualification before the top-k cut) and boost 2.0 on
    the (1+cos)/2 transform; knn_l2 ranks by 1/(1+d^2). The 'cosine'
    column carries the TRANSFORMED ES _score for these modes; the twin
    replays both transforms over the shared base CTE."""
    import tempfile  # noqa: PLC0415

    from prow_jobs_scraper_spark.operators.similarity import (
        brute_force_topk,
        build_lsh_index,
        lsh_probe_topk,
    )
    from prow_jobs_scraper_spark.search.dsl import execute_request

    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select("embedding").first()[0]
    qv = [float(x) for x in q]
    d = tempfile.mkdtemp(prefix="entry_lsh_")
    build_lsh_index(e, d, n_planes=10, seed=42)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    a = lsh_probe_topk(spark, d, qv, 10, multi_probe=2).select(
        F.lit("lsh").alias("mode"), "vec_id",
        F.row_number().over(w).alias("rank"),
        F.round("cosine", 4).alias("cosine"))
    b = brute_force_topk(e, qv, 10).select(
        F.lit("brute").alias("mode"), "vec_id",
        F.row_number().over(w).alias("rank"),
        F.round("cosine", 4).alias("cosine"))
    ed = e.withColumnRenamed("vec_id", "doc_id")
    wk = Window.orderBy(F.desc("score"), F.asc("doc_id"))

    def knn_mode(name, req):
        return execute_request(ed, req).select(
            F.lit(name).alias("mode"), F.col("doc_id").alias("vec_id"),
            F.row_number().over(wk).alias("rank"),
            F.round("score", 4).alias("cosine"))

    kc = knn_mode("knn_cos", {"knn": {
        "field": "embedding", "query_vector": qv, "k": 10,
        "num_candidates": 100, "boost": 2.0,
        "filter": {"range": {"label": {"gte": 1}}}}})
    kl = knn_mode("knn_l2", {"knn": {
        "field": "embedding", "query_vector": qv, "k": 10,
        "metric": "l2_norm"}})
    return a.unionByName(b).unionByName(kc).unionByName(kl)


def _media_features(spark, sf_dir):
    """Multimodal plumbing, oracle-checked per kind. Video rows derive
    from the documents table (payload = UTF-8 text bytes) and
    value-check the Arrow binary path by byte count
    (octet_length(encode(..)) in SQL). Audio rows (round 5) carry REAL
    RIFF/WAVE PCM16 payloads — a deterministic integer signal derived
    from doc_id, containerized by encode_wav — decoded for real by the
    strict path, so the driver value-checks true duration/RMS/peak.
    Image rows (round 5, closing session) carry REAL PNG payloads
    (closed-form pixel pattern, Paeth-filtered scanlines, zlib
    container — operators/multimodal.py encode_png/decode_png) decoded
    STRICTLY, value-checking true per-channel means; their n_bytes is
    the DECODED raster size w*h*3 (the compressed payload size is
    codec-dependent, not oracle-expressible). Every checked double is
    order-independent IEEE (integer sums < 2^53, final float32
    quantization replayed as CAST(.. AS REAL)), so the DuckDB twin
    reproduces them bit-exactly from the closed forms."""
    from prow_jobs_scraper_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        encode_wav,
        extract_features,
        media_from_docs,
    )

    d = _spread(spark, _t(spark, sf_dir, "documents"))
    media = media_from_docs(d)

    def nulls(*names):
        return [F.lit(None).cast("double").alias(c) for c in names]

    vid = extract_features(media.where(F.col("kind") == "video")).select(
        "media_id", "kind", "n_bytes",
        *nulls("dur_sec", "rms", "peak", "r_mean", "g_mean", "b_mean"))

    def gen_wav(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n = 160 + mid % 160          # Python % is nonnegative,
                a = mid % 251 + 2            # matching the oracle's
                c = mid % 97                 # ((x % m) + m) % m
                k = np.arange(n, dtype=np.int64)
                s = ((a * k + c) % 20001 - 10000).astype(np.int16)
                rows.append((mid, "audio",
                             bytearray(encode_wav(s, 16000)),
                             {"width": 0, "height": 0,
                              "sample_rate": 16000, "n_frames": 1}))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"])

    audio_media = (media.where(F.col("kind") == "audio")
                   .select("media_id")  # twin regenerates the payload
                   .mapInPandas(gen_wav, schema=MEDIA_SCHEMA))
    audio = extract_features(
        audio_media, deterministic_fake=False).select(
        "media_id", "kind", "n_bytes",
        F.element_at("feat", 1).cast("double").alias("dur_sec"),
        F.element_at("feat", 2).cast("double").alias("rms"),
        F.element_at("feat", 3).cast("double").alias("peak"),
        *nulls("r_mean", "g_mean", "b_mean"))

    def gen_png(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w = mid % 13 + 4             # == media_from_docs' meta
                h = (mid % 13 * 7) % 13 + 4  # (pmod arithmetic)
                a = mid % 251 + 2
                i = np.arange(w * h, dtype=np.int64)[:, None]
                ch = np.arange(3, dtype=np.int64)[None, :]
                px = ((a * i + 17 * ch) % 256).astype(
                    np.uint8).reshape(h, w, 3)
                rows.append((mid, "image",
                             bytearray(encode_png(px, filter_type=4)),
                             {"width": w, "height": h,
                              "sample_rate": 0, "n_frames": 1}))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"])

    img_media = (media.where(F.col("kind") == "image")
                 .select("media_id")  # twin regenerates the payload
                 .mapInPandas(gen_png, schema=MEDIA_SCHEMA))
    wcol = F.pmod(F.col("media_id"), F.lit(13)) + 4
    hcol = F.pmod(F.pmod(F.col("media_id"), F.lit(13)) * 7, F.lit(13)) + 4
    img = extract_features(img_media, deterministic_fake=False).select(
        "media_id", "kind",
        (wcol * hcol * 3).cast("long").alias("n_bytes"),
        *nulls("dur_sec", "rms", "peak"),
        F.element_at("feat", 1).cast("double").alias("r_mean"),
        F.element_at("feat", 2).cast("double").alias("g_mean"),
        F.element_at("feat", 3).cast("double").alias("b_mean"))
    return vid.unionByName(audio).unionByName(img)


def _bm25_compressed_topk(spark, sf_dir):
    """North-rule core, ORACLE-checked end-to-end: salted compressed
    index build → delta/varint codec → block-max conjunctive top-k, over
    the driver's documents table (pre-assigned doc_ids pass through
    build_index, so results carry the caller's ids). Same query and
    oracle as `bm25_topk` — the DuckDB SQL value-checks the ENTIRE
    compressed engine, not just the naive DataFrame plan. Rank+score
    equality between this entry and `bm25_topk` falls out of the two
    green rows. (Reference query shape: src/jobsautoreport/query.py:47-74.)"""
    import tempfile  # noqa: PLC0415

    from prow_jobs_scraper_spark.index.build import BuildConfig, build_index
    from prow_jobs_scraper_spark.search.compressed import search_topk

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"), "text")
    d = tempfile.mkdtemp(prefix="entry_cidx_")
    build_index(spark, docs, d, BuildConfig(n_ranges=8, n_buckets=4))
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    parts = []
    for op in ("and", "or"):
        # 'and' = block-max conjunctive kernel; 'or' = MaxScore
        # disjunctive kernel — BOTH compressed paths value-checked
        topk = search_topk(spark, d, "key agg", 10, operator=op)
        parts.append(topk.select(
            F.lit(op).alias("mode"), "doc_id",
            F.row_number().over(w).alias("rank"),
            F.round("score", 4).alias("score")))
    return parts[0].unionByName(parts[1])


def _search_aggs_indexed(spark, sf_dir):
    """ES `aggs` over the INDEX's qualifying set, oracle-checked: a
    bool query (match operator:or + range filter) resolves against
    posting blocks + doc_stats — which persists every non-text input
    column, the ES doc-values analogue — and a terms bucket agg with an
    avg sub-metric runs over the FULL qualifying set (ES rule: aggs see
    every match, not the top-k). The source corpus is never read at
    query time — at 10^12 turns this is the scale path for the
    reference's per-period report metrics (src/jobsautoreport/
    main.py:70-72 + report.py computes them client-side from hits)."""
    import tempfile  # noqa: PLC0415

    from prow_jobs_scraper_spark.index.build import BuildConfig, build_index
    from prow_jobs_scraper_spark.search.dsl import dsl_aggregate_indexed

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"), "text", "lang", "source",
        F.col("n_chars").cast("long").alias("n_chars"))
    d = tempfile.mkdtemp(prefix="entry_aidx_")
    build_index(spark, docs, d, BuildConfig(n_ranges=8, n_buckets=4))
    req = {
        "query": {"bool": {
            "must": [{"match": {"text": {"query": "key agg",
                                         "operator": "or"}}}],
            "filter": [{"range": {"n_chars": {"gte": 200}}}],
        }},
        # NESTED bucket aggs (round 4): terms > terms with a metric
        # leaf — the ES idiom for the reference's per-period per-type
        # tables (src/jobsautoreport/report.py:184-225); parent size
        # cuts by TOTAL doc_count, child size per parent bucket
        "aggs": {"by_lang": {"terms": {"field": "lang", "size": 3},
                 "aggs": {"by_source": {
                     "terms": {"field": "source", "size": 3},
                     "aggs": {"avg_chars": {"avg": {
                         "field": "n_chars"}}}}}}},
    }
    out = dsl_aggregate_indexed(spark, d, req)
    return out.select("key", "doc_count", "sub_key", "sub_doc_count",
                      F.round("avg_chars", 6).alias("avg_chars"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # NOTE on ordering: the driver's CORRECTNESS artifact has recorded
    # only the FIRST 50 entries in insertion order each round (41/44/50
    # rows as the contract grew to 53). The flagship and newest entries
    # therefore sit inside the first 50; five long-green TRIVIAL filters
    # (plain predicate/string-function shapes, each still covered by
    # pytest and the local oracle-replica gate in tests/test_entry.py)
    # are parked at the tail: boolean_flag_filter, regex_filter,
    # union_event_streams, url_paths, customer_ids_derived.
    return {
        "bm25_topk": _bm25_topk,
        "bm25_compressed_topk": _bm25_compressed_topk,
        "query_string_topk": _query_string_topk,
        "bm25_filtered_topk": _bm25_filtered_topk,
        "phrase_match": _phrase_match,
        "bool_dsl_topk": _bool_dsl_topk,
        "nested_bool_topk": _nested_bool_topk,
        "dismax_topk": _dismax_topk,
        "multi_match_topk": _multi_match_topk,
        "dsl_scan": _dsl_scan,
        "search_after_page": _search_after_page,
        "cleanup_duplicates": _cleanup_duplicates,
        "dsl_count": _dsl_count,
        "search_aggs_weekly": _search_aggs_weekly,
        "search_aggs_indexed": _search_aggs_indexed,
        "search_aggs_range": _search_aggs_range,
        "search_aggs_metrics": _search_aggs_metrics,
        "doc_fingerprints": _doc_fingerprints,
        "pricing_summary": _pricing_summary,
        "top_failing_users": _top_failing_users,
        "anti_join_customers": _anti_join_customers,
        "cost_by_segment": _cost_by_segment,
        "top_revenue_orders": _top_revenue_orders,
        "flakiness_users": _flakiness_users,
        "dedup_keep_first": _dedup_keep_first,
        "trends_weekly": _trends_weekly,
        # ten trivial operators value-checked in one row (P5/P2/U2/F4/
        # F1-F2/A2-U3 + P3-P4-P9 time-range, P6-P8 classifier, F3/F6
        # priority labels, F5/F10/S9 weekly partition names) — their
        # individual entries sit at the tail
        "trivial_filters_suite": _trivial_filters_suite,
        "exact_dedup": _exact_dedup,
        "unigram_jaccard": _unigram_jaccard,
        # quality is the merged ONE-SCAN per-doc QC feature row (quality
        # + token counts + language ID — their standalone entries sit at
        # the tail); the freed slots hold the round-5 training-pipeline
        # rows repetition_qc and contamination_check
        "quality": _quality,
        "repetition_qc": _repetition_qc,
        "contamination_check": _contamination_check,
        "pii_scrub": _pii_scrub,
        "span_dedup": _span_dedup,
        "hybrid_rrf_topk": _hybrid_rrf_topk,
        "enrich_orders": _enrich_orders,
        "first_match_enrich": _first_match_enrich,
        "order_lineitems_denorm": _order_lineitems_denorm,
        "event_state_counts": _event_state_counts,
        "brand_share_others": _brand_share_others,
        "order_ship_overlap": _order_ship_overlap,
        "composite_anti_join": _composite_anti_join,
        "embedding_dedup_pairs": _embedding_dedup_pairs,
        "minhash_candidates": _minhash_candidates,
        "dedup_clusters": _dedup_clusters,
        "simhash_pairs": _simhash_pairs,
        "lsh_ann_topk": _lsh_ann_topk,
        "ivf_ann_topk": _ivf_ann_topk,
        "ivfpq_ann_topk": _ivfpq_ann_topk,
        "media_features": _media_features,
        # ---- tail: trivial long-green filters (see NOTE above; all six
        # are ALSO value-checked inside the driver window by
        # trivial_filters_suite, and conjunctive_match's operator row
        # P11 keeps its in-window check via bm25_topk)
        "conjunctive_match": _conjunctive_match,
        "time_range_filter": _time_range_filter,
        "classifier": _classifier,
        "priority_labels": _priority_labels,
        "weekly_partition_names": _weekly_partition_names,
        "global_revenue": _global_revenue,
        "boolean_flag_filter": _boolean_flag_filter,
        "regex_filter": _regex_filter,
        "union_event_streams": _union_event_streams,
        "url_paths": _url_paths,
        "customer_ids_derived": _customer_ids_derived,
        "distinct_users": _distinct_users,
        # ANN brute-force cosine baseline: displaced to the tail round 5
        # to make room for search_aggs_metrics — the ANN component stays
        # value-checked IN-WINDOW by lsh_ann_topk / ivf_ann_topk /
        # ivfpq_ann_topk / embedding_dedup_pairs / hybrid_rrf_topk
        "similarity_topk": _similarity_topk,
        # P11' OR-match: displaced to the tail round 5 to make room for
        # query_string_topk — the or-operator shape stays value-checked
        # IN-WINDOW by bool_dsl_topk (operator:or must), dismax_topk and
        # multi_match_topk; this naive-executor row keeps its pytest +
        # replica coverage
        "bm25_topk_or": _bm25_topk_or,
        # per-doc QC features: displaced to the tail round 5 — BOTH stay
        # value-checked IN-WINDOW as columns of the merged quality row
        "token_counts": _token_counts,
        "language_id": _language_id,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

_TOKS = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"

_BM25_CORE = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
s AS (SELECT count(*)::DOUBLE n, avg(len(t))::DOUBLE avgdl FROM toks),
tf AS (
  SELECT doc_id, tok AS term, count(*)::DOUBLE tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  WHERE tok IN ('key','agg') GROUP BY 1, 2),
dl AS (SELECT doc_id, len(t)::DOUBLE dl FROM toks),
df AS (SELECT term, count(*)::DOUBLE df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1+(s.n-df.df+0.5)/(df.df+0.5))
             * tf.tf*2.2/(tf.tf+1.2*(0.25+0.75*dl.dl/s.avgdl))) AS score,
         count(*) AS nt
  FROM tf JOIN df USING(term) JOIN dl USING(doc_id) CROSS JOIN s
  GROUP BY 1)"""

# both match semantics from the one score CTE: 'and' requires every
# query term (nt = 2), 'or' is the ES match default (any term)
_BM25_SQL = _BM25_CORE + """
(SELECT 'and' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM sc WHERE nt = 2 ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
(SELECT 'or' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM sc ORDER BY score DESC, doc_id LIMIT 10)
"""

# standalone disjunctive form (the tail bm25_topk_or entry)
_BM25_OR_SQL = _BM25_CORE + """
SELECT doc_id,
       row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
       round(score, 4) AS score
FROM sc ORDER BY score DESC, doc_id LIMIT 10
"""

# standalone conjunctive form — the base the filtered twin derives from
_BM25_AND_SQL = _BM25_CORE + """
SELECT doc_id,
       row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
       round(score, 4) AS score
FROM sc WHERE nt = 2
ORDER BY sc.score DESC, doc_id LIMIT 10
"""

# ES bool twin: scoring CTEs identical (stats corpus-global), the filter
# applies between scoring and the top-k — exactly ES filter context
_BM25_FILTERED_SQL = _BM25_AND_SQL.replace(
    "FROM sc WHERE nt = 2",
    "FROM sc WHERE doc_id IN (SELECT doc_id FROM documents "
    "WHERE lang = 'en')")

# full bool-DSL twin of _BOOL_DSL_QUERY: must (or over key/agg, scored)
# + should (hash score added when present) + must_not (adjacency-exact
# phrase exclusion) + filter (term + range, score-neutral). Same BM25
# CTE shape; per-context contributions split with CASE so the filter
# context provably never touches the scores.
_BOOL_DSL_SQL = f"""
WITH toks AS (SELECT doc_id, {{toks}} AS t FROM documents),
s AS (SELECT count(*)::DOUBLE n, avg(len(t))::DOUBLE avgdl FROM toks),
tf AS (
  SELECT doc_id, tok AS term, count(*)::DOUBLE tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  WHERE tok IN ('key','agg','hash') GROUP BY 1, 2),
dl AS (SELECT doc_id, len(t)::DOUBLE dl FROM toks),
df AS (SELECT term, count(*)::DOUBLE df FROM tf GROUP BY 1),
ph AS (
  SELECT doc_id FROM toks
  WHERE position(' table hash ' IN
                 ' ' || array_to_string(t, ' ') || ' ') > 0),
sc AS (
  SELECT tf.doc_id,
         sum(CASE WHEN term IN ('key','agg') THEN
               ln(1+(s.n-df.df+0.5)/(df.df+0.5))
               * tf.tf*2.2/(tf.tf+1.2*(0.25+0.75*dl.dl/s.avgdl))
             ELSE 0 END) AS must_score,
         sum(CASE WHEN term = 'hash' THEN
               ln(1+(s.n-df.df+0.5)/(df.df+0.5))
               * tf.tf*2.2/(tf.tf+1.2*(0.25+0.75*dl.dl/s.avgdl))
             ELSE 0 END) AS should_score,
         sum(CASE WHEN term IN ('key','agg') THEN 1 ELSE 0 END) AS must_nt
  FROM tf JOIN df USING(term) JOIN dl USING(doc_id) CROSS JOIN s
  GROUP BY 1)
SELECT sc.doc_id,
       row_number() OVER (
         ORDER BY must_score + should_score DESC, sc.doc_id) AS rank,
       round(must_score + should_score, 4) AS score
FROM sc JOIN documents d ON sc.doc_id = d.doc_id
WHERE must_nt >= 1 AND d.lang = 'en' AND d.n_chars >= 100
  AND sc.doc_id NOT IN (SELECT doc_id FROM ph)
ORDER BY must_score + should_score DESC, sc.doc_id LIMIT 10
""".replace("{toks}", _TOKS)

# dis_max twin of _DISMAX_QUERY: per-clause scores from the same BM25
# CTE shape; dis_max combine = best matched child + 0.3 * the rest, the
# should-range (n_chars >= 400) gates via minimum_should_match only
_DISMAX_SQL = f"""
WITH toks AS (SELECT doc_id, {{toks}} AS t FROM documents),
s AS (SELECT count(*)::DOUBLE n, avg(len(t))::DOUBLE avgdl FROM toks),
tf AS (
  SELECT doc_id, tok AS term, count(*)::DOUBLE tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  WHERE tok IN ('key','agg','hash') GROUP BY 1, 2),
dl AS (SELECT doc_id, len(t)::DOUBLE dl FROM toks),
df AS (SELECT term, count(*)::DOUBLE df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         sum(CASE WHEN term IN ('key','agg') THEN
               ln(1+(s.n-df.df+0.5)/(df.df+0.5))
               * tf.tf*2.2/(tf.tf+1.2*(0.25+0.75*dl.dl/s.avgdl))
             ELSE 0 END) AS s1,
         sum(CASE WHEN term IN ('key','agg') THEN 1 ELSE 0 END) AS m1,
         sum(CASE WHEN term = 'hash' THEN
               ln(1+(s.n-df.df+0.5)/(df.df+0.5))
               * tf.tf*2.2/(tf.tf+1.2*(0.25+0.75*dl.dl/s.avgdl))
             ELSE 0 END) AS s2,
         sum(CASE WHEN term = 'hash' THEN 1 ELSE 0 END) AS m2
  FROM tf JOIN df USING(term) JOIN dl USING(doc_id) CROSS JOIN s
  GROUP BY 1),
dm AS (
  SELECT sc.doc_id,
         CASE WHEN m1 > 0 AND m2 > 0
                THEN greatest(s1, s2) + 0.3*(s1 + s2 - greatest(s1, s2))
              WHEN m1 > 0 THEN s1 ELSE s2 END AS score
  FROM sc JOIN documents d ON sc.doc_id = d.doc_id
  WHERE (m1 > 0 OR m2 > 0) AND d.n_chars >= 400),
exps AS (
  SELECT x AS term
  FROM (SELECT DISTINCT unnest(t) AS x FROM toks)
  WHERE levenshtein(x, 'mash') <= 2),
tf2 AS (
  SELECT doc_id, tok AS term, count(*)::DOUBLE tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  WHERE tok IN (SELECT term FROM exps) GROUP BY 1, 2),
df2 AS (SELECT term, count(*)::DOUBLE df FROM tf2 GROUP BY 1),
fz AS (
  SELECT tf2.doc_id,
         max(ln(1+(s.n-df2.df+0.5)/(df2.df+0.5))
             * tf2.tf*2.2/(tf2.tf+1.2*(0.25+0.75*dl.dl/s.avgdl)))
           AS score
  FROM tf2 JOIN df2 USING(term) JOIN dl USING(doc_id) CROSS JOIN s
  GROUP BY 1),
rx AS (
  -- regexp leaf in filter context: the engine's anchored predicate
  -- string replayed VERBATIM (shared Java/RE2 subset by design)
  SELECT sc.doc_id, s1 AS score
  FROM sc JOIN documents d ON sc.doc_id = d.doc_id
  WHERE m1 > 0
    AND regexp_extract(d.source, '^(?:src1[0-9])$', 0) = d.source),
cix AS (
  -- case_insensitive twin: the engine's lower()-both-sides predicates
  -- replayed verbatim; must_not is null-guarded like the engine
  SELECT sc.doc_id, s1 AS score
  FROM sc JOIN documents d ON sc.doc_id = d.doc_id
  WHERE m1 > 0
    AND lower(d.lang) = lower('EN')
    AND NOT coalesce(lower(d.source) LIKE lower('SRC1%'), FALSE)),
cs AS (
  -- constant_score: qualification only (token membership + lang
  -- regexp); every hit is pinned to boost=2.5 in the final select
  SELECT tk.doc_id
  FROM toks tk JOIN documents d ON tk.doc_id = d.doc_id
  WHERE list_contains(tk.t, 'hash')
    AND regexp_extract(d.lang, '^(?:(en|e[a-z]))$', 0) = d.lang),
pexp AS (
  -- match_phrase_prefix expansion set: FIRST 4 's*' vocabulary terms
  -- in term order (the Lucene term-dict rule the engine implements)
  SELECT x AS term
  FROM (SELECT DISTINCT unnest(t) AS x FROM toks)
  WHERE x LIKE 's%' ORDER BY x LIMIT 4),
tf3 AS (
  SELECT doc_id, tok AS term, count(*)::DOUBLE tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  WHERE tok IN (SELECT term FROM pexp) GROUP BY 1, 2),
df3 AS (SELECT term, count(*)::DOUBLE df FROM tf3 GROUP BY 1),
hb AS (
  SELECT tf.doc_id,
         ln(1+(s.n-df.df+0.5)/(df.df+0.5))
         * tf.tf*2.2/(tf.tf+1.2*(0.25+0.75*dl.dl/s.avgdl)) AS score
  FROM tf JOIN df USING(term) JOIN dl USING(doc_id) CROSS JOIN s
  WHERE tf.term = 'hash'),
fsq AS (
  -- function_score twin: score_mode=sum over (regexp-filtered weight
  -- 2, unfiltered log1p fvf), boost_mode=multiply against the 'key
  -- agg' BM25 sum — the engine's value SQL replayed verbatim
  SELECT sc.doc_id,
         s1 * ((CASE WHEN regexp_extract(d.source,
                          '^(?:src1[0-9])$', 0) = d.source
                     THEN 2.0 ELSE 0.0 END)
               + log10((0.01 * coalesce(cast(d.n_chars as double),
                                        1.0)) + 1)) AS score
  FROM sc JOIN documents d ON sc.doc_id = d.doc_id
  WHERE m1 > 0),
pp AS (
  -- best completed phrase: adjacency-gated BM25 over the phrase's
  -- terms ('hash' + the expansion), max over matching expansions
  -- (dis_max tie_breaker 0 — the engine's documented desugaring)
  SELECT tk.doc_id,
         max(hb.score
             + ln(1+(s.n-df3.df+0.5)/(df3.df+0.5))
               * tf3.tf*2.2/(tf3.tf+1.2*(0.25+0.75*dl.dl/s.avgdl)))
           AS score
  FROM toks tk
  JOIN pexp e
    ON position(' hash ' || e.term || ' '
                IN ' ' || array_to_string(tk.t, ' ') || ' ') > 0
  JOIN hb ON hb.doc_id = tk.doc_id
  JOIN tf3 ON tf3.doc_id = tk.doc_id AND tf3.term = e.term
  JOIN df3 ON df3.term = e.term
  JOIN dl ON dl.doc_id = tk.doc_id
  CROSS JOIN s
  GROUP BY 1)
(SELECT 'dismax' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM dm ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
(SELECT 'fuzzy' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM fz ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
(SELECT 'regexp' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM rx ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
(SELECT 'ci' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM cix ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
(SELECT 'cscore' AS mode, doc_id,
        row_number() OVER (ORDER BY doc_id) AS rank,
        2.5::DOUBLE AS score
 FROM cs ORDER BY doc_id LIMIT 10)
UNION ALL
(SELECT 'pprefix' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM pp ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
(SELECT 'boosting' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM (SELECT doc_id,
              s1 * CASE WHEN m2 > 0 THEN 0.3 ELSE 1.0 END AS score
       FROM sc WHERE m1 > 0)
 ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
(SELECT 'fscore' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM fsq ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
-- script_score twin: the painless arithmetic replayed verbatim —
-- _score * ln(2 + n_chars/100.0) over the 'key agg' or-match
(SELECT 'sscore' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM (SELECT sc.doc_id,
              s1 * ln(2 + cast(d.n_chars as double) / 100.0) AS score
       FROM sc JOIN documents d ON sc.doc_id = d.doc_id
       WHERE m1 > 0)
 ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
-- match_bool_prefix twin: match('hash') OR best 's*'-expansion match
-- (bool-should sum over the matched sides, either qualifies)
(SELECT 'mbp' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM (
   SELECT coalesce(hb.doc_id, bx.doc_id) AS doc_id,
          coalesce(hb.score, 0) + coalesce(bx.score, 0) AS score
   FROM hb FULL JOIN (
     SELECT tf3.doc_id,
            max(ln(1+(s.n-df3.df+0.5)/(df3.df+0.5))
                * tf3.tf*2.2/(tf3.tf+1.2*(0.25+0.75*dl.dl/s.avgdl)))
              AS score
     FROM tf3 JOIN df3 USING(term) JOIN dl USING(doc_id) CROSS JOIN s
     GROUP BY 1) bx ON hb.doc_id = bx.doc_id)
 ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
-- rank_feature twin: hash BM25 + saturation(n_chars, pivot 100);
-- exact doubles both sides (integer-valued epochs/counts)
(SELECT 'rankf' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM (SELECT hb.doc_id,
              hb.score + d.n_chars/(d.n_chars + 100.0) AS score
       FROM hb JOIN documents d ON hb.doc_id = d.doc_id)
 ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
-- distance_feature twin: 2d/(2d + |ts - 2024-01-15|) at second
-- resolution over the error events (epoch == unix_timestamp on
-- whole-second data)
(SELECT 'distf' AS mode, event_id AS doc_id,
        row_number() OVER (ORDER BY score DESC, event_id) AS rank,
        round(score, 4) AS score
 FROM (SELECT event_id,
              172800.0/(172800.0 + abs(epoch(ts) - 1705276800.0))
                AS score
       FROM events WHERE event_type = 'error')
 ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
-- pinned twin: docs 5 then 3 at the BASE - rank*STEP ladder, the
-- organic 'hash' ranking after them (doc 5's organic BM25 add is
-- below the double ulp at BASE in both engines; doc 3 qualifies via
-- its pin alone)
(SELECT 'pinned' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM (
   SELECT d.doc_id,
          CASE d.doc_id WHEN 5 THEN 1.7014122e38
                        WHEN 3 THEN 1.7014122e38 - 1e30
               ELSE hb.score END AS score
   FROM documents d LEFT JOIN hb ON hb.doc_id = d.doc_id
   WHERE d.doc_id IN (5, 3) OR hb.doc_id IS NOT NULL)
 ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
-- wrapper twin: identical rows to the dismax mode (the clause only
-- changed transport encoding)
(SELECT 'wrap' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM dm ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
-- terms_set twin (CoveringQuery): matched-term count over
-- key/agg/hash (the sc CTE's m1+m2) must clear the per-doc
-- minimum trunc(least(3, n_chars/300)) clamped >= 1 (the engine's
-- cast-to-long truncates; DuckDB CAST rounds, hence trunc()); score
-- = sum of the MATCHED terms' BM25 (s1 + s2)
(SELECT 'tset' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM (SELECT sc.doc_id, s1 + s2 AS score
       FROM sc JOIN documents d ON sc.doc_id = d.doc_id
       WHERE m1 + m2 >= greatest(1.0, trunc(least(3.0,
             cast(d.n_chars AS DOUBLE) / 300.0))))
 ORDER BY score DESC, doc_id LIMIT 10)
""".replace("{toks}", _TOKS)

# multi_match most_fields twin of _MULTI_MATCH_QUERY: each field scored
# with its OWN stats (df/avgdl over that field's tokens), matched-field
# scores summed; 'src3' only exists in `source`, 'key' only in `text`
_MULTI_MATCH_SQL = f"""
WITH tt AS (SELECT doc_id, {_TOKS} AS t FROM documents),
st AS (SELECT doc_id,
              regexp_extract_all(lower(source), '{TOKEN_RE}') AS t
       FROM documents),
s1 AS (SELECT count(*)::DOUBLE n, avg(len(t))::DOUBLE avgdl FROM tt),
s2 AS (SELECT count(*)::DOUBLE n, avg(len(t))::DOUBLE avgdl FROM st),
tf1 AS (
  SELECT doc_id, tok AS term, count(*)::DOUBLE tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM tt)
  WHERE tok IN ('src3','key') GROUP BY 1, 2),
tf2 AS (
  SELECT doc_id, tok AS term, count(*)::DOUBLE tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM st)
  WHERE tok IN ('src3','key') GROUP BY 1, 2),
df1 AS (SELECT term, count(*)::DOUBLE df FROM tf1 GROUP BY 1),
df2 AS (SELECT term, count(*)::DOUBLE df FROM tf2 GROUP BY 1),
dl1 AS (SELECT doc_id, len(t)::DOUBLE dl FROM tt),
dl2 AS (SELECT doc_id, len(t)::DOUBLE dl FROM st),
sc1 AS (
  SELECT tf1.doc_id,
         sum(ln(1+(s1.n-df1.df+0.5)/(df1.df+0.5))
             * tf1.tf*2.2/(tf1.tf+1.2*(0.25+0.75*dl1.dl/s1.avgdl)))
           AS score
  FROM tf1 JOIN df1 USING(term) JOIN dl1 USING(doc_id) CROSS JOIN s1
  GROUP BY 1),
sc2 AS (
  SELECT tf2.doc_id,
         sum(ln(1+(s2.n-df2.df+0.5)/(df2.df+0.5))
             * tf2.tf*2.2/(tf2.tf+1.2*(0.25+0.75*dl2.dl/s2.avgdl)))
           AS score
  FROM tf2 JOIN df2 USING(term) JOIN dl2 USING(doc_id) CROSS JOIN s2
  GROUP BY 1),
u AS (
  SELECT doc_id, coalesce(sc1.score, 0) + coalesce(sc2.score, 0) AS score
  FROM sc1 FULL OUTER JOIN sc2 USING (doc_id)),
likebag AS (
  -- the analyzed like-text of _MLT_QUERY, verbatim
  SELECT unnest(['hash','hash','join','join','scan','the',
                 'data','data']) AS term),
ltf AS (SELECT term, count(*)::INT tf FROM likebag GROUP BY 1),
cdf AS (
  SELECT tok AS term, count(DISTINCT doc_id)::DOUBLE df
  FROM (SELECT doc_id, unnest(t) AS tok FROM tt) GROUP BY 1),
msel AS (
  -- the MltClause selection rule: tf/df bounds, tf*idf rank
  -- (score desc, term asc), max_query_terms cap
  SELECT lt.term
  FROM ltf lt JOIN cdf USING (term) CROSS JOIN s1
  WHERE lt.tf >= 2 AND cdf.df >= 5
  ORDER BY lt.tf * ln(1 + (s1.n - cdf.df + 0.5) / (cdf.df + 0.5))
             DESC, lt.term
  LIMIT 25),
mtf AS (
  SELECT doc_id, tok AS term, count(*)::DOUBLE tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM tt)
  WHERE tok IN (SELECT term FROM msel) GROUP BY 1, 2),
mu AS (
  -- msm resolves to max(1, floor(0.3*n_sel)) = 1 here: any doc with
  -- >=1 matched selected term qualifies, scored by the BM25 sum
  SELECT mtf.doc_id,
         sum(ln(1+(s1.n-cdf.df+0.5)/(cdf.df+0.5))
             * mtf.tf*2.2/(mtf.tf+1.2*(0.25+0.75*dl1.dl/s1.avgdl)))
           AS score
  FROM mtf JOIN cdf USING(term) JOIN dl1 USING(doc_id) CROSS JOIN s1
  GROUP BY 1)
(SELECT 'fields' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM u ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
(SELECT 'mlt' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM mu ORDER BY score DESC, doc_id LIMIT 10)
"""

# range/filters/stats aggs twin of _search_aggs_range: the range part
# replays multi-membership as a UNION ALL of the three bucket selects
# (overlap-safe), the filters part as three independent counts; ES
# default range keys are literals on both sides so no float formatting
# can drift
_AGGS_RANGE_SQL = """
WITH p AS (SELECT value FROM events WHERE event_type = 'purchase'),
r AS (
  SELECT '*-10.0' AS key, value FROM p WHERE value < 10
  UNION ALL
  SELECT '10.0-100.0', value FROM p WHERE value >= 10 AND value < 100
  UNION ALL
  SELECT '100.0-*', value FROM p WHERE value >= 100)
SELECT 'range' AS shape, key, count(*) AS doc_count,
       count(value) AS v_count,
       round(min(value), 4) AS v_min, round(max(value), 4) AS v_max,
       round(avg(value), 4) AS v_avg, round(sum(value), 4) AS v_sum
FROM r GROUP BY key
UNION ALL
SELECT 'filters', f.key, f.doc_count,
       NULL::BIGINT, NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE,
       NULL::DOUBLE
FROM (
  SELECT 'errors' AS key, count(*) AS doc_count FROM events
  WHERE event_type = 'error' HAVING count(*) > 0
  UNION ALL
  SELECT 'big', count(*) FROM events WHERE value >= 100
  HAVING count(*) > 0
  UNION ALL
  SELECT 'all', count(*) FROM events HAVING count(*) > 0) f
UNION ALL
SELECT 'terms_missing', t.key, t.doc_count,
       NULL::BIGINT, NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE,
       NULL::DOUBLE
FROM (
  SELECT CASE WHEN doc_id % 5 = 0 THEN 'none' ELSE source END AS key,
         count(*) AS doc_count
  FROM documents GROUP BY 1 HAVING count(*) >= 30) t
"""

# histogram / percentiles / cardinality twin of _search_aggs_metrics —
# the date-math window resolves to [2024-01-08, 2024-01-22) (Mondays;
# /w truncation, +1w then /w), percentiles replay as quantile_cont
# (both engines compute exact linear interpolation; round(6) absorbs
# last-ulp interpolation-order differences), cardinality as
# count(DISTINCT ..)
_AGGS_METRICS_SQL = """
WITH w AS (
  SELECT * FROM events
  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
    AND ts <  TIMESTAMP '2024-01-22 00:00:00')
SELECT 'histogram' AS shape,
       CAST(floor(value / 50.0) * 50.0 AS VARCHAR) AS key,
       count(*) AS doc_count, NULL::DOUBLE AS val
FROM w GROUP BY 2 HAVING count(*) >= 2
UNION ALL
SELECT 'percentile', k, NULL::BIGINT, round(v, 6)
FROM (
  SELECT unnest(['p25', 'p50', 'p75', 'p95']) AS k,
         unnest([quantile_cont(value, 0.25), quantile_cont(value, 0.50),
                 quantile_cont(value, 0.75), quantile_cont(value, 0.95)])
           AS v
  FROM w)
UNION ALL
SELECT 'cardinality', 'user_id', count(DISTINCT user_id), NULL::DOUBLE
FROM w
UNION ALL
-- pipeline twin: running count + avg delta over the weekly buckets
-- (duckdb date_trunc('week') is a DATE — render via TIMESTAMP so the
-- string matches Spark's 'yyyy-MM-dd HH:mm:ss' cast)
SELECT 'pipeline', CAST(CAST(key AS TIMESTAMP) AS VARCHAR),
       running, round(delta, 6)
FROM (
  SELECT key, sum(c) OVER (ORDER BY key) AS running,
         a - lag(a) OVER (ORDER BY key) AS delta
  FROM (SELECT date_trunc('week', ts) AS key, count(*) AS c,
               avg(value) AS a FROM w GROUP BY 1))
UNION ALL
-- composite twin: lexicographic after-cut, source-order page of 5
(SELECT 'composite', event_type || '|' || user_id::VARCHAR,
        count(*), round(max(value), 6)
 FROM w
 WHERE event_type IS NOT NULL AND user_id IS NOT NULL
   AND (event_type > 'error'
        OR (event_type = 'error' AND user_id > 100))
 GROUP BY event_type, user_id
 ORDER BY event_type, user_id LIMIT 5)
UNION ALL
-- sibling twin: avg_bucket(_count) over the final terms buckets
-- (doc_count desc / key asc, size 10) as a constant column
SELECT 'sibling', key, doc_count, round(mean_sz, 6) FROM (
  SELECT key, doc_count, avg(doc_count) OVER () AS mean_sz FROM (
    SELECT event_type AS key, count(*) AS doc_count
    FROM w WHERE event_type IS NOT NULL
    GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT 10))
UNION ALL
-- stats_bucket twin: five stats of the per-bucket avg metric,
-- unpivoted (count cast to DOUBLE like the Spark stack)
SELECT 'sibling_stats', k, NULL::BIGINT, round(v, 6) FROM (
  SELECT unnest(['count', 'min', 'max', 'avg', 'sum']) AS k,
         unnest([CAST(count(av) AS DOUBLE), min(av), max(av),
                 avg(av), sum(av)]) AS v
  FROM (SELECT event_type AS key, count(*) AS doc_count,
               avg(value) AS av
        FROM w WHERE event_type IS NOT NULL
        GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT 10))
UNION ALL
-- significant_terms twin: JLH over fg (window) vs bg (whole table),
-- min_doc_count 3 (the ES significant_terms default), positive
-- significance only, score desc / key asc, size 10
(SELECT 'sig', fg.k || '|' || bg.b::VARCHAR, fg.f,
        round((fg.f*1.0/tot.ft - bg.b*1.0/tot.bt)
              * ((fg.f*1.0/tot.ft)/(bg.b*1.0/tot.bt)), 6) AS s
 FROM (SELECT event_type k, count(*) f FROM w
       WHERE event_type IS NOT NULL GROUP BY 1) fg
 JOIN (SELECT event_type k, count(*) b FROM events
       WHERE event_type IS NOT NULL GROUP BY 1) bg USING (k)
 CROSS JOIN (SELECT
    (SELECT count(*) FROM w WHERE event_type IS NOT NULL) ft,
    (SELECT count(*) FROM events WHERE event_type IS NOT NULL) bt) tot
 WHERE fg.f >= 3 AND fg.f*1.0/tot.ft > bg.b*1.0/tot.bt
 ORDER BY s DESC, fg.k ASC LIMIT 10)
UNION ALL
-- rare_terms twin: exact long-tail buckets, a max metric riding along
SELECT 'rare', o_custkey::VARCHAR, count(*), round(max(o_totalprice), 6)
FROM orders GROUP BY o_custkey HAVING count(*) <= 2
UNION ALL
-- global twin: the sub-agg over the WHOLE table (query ignored)
(SELECT 'global', event_type, count(*), NULL::DOUBLE
 FROM events WHERE event_type IS NOT NULL
 GROUP BY 2 ORDER BY count(*) DESC, event_type ASC LIMIT 10)
UNION ALL
-- bucket_sort twin: two-level ORDER — the terms agg's own
-- (count desc, key) cut, then the pipeline's (metric desc) page
SELECT 'bsort', key, doc_count, round(av, 6) FROM (
  SELECT key, doc_count, av FROM (
    SELECT event_type AS key, count(*) AS doc_count,
           avg(value) AS av
    FROM w WHERE event_type IS NOT NULL
    GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT 10)
  ORDER BY av DESC, key ASC LIMIT 3 OFFSET 1)
UNION ALL
-- extended_stats twin: eight stats unpivoted; population variance
SELECT 'estats', k, NULL::BIGINT, round(v, 3) FROM (
  SELECT unnest(['count', 'min', 'max', 'avg', 'sum',
                 'sum_of_squares', 'variance', 'std_deviation']) AS k,
         unnest([CAST(count(value) AS DOUBLE), min(value), max(value),
                 avg(value), sum(value), sum(value * value),
                 var_pop(value), stddev_pop(value)]) AS v
  FROM w)
UNION ALL
-- adjacency_matrix twin: singles + alphabetical-pair intersections,
-- non-empty only, key-sorted
SELECT 'adjacency', k, c, NULL::DOUBLE FROM (
  SELECT 'err' k, count(*) c FROM w WHERE event_type = 'error'
  UNION ALL SELECT 'hi', count(*) FROM w WHERE value >= 400
  UNION ALL SELECT 'wk1', count(*) FROM w
            WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
  UNION ALL SELECT 'err&hi', count(*) FROM w
            WHERE event_type = 'error' AND value >= 400
  UNION ALL SELECT 'err&wk1', count(*) FROM w
            WHERE event_type = 'error'
              AND ts < TIMESTAMP '2024-01-15 00:00:00'
  UNION ALL SELECT 'hi&wk1', count(*) FROM w
            WHERE value >= 400
              AND ts < TIMESTAMP '2024-01-15 00:00:00')
WHERE c > 0
UNION ALL
-- weighted_avg twin: sum(v*w)/sum(w) over lineitem
SELECT 'wavg', 'price_by_qty', NULL::BIGINT,
       round(sum(l_extendedprice * l_quantity)
             / sum(l_quantity::DOUBLE), 4)
FROM lineitem
UNION ALL
-- bucket_script/bucket_selector twin: the engine's compiled script
-- text (CAST(.. AS DOUBLE) arithmetic) replayed verbatim over the
-- final terms buckets
SELECT 'bscript', key, doc_count, round(ratio, 6) FROM (
  SELECT key, doc_count,
         CAST(av AS DOUBLE) / CAST(doc_count AS DOUBLE) * 10 AS ratio
  FROM (SELECT event_type AS key, count(*) AS doc_count,
               avg(value) AS av
        FROM w WHERE event_type IS NOT NULL
        GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT 10))
WHERE CAST(doc_count AS DOUBLE) > 930
UNION ALL
-- gap-fill twin: generate_series over the extended_bounds-widened
-- day range, zero-count days NULL-joined in, running sum over the
-- FILLED sequence (duckdb days are DATEs — render via TIMESTAMP)
SELECT 'gapfill', CAST(CAST(key AS TIMESTAMP) AS VARCHAR),
       doc_count, CAST(run AS DOUBLE) FROM (
  SELECT d.key, coalesce(b.c, 0) AS doc_count,
         sum(coalesce(b.c, 0)) OVER (ORDER BY d.key) AS run
  FROM (SELECT unnest(generate_series(
          least(TIMESTAMP '2024-01-05',
                (SELECT date_trunc('day', min(ts)) FROM w)),
          greatest(TIMESTAMP '2024-01-24',
                   (SELECT date_trunc('day', max(ts)) FROM w)),
          INTERVAL 1 DAY)) AS key) d
  LEFT JOIN (SELECT date_trunc('day', ts) AS key, count(*) AS c
             FROM w GROUP BY 1) b ON d.key = b.key)
UNION ALL
-- percentile_ranks twin: exact pct of non-null values <= v
SELECT 'prank', k, NULL::BIGINT, round(v, 6) FROM (
  SELECT unnest(['le100', 'le250_5']) AS k,
         unnest([100.0 * avg(CASE WHEN value <= 100 THEN 1.0
                             WHEN value IS NOT NULL THEN 0.0 END),
                 100.0 * avg(CASE WHEN value <= 250.5 THEN 1.0
                             WHEN value IS NOT NULL THEN 0.0 END)])
           AS v
  FROM w)
UNION ALL
-- metric `missing` twin: value NULLed on 'error' rows, filled with 0
SELECT 'mmiss', k, dc, round(v, 6) FROM (
  SELECT unnest(['avg0', 'p50', 'vc']) AS k,
         unnest([NULL, NULL, count(coalesce(val2, 0))]::BIGINT[]) AS dc,
         unnest([avg(coalesce(val2, 0)),
                 quantile_cont(coalesce(val2, 0), 0.5),
                 NULL]) AS v
  FROM (SELECT CASE WHEN event_type <> 'error' THEN value END AS val2
        FROM w))
UNION ALL
SELECT 'mmiss_terms', event_type, count(*),
       round(avg(coalesce(
         CASE WHEN event_type <> 'error' THEN value END, 0)), 6)
FROM w GROUP BY event_type
UNION ALL
-- time_zone twin: NY local-midnight day buckets keyed by UTC instant;
-- timezone() chained through an explicit 'UTC' leg so the replay is
-- independent of the connection's session TimeZone
SELECT 'tzday',
       CAST(CAST(timezone('UTC', timezone('America/New_York',
         date_trunc('day', timezone('America/New_York',
           timezone('UTC', ts))))) AS TIMESTAMP) AS VARCHAR),
       count(*), NULL::DOUBLE
FROM w GROUP BY 2
UNION ALL
-- multi_terms twin: the engine's flattened pipe-joined key replayed
-- as a plain GROUP BY; count-desc/key-asc order makes the size cut
-- integer-deterministic in both engines
SELECT 'mterms', key, dc, round(v, 6) FROM (
  SELECT event_type || '|' || CAST(user_id AS VARCHAR) AS key,
         count(*) AS dc, avg(value) AS v
  FROM w GROUP BY 1 HAVING count(*) >= 2
  ORDER BY dc DESC, key LIMIT 12)
UNION ALL
-- boxplot twin: exact interpolated quartiles (both engines compute
-- quantile_cont-equivalent exact interpolation)
SELECT 'bxp', k, NULL::BIGINT, round(v, 6) FROM (
  SELECT unnest(['min', 'q1', 'q2', 'q3', 'max']) AS k,
         unnest([quantile_cont(value, 0.00), quantile_cont(value, 0.25),
                 quantile_cont(value, 0.50), quantile_cont(value, 0.75),
                 quantile_cont(value, 1.00)]) AS v
  FROM w)
UNION ALL
-- MAD twins: exact median(|x - median|), bare + per-event_type
SELECT 'mad', 'value', NULL::BIGINT,
       round(quantile_cont(abs(value -
         (SELECT quantile_cont(value, 0.5) FROM w)), 0.5), 6)
FROM w
UNION ALL
SELECT 'mad_terms', w.event_type, count(*),
       round(quantile_cont(abs(value - m), 0.5), 6)
FROM w JOIN (SELECT event_type AS et2, quantile_cont(value, 0.5) AS m
             FROM w GROUP BY 1) med ON w.event_type = med.et2
GROUP BY w.event_type
UNION ALL
-- string_stats twin: length stats + the Shannon entropy formula
-- -(1/N)*sum(n*log2 n) + log2 N over the char counts
SELECT 'sstats', k, NULL::BIGINT, round(v, 6) FROM (
  SELECT unnest(['count', 'min_length', 'max_length', 'avg_length',
                 'entropy']) AS k,
         unnest([(SELECT count(event_type) FROM w)::DOUBLE,
                 (SELECT min(length(event_type)) FROM w)::DOUBLE,
                 (SELECT max(length(event_type)) FROM w)::DOUBLE,
                 (SELECT avg(length(event_type)) FROM w),
                 (SELECT -sum(cnt * log2(cnt)) / sum(cnt)
                         + log2(sum(cnt))
                  FROM (SELECT count(*) AS cnt
                        FROM (SELECT unnest(string_split(event_type,
                                                         '')) AS ch
                              FROM w) GROUP BY ch))]) AS v)
UNION ALL
-- terms include/exclude twin: the same Lucene-anchored whole-match
-- idiom the regexp meta clause uses, exclude winning on overlap
SELECT 'tincl', event_type, count(*), NULL::DOUBLE
FROM w
WHERE regexp_extract(event_type, '^(?:(view|click|signup))$', 0)
        = event_type
  AND NOT regexp_extract(event_type, '^(?:click)$', 0) = event_type
GROUP BY event_type
UNION ALL
-- top_metrics twins: the winning doc by sort; ORDER BY replays the
-- engine's struct tiebreak (ts unique at sf0.01, so it is inert)
SELECT 'tmx', k, NULL::BIGINT, round(v, 6) FROM (
  SELECT unnest(['value', 'user_id']) AS k,
         unnest([value, user_id::DOUBLE]) AS v
  FROM (SELECT value, user_id FROM w WHERE ts IS NOT NULL
        ORDER BY ts DESC, value DESC, user_id DESC LIMIT 1))
UNION ALL
SELECT 'tmxt', event_type, cnt, round(val, 6) FROM (
  SELECT event_type,
         count(*) OVER (PARTITION BY event_type) AS cnt,
         value AS val,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts ASC, value ASC) AS rn
  FROM w WHERE ts IS NOT NULL AND event_type IS NOT NULL)
WHERE rn = 1
UNION ALL
-- normalize twins: percent_of_sum on counts + population z-score on
-- the day-bucket avg(value), replayed as window functions
SELECT 'nrm', key || '|' || which, dc::BIGINT, round(val, 6) FROM (
  SELECT key, dc,
         unnest(['pos', 'zs']) AS which,
         unnest([dc / sum(dc) OVER (),
                 (m - avg(m) OVER ()) / stddev_pop(m) OVER ()]) AS val
  FROM (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP)::VARCHAR AS key,
               count(*)::DOUBLE AS dc, avg(value) AS m
        FROM w GROUP BY 1))
UNION ALL
-- auto_date_histogram twin: the ladder resolves to 1d on this
-- window's bounds (span ~14 days, target 20; 12h would need 28
-- buckets) — the key embeds the label so a ladder drift mismatches;
-- contiguous day sequence between the OBSERVED bounds, epoch-floored
-- day == date_trunc('day')
SELECT 'auto', '1d|' || CAST(CAST(d.key AS TIMESTAMP) AS VARCHAR),
       coalesce(b.c, 0), NULL::DOUBLE FROM
  (SELECT unnest(generate_series(
     (SELECT date_trunc('day', min(ts)) FROM w),
     (SELECT date_trunc('day', max(ts)) FROM w),
     INTERVAL 1 DAY)) AS key) d
  LEFT JOIN (SELECT date_trunc('day', ts) AS key, count(*) AS c
             FROM w GROUP BY 1) b ON d.key = b.key
UNION ALL
-- matrix_stats twin: closed-form raw moments over (value, v2) — the
-- same arithmetic the engine compiles (sample n/(n-1) variance and
-- covariance, skew m3/m2^1.5, Pearson kurtosis m4/m2^2, correlation
-- cov/sqrt(var_i*var_j)); one row per (field, other, stat)
SELECT 'mstat', k, n, round(v, 6)
FROM (
  WITH mv AS (
    SELECT count(*)::BIGINT n,
           avg(x) m1x, avg(x*x) m2x, avg(x*x*x) m3x, avg(x*x*x*x) m4x,
           avg(y) m1y, avg(y*y) m2y, avg(y*y*y) m3y, avg(y*y*y*y) m4y,
           avg(x*y) mxy
    FROM (SELECT value AS x, (user_id % 50)::DOUBLE AS y FROM w
          WHERE value IS NOT NULL AND user_id IS NOT NULL)),
  cm AS (
    SELECT n, m1x, m1y,
           m2x - m1x*m1x AS c2x,
           m3x - 3*m1x*m2x + 2*m1x*m1x*m1x AS c3x,
           m4x - 4*m1x*m3x + 6*m1x*m1x*m2x - 3*m1x*m1x*m1x*m1x AS c4x,
           m2y - m1y*m1y AS c2y,
           m3y - 3*m1y*m2y + 2*m1y*m1y*m1y AS c3y,
           m4y - 4*m1y*m3y + 6*m1y*m1y*m2y - 3*m1y*m1y*m1y*m1y AS c4y,
           mxy - m1x*m1y AS cxy
    FROM mv)
  SELECT n,
    unnest(['value|value|mean', 'value|value|var', 'value|value|skew',
            'value|value|kurt', 'value|value|cov', 'value|value|corr',
            'value|v2|mean', 'value|v2|var', 'value|v2|skew',
            'value|v2|kurt', 'value|v2|cov', 'value|v2|corr',
            'v2|value|mean', 'v2|value|var', 'v2|value|skew',
            'v2|value|kurt', 'v2|value|cov', 'v2|value|corr',
            'v2|v2|mean', 'v2|v2|var', 'v2|v2|skew',
            'v2|v2|kurt', 'v2|v2|cov', 'v2|v2|corr']) AS k,
    unnest([
      m1x, c2x * n / (n - 1), c3x / pow(c2x, 1.5), c4x / (c2x * c2x),
        c2x * n / (n - 1),
        (c2x * n / (n - 1)) / sqrt((c2x * n / (n - 1))
                                   * (c2x * n / (n - 1))),
      m1x, c2x * n / (n - 1), c3x / pow(c2x, 1.5), c4x / (c2x * c2x),
        cxy * n / (n - 1),
        (cxy * n / (n - 1)) / sqrt((c2x * n / (n - 1))
                                   * (c2y * n / (n - 1))),
      m1y, c2y * n / (n - 1), c3y / pow(c2y, 1.5), c4y / (c2y * c2y),
        cxy * n / (n - 1),
        (cxy * n / (n - 1)) / sqrt((c2y * n / (n - 1))
                                   * (c2x * n / (n - 1))),
      m1y, c2y * n / (n - 1), c3y / pow(c2y, 1.5), c4y / (c2y * c2y),
        c2y * n / (n - 1),
        (c2y * n / (n - 1)) / sqrt((c2y * n / (n - 1))
                                   * (c2y * n / (n - 1)))]) AS v
  FROM cm)
UNION ALL
-- scripted-sources twin: the same arithmetic the painless subset
-- compiles (script terms key user_id*2+1, script avg value*3+2);
-- NULL keys drop (the terms rule), count-desc/key-asc cut
SELECT 'sscript', CAST(key AS VARCHAR), doc_count, round(av, 6)
FROM (
  SELECT user_id * 2.0 + 1 AS key, count(*) AS doc_count,
         avg(value * 3.0 + 2) AS av
  FROM w WHERE user_id IS NOT NULL
  GROUP BY 1 ORDER BY doc_count DESC, key LIMIT 7)
"""

# repetition_qc twin: identical multi-line augmentation, then the
# Gopher statistics replayed RELATIONALLY (unnest + group + window)
# where the engine uses per-row higher-order array expressions — an
# independent computation path, not a transliteration. Top-gram
# tie-break: max count, then lexicographically greatest gram (the
# engine's struct array_max order).
_REPETITION_QC_SQL = f"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 4 = 0 THEN chr(10) || text ELSE '' END
         || CASE WHEN doc_id % 6 = 0
                 THEN chr(10) || substr(text, 1, 40) ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN chr(10) || chr(10) || 'para two repeated here'
                 ELSE '' END
         || CASE WHEN doc_id % 10 = 0
                 THEN chr(10) || chr(10) || 'para two repeated here'
                 ELSE '' END AS text
  FROM documents),
base AS (
  SELECT doc_id, text, length(text) AS n_chars, {_TOKS} AS toks,
         list_filter(string_split(text, chr(10)),
                     x -> trim(x) <> '') AS lines,
         list_filter(regexp_split_to_array(text, '\\n\\n+'),
                     x -> trim(x) <> '') AS paras
  FROM aug),
lstats AS (
  SELECT doc_id,
         len(lines)::BIGINT AS n_lines,
         CASE WHEN len(lines) > 0 THEN
           (len(lines) - len(list_distinct(lines)))::DOUBLE / len(lines)
           ELSE 0.0 END AS dup_line_frac,
         CASE WHEN coalesce(list_sum(list_transform(lines,
                x -> length(x))), 0) > 0 THEN
           (list_sum(list_transform(lines, x -> length(x)))
            - list_sum(list_transform(list_distinct(lines),
                                      x -> length(x))))::DOUBLE
             / list_sum(list_transform(lines, x -> length(x)))
           ELSE 0.0 END AS dup_line_char_frac,
         CASE WHEN len(paras) > 0 THEN
           (len(paras) - len(list_distinct(paras)))::DOUBLE / len(paras)
           ELSE 0.0 END AS dup_para_frac,
         CASE WHEN coalesce(list_sum(list_transform(paras,
                x -> length(x))), 0) > 0 THEN
           (list_sum(list_transform(paras, x -> length(x)))
            - list_sum(list_transform(list_distinct(paras),
                                      x -> length(x))))::DOUBLE
             / list_sum(list_transform(paras, x -> length(x)))
           ELSE 0.0 END AS dup_para_char_frac
  FROM base),
g2 AS (SELECT doc_id, gram, count(*) AS cnt FROM (
         SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                  i -> array_to_string(toks[i:i+1], ' '))) AS gram
         FROM base) GROUP BY 1, 2),
g3 AS (SELECT doc_id, gram, count(*) AS cnt FROM (
         SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
                  i -> array_to_string(toks[i:i+2], ' '))) AS gram
         FROM base) GROUP BY 1, 2),
g4 AS (SELECT doc_id, gram, count(*) AS cnt FROM (
         SELECT doc_id, unnest(list_transform(range(1, len(toks) - 2),
                  i -> array_to_string(toks[i:i+3], ' '))) AS gram
         FROM base) GROUP BY 1, 2),
g5 AS (SELECT doc_id, gram, count(*) AS cnt FROM (
         SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3),
                  i -> array_to_string(toks[i:i+4], ' '))) AS gram
         FROM base) GROUP BY 1, 2),
g10 AS (SELECT doc_id, gram, count(*) AS cnt FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(toks) - 8),
                   i -> array_to_string(toks[i:i+9], ' '))) AS gram
          FROM base) GROUP BY 1, 2),
t2 AS (SELECT doc_id, cnt, gram FROM (
         SELECT doc_id, gram, cnt, row_number() OVER (
           PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) AS rn
         FROM g2) WHERE rn = 1),
t3 AS (SELECT doc_id, cnt, gram FROM (
         SELECT doc_id, gram, cnt, row_number() OVER (
           PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) AS rn
         FROM g3) WHERE rn = 1),
t4 AS (SELECT doc_id, cnt, gram FROM (
         SELECT doc_id, gram, cnt, row_number() OVER (
           PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) AS rn
         FROM g4) WHERE rn = 1),
d5 AS (SELECT doc_id,
              coalesce(sum(cnt) FILTER (WHERE cnt >= 2), 0)::DOUBLE
                / sum(cnt) AS f
       FROM g5 GROUP BY 1),
d10 AS (SELECT doc_id,
               coalesce(sum(cnt) FILTER (WHERE cnt >= 2), 0)::DOUBLE
                 / sum(cnt) AS f
        FROM g10 GROUP BY 1)
SELECT b.doc_id, l.n_lines,
       round(l.dup_line_frac, 6) AS dup_line_frac,
       round(l.dup_line_char_frac, 6) AS dup_line_char_frac,
       round(l.dup_para_frac, 6) AS dup_para_frac,
       round(l.dup_para_char_frac, 6) AS dup_para_char_frac,
       round(coalesce(CASE WHEN b.n_chars > 0 THEN
         t2.cnt * length(t2.gram)::DOUBLE / b.n_chars END, 0.0), 6)
         AS top_2gram_char_frac,
       round(coalesce(CASE WHEN b.n_chars > 0 THEN
         t3.cnt * length(t3.gram)::DOUBLE / b.n_chars END, 0.0), 6)
         AS top_3gram_char_frac,
       round(coalesce(CASE WHEN b.n_chars > 0 THEN
         t4.cnt * length(t4.gram)::DOUBLE / b.n_chars END, 0.0), 6)
         AS top_4gram_char_frac,
       round(coalesce(d5.f, 0.0), 6) AS dup_5gram_frac,
       round(coalesce(d10.f, 0.0), 6) AS dup_10gram_frac
FROM base b
JOIN lstats l USING (doc_id)
LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
LEFT JOIN t4 USING (doc_id)
LEFT JOIN d5 USING (doc_id) LEFT JOIN d10 USING (doc_id)
"""

# contamination_check twin: the engine joins (xxhash64(gram), gram)
# with the benchmark side broadcast; the twin joins the gram STRINGS —
# value-identical because the hash only prunes comparisons.
_CONTAMINATION_SQL = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
grams AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 11),
           i -> array_to_string(toks[i:i+12], ' '))) AS g
  FROM t),
bench AS (
  SELECT DISTINCT unnest(list_transform(range(1, len(toks[1:20]) - 11),
           i -> array_to_string((toks[1:20])[i:i+12], ' '))) AS g
  FROM t WHERE doc_id % 37 = 0),
agg AS (
  SELECT gr.doc_id, count(*) AS n_grams, count(b.g) AS n_contaminated
  FROM grams gr LEFT JOIN bench b ON gr.g = b.g
  GROUP BY 1)
SELECT t.doc_id,
       coalesce(a.n_grams, 0)::BIGINT AS n_grams,
       coalesce(a.n_contaminated, 0)::BIGINT AS n_contaminated,
       round(CASE WHEN coalesce(a.n_grams, 0) > 0 THEN
         a.n_contaminated::DOUBLE / a.n_grams ELSE 0.0 END, 6)
         AS contaminated_frac,
       coalesce(a.n_contaminated, 0) > 0 AS is_contaminated
FROM t LEFT JOIN agg a USING (doc_id)
"""

# pii_scrub twin: identical augmentation (residue classes over doc_id)
# and the same 4-stage count-then-mask chain — the patterns live in the
# Java/RE2 shared regex subset, so DuckDB replays them verbatim
_PII_SCRUB_SQL = r"""
WITH aug AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 3 = 0
            THEN ' contact user' || doc_id::VARCHAR || '@example.com'
            ELSE '' END
    || CASE WHEN doc_id % 4 = 0
            THEN ' see https://data.example.com/d/' || doc_id::VARCHAR
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' from 10.0.' || (doc_id % 256)::VARCHAR || '.7'
            ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN ' call 555-000-1234' ELSE '' END
    || CASE WHEN doc_id % 11 = 0 THEN ' or (555) 000-9876' ELSE '' END
    || CASE WHEN doc_id % 13 = 0 THEN ' cell +1 555.222.3333' ELSE '' END
      AS s0
  FROM documents),
e AS (SELECT doc_id,
        len(regexp_extract_all(s0,
            '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}'))::INT
          AS n_emails,
        regexp_replace(s0,
            '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
            '<EMAIL>', 'g') AS s1 FROM aug),
u AS (SELECT doc_id, n_emails,
        len(regexp_extract_all(s1, 'https?://[^\s]+'))::INT AS n_urls,
        regexp_replace(s1, 'https?://[^\s]+', '<URL>', 'g') AS s2 FROM e),
i AS (SELECT doc_id, n_emails, n_urls,
        len(regexp_extract_all(s2,
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::INT AS n_ipv4s,
        regexp_replace(s2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                       '<IP>', 'g') AS s3 FROM u)
SELECT doc_id, n_emails, n_urls, n_ipv4s,
       len(regexp_extract_all(s3, '(\+1[-. ]?)?(\(\d{3}\)[-. ]?|\b\d{3}[-. ])\d{3}[-. ]\d{4}\b'))::INT
         AS n_phones,
       md5(regexp_replace(s3, '(\+1[-. ]?)?(\(\d{3}\)[-. ]?|\b\d{3}[-. ])\d{3}[-. ]\d{4}\b',
                          '<PHONE>', 'g')) AS scrub_md5
FROM i
"""

# span_dedup twin: same union corpus (documents + relabeled first-50
# copies), same 20-token chunking (list slice == Spark F.slice), same
# keep-first rule (row_number over (doc_id, chunk_idx) per chunk), same
# ordered rebuild (string_agg ORDER BY chunk_idx == array_sort struct)
_SPAN_DEDUP_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1099511627776, text FROM documents WHERE doc_id < 50),
toks AS (SELECT doc_id, {_TOKS} AS t FROM corpus),
nz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
ch AS (SELECT doc_id, (start / 20)::BIGINT AS chunk_idx,
              array_to_string(t[start+1 : start+20], ' ') AS chunk
       FROM (SELECT doc_id, t, unnest(range(0, n, 20)) AS start FROM nz)),
rk AS (SELECT doc_id, chunk_idx, chunk,
              row_number() OVER (PARTITION BY chunk
                                 ORDER BY doc_id, chunk_idx) AS rn
       FROM ch)
SELECT doc_id, count(*) AS n_chunks,
       sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
       md5(coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
                               ORDER BY chunk_idx), '')) AS dedup_md5
FROM rk GROUP BY doc_id
"""

# helpers.scan twin of _SCAN_QUERY: full qualifying set, no ranking —
# any doc containing >=1 must term, filters applied, every row kept
_DSL_SCAN_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
hit AS (SELECT DISTINCT doc_id
        FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
        WHERE tok IN ('key','agg'))
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN hit USING (doc_id)
WHERE d.lang = 'en' AND d.n_chars >= 100
"""

# search_after twin: the cursor-reached page 2 must equal rows 6-10 of
# the one-shot (score desc, doc_id asc) ordering — same scoring CTEs as
# _BM25_SQL, disjunctive (no nt filter), offset instead of a cursor
_SEARCH_AFTER_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
s AS (SELECT count(*)::DOUBLE n, avg(len(t))::DOUBLE avgdl FROM toks),
tf AS (
  SELECT doc_id, tok AS term, count(*)::DOUBLE tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  WHERE tok IN ('key','agg') GROUP BY 1, 2),
dl AS (SELECT doc_id, len(t)::DOUBLE dl FROM toks),
df AS (SELECT term, count(*)::DOUBLE df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1+(s.n-df.df+0.5)/(df.df+0.5))
             * tf.tf*2.2/(tf.tf+1.2*(0.25+0.75*dl.dl/s.avgdl))) AS score
  FROM tf JOIN df USING(term) JOIN dl USING(doc_id) CROSS JOIN s
  GROUP BY 1)
SELECT doc_id, round(score, 4) AS score
FROM sc ORDER BY score DESC, doc_id LIMIT 5 OFFSET 5
"""

# hybrid RRF twin: the _BM25_OR CTE shape at depth 20 + the cosine CTE
# from similarity_topk at depth 20, fused with 1/(60+rank). All division
# through ::DOUBLE (DuckDB's bare 1.0 is DECIMAL -> decimal sums would
# drift from Spark's double under the type-tagged driver hash).
_HYBRID_RRF_SQL = f"""
WITH toks AS (SELECT doc_id, {{toks}} AS t FROM documents),
s AS (SELECT count(*)::DOUBLE n, avg(len(t))::DOUBLE avgdl FROM toks),
tf AS (
  SELECT doc_id, tok AS term, count(*)::DOUBLE tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  WHERE tok IN ('key','agg') GROUP BY 1, 2),
dl AS (SELECT doc_id, len(t)::DOUBLE dl FROM toks),
df AS (SELECT term, count(*)::DOUBLE df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1+(s.n-df.df+0.5)/(df.df+0.5))
             * tf.tf*2.2/(tf.tf+1.2*(0.25+0.75*dl.dl/s.avgdl))) AS score
  FROM tf JOIN df USING(term) JOIN dl USING(doc_id) CROSS JOIN s
  GROUP BY 1),
bm AS (SELECT doc_id,
              row_number() OVER (ORDER BY score DESC, doc_id) AS rank
       FROM sc),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT vec_id,
         list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                (SELECT qv FROM q)) AS c
  FROM embeddings),
sr AS (SELECT vec_id,
              row_number() OVER (ORDER BY c DESC, vec_id) AS rank
       FROM sims),
u AS (
  SELECT doc_id, 1.0::DOUBLE/(60 + rank) AS contrib
  FROM bm WHERE rank <= 20
  UNION ALL
  SELECT vec_id AS doc_id, 1.0::DOUBLE/(60 + rank) AS contrib
  FROM sr WHERE rank <= 20),
f AS (SELECT doc_id, sum(contrib) AS rrf_score,
             count(*) AS n_lists
      FROM u GROUP BY 1)
SELECT doc_id,
       row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank,
       round(rrf_score, 6) AS rrf_score, n_lists
FROM f ORDER BY f.rrf_score DESC, doc_id LIMIT 10
""".replace("{toks}", _TOKS)

# match_phrase twin: BM25 scoring over the phrase's distinct terms
# (identical CTE shape), gated on (a) the exact adjacency-in-order
# check — the same space-joined-tokens substring predicate the engine
# uses — and (b) the slop-2 sloppy-phrase rule, replayed with nested
# list_filter lambdas: positions p0 of 'table' (slot 0) and p1 of
# 'hash' (slot 1) exist with displacement range
# greatest(p0-0, p1-1) - least(p0-0, p1-1) <= 2 (the Lucene rule the
# engine's sloppy_exists_expr implements)
_PHRASE_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
s AS (SELECT count(*)::DOUBLE n, avg(len(t))::DOUBLE avgdl FROM toks),
tf AS (
  SELECT doc_id, tok AS term, count(*)::DOUBLE tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  WHERE tok IN ('table','hash') GROUP BY 1, 2),
dl AS (SELECT doc_id, len(t)::DOUBLE dl FROM toks),
df AS (SELECT term, count(*)::DOUBLE df FROM tf GROUP BY 1),
tfs AS (
  SELECT doc_id, count(*)::DOUBLE tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  WHERE tok = 'scan' GROUP BY 1),
ph AS (
  SELECT doc_id FROM toks
  WHERE position(' table hash ' IN
                 ' ' || array_to_string(t, ' ') || ' ') > 0),
ph2 AS (
  SELECT doc_id FROM toks
  WHERE len(list_filter(
          list_filter(range(1, len(t)+1), i -> t[i] = 'table'),
          p0 -> len(list_filter(
                  list_filter(range(1, len(t)+1), j -> t[j] = 'hash'),
                  p1 -> greatest(p0 - 0, p1 - 1)
                        - least(p0 - 0, p1 - 1) <= 2)) > 0)) > 0),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1+(s.n-df.df+0.5)/(df.df+0.5))
             * tf.tf*2.2/(tf.tf+1.2*(0.25+0.75*dl.dl/s.avgdl))) AS score
  FROM tf JOIN df USING(term) JOIN dl USING(doc_id) CROSS JOIN s
  GROUP BY 1)
(SELECT 'exact' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM sc WHERE doc_id IN (SELECT doc_id FROM ph)
 ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
(SELECT 'slop2' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM sc WHERE doc_id IN (SELECT doc_id FROM ph2)
 ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
-- span_near ordered, slop 2: exists p0 < p1 with p1 - p0 - 1 <= 2
(SELECT 'span_ord' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM sc WHERE doc_id IN (
   SELECT doc_id FROM toks
   WHERE len(list_filter(
           list_filter(range(1, len(t)+1), i -> t[i] = 'table'),
           p0 -> len(list_filter(
                   list_filter(range(1, len(t)+1), j -> t[j] = 'hash'),
                   p1 -> p0 < p1 AND p1 - p0 <= 3)) > 0)) > 0)
 ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
-- span_near unordered, slop 2: |p1 - p0| - 1 <= 2, either direction
(SELECT 'span_unord' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM sc WHERE doc_id IN (
   SELECT doc_id FROM toks
   WHERE len(list_filter(
           list_filter(range(1, len(t)+1), i -> t[i] = 'table'),
           p0 -> len(list_filter(
                   list_filter(range(1, len(t)+1), j -> t[j] = 'hash'),
                   p1 -> abs(p1 - p0) <= 3)) > 0)) > 0)
 ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
-- span_first end=3: 'hash' first occurs within the first 3 tokens
-- (1-based list_position <= 3 == Lucene 0-based p+1 <= 3); score =
-- the term's own BM25
(SELECT 'span_first3' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM (
   SELECT tf.doc_id,
          ln(1+(s.n-df.df+0.5)/(df.df+0.5))
          * tf.tf*2.2/(tf.tf+1.2*(0.25+0.75*dl.dl/s.avgdl)) AS score
   FROM tf JOIN df USING(term) JOIN dl USING(doc_id) CROSS JOIN s
   WHERE tf.term = 'hash'
     AND tf.doc_id IN (
       SELECT doc_id FROM toks
       WHERE list_position(t, 'hash') BETWEEN 1 AND 3))
 ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
-- span_or twin: bool-should msm=1 over (span_first3, ordered slop-2
-- window) — matched children's scores SUM (hash BM25 counted by each
-- matching child)
(SELECT 'span_or' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM (
   SELECT coalesce(f.doc_id, wn.doc_id) AS doc_id,
          coalesce(f.score, 0) + coalesce(wn.score, 0) AS score
   FROM (
     SELECT tf.doc_id,
            ln(1+(s.n-df.df+0.5)/(df.df+0.5))
            * tf.tf*2.2/(tf.tf+1.2*(0.25+0.75*dl.dl/s.avgdl)) AS score
     FROM tf JOIN df USING(term) JOIN dl USING(doc_id) CROSS JOIN s
     WHERE tf.term = 'hash'
       AND tf.doc_id IN (
         SELECT doc_id FROM toks
         WHERE list_position(t, 'hash') BETWEEN 1 AND 3)) f
   FULL JOIN (
     SELECT sc.doc_id, sc.score
     FROM sc WHERE sc.doc_id IN (
       SELECT doc_id FROM toks
       WHERE len(list_filter(
               list_filter(range(1, len(t)+1), i -> t[i] = 'table'),
               p0 -> len(list_filter(
                       list_filter(range(1, len(t)+1),
                                   j -> t[j] = 'hash'),
                       p1 -> p0 < p1 AND p1 - p0 <= 3)) > 0)) > 0)) wn
   ON f.doc_id = wn.doc_id)
 ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
-- intervals any_of twin: ordered max_gaps-2 window score (sc, both
-- terms) FULL JOIN the plain 'scan' BM25 — matched children sum
(SELECT 'iv_any' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM (
   SELECT coalesce(wv.doc_id, sn.doc_id) AS doc_id,
          coalesce(wv.score, 0) + coalesce(sn.score, 0) AS score
   FROM (
     SELECT sc.doc_id, sc.score
     FROM sc WHERE sc.doc_id IN (
       SELECT doc_id FROM toks
       WHERE len(list_filter(
               list_filter(range(1, len(t)+1), i -> t[i] = 'table'),
               p0 -> len(list_filter(
                       list_filter(range(1, len(t)+1),
                                   j -> t[j] = 'hash'),
                       p1 -> p0 < p1 AND p1 - p0 <= 3)) > 0)) > 0)) wv
   FULL JOIN (
     SELECT tfs.doc_id,
            ln(1+(s.n-(SELECT count(*) FROM tfs)+0.5)
               /((SELECT count(*) FROM tfs)+0.5))
            * tfs.tf*2.2/(tfs.tf+1.2*(0.25+0.75*dl.dl/s.avgdl))
              AS score
     FROM tfs JOIN dl USING(doc_id) CROSS JOIN s) sn
   ON wv.doc_id = sn.doc_id)
 ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
-- span_not twin: a 'hash' occurrence with NO 'table' at q in [p-1, p]
-- (pre=1, post=0 — "hash not immediately preceded by table"); score =
-- the include term's BM25
(SELECT 'span_not' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM (
   SELECT tf.doc_id,
          ln(1+(s.n-df.df+0.5)/(df.df+0.5))
          * tf.tf*2.2/(tf.tf+1.2*(0.25+0.75*dl.dl/s.avgdl)) AS score
   FROM tf JOIN df USING(term) JOIN dl USING(doc_id) CROSS JOIN s
   WHERE tf.term = 'hash'
     AND tf.doc_id IN (
       SELECT doc_id FROM toks
       WHERE len(list_filter(
               list_filter(range(1, len(t)+1), i -> t[i] = 'hash'),
               p -> len(list_filter(
                      list_filter(range(1, len(t)+1),
                                  j -> t[j] = 'table'),
                      q -> q >= p - 1 AND q <= p)) = 0)) > 0))
 ORDER BY score DESC, doc_id LIMIT 10)
"""

_FLAKINESS_SQL = """
WITH e AS (
  SELECT user_id,
         CASE WHEN event_type = 'error' THEN 0.0 ELSE 1.0 END AS s,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events),
d AS (
  SELECT user_id, rn, n,
         abs(s - lag(s) OVER (PARTITION BY user_id ORDER BY rn)) AS t,
         CASE WHEN n > 2 THEN 0.1 + 0.9*(rn-2)::DOUBLE/(n-2) ELSE 1.0 END AS w
  FROM e)
SELECT user_id,
       round(coalesce(sum(t*w) FILTER (rn > 1) / sum(w) FILTER (rn > 1), 0.0),
             6) AS flakiness
FROM d GROUP BY user_id
"""


# DuckDB replica of dedup.shingles_of for n=3: token 3-grams, or one
# whole-doc shingle when the doc has fewer than 3 tokens
_SH3 = ("CASE WHEN len(t) >= 3 THEN "
        "list_transform(range(1, len(t)-1), "
        "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) "
        "ELSE [concat_ws(' ', t)] END")


def _jaccard_sql(threshold: float, shingle_n: int = 1) -> str:
    """Exact all-pairs distinct-shingle Jaccard at a threshold — the
    ground truth both for the exact AllPairs entry (unigrams, 0.5) and
    as the 100%-recall gate on the MinHash candidate generator
    (3-gram shingles, 0.5)."""
    shingles = "t" if shingle_n == 1 else _SH3
    return f"""
        WITH toks0 AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        toks AS (
          SELECT doc_id, list_distinct({shingles}) AS t FROM toks0),
        sz AS (SELECT doc_id, len(t) AS n FROM toks),
        flat AS (SELECT doc_id, unnest(t) AS tok FROM toks),
        shared AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS sh
          FROM flat a JOIN flat b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
               round(sh::DOUBLE / (sa.n + sb.n - sh), 6) AS jaccard
        FROM shared
        JOIN sz sa ON sa.doc_id = id_a
        JOIN sz sb ON sb.doc_id = id_b
        WHERE sh::DOUBLE / (sa.n + sb.n - sh) >= {threshold}
    """


# DuckDB replica of the FULL simhash pipeline over the md5-derived
# 60-bit token hash (byte-identical to the Spark expression, see
# dedup.md5_token_hash): tf-weighted ±1 votes per bit, sign → bit,
# fingerprint, then the Hamming ≤ 3 pair set the banded Spark path must
# reproduce exactly (banding is pure pruning — pigeonhole-lossless).
_SIMHASH_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
flat AS (SELECT doc_id, unnest(t) AS tok FROM toks),
h AS (SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 15))::UBIGINT::BIGINT AS th
      FROM flat),
votes AS (
  SELECT doc_id, i,
         sum(CASE WHEN (th >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h, range(60) r(i) GROUP BY doc_id, i),
fp AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN (1::BIGINT << i::INT) ELSE 0 END)::BIGINT
           AS f
  FROM votes GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.f, b.f))::INT AS hamming
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
"""


# DuckDB replica of the FULL winnowing-fingerprint pipeline over the
# md5-derived 60-bit token hash: per-doc rolling polynomial hashes of
# 4-token windows, Σ h[j]·base^(3−j) in uint64 wraparound (HUGEINT
# products reduced mod 2^64 term-by-term — th < 2^60 and pow < 2^64, so
# each product < 2^124 fits HUGEINT), min over windows, then the uint64
# min reinterpreted as signed int64 exactly as numpy's astype does.
# Docs shorter than the window use one window of their full length with
# powers base^(len−1−j); empty docs fingerprint to 0.
_FP_P1 = 1099511628211          # base^1 mod 2^64
_FP_P2 = 956575116354345        # base^2 mod 2^64
_FP_P3 = 624165263380053675     # base^3 mod 2^64
_FP_M = "18446744073709551616"  # 2^64 (parses as HUGEINT)

_FINGERPRINT_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_transform({_TOKS},
           tok -> ('0x' || substr(md5(tok), 1, 15))::UBIGINT::HUGEINT)
           AS th
  FROM documents),
fpu AS (
  SELECT doc_id,
    CASE
      WHEN len(th) = 0 THEN 0::HUGEINT
      WHEN len(th) = 1 THEN th[1]
      WHEN len(th) = 2 THEN
        ((th[1] * {_FP_P1}) % {_FP_M} + th[2]) % {_FP_M}
      WHEN len(th) = 3 THEN
        ((th[1] * {_FP_P2}) % {_FP_M} + (th[2] * {_FP_P1}) % {_FP_M}
         + th[3]) % {_FP_M}
      ELSE list_min(list_transform(range(1, len(th) - 2),
        i -> ((th[i] * {_FP_P3}) % {_FP_M}
              + (th[i+1] * {_FP_P2}) % {_FP_M}
              + (th[i+2] * {_FP_P1}) % {_FP_M}
              + th[i+3]) % {_FP_M}))
    END AS v
  FROM toks)
SELECT doc_id,
       (CASE WHEN v >= 9223372036854775808::HUGEINT
             THEN v - {_FP_M} ELSE v END)::BIGINT AS fingerprint
FROM fpu
"""


def _lsh_ann_sql(n_planes: int = 10, seed: int = 42, multi_probe: int = 2,
                 dim: int = 64, k: int = 10) -> str:
    """DuckDB replica of the FULL persisted-LSH ANN path: recompute each
    row's signature from the same seeded hyperplanes (embedded as SQL
    literals — deterministic given (dim, n_planes, seed)), keep rows
    within Hamming ≤ multi_probe of the query's signature (exactly the
    probe set lsh_probe_topk prunes to), exact cosine top-k inside."""
    from prow_jobs_scraper_spark.operators.similarity import hyperplanes

    pl = hyperplanes(dim, n_planes, seed)
    bits = " + ".join(
        "(CASE WHEN list_inner_product(e, ["
        + ", ".join(repr(float(x)) for x in pl[i])
        + f"]) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes))
    return f"""
        WITH base AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings),
        sigs AS (SELECT vec_id, e, {bits} AS sig FROM base),
        q AS (SELECT e AS qv, sig AS qsig FROM sigs WHERE vec_id = 0),
        cand AS (
          SELECT vec_id, list_cosine_similarity(e, (SELECT qv FROM q)) AS c
          FROM sigs
          WHERE bit_count(xor(sig, (SELECT qsig FROM q))) <= {multi_probe}),
        rk AS (SELECT vec_id, c,
                      row_number() OVER (ORDER BY c DESC, vec_id) AS rank
               FROM cand),
        brk AS (SELECT vec_id,
                       list_cosine_similarity(e, (SELECT qv FROM q)) AS c,
                       row_number() OVER (
                         ORDER BY list_cosine_similarity(
                           e, (SELECT qv FROM q)) DESC, vec_id) AS rank
                FROM base),
        -- knn twins: the ES dense-vector score transforms replayed —
        -- knn_cos = (1+cos)/2 * boost 2 (== 1+cos exactly: /2 and *2
        -- are power-of-two fp ops) over the label>=1 PRE-filter;
        -- knn_l2 = 1/(1+d^2) (list_distance^2 vs the engine's direct
        -- square-sum differ ~1 ulp, absorbed by round(,4))
        kcs AS (SELECT vec_id,
                       1.0 + list_cosine_similarity(e, (SELECT qv FROM q))
                         AS s
                FROM base WHERE label >= 1),
        kcr AS (SELECT vec_id, s,
                       row_number() OVER (ORDER BY s DESC, vec_id) AS rank
                FROM kcs),
        kls AS (SELECT vec_id,
                       1.0 / (1.0 + list_distance(e, (SELECT qv FROM q))
                                    ** 2) AS s
                FROM base),
        klr AS (SELECT vec_id, s,
                       row_number() OVER (ORDER BY s DESC, vec_id) AS rank
                FROM kls)
        SELECT 'lsh' AS mode, vec_id, rank, round(c, 4) AS cosine
        FROM rk WHERE rank <= {k}
        UNION ALL
        SELECT 'brute' AS mode, vec_id, rank, round(c, 4) AS cosine
        FROM brk WHERE rank <= {k}
        UNION ALL
        SELECT 'knn_cos' AS mode, vec_id, rank, round(s, 4) AS cosine
        FROM kcr WHERE rank <= {k}
        UNION ALL
        SELECT 'knn_l2' AS mode, vec_id, rank, round(s, 4) AS cosine
        FROM klr WHERE rank <= {k}
    """


# DuckDB replica of the persisted-IVF ANN path with centroids="head":
# centroid pick (lowest 16 ids), per-row argmax-dot assignment, top-4
# probe lists for the query, exact cosine rescoring inside those lists.
_IVF_ANN_SQL = """
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cents AS (SELECT vec_id AS list_id, e AS ce,
                 sqrt(list_inner_product(e, e)) AS cn
          FROM base WHERE vec_id < 16),
q AS (SELECT e AS qv FROM base WHERE vec_id = 0),
probes AS (
  SELECT list_id FROM cents, q
  ORDER BY list_inner_product(ce, qv) / cn DESC, list_id
  LIMIT 4),
scored AS (
  SELECT b.vec_id, c.list_id,
         list_inner_product(b.e, c.ce)
           / (sqrt(list_inner_product(b.e, b.e)) * c.cn) AS d
  FROM base b CROSS JOIN cents c),
asn AS (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d DESC, list_id) AS rn
    FROM scored) WHERE rn = 1),
cand AS (
  SELECT a.vec_id, list_cosine_similarity(b.e, (SELECT qv FROM q)) AS c
  FROM asn a JOIN base b USING (vec_id)
  WHERE a.list_id IN (SELECT list_id FROM probes)),
rk AS (SELECT vec_id, c, row_number() OVER (ORDER BY c DESC, vec_id) AS rank
       FROM cand)
SELECT vec_id, rank, round(c, 4) AS cosine FROM rk WHERE rank <= 10
"""


def _dedup_clusters_sql() -> str:
    """Component labels via transitive closure (recursive CTE) over the
    SAME exact pair set as the minhash_candidates oracle — cluster_id =
    min reachable id, singletons label themselves."""
    return f"""
        WITH RECURSIVE pairs AS (
          SELECT id_a, id_b FROM ({_jaccard_sql(0.5, shingle_n=3)})),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(a, b) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u),
        labels AS (
          SELECT a AS doc_id, least(a, min(b)) AS cluster_id
          FROM reach GROUP BY a)
        SELECT d.doc_id,
               coalesce(l.cluster_id, d.doc_id) AS cluster_id,
               CASE WHEN coalesce(l.cluster_id, d.doc_id) = d.doc_id
                    THEN 1 ELSE 0 END::INT AS is_canonical
        FROM documents d LEFT JOIN labels l USING (doc_id)
    """


# nested-bool twin of _NESTED_BOOL_QUERY: the must-child is a
# should-group over single-term AND matches, so score = sum of the
# PRESENT terms' BM25 and qual = >=1 present; the must_not-child is the
# conjunction (has 'hash' AND lang='de') — excluded together, never
# separately
_NESTED_BOOL_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
s AS (SELECT count(*)::DOUBLE n, avg(len(t))::DOUBLE avgdl FROM toks),
tf AS (
  SELECT doc_id, tok AS term, count(*)::DOUBLE tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  WHERE tok IN ('key','agg','hash') GROUP BY 1, 2),
dl AS (SELECT doc_id, len(t)::DOUBLE dl FROM toks),
df AS (SELECT term, count(*)::DOUBLE df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         sum(CASE WHEN term IN ('key','agg') THEN
               ln(1+(s.n-df.df+0.5)/(df.df+0.5))
               * tf.tf*2.2/(tf.tf+1.2*(0.25+0.75*dl.dl/s.avgdl))
             ELSE 0 END) AS score,
         sum(CASE WHEN term IN ('key','agg') THEN 1 ELSE 0 END) AS nt,
         max(CASE WHEN term = 'hash' THEN 1 ELSE 0 END) AS has_hash
  FROM tf JOIN df USING(term) JOIN dl USING(doc_id) CROSS JOIN s
  GROUP BY 1)
SELECT sc.doc_id,
       row_number() OVER (ORDER BY score DESC, sc.doc_id) AS rank,
       round(score, 4) AS score
FROM sc JOIN documents d ON sc.doc_id = d.doc_id
WHERE nt >= 1 AND d.n_chars >= 100
  AND NOT (has_hash = 1 AND d.lang = 'de')
ORDER BY score DESC, sc.doc_id LIMIT 10
"""

# IVF-PQ twin: head centroids (vec_id < 16, normalized), spherical
# assignment, residual vs the list centroid, nearest-point encode on
# the fixed 256-step [-1,1] scalar grid, ADC = base(list·q) + sum_j
# q_j·grid(code_j) over the 4 probed lists, k·refine=40 candidate cut
# by approximate score, exact cosine rescore, top-10 — every stage of
# operators/similarity.py build_ivfpq_index + ivfpq_probe_topk
_IVFPQ_ANN_SQL = """
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings),
nrm AS (SELECT vec_id, e,
               list_transform(e, x -> x
                 / (sqrt(list_inner_product(e, e)) + 1e-12)) AS v
        FROM base),
cents AS (SELECT vec_id AS list_id, v AS c FROM nrm WHERE vec_id < 16),
q AS (SELECT v AS qv, e AS qe FROM nrm WHERE vec_id = 0),
asn AS (
  SELECT vec_id, list_id FROM (
    SELECT n.vec_id, ct.list_id,
           row_number() OVER (PARTITION BY n.vec_id
                              ORDER BY list_inner_product(n.v, ct.c) DESC,
                                       ct.list_id) AS rn
    FROM nrm n CROSS JOIN cents ct) WHERE rn = 1),
probes AS (
  SELECT list_id, list_inner_product(c, (SELECT qv FROM q)) AS basescore
  FROM cents ORDER BY basescore DESC, list_id LIMIT 4),
vdims AS (SELECT vec_id, generate_subscripts(v, 1) AS j,
                 unnest(v) AS vx FROM nrm),
cdims AS (SELECT list_id, generate_subscripts(c, 1) AS j,
                 unnest(c) AS cx FROM cents),
qdims AS (SELECT generate_subscripts(qv, 1) AS j, unnest(qv) AS qx
          FROM q),
adc AS (
  SELECT d.vec_id,
         sum(qd.qx * (-1.0 + least(255.0, greatest(0.0,
             round((d.vx - cd.cx + 1.0) * 127.5))) * (2.0 / 255.0))) AS s
  FROM vdims d
  JOIN asn a USING (vec_id)
  JOIN probes p USING (list_id)
  JOIN cdims cd ON cd.list_id = a.list_id AND cd.j = d.j
  JOIN qdims qd ON qd.j = d.j
  GROUP BY d.vec_id),
approxs AS (
  SELECT adc.vec_id, adc.s + p.basescore AS approx
  FROM adc JOIN asn a2 USING (vec_id) JOIN probes p USING (list_id)),
cand AS (SELECT vec_id FROM approxs ORDER BY approx DESC, vec_id
         LIMIT 40),
res AS (
  SELECT b.vec_id,
         list_cosine_similarity(b.e, (SELECT qe FROM q)) AS c
  FROM base b JOIN cand USING (vec_id)),
rk AS (SELECT vec_id, c,
              row_number() OVER (ORDER BY c DESC, vec_id) AS rank
       FROM res)
SELECT vec_id, rank, round(c, 4) AS cosine FROM rk WHERE rank <= 10
"""


# query_string / simple_query_string twin: per-term BM25 pivot over the
# three query terms, then the two desugared bool shapes —
#   qs : key AND (agg OR hash) -"table hash"
#        -> must key, must (agg|hash), must_not adjacent-phrase;
#        score = s_key + matched should contributions
#   sqs: key +agg | hash  ->  should [(key AND agg), hash] msm 1;
#        score = (key&agg ? s_key+s_agg : 0) + (hash ? s_hash : 0)
_QUERY_STRING_SQL = f"""
WITH toks AS (SELECT doc_id, {{toks}} AS t FROM documents),
s AS (SELECT count(*)::DOUBLE n, avg(len(t))::DOUBLE avgdl FROM toks),
tf AS (
  SELECT doc_id, tok AS term, count(*)::DOUBLE tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  WHERE tok IN ('key','agg','hash') GROUP BY 1, 2),
dl AS (SELECT doc_id, len(t)::DOUBLE dl FROM toks),
df AS (SELECT term, count(*)::DOUBLE df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id, tf.term,
         ln(1+(s.n-df.df+0.5)/(df.df+0.5))
             * tf.tf*2.2/(tf.tf+1.2*(0.25+0.75*dl.dl/s.avgdl)) AS sco
  FROM tf JOIN df USING(term) JOIN dl USING(doc_id) CROSS JOIN s),
piv AS (
  SELECT doc_id,
         max(CASE WHEN term = 'key'  THEN sco END) AS s_key,
         max(CASE WHEN term = 'agg'  THEN sco END) AS s_agg,
         max(CASE WHEN term = 'hash' THEN sco END) AS s_hash
  FROM sc GROUP BY 1),
ph AS (
  SELECT doc_id FROM toks
  WHERE position(' table hash ' IN
                 ' ' || array_to_string(t, ' ') || ' ') > 0),
qs AS (
  SELECT doc_id,
         s_key + coalesce(s_agg, 0) + coalesce(s_hash, 0) AS score
  FROM piv
  WHERE s_key IS NOT NULL
    AND (s_agg IS NOT NULL OR s_hash IS NOT NULL)
    AND doc_id NOT IN (SELECT doc_id FROM ph)),
sqs AS (
  SELECT doc_id,
         CASE WHEN s_key IS NOT NULL AND s_agg IS NOT NULL
              THEN s_key + s_agg ELSE 0 END
         + coalesce(s_hash, 0) AS score
  FROM piv
  WHERE (s_key IS NOT NULL AND s_agg IS NOT NULL)
     OR s_hash IS NOT NULL)
(SELECT 'qs' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM qs ORDER BY score DESC, doc_id LIMIT 10)
UNION ALL
(SELECT 'sqs' AS mode, doc_id,
        row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        round(score, 4) AS score
 FROM sqs ORDER BY score DESC, doc_id LIMIT 10)
""".replace("{toks}", _TOKS)


def oracle_sql() -> dict[str, str]:
    o = {
        "bm25_topk": _BM25_SQL,
        "bm25_topk_or": _BM25_OR_SQL,
        "query_string_topk": _QUERY_STRING_SQL,
        "bm25_filtered_topk": _BM25_FILTERED_SQL,
        # same oracle as bm25_topk: the compressed entry must reproduce
        # the naive plan's rows exactly (build→codec→block-max scoring)
        "bm25_compressed_topk": _BM25_SQL,
        "phrase_match": _PHRASE_SQL,
        "bool_dsl_topk": _BOOL_DSL_SQL,
        "dismax_topk": _DISMAX_SQL,
        "multi_match_topk": _MULTI_MATCH_SQL,
        "dsl_scan": _DSL_SCAN_SQL,
        "search_after_page": _SEARCH_AFTER_SQL,
        "dsl_count": f"SELECT count(*) AS count FROM ({_DSL_SCAN_SQL})",
        "cleanup_duplicates": """
SELECT doc_id, lang, source
FROM (SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang, source ORDER BY doc_id) AS rn
      FROM documents)
WHERE rn = 1
""",
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_failing_users": """
            WITH m AS (
              SELECT user_id,
                     sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END)::BIGINT
                       AS errors,
                     count(*) AS total
              FROM events GROUP BY user_id),
            r AS (
              SELECT user_id, errors, total,
                     round(errors::DOUBLE / total, 6) AS error_rate,
                     row_number() OVER (
                       ORDER BY errors::DOUBLE / total DESC, errors DESC,
                                user_id DESC) AS rank
              FROM m WHERE errors > 0)
            SELECT user_id, errors, total, error_rate, rank
            FROM r WHERE rank <= 10
        """,
        "anti_join_customers": """
            SELECT c_custkey FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "cost_by_segment": """
            SELECT c_mktsegment,
                   round(sum(o_totalprice), 2) AS segment_value,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "top_revenue_orders": """
            WITH rev AS (
              SELECT l_orderkey AS orderkey,
                     sum(l_extendedprice * (1 - l_discount)) AS r
              FROM lineitem GROUP BY 1),
            rk AS (SELECT orderkey, r,
                          row_number() OVER (ORDER BY r DESC, orderkey) AS rank
                   FROM rev)
            SELECT orderkey, rank, round(r, 2) AS revenue FROM rk WHERE rank <= 5
        """,
        "flakiness_users": _FLAKINESS_SQL,
        "dedup_keep_first": """
            SELECT lang, source, doc_id FROM (
              SELECT lang, source, doc_id,
                     row_number() OVER (
                       PARTITION BY lang, source
                       ORDER BY length(doc_id::VARCHAR), doc_id::VARCHAR) AS rn
              FROM documents) WHERE rn = 1
        """,
        "trends_weekly": """
            WITH weekly AS (
              SELECT date_trunc('week', ts) AS week, event_type, count(*) AS n
              FROM events GROUP BY 1, 2)
            SELECT week, event_type, n,
                   n - coalesce(lag(n) OVER (
                     PARTITION BY event_type ORDER BY week), 0) AS delta
            FROM weekly
        """,
        "weekly_partition_names": """
            SELECT printf('events-%d.%02d', isoyear(ts), week(ts)) AS index_name,
                   count(*) AS n_docs
            FROM events GROUP BY 1
        """,
        "time_range_filter": """
            SELECT event_id, event_type, round(value, 2) AS value
            FROM events
            WHERE ts BETWEEN TIMESTAMP '2024-01-08 00:00:00'
                         AND TIMESTAMP '2024-01-21 23:59:59'
              AND event_type IN ('error', 'purchase')
              AND contains(props, '7')
        """,
        "boolean_flag_filter": """
            SELECT event_id, user_id, (event_type = 'error') AS is_error
            FROM events WHERE event_type = 'error'
        """,
        "regex_filter": """
            SELECT doc_id, n_chars FROM documents
            WHERE regexp_matches(text, 'spark.*join')
        """,
        "classifier": """
            SELECT CASE
                     WHEN contains(text, 'spark') AND lang = 'en' THEN 'spark_en'
                     WHEN source IN ('src0', 'src1') THEN 'early_src'
                     WHEN contains(text, 'join') OR contains(text, 'query')
                       THEN 'sqlish'
                     ELSE 'other'
                   END AS doc_class,
                   count(*) AS n
            FROM documents GROUP BY 1
        """,
        "conjunctive_match": f"""
            SELECT doc_id FROM documents
            WHERE list_contains({_TOKS}, 'key')
              AND list_contains({_TOKS}, 'agg')
              AND list_contains({_TOKS}, 'row')
        """,
        "exact_dedup": """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "unigram_jaccard": _jaccard_sql(0.5),
        "minhash_candidates": _jaccard_sql(0.5, shingle_n=3),
        "simhash_pairs": _SIMHASH_SQL,
        "doc_fingerprints": _FINGERPRINT_SQL,
        # image/video rows: byte-count check on the text payload; audio
        # rows: REAL WAV decode replayed closed-form — n samples of
        # ((a*k + c) % 20001) - 10000 give integer sum-of-squares
        # (exact in float64 in any order), so duration/RMS/peak match
        # the engine's float32 features bit-exactly after the REAL cast
        "media_features": """
            SELECT doc_id AS media_id, 'video' AS kind,
                   octet_length(encode(text)) AS n_bytes,
                   NULL::DOUBLE AS dur_sec, NULL::DOUBLE AS rms,
                   NULL::DOUBLE AS peak, NULL::DOUBLE AS r_mean,
                   NULL::DOUBLE AS g_mean, NULL::DOUBLE AS b_mean
            FROM documents WHERE ((doc_id % 3) + 3) % 3 = 2
            UNION ALL
            SELECT media_id, 'audio' AS kind, 44 + 2 * n AS n_bytes,
                   CAST(CAST(n / 16000.0 AS REAL) AS DOUBLE) AS dur_sec,
                   CAST(CAST(sqrt((ss / n::DOUBLE)) / 32768.0 AS REAL)
                        AS DOUBLE) AS rms,
                   CAST(CAST(mx / 32768.0 AS REAL) AS DOUBLE) AS peak,
                   NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE
            FROM (
              SELECT media_id, any_value(n) AS n,
                     sum(s * s) AS ss, max(abs(s)) AS mx
              FROM (
                SELECT media_id, n, ((a * k + c) % 20001) - 10000 AS s
                FROM (
                  SELECT doc_id AS media_id,
                         160 + ((doc_id % 160) + 160) % 160 AS n,
                         ((doc_id % 251) + 251) % 251 + 2 AS a,
                         ((doc_id % 97) + 97) % 97 AS c,
                         unnest(range(0,
                           160 + ((doc_id % 160) + 160) % 160)) AS k
                  FROM documents
                  WHERE ((doc_id % 3) + 3) % 3 = 1))
              GROUP BY media_id)
            UNION ALL
            -- image twin (round 5): true channel means of the REAL
            -- PNG payloads replayed from the closed-form pixel
            -- pattern ((a*i + 17*ch) % 256); n_bytes = decoded
            -- raster size (compressed size is codec-dependent)
            SELECT media_id, 'image' AS kind,
                   any_value(w) * any_value(h) * 3 AS n_bytes,
                   NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE,
                   CAST(CAST(avg((a * i) % 256) AS REAL) AS DOUBLE)
                     AS r_mean,
                   CAST(CAST(avg((a * i + 17) % 256) AS REAL) AS DOUBLE)
                     AS g_mean,
                   CAST(CAST(avg((a * i + 34) % 256) AS REAL) AS DOUBLE)
                     AS b_mean
            FROM (
              SELECT doc_id AS media_id,
                     ((doc_id % 13) + 13) % 13 + 4 AS w,
                     ((((doc_id % 13) + 13) % 13 * 7) % 13) + 4 AS h,
                     ((doc_id % 251) + 251) % 251 + 2 AS a,
                     unnest(range(0,
                       (((doc_id % 13) + 13) % 13 + 4)
                       * (((((doc_id % 13) + 13) % 13 * 7) % 13) + 4)))
                       AS i
              FROM documents WHERE ((doc_id % 3) + 3) % 3 = 0)
            GROUP BY media_id, a
        """,
        "token_counts": f"""
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text, '\\s+'),
                                   x -> x <> '')) AS n_ws_tokens,
                   len({_TOKS}) AS n_tokens,
                   ceil(length(text) / 4.0)::BIGINT AS n_bpe_est
            FROM documents
        """,
        "quality": f"""
            WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
            sc AS (
              SELECT doc_id, list_max([
                {{'hits': len(list_intersect(list_distinct(toks),
                   ['the','and','of','to','in','is','that','it','for',
                    'with'])), 'lang': 'en'}},
                {{'hits': len(list_intersect(list_distinct(toks),
                   ['der','die','und','das','ist','nicht','ein','mit',
                    'auf'])), 'lang': 'de'}},
                {{'hits': len(list_intersect(list_distinct(toks),
                   ['le','la','et','les','des','est','pas','une','dans'])),
                 'lang': 'fr'}},
                {{'hits': len(list_intersect(list_distinct(toks),
                   ['el','la','los','las','es','una','para','por','con'])),
                 'lang': 'es'}}
              ]) AS best
              FROM t)
            SELECT t.doc_id,
                   length(text)::BIGINT AS n_chars,
                   round(CASE WHEN length(text) > 0 THEN
                     length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                       / length(text) ELSE 0.0 END, 6) AS alpha_ratio,
                   round(CASE WHEN len(toks) > 0 THEN
                     len(list_distinct(toks))::DOUBLE / len(toks)
                     ELSE 0.0 END, 6) AS distinct_ratio,
                   round(CASE WHEN len(toks) > 0 THEN
                     list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                       / len(toks) ELSE 0.0 END, 6) AS mean_word_len,
                   len(list_filter(regexp_split_to_array(text, '\\s+'),
                                   x -> x <> ''))::BIGINT AS n_ws_tokens,
                   len(toks)::BIGINT AS n_tokens,
                   ceil(length(text) / 4.0)::BIGINT AS n_bpe_est,
                   CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END
                     AS lang_pred
            FROM t JOIN sc USING (doc_id)
        """,
        "repetition_qc": _REPETITION_QC_SQL,
        "contamination_check": _CONTAMINATION_SQL,
        "language_id": f"""
            WITH t AS (
              SELECT doc_id, list_distinct({_TOKS}) AS toks FROM documents),
            sc AS (
              SELECT doc_id, list_max([
                {{'hits': len(list_intersect(toks, ['the','and','of','to','in',
                   'is','that','it','for','with'])), 'lang': 'en'}},
                {{'hits': len(list_intersect(toks, ['der','die','und','das',
                   'ist','nicht','ein','mit','auf'])), 'lang': 'de'}},
                {{'hits': len(list_intersect(toks, ['le','la','et','les','des',
                   'est','pas','une','dans'])), 'lang': 'fr'}},
                {{'hits': len(list_intersect(toks, ['el','la','los','las','es',
                   'una','para','por','con'])), 'lang': 'es'}}
              ]) AS best
              FROM t)
            SELECT doc_id,
                   CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END
                     AS lang_pred
            FROM sc
        """,
        "pii_scrub": _PII_SCRUB_SQL,
        "span_dedup": _SPAN_DEDUP_SQL,
        "search_aggs_range": _AGGS_RANGE_SQL,
        "search_aggs_metrics": _AGGS_METRICS_SQL,
        "enrich_orders": """
            SELECT o_orderkey, c_name, c_mktsegment,
                   round(o_totalprice, 2) AS totalprice
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        """,
        "first_match_enrich": """
            WITH fb AS (
              SELECT user_id, value AS first_purchase_value
              FROM (SELECT user_id, value,
                           row_number() OVER (
                             PARTITION BY user_id ORDER BY ts, event_id, value
                           ) AS rn
                    FROM events WHERE event_type = 'purchase')
              WHERE rn = 1)
            SELECT event_id, e.user_id,
                   round(coalesce(fb.first_purchase_value, 0.0), 2)
                     AS first_purchase_value
            FROM events e LEFT JOIN fb ON e.user_id = fb.user_id
            WHERE e.event_type = 'error'
        """,
        "order_lineitems_denorm": """
            SELECT l_orderkey, l_linenumber, o_orderdate AS order_date,
                   round(o_totalprice, 2) AS totalprice
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_quantity > 45
        """,
        "global_revenue": """
            SELECT round(sum(l_extendedprice * (1 - l_discount)), 2)
                     AS total_revenue,
                   count(*) AS n_lineitems
            FROM lineitem
        """,
        "event_state_counts": """
            SELECT event_type, count(*) AS n FROM events GROUP BY event_type
        """,
        "customer_ids_derived": """
            SELECT c_custkey,
                   CAST(regexp_replace(c_name, '^Customer#', '') AS BIGINT)
                     AS cust_num,
                   starts_with(c_name, 'Customer#') AS name_ok
            FROM customer
        """,
        "priority_labels": """
            SELECT o_orderkey,
                   list_extract(string_split(o_orderpriority, '-'), -1) AS label,
                   replace(list_extract(string_split(o_orderpriority, '-'), -1),
                           ' ', '_') AS label_norm
            FROM orders
        """,
        "brand_share_others": """
            WITH rev AS (
              SELECT p_brand, sum(l_extendedprice * (1 - l_discount)) AS r
              FROM lineitem JOIN part ON l_partkey = p_partkey
              GROUP BY p_brand),
            b AS (
              SELECT CASE WHEN r / sum(r) OVER () > 0.02
                          THEN p_brand ELSE 'Others' END AS bucket, r
              FROM rev)
            SELECT bucket, round(sum(r), 2) AS revenue FROM b GROUP BY bucket
        """,
        "order_ship_overlap": """
            WITH spans AS (
              SELECT l_orderkey, max(l_shipdate) AS last_ship
              FROM lineitem GROUP BY l_orderkey)
            SELECT o_orderkey, o_orderdate, last_ship
            FROM orders JOIN spans ON o_orderkey = l_orderkey
            WHERE o_orderdate <= TIMESTAMP '1996-12-31'
              AND last_ship >= TIMESTAMP '1996-01-01'
        """,
        "union_event_streams": """
            SELECT event_id, 'err' AS tag FROM events WHERE event_type = 'error'
            UNION ALL
            SELECT event_id, 'buy' AS tag FROM events WHERE event_type = 'purchase'
        """,
        "composite_anti_join": """
            WITH wk1 AS (
              SELECT DISTINCT user_id, event_type FROM events
              WHERE ts < TIMESTAMP '2024-01-08'),
            later AS (
              SELECT DISTINCT user_id, event_type FROM events
              WHERE ts >= TIMESTAMP '2024-01-08')
            SELECT user_id, event_type FROM later
            WHERE NOT EXISTS (
              SELECT 1 FROM wk1
              WHERE wk1.user_id = later.user_id
                AND wk1.event_type = later.event_type)
        """,
        "url_paths": """
            SELECT event_id,
                   array_to_string(
                     list_slice(string_split(
                       '/v1/b/' || event_type || '/' || user_id
                         || '/artifacts/' || event_id, '/'),
                       5, 100000), '/') AS artifact_path
            FROM events WHERE event_type = 'error'
        """,
        "distinct_users": """
            SELECT DISTINCT user_id FROM events
        """,
        "embedding_dedup_pairs": """
            WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
                       FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.e, b.e), 4) AS cosine
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.e, b.e) >= 0.45
        """,
        "similarity_topk": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = 0),
            sims AS (
              SELECT vec_id,
                     list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            (SELECT qv FROM q)) AS c
              FROM embeddings),
            rk AS (SELECT vec_id, c,
                          row_number() OVER (ORDER BY c DESC, vec_id) AS rank
                   FROM sims)
            SELECT vec_id, rank, round(c, 4) AS cosine FROM rk WHERE rank <= 10
        """,
        "lsh_ann_topk": _lsh_ann_sql(),
        "ivf_ann_topk": _IVF_ANN_SQL,
        "hybrid_rrf_topk": _HYBRID_RRF_SQL,
        "search_aggs_weekly": """
            SELECT date_trunc('week', ts) AS week,
                   count(*) AS doc_count,
                   round(avg(value), 6) AS avg_value
            FROM events
            WHERE event_type IN ('error', 'purchase')
              AND ts >= '2024-01-01'
            GROUP BY 1 ORDER BY 1
        """,
        # indexed-aggs twin: qualification = match-or ('key','agg' — any
        # term present) + range filter, aggs over the FULL qualifying
        # set (ES rule). NESTED buckets: parent terms order = TOTAL
        # doc_count desc, key asc (size cut on parents), child terms
        # order = sub_doc_count desc, sub_key asc within each parent
        # (size cut per parent) — flattened to one row per cell
        "search_aggs_indexed": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            hit AS (
              SELECT DISTINCT doc_id
              FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
              WHERE tok IN ('key', 'agg')),
            q AS (SELECT d.* FROM documents d JOIN hit USING (doc_id)
                  WHERE d.n_chars >= 200),
            cells AS (
              SELECT lang AS key, source AS sub_key,
                     count(*) AS sub_doc_count,
                     avg(n_chars) AS avg_chars
              FROM q WHERE lang IS NOT NULL GROUP BY 1, 2),
            tot AS (
              SELECT *, sum(sub_doc_count)
                          OVER (PARTITION BY key) AS doc_count
              FROM cells),
            pr AS (SELECT DISTINCT key, doc_count FROM tot
                   ORDER BY doc_count DESC, key LIMIT 3),
            ranked AS (
              SELECT *, row_number() OVER (
                 PARTITION BY key
                 ORDER BY sub_doc_count DESC, sub_key ASC) AS rn
              FROM tot WHERE sub_key IS NOT NULL)
            SELECT r.key, r.doc_count::BIGINT AS doc_count, r.sub_key,
                   r.sub_doc_count::BIGINT AS sub_doc_count,
                   round(r.avg_chars, 6) AS avg_chars
            FROM ranked r JOIN pr USING (key, doc_count)
            WHERE r.rn <= 3
            ORDER BY r.doc_count DESC, r.key ASC,
                     r.sub_doc_count DESC, r.sub_key ASC
        """,
        "nested_bool_topk": _NESTED_BOOL_SQL,
        "ivfpq_ann_topk": _IVFPQ_ANN_SQL,
        "dedup_clusters": _dedup_clusters_sql(),
    }
    # the combo row wraps the six individual oracle SQLs VERBATIM, so
    # its value agreement is inherited from theirs (see
    # _trivial_filters_suite)
    o["trivial_filters_suite"] = f"""
        SELECT 'revenue' AS shape,
               round(total_revenue * 100)::BIGINT::VARCHAR AS k,
               n_lineitems::VARCHAR AS v
        FROM ({o["global_revenue"]})
        UNION ALL
        SELECT 'priority' AS shape, o_orderkey::VARCHAR AS k,
               label || ':' || label_norm AS v
        FROM ({o["priority_labels"]})
        UNION ALL
        SELECT 'weekly', index_name, n_docs::VARCHAR
        FROM ({o["weekly_partition_names"]})
        UNION ALL
        SELECT 'timerange' AS shape, event_id::VARCHAR AS k,
               event_type || ':' || round(value * 100)::BIGINT::VARCHAR AS v
        FROM ({o["time_range_filter"]})
        UNION ALL
        SELECT 'classifier', doc_class, n::VARCHAR
        FROM ({o["classifier"]})
        UNION ALL
        SELECT 'bool_flag' AS shape, event_id::VARCHAR AS k,
               user_id::VARCHAR AS v FROM ({o["boolean_flag_filter"]})
        UNION ALL
        SELECT 'regex', doc_id::VARCHAR, n_chars::VARCHAR
        FROM ({o["regex_filter"]})
        UNION ALL
        SELECT 'union', event_id::VARCHAR, tag
        FROM ({o["union_event_streams"]})
        UNION ALL
        SELECT 'url', event_id::VARCHAR, artifact_path
        FROM ({o["url_paths"]})
        UNION ALL
        SELECT 'prefix', c_custkey::VARCHAR,
               cust_num::VARCHAR || ':' || name_ok::VARCHAR
        FROM ({o["customer_ids_derived"]})
        UNION ALL
        SELECT 'distinct', user_id::VARCHAR, ''
        FROM ({o["distinct_users"]})
    """
    return o
