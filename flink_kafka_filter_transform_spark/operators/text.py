"""Text-analysis operators over the ``documents`` table.

Everything is built-in Catalyst expressions (split/filter/aggregate
higher-order functions) — no Python in the hot path, so the whole
pipeline stays inside WholeStageCodegen and scales linearly with input
bytes. At 100 TB these are embarrassingly parallel map-only plans:
no shuffle at all until an (optional) aggregation over the stats.

Ops (each with a DuckDB oracle in oracles.py):
- ``text_stats``      : token counts + quality score (length/stopword/
                        diversity heuristics)
- ``lang_id``         : marker-token language guess (n-gram heuristic)
- ``token_counts``    : whitespace + BPE-ish regex tokenization counts
- ``doc_fingerprint`` : order-sensitive polynomial rolling hash
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_kafka_filter_transform_spark.functions.hashing import portable_hash64
from flink_kafka_filter_transform_spark.operators import params


def tokens(col: Column | str = "text") -> Column:
    """Whitespace tokens with no empty strings (regexp_extract_all)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(params.TOKEN_PATTERN), 0)


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document token statistics + composite quality score.

    quality = 0.25*min(n_tokens/100,1) + 0.25*diversity
            + 0.25*(1-stopword_ratio) + 0.25*min(avg_token_len/8,1)
    """
    toks = tokens()
    stop_arr = F.array(*[F.lit(s) for s in params.STOPWORDS])
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    avg_len = sum_len.cast("double") / n
    stop_ratio = n_stop.cast("double") / n
    # single shared definition of the composite score (quality_score) —
    # quality_filter_funnel gates on the same expression
    quality = quality_score(toks)
    return docs.filter(n > 0).select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        n_distinct.cast("bigint").alias("n_distinct_tokens"),
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Deterministic marker-token language guess.

    Scores each language by marker-token occurrences; highest score
    wins, ties broken by LANG_ORDER, all-zero -> 'unknown'. The point
    is the *shape* of a real n-gram language-ID pass (token match +
    per-language score + argmax), fully vectorized JVM-side.
    """
    toks = tokens()

    def marker_score(markers: tuple[str, ...]) -> Column:
        # no default-arg lambdas here: PySpark's higher-order-function
        # wrapper counts lambda params and would bind a second lambda var
        arr = F.array(*[F.lit(x) for x in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = {lang: marker_score(m) for lang, m in params.LANG_MARKERS.items()}
    best = F.greatest(*[scores[lang] for lang in params.LANG_ORDER])
    pred = F.lit("unknown")
    for lang in reversed(params.LANG_ORDER):
        pred = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(pred)
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        *[scores[lang].cast("bigint").alias(f"score_{lang}") for lang in params.LANG_ORDER],
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish regex piece count + char count."""
    return docs.select(
        "doc_id",
        F.size(tokens()).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(params.BPE_PATTERN), 0))
        .cast("bigint")
        .alias("n_bpe_pieces"),
        F.length("text").cast("bigint").alias("n_chars_measured"),
    )


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Order-sensitive polynomial rolling hash of the token stream.

    fp = fold(tokens, 0, acc -> (acc*31 + h(tok) mod 1e6) mod 1e9+7)
    with h the portable 60-bit md5 hash — arithmetic stays well under
    63 bits, so it is exact (and identical in DuckDB's list_reduce
    oracle). A content fingerprint that, unlike a set hash, detects
    token reordering."""
    toks = tokens()
    reduced = F.transform(toks, lambda t: portable_hash64(t) % params.FP_TOKEN_MOD)
    fp = F.aggregate(
        reduced,
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * params.FP_BASE + h) % params.FP_MOD,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


def tfidf_top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-k terms per document by tf-idf.

    Classic two-aggregation shape: explode -> per-(doc,term) tf ->
    per-term document frequency -> join -> per-doc top-k window. The
    idf is the RATIONAL form N/df (no logarithm): transcendental
    functions are not bit-reproducible across engines, and for ranking
    the monotone transform changes nothing. At scale: tf agg and df
    agg share the term-hash shuffle, and the tf<->df join is a plain
    equi-join on term — NO broadcast hint: the vocabulary is unbounded
    (billions of terms at 100 TB, a guaranteed driver/executor OOM as a
    broadcast), while AQE picks broadcast at runtime when df is
    actually small and splits hot-term skew otherwise. Only the 1-row
    n_docs aggregate is pinned broadcast."""
    from pyspark.sql.window import Window

    ex = docs.select("doc_id", F.explode(tokens()).alias("term"))
    tf = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_counts, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * (F.col("n_docs").cast("double") / F.col("df_count").cast("double")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "df_count", "tfidf")
    )


def token_ngrams(toks: Column, n: int, distinct: bool = True) -> Column:
    """Token n-grams (space-joined windows of ``n``) of a token array.

    GUARDED for short inputs: with fewer than ``n`` tokens the result
    is an EMPTY array — never evaluate ``sequence(1, k)`` with k <= 0
    (Spark's sequence counts DOWN when stop < start, then slice(_, 0,
    n) throws INVALID_PARAMETER_VALUE). The single shared builder for
    every n-gram consumer (repetition ratios, decontamination) so the
    guard cannot drift.
    """
    # O(tokens) construction: zip n SHIFTED copies of the array instead
    # of a slice+join per position (which is O(tokens^2) in interpreted
    # higher-order-function evaluation — measured 15s for 5000 docs at
    # sf0.1 before this rewrite, ~0.5s after).
    sz = F.size(toks)
    grams = F.slice(toks, 1, sz - (n - 1))
    for j in range(1, n):
        shifted = F.slice(toks, 1 + j, sz - (n - 1))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    if distinct:
        grams = F.array_distinct(grams)
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def ngram_dup_ratio(toks: Column, size_n: int) -> Column:
    """Duplicate fraction of length-``size_n`` token windows; NULL when
    the doc is too short to have any (token_ngrams guards the sequence
    bounds; the outer when guards the 0/0 division — which would THROW
    under ANSI mode, not just return null)."""
    grams = token_ngrams(toks, size_n, distinct=False)
    return F.when(
        F.size(toks) >= size_n,
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / F.size(grams),
    )


def top_token_run_count(toks: Column) -> Column:
    """Occurrence count of the most frequent token, as the longest run
    in the SORTED token array: O(n log n) instead of the O(n x
    distinct) count-per-distinct-token scan (interpreted HOFs make the
    quadratic form dominate — measured as the whole query's cost before
    this form). Empty-string sentinel is safe: tokens are [^\\s]+ and
    therefore never empty. Shared by repetition_ratios and
    quality_filter_funnel so the definitions cannot drift."""
    return F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(t == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    ).best


def quality_score(toks: Column) -> Column:
    """The composite quality score of ``text_stats``, as a reusable
    expression: 0.25 each for length, diversity, non-stopword mass, and
    average token length. Single definition shared by text_stats and
    quality_filter_funnel."""
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in params.STOPWORDS])
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast(
        "double"
    ) / n
    diversity = F.size(F.array_distinct(toks)).cast("double") / n
    return (
        F.lit(0.25) * F.least(n.cast("double") / F.lit(100.0), F.lit(1.0))
        + F.lit(0.25) * diversity
        + F.lit(0.25) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.25) * F.least((sum_len.cast("double") / n) / F.lit(8.0), F.lit(1.0))
    )


def repetition_ratios(docs: DataFrame) -> DataFrame:
    """Intra-document repetition signals (Gopher-style quality rules):
    duplicate token-n-gram fractions and the most-frequent-token share.
    High values flag boilerplate/spam — standard filters before
    training-data inclusion.

    All Catalyst higher-order functions over the token array: map-only,
    zero shuffle, LINEAR(ish) per document — n-grams by zipped shifts,
    top-token by the sorted-run fold (see the shared helpers).
    """
    toks = tokens()
    n = F.size(toks)
    top_ratio = top_token_run_count(toks).cast("double") / n
    return docs.filter(n > 0).select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        ngram_dup_ratio(toks, 2).alias("dup_2gram_ratio"),
        ngram_dup_ratio(toks, 3).alias("dup_3gram_ratio"),
        top_ratio.alias("top_token_ratio"),
    )


def token_frequency_score(docs: DataFrame, rare_max_count: int = 2) -> DataFrame:
    """Corpus-frequency quality signals per document: the arithmetic
    mean corpus probability of its token occurrences and the fraction
    whose corpus count is <= ``rare_max_count`` — the rare-token-
    density filter (gibberish/OCR noise scores rare-heavy; boilerplate
    scores common-heavy) that runs beside length/repetition gates in a
    training-data pipeline.

    Deliberately TRANSCENDENTAL-FREE — and genuinely BIT-EXACT: the
    classic mean-log-prob form would hinge on cross-engine libm parity
    for ln(), which this repo's float policy forbids (see sketch.py's
    precomputed ln tables). Since mean(c_i/total)/n == sum(c_i) /
    (total*n), everything stays INTEGER until one final double
    division of two exactly-representable values — correctly rounded
    per IEEE on both engines, no decimal round-trip whose
    double->DECIMAL cast semantics differ between them (Spark goes
    through Java's shortest-string BigDecimal.valueOf, DuckDB scales
    in double — ~1e-17 relative divergence in the old form).
    Exactness holds while sum(c) and total*n stay under 2^53; a
    100 TB corpus crosses that, where the result degrades gracefully
    to ordinary double rounding.

    Scale shape: one token-keyed aggregation builds the vocabulary
    (map-side combine), the exploded corpus joins it back reusing the
    same token hash partitioning, the 1-row total broadcasts, and the
    per-doc rollup shuffles fixed-width rows. The vocabulary is NEVER
    broadcast — it is corpus-sized at 100 TB."""
    toks = docs.select("doc_id", F.explode(tokens()).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_c"))
    total = vocab.agg(F.sum("_c").alias("_total"))
    agg = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("_c").alias("_sum_c"),
            F.max("_total").alias("_t"),
            F.sum(
                F.when(F.col("_c") <= rare_max_count, 1).otherwise(0)
            ).alias("_rare"),
        )
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        (
            F.col("_sum_c").cast("double")
            / (F.col("_t") * F.col("n_tokens")).cast("double")
        ).alias("mean_token_prob"),
        (F.col("_rare").cast("double") / F.col("n_tokens").cast("double")).alias(
            "rare_token_frac"
        ),
    )


def token_pack_report(docs: DataFrame, window: int = 512) -> DataFrame:
    """Sequence-packing layout report: concatenate each SOURCE's
    documents into a token stream (deterministic order: content hash,
    then doc_id) and cut it every ``window`` tokens — the GPT-style
    pack-and-cut a pretraining loader applies. Reports, per (source,
    pack), how many documents START in the pack and their token mass —
    the fill/fragmentation numbers read before choosing a context
    length.

    Packing is PER SOURCE, not global, and that is the scale design,
    not a concession: a global token order would need a full-corpus
    prefix sum (an unpartitioned window — single-task, the exact
    anti-pattern the plan gates exist to catch), while per-shard
    packing is what production loaders do anyway. The window
    partitions by source and each source's cumulative sum runs
    parallel to every other's."""
    n = F.size(tokens())
    base = docs.select(
        "source",
        "doc_id",
        n.alias("_n"),
        portable_hash64(F.col("text")).alias("_h"),
    ).filter(F.col("_n") > 0)
    w = (
        Window.partitionBy("source")
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = base.withColumn(
        "pack_id", F.floor((F.sum("_n").over(w) - F.col("_n")) / F.lit(window))
    )
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs_started"),
            F.sum("_n").cast("bigint").alias("n_tokens"),
        )
    )


def source_vocab_divergence(docs: DataFrame) -> DataFrame:
    """Per-source vocabulary drift: the chi-square statistic of each
    source's token distribution against the corpus distribution — the
    domain-mixture audit that flags a shard whose vocabulary stopped
    looking like the rest (scraper drift, encoding rot, language
    imbalance) before it contaminates a training mix.

    Chi-square, not KL: the statistic is POLYNOMIAL in the counts, so
    it stays inside the repo's no-transcendentals float policy —
    expected counts are exact double ratios of integers and the
    per-source sum folds as DECIMAL (order-independent). This is the
    OBSERVED-CELLS variant: (source, token) cells where the source
    never uses the token contribute nothing (the textbook statistic
    adds their expected mass); fine for ranking drift across sources,
    not for textbook p-values — the oracle computes the identical
    variant.

    Scale shape: one (source, token)-keyed aggregation, one
    token-keyed aggregation joined back on token (partitioning
    reuse), per-source totals joined on source, the 1-row grand total
    broadcast; nothing vocabulary-sized is ever broadcast."""
    e = docs.select("source", F.explode(tokens()).alias("tok"))
    st = e.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("_obs"))
    tok_tot = st.groupBy("tok").agg(F.sum("_obs").alias("_c_tok"))
    src_tot = st.groupBy("source").agg(F.sum("_obs").alias("_total_s"))
    grand = tok_tot.agg(F.sum("_c_tok").alias("_total"))
    exp = (
        F.col("_total_s").cast("double")
        * F.col("_c_tok").cast("double")
        / F.col("_total").cast("double")
    )
    term = (F.col("_obs").cast("double") - exp) * (
        F.col("_obs").cast("double") - exp
    ) / exp
    return (
        st.join(tok_tot, "tok")
        .join(src_tot, "source")
        .crossJoin(F.broadcast(grand))
        .groupBy("source")
        .agg(
            F.max("_total_s").cast("bigint").alias("n_tokens"),
            F.sum(term.cast("decimal(38,18)")).cast("double").alias("chi2"),
        )
        .select("source", "n_tokens", "chi2")
    )


# BPE stream encoding: tokens wrapped in \x1f with DOUBLE separators
# between them (";a;;b;"), so replacing ";a;;b;" with ";a<merge>b;"
# merges EVERY non-overlapping adjacent occurrence left-to-right —
# verified to behave identically in Spark's replace() and DuckDB's
# (adjacent repeats both merge; overlapping triples merge leftmost
# only), which is exactly the BPE merge rule.
_BPE_SEP = "\x1f"
_BPE_MERGE = "\x1e"


def bpe_merges(docs: DataFrame, steps: int = 3) -> DataFrame:
    """The first ``steps`` merges of byte-pair-encoding tokenizer
    training, computed on the corpus: each step counts all adjacent
    token pairs under the CURRENT tokenization, picks the most
    frequent (ties: lexicographically smallest), and rewrites the
    corpus with that pair fused — the real iterative BPE loop, not
    just a one-shot pair count (text.bigram_top_pairs is step 1's
    count only).

    Iterative-algorithm template, same discipline as operators.kmeans:
    a FIXED number of deterministic iterations, each = one corpus-wide
    aggregation (map-side combined pair counts), a 1-row top-pair
    relation broadcast back, and a map-only rewrite. The DuckDB oracle
    unrolls the identical steps as a CTE chain, so the differential
    proves the whole trajectory. Token streams travel as
    \\x1f-delimited strings. CAVEAT: [^\\s]+ tokens could in principle
    contain the \\x1f/\\x1e control bytes (they are not whitespace);
    such documents are EXCLUDED from the BPE corpus on both engines
    (identical guard in the oracle), so a hostile byte can skew the
    counts by at most its own document, never corrupt the encoding.

    LINEAGE DISCIPLINE (r12 — the bpe_encode_report fix applied to
    the training side, which had the same compounding shape only
    better hidden: each step's output row dragged its OWN lineage of
    all prior rewrites, so the final union re-ran O(steps^2) corpus
    passes at collect time): the corpus relation is eagerly
    localCheckpoint'd up front and per rewrite, and each step's 1-row
    top relation is checkpointed too, so the step's aggregate runs
    EXACTLY once (the output row and the rewrite both read the stored
    row) and the final union is free. Bounded work: one aggregate +
    one rewrite pass per step over stored rows.

    Returns (step, pair_a, pair_b, n_occurrences) — merged tokens from
    earlier steps print with spaces between their parts."""
    s = F.concat(
        F.lit(_BPE_SEP),
        F.array_join(tokens(), _BPE_SEP + _BPE_SEP),
        F.lit(_BPE_SEP),
    )
    cur = (
        docs.filter(F.size(tokens()) > 0)
        .filter(
            ~F.col("text").contains(_BPE_SEP) & ~F.col("text").contains(_BPE_MERGE)
        )
        .select(s.alias("_s"))
        .localCheckpoint(eager=True)
    )
    out: DataFrame | None = None
    for step in range(1, steps + 1):
        toks = F.split(
            F.expr("substring(_s, 2, length(_s) - 2)"), _BPE_SEP + _BPE_SEP
        )
        n = F.size(toks)
        pairs = F.when(
            n >= 2,
            F.zip_with(
                F.slice(toks, 1, n - 1),
                F.slice(toks, 2, n - 1),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        # checkpoint the (<=1-row) top: the output row AND the rewrite
        # both read it, so the step's aggregate runs exactly once
        top = (
            cur.select(F.explode(pairs).alias("p"))
            .groupBy(F.col("p.a").alias("_a"), F.col("p.b").alias("_b"))
            .agg(F.count(F.lit(1)).alias("_n"))
            .orderBy(F.col("_n").desc(), F.col("_a").asc(), F.col("_b").asc())
            .limit(1)
            .localCheckpoint(eager=True)
        )
        row = top.select(
            F.lit(step).cast("int").alias("step"),
            F.replace(F.col("_a"), F.lit(_BPE_MERGE), F.lit(" ")).alias("pair_a"),
            F.replace(F.col("_b"), F.lit(_BPE_MERGE), F.lit(" ")).alias("pair_b"),
            F.col("_n").cast("bigint").alias("n_occurrences"),
        )
        out = row if out is None else out.unionByName(row)
        if step < steps:
            pat = F.concat(
                F.lit(_BPE_SEP), F.col("_a"), F.lit(_BPE_SEP + _BPE_SEP),
                F.col("_b"), F.lit(_BPE_SEP),
            )
            rep = F.concat(
                F.lit(_BPE_SEP), F.col("_a"), F.lit(_BPE_MERGE), F.col("_b"),
                F.lit(_BPE_SEP),
            )
            cur = cur.crossJoin(F.broadcast(top)).select(
                F.replace(F.col("_s"), pat, rep).alias("_s")
            ).localCheckpoint(eager=True)
    return out


def bpe_encode_report(docs: DataFrame, steps: int = 3) -> DataFrame:
    """ENCODE with the trained tokenizer — the missing half of the BPE
    loop (``bpe_merges`` trains; this applies). Trains the same
    ``steps`` merges on the corpus, then applies each merge in rank
    order to every eligible document: one greedy left-to-right
    non-overlapping replace pass per merge — exactly the rewrite the
    training loop itself performs, which is standard BPE encoding
    semantics (later merges see the fused output of earlier ones).

    Returns per document:
    - ``n_tokens_base``    : whitespace tokens before any merge
    - ``n_tokens_bpe``     : tokens after all ``steps`` merges
    - ``n_merges_applied`` : base - bpe (each application fuses 2 -> 1)
    - ``compression``      : bpe / base (one double division)

    Scale shape: the training aggregations are shared with
    ``bpe_merges`` (per step: one map-side-combined pair count -> 1-row
    broadcast). Encoding itself adds ZERO shuffles — each merge is a
    broadcast crossJoin of a 1-row relation plus a map-only string
    rewrite, so at 100 TB the encode pass is embarrassingly parallel
    and the only cluster-wide cost is the 3 tiny pair-count aggs.

    LINEAGE DISCIPLINE (r11 VERDICT item 2 — the semdedup_text_prune
    remedy applied to the merge loop): without truncation, step k's
    pair-count aggregate re-executes all k-1 prior corpus rewrites and
    the final per-doc select re-runs the whole chain — steps-squared
    corpus passes, and the exact compounding the published 11.3 s
    reading showed. The corpus string relation is therefore EAGERLY
    localCheckpoint'd once up front and once per merge step: total
    work becomes 2 bounded passes per step (one aggregate read + one
    rewrite materialization) over rows that already sit in executor
    storage. Same non-reliable-storage trade as operators.kmeans and
    semdedup_text_prune — localCheckpoint TRUNCATES lineage, so a lost
    executor invalidates the stored blocks and FAILS the job (the job
    retry restarts from the source data); reliable checkpointing to a
    fault-tolerant store is the swap where executor loss is routine.
    Measured at sf0.1 (SCALING.md r12): 11.3 s published -> see the
    adjudication row. Same \\x1f/\\x1e sentinel encoding and
    hostile-byte guard as ``bpe_merges`` (docs containing the control
    bytes are excluded on both engines)."""
    s = F.concat(
        F.lit(_BPE_SEP),
        F.array_join(tokens(), _BPE_SEP + _BPE_SEP),
        F.lit(_BPE_SEP),
    )
    cur = (
        docs.filter(F.size(tokens()) > 0)
        .filter(
            ~F.col("text").contains(_BPE_SEP) & ~F.col("text").contains(_BPE_MERGE)
        )
        .select(
            "doc_id",
            F.size(tokens()).cast("bigint").alias("n_tokens_base"),
            s.alias("_s"),
        )
        # materialize the tokenized corpus ONCE: step 1's aggregate and
        # rewrite would otherwise each re-run the parquet scan +
        # tokenize + array_join lineage
        .localCheckpoint(eager=True)
    )
    for _step in range(steps):
        toks = F.split(
            F.expr("substring(_s, 2, length(_s) - 2)"), _BPE_SEP + _BPE_SEP
        )
        n = F.size(toks)
        pairs = F.when(
            n >= 2,
            F.zip_with(
                F.slice(toks, 1, n - 1),
                F.slice(toks, 2, n - 1),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        top = (
            cur.select(F.explode(pairs).alias("p"))
            .groupBy(F.col("p.a").alias("_a"), F.col("p.b").alias("_b"))
            .agg(F.count(F.lit(1)).alias("_n"))
            .orderBy(F.col("_n").desc(), F.col("_a").asc(), F.col("_b").asc())
            .limit(1)
        )
        pat = F.concat(
            F.lit(_BPE_SEP), F.col("_a"), F.lit(_BPE_SEP + _BPE_SEP),
            F.col("_b"), F.lit(_BPE_SEP),
        )
        rep = F.concat(
            F.lit(_BPE_SEP), F.col("_a"), F.lit(_BPE_MERGE), F.col("_b"),
            F.lit(_BPE_SEP),
        )
        # Re-aggregate the (<=1-row) top relation: an ungrouped agg
        # yields EXACTLY one row even on empty input, so a corpus with
        # no adjacent pairs (all single-token docs) flows through as
        # identity instead of being annihilated by a crossJoin against
        # an empty relation (caught by the property test's ['a'] case).
        top1 = top.agg(F.max("_a").alias("_a"), F.max("_b").alias("_b"))
        # unlike training, the LAST merge is applied too: encoding uses
        # the full merge table. Each rewrite is checkpointed eagerly so
        # the NEXT step's aggregate (and the final select) read stored
        # rows instead of replaying every prior rewrite — the lineage
        # truncation the docstring derives.
        cur = cur.crossJoin(F.broadcast(top1)).select(
            "doc_id",
            "n_tokens_base",
            F.when(
                F.col("_a").isNotNull(), F.replace(F.col("_s"), pat, rep)
            ).otherwise(F.col("_s")).alias("_s"),
        ).localCheckpoint(eager=True)
    n_bpe = F.size(
        F.split(F.expr("substring(_s, 2, length(_s) - 2)"), _BPE_SEP + _BPE_SEP)
    ).cast("bigint")
    return cur.select(
        "doc_id",
        "n_tokens_base",
        n_bpe.alias("n_tokens_bpe"),
        (F.col("n_tokens_base") - n_bpe).alias("n_merges_applied"),
        (n_bpe / F.col("n_tokens_base")).alias("compression"),
    )


def quality_classifier_score(docs: DataFrame) -> DataFrame:
    """fastText-style hashed linear classifier scoring — the standard
    cheap quality gate of LLM data pipelines (a linear model over
    hashed bag-of-words features, cf. CCNet/fastText filtering). Each
    token maps to a weight through the feature hash:

        w(tok) = (portable_hash64(tok) mod 2001) - 1000   in [-1000, 1000]

    (hash-derived weights stand in for trained ones so both engines
    agree bit-for-bit; a production deploy swaps in a broadcast weight
    table of identical shape — the PLAN is what this operator pins).
    The document score is the mean weight, computed integer-exactly:

        score_raw = sum(w(tok))              (BIGINT, exact)
        score     = score_raw / (1000 * n)   (ONE double division)
        keep      = score >= 0

    Scale shape: ZERO shuffles — the fold over the token array runs
    in-row inside codegen (F.aggregate), so at 100 TB this is a pure
    map over the corpus: no vocabulary broadcast, no feature explode,
    no aggregation state. The same no-widening discipline as
    trigram_gini_diversity."""
    toks = tokens()
    raw = hashed_score_raw(F.col("_t"))
    n = F.size("_t").cast("bigint")
    return (
        docs.select("doc_id", toks.alias("_t"))
        .filter(F.size("_t") > 0)
        .select(
            "doc_id",
            n.alias("n_tokens"),
            raw.alias("score_raw"),
            (raw.cast("double") / (n * 1000).cast("double")).alias("score"),
            (raw >= 0).alias("keep"),
        )
    )


def hashed_score_raw(toks_col: Column) -> Column:
    """The classifier's integer-exact in-row fold: sum of hash-derived
    token weights in [-1000, 1000] — shared by the per-doc scorer and
    the per-source rollup so the feature hash cannot drift."""
    weight = lambda x: (  # noqa: E731 — inline fold step
        F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("bigint") % 2001 - 1000
    )
    return F.aggregate(
        toks_col, F.lit(0).cast("bigint"), lambda acc, x: acc + weight(x)
    )


# Dialect-portable PII patterns: explicit [0-9]/[A-Za-z] classes only —
# identical in Java regex (Spark) and RE2 (DuckDB); no \d/\w shorthands
# (Unicode semantics differ, see tests/test_regex_dialect.py).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"[0-9]{3}-[0-9]{2,}"
PII_IPV4 = r"([0-9]{1,3}\.){3}[0-9]{1,3}"


def with_synthetic_pii(docs: DataFrame) -> DataFrame:
    """Append a deterministic PII-bearing suffix to each document —
    the testdata corpus contains no real PII (by design), so the
    redaction path needs seeded positives. Pure function of doc_id;
    the DuckDB oracle builds the identical suffix."""
    suffix = F.concat(
        F.lit(" Contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com phone 555-01"),
        (F.col("doc_id") % 90 + 10).cast("string"),
        F.lit(" ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    return docs.withColumn("aug_text", F.concat(F.col("text"), suffix))


def pii_redact(docs: DataFrame) -> DataFrame:
    """Detect-and-redact pass for training-data hygiene: count emails /
    phone-like / IPv4-like spans and emit the redacted tail. Map-only
    (regexp_extract_all + chained regexp_replace), no Python, no
    shuffle — at 100 TB this runs at scan speed."""
    aug = with_synthetic_pii(docs)
    t = F.col("aug_text")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), 0)).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), 0)).cast("bigint").alias("n_phones"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), 0)).cast("bigint").alias("n_ips"),
        # explicit start index: negative-start substring semantics
        # differ across engines (Spark counts from the end, DuckDB
        # follows Postgres) — greatest(1, len-79) is identical in both.
        redacted.substr(
            F.greatest(F.lit(1), F.length(redacted) - 79), F.lit(80)
        ).alias("redacted_tail"),
    )


def quality_filter_funnel(docs: DataFrame) -> DataFrame:
    """The corpus-curation funnel: how many documents survive each
    quality gate, applied cumulatively in pipeline order — the
    one-table report every training-data run publishes.

    Stages (thresholds chosen off knife-edge values so cross-engine
    float comparisons can't flip on an exact boundary):
      1 min_tokens : n_tokens >= 20
      2 quality    : composite quality_score >= 0.62 (text_stats math)
      3 repetition : dup_2gram_ratio < 0.05 (short docs fail stage 1)
      4 top_token  : top_token_ratio <= 0.12

    ONE map pass computes every flag per document via the SHARED
    signal expressions (quality_score / ngram_dup_ratio /
    top_token_run_count — no join of the per-signal operators, and no
    drift from them either), then a single global aggregation emits
    the funnel.
    """
    toks = tokens()
    n = F.size(toks)
    # ngram_dup_ratio is NULL-guarded for short docs (an unguarded
    # size(bigrams) division would THROW under ANSI mode, and conjunct
    # short-circuit order is not contractual).
    dup2 = ngram_dup_ratio(toks, 2)
    top_ratio = top_token_run_count(toks).cast("double") / n

    c1 = n >= 20
    c2 = c1 & (quality_score(toks) >= 0.62)
    c3 = c2 & F.coalesce(dup2 < 0.05, F.lit(False))
    c4 = c3 & (top_ratio <= 0.12)
    flagged = docs.filter(n > 0).select(
        c1.alias("c1"), c2.alias("c2"), c3.alias("c3"), c4.alias("c4")
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n0"),
        *[
            F.sum(F.col(f"c{i}").cast("long")).alias(f"n{i}")
            for i in (1, 2, 3, 4)
        ],
    )
    return agg.select(
        F.expr(
            "stack(5, 0, 'all', n0, 1, 'min_tokens', n1, 2, 'quality', n2, "
            "3, 'repetition', n3, 4, 'top_token', n4) AS (stage_no, stage, n_pass)"
        )
    )


def source_quality_matrix(docs: DataFrame) -> DataFrame:
    """Per-source curation dashboard — the table that sets per-source
    mixture weights: the quality funnel's cumulative gate counts BY
    SOURCE (same shared flag expressions as quality_filter_funnel, so
    the two reports cannot drift) plus the hashed classifier's
    token-weighted mean score, computed integer-exactly
    (sum_score_raw / (1000 * sum_tokens), ONE double division).

    Columns: (source, n_docs, n_min_tokens, n_quality, n_repetition,
    n_top_token, sum_score_raw, sum_tokens, mean_token_weight).

    Scale shape: ONE map pass computes every flag and the classifier
    fold per document; one source-keyed aggregation (map-side combined,
    source-cardinality output) emits the matrix. No joins, no second
    corpus scan."""
    toks = tokens()
    n = F.size(toks)
    dup2 = ngram_dup_ratio(toks, 2)
    top_ratio = top_token_run_count(toks).cast("double") / n
    c1 = n >= 20
    c2 = c1 & (quality_score(toks) >= 0.62)
    c3 = c2 & F.coalesce(dup2 < 0.05, F.lit(False))
    c4 = c3 & (top_ratio <= 0.12)
    flagged = docs.filter(n > 0).select(
        "source",
        c1.alias("c1"),
        c2.alias("c2"),
        c3.alias("c3"),
        c4.alias("c4"),
        hashed_score_raw(toks).alias("_raw"),
        n.cast("bigint").alias("_nt"),
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("c1").cast("bigint")).alias("n_min_tokens"),
        F.sum(F.col("c2").cast("bigint")).alias("n_quality"),
        F.sum(F.col("c3").cast("bigint")).alias("n_repetition"),
        F.sum(F.col("c4").cast("bigint")).alias("n_top_token"),
        F.sum("_raw").alias("sum_score_raw"),
        F.sum("_nt").alias("sum_tokens"),
        (
            F.sum("_raw").cast("double")
            / (F.sum("_nt") * 1000).cast("double")
        ).alias("mean_token_weight"),
    )


def normalize_text(docs: DataFrame) -> DataFrame:
    """Canonical text cleaning: lowercase, strip non-alphanumeric
    (keeping spaces), collapse whitespace runs, trim — the first pass
    of every text-dedup/training pipeline, plus before/after lengths
    so the aggressiveness is observable."""
    cleaned = F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
        " +",
        " ",
    )
    trimmed = F.regexp_replace(cleaned, "^ +| +$", "")
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("len_raw"),
        F.length(trimmed).cast("bigint").alias("len_clean"),
        F.substring(trimmed, 1, 80).alias("clean_prefix"),
    )


def bigram_top_pairs(docs: DataFrame, k: int = 20) -> DataFrame:
    """Corpus-wide top-k adjacent token pairs — the merge-candidate
    statistic a BPE-style tokenizer training pass computes each round
    (over tokens rather than bytes here). O(tokens) pair construction
    via the shifted-array zip (token_ngrams), map-side combined count,
    TakeOrderedAndProject for the top-k; ties broken lexically so the
    result is deterministic."""
    pairs = docs.select(
        F.explode(token_ngrams(tokens(), 2, distinct=False)).alias("gram")
    )
    return (
        pairs.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("gram").asc())
        .limit(k)
    )


def adaptive_length_filter(
    docs: DataFrame, lo_pct: int = 5, hi_pct: int = 95
) -> DataFrame:
    """Per-source ADAPTIVE length gates — the C4/Gopher fixed length
    filter made source-aware: each source keeps documents whose
    n_chars lies within its own [p05, p95] (cutoffs are EXACT order
    statistics of that source's length distribution, so a long-form
    source is not gutted by thresholds tuned for a short-form one).

    Cutoff semantics: cut = min length whose cumulative count reaches
    pct% of the source (ceiling convention, 100*cume >= pct*n in pure
    integers — no float percentile on either engine). Kept iff
    cut_low <= n_chars <= cut_high.

    Output per source: (source, n_docs, cut_low, cut_high, n_kept,
    n_short, n_long), all exact BIGINTs.

    Why this shape at 100 TB: exact per-source quantiles normally sort
    the corpus — instead lengths are aggregated to a (source, n_chars)
    VALUE-COUNT grid first (integer domain, bounded distinct values:
    the same trick as the histogram sketch but lossless), the
    cumulative scan runs over that grid (thousands of rows, not the
    corpus), and the per-source cutoff relation broadcasts back onto
    the scan. Shuffles: one grid aggregation + one per-source report
    aggregation; the corpus itself is never sorted or widened."""
    grid = (
        docs.filter(F.col("n_chars").isNotNull())
        .groupBy("source", "n_chars")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "source", "n_chars", F.sum("_c").over(w).alias("_cume")
    )
    totals = grid.groupBy("source").agg(F.sum("_c").alias("_n"))
    j = cum.join(F.broadcast(totals), "source")
    cuts = j.groupBy("source").agg(
        F.min(
            F.when(100 * F.col("_cume") >= lo_pct * F.col("_n"), F.col("n_chars"))
        ).alias("cut_low"),
        F.min(
            F.when(100 * F.col("_cume") >= hi_pct * F.col("_n"), F.col("n_chars"))
        ).alias("cut_high"),
    )
    gated = docs.filter(F.col("n_chars").isNotNull()).join(
        F.broadcast(cuts), "source"
    )
    kept = (F.col("n_chars") >= F.col("cut_low")) & (
        F.col("n_chars") <= F.col("cut_high")
    )
    return gated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.first("cut_low").alias("cut_low"),
        F.first("cut_high").alias("cut_high"),
        F.sum(kept.cast("bigint")).alias("n_kept"),
        F.sum((F.col("n_chars") < F.col("cut_low")).cast("bigint")).alias("n_short"),
        F.sum((F.col("n_chars") > F.col("cut_high")).cast("bigint")).alias("n_long"),
    )


def bigram_lift_top(docs: DataFrame, k: int = 20, min_pair: int = 5) -> DataFrame:
    """Collocation mining: the top-``k`` adjacent token pairs by LIFT —
    observed co-occurrence over the independence expectation:

        lift(a,b) = (n_ab / N) / ((c_a / T) * (c_b / T))

    with n_ab = pair occurrences, N = total pairs, c_x = unigram
    occurrences, T = total tokens. This is the association statistic
    behind phrase detection (word2vec-style phrase merging, PMI-based
    collocation tables) kept inside the repo's no-transcendentals float
    policy: PMI = log(lift), and log is monotone, so ranking by lift IS
    ranking by PMI without either engine evaluating a transcendental.
    Pairs below ``min_pair`` occurrences are dropped (1-count pairs
    produce unstable top ranks). All counts are exact BIGINTs; lift is
    one double expression with an identical tree on both engines.

    Scale shape — the vocabulary is NEVER broadcast (same discipline as
    token_frequency_score): pair counts aggregate on the pair key,
    unigram counts on the token key (both map-side combined, count
    relations are far smaller than the corpus), then the pair relation
    joins the unigram relation twice (on a, then b) as ordinary
    shuffle joins; the global (T, N) scalars ride in via a 1-row
    broadcast. TakeOrderedAndProject caps the output at k."""
    toks = tokens()
    pairs = docs.select(F.explode(token_ngrams(toks, 2, distinct=False)).alias("gram"))
    pair_counts = (
        pairs.groupBy("gram").agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair)
        .select(
            "gram",
            F.split_part(F.col("gram"), F.lit(" "), F.lit(1)).alias("_a"),
            F.split_part(F.col("gram"), F.lit(" "), F.lit(2)).alias("_b"),
            "n_pair",
        )
    )
    unis = docs.select(F.explode(toks).alias("tok"))
    uni_counts = unis.groupBy("tok").agg(F.count(F.lit(1)).alias("_c"))
    totals = unis.agg(F.count(F.lit(1)).alias("_t")).crossJoin(
        pairs.agg(F.count(F.lit(1)).alias("_n"))
    )
    joined = (
        pair_counts.join(uni_counts.select(F.col("tok").alias("_a"), F.col("_c").alias("c_a")), "_a")
        .join(uni_counts.select(F.col("tok").alias("_b"), F.col("_c").alias("c_b")), "_b")
        .crossJoin(F.broadcast(totals))
    )
    # Each factor is cast to double BEFORE multiplying: n_pair*T and
    # c_a*c_b in BIGINT overflow int64 past ~3e9 tokens — DuckDB would
    # raise while Spark silently wraps (r5 ADVICE). lift is a float
    # output, so no exactness is lost; the oracle mirrors the same
    # expression tree.
    lift = (
        F.col("n_pair").cast("double")
        * F.col("_t").cast("double")
        * F.col("_t").cast("double")
    ) / (
        F.col("_n").cast("double")
        * (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
    )
    return (
        joined.select("gram", "n_pair", "c_a", "c_b", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), F.col("gram").asc())
        .limit(k)
    )


def doc_chunks(docs: DataFrame, chunk: int = 64, stride: int = 32) -> DataFrame:
    """Overlapping token-window chunking — the context-window prep step
    of an LLM data pipeline (chunk size in tokens, stride < chunk gives
    overlap). Start positions 0, stride, 2*stride, ... < n_tokens; the
    final chunk may be short. Emits a content hash per chunk so the
    differential gate verifies the chunk TEXT, not just its shape.

    Map-only: sequence+transform build the windows per doc inside
    codegen (O(n_tokens * chunk / stride) per doc, linear work per
    emitted token), explode fans out — no shuffle, no state."""
    from flink_kafka_filter_transform_spark.functions.hashing import portable_hash64

    toks = tokens()
    starts = F.sequence(F.lit(0), F.size(F.col("_t")) - 1, F.lit(stride))
    chunk_toks = F.slice(F.col("_t"), F.col("_s") + 1, chunk)
    return (
        docs.select("doc_id", toks.alias("_t"))
        .filter(F.size("_t") > 0)
        .select("doc_id", "_t", F.explode(starts).alias("_s"))
        .select(
            "doc_id",
            (F.col("_s") / stride).cast("int").alias("chunk_idx"),
            chunk_toks.alias("_c"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("_c").cast("bigint").alias("n_chunk_tokens"),
            portable_hash64(F.array_join(F.col("_c"), " ")).alias("chunk_hash"),
        )
    )


def trigram_gini_diversity(docs: DataFrame) -> DataFrame:
    """Per-document lexical-diversity profile — the polynomial stand-in
    for token entropy that stays inside the repo's no-transcendentals
    float policy (like source_vocab_divergence's chi-square):

    - ``distinct_ratio``          : distinct tokens / tokens
    - ``gini``                    : Gini impurity 1 - sum(c_i^2)/n^2 of
                                    the doc's token distribution
                                    (0 = one token repeated, ->1 = all
                                    distinct); integer-exact numerator
                                    via a single sorted run-length fold
    - ``trigram_distinct_ratio``  : distinct / total token trigrams
                                    (NULL under 3 tokens)

    A low-gini or low-trigram-ratio doc is boilerplate/spam; corpora
    are gated on these before training (Gopher-style quality rules).

    Scale shape: map-only — one projection per document, no shuffle,
    no vocabulary state. The run-length fold over the SORTED token
    array is O(n log n) per doc and purely integer until the final
    double division, so both engines agree bit-for-bit (DuckDB's
    oracle computes the same sums relationally).
    """
    toks = tokens()
    n = F.size(toks).cast("bigint")
    # sum of squared token counts, via run lengths of the sorted array:
    # fold state (prev token, current run, acc of completed run^2);
    # finish closes the last run. Tokens are [^\s]+ so the "" sentinel
    # can never collide with a real token.
    sum_sq = F.aggregate(
        F.sort_array(toks),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("bigint").alias("run"),
            F.lit(0).cast("bigint").alias("acc"),
        ),
        lambda s, x: F.struct(
            x.alias("prev"),
            F.when(x == s["prev"], s["run"] + 1).otherwise(F.lit(1).cast("bigint")).alias("run"),
            F.when(x == s["prev"], s["acc"])
            .otherwise(s["acc"] + s["run"] * s["run"])
            .alias("acc"),
        ),
        lambda s: s["acc"] + s["run"] * s["run"],
    )
    tri_total = n - 2
    tri_distinct = F.size(token_ngrams(toks, 3, distinct=True)).cast("bigint")
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        F.when(
            n > 0,
            F.size(F.array_distinct(toks)).cast("double") / n.cast("double"),
        ).alias("distinct_ratio"),
        F.when(
            n > 0,
            F.lit(1.0) - sum_sq.cast("double") / (n * n).cast("double"),
        ).alias("gini"),
        F.when(
            n >= 3, tri_distinct.cast("double") / tri_total.cast("double")
        ).alias("trigram_distinct_ratio"),
    )


def bm25_top_docs(
    docs: DataFrame,
    k: int = 5,
    query_mod: int = 200,
    query_terms: int = 6,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 retrieval (r7): for each query document (doc_id %
    ``query_mod`` == 0, standing in for a bounded query workload), rank
    the rest of the corpus by BM25 over the query's first
    ``query_terms`` distinct tokens and keep the top ``k``.

    The idf is the RATIONAL Robertson form (N - df + 0.5)/(df + 0.5)
    WITHOUT the logarithm — the same transcendental-free divergence
    tfidf_top_terms documents: ln is not bit-reproducible across
    engines, and per-term the transform is monotone (summed scores
    weight rare terms more steeply than classic BM25; the contract is
    this exact formula, mirrored in the oracle). Per-term scores are
    deterministic doubles built from integer counts; the per-(query,
    doc) sum goes through exact DECIMAL(28,18) so shuffle order cannot
    perturb ranking — the same discipline as the PQ ADC sums.

    Scale shape: the query-term relation is bounded by contract
    (queries x query_terms rows — BROADCAST), and it is pushed BELOW
    every aggregation: the exploded token stream is semi-joined to the
    broadcast query-term set BEFORE tf/df are counted, so the only
    (doc, term) shuffle carries query-term postings — never the full
    corpus vocabulary (tf over all terms would be the dominant
    100 TB shuffle, computed then immediately discarded). Document
    length/count stats are the one corpus-wide pass, a thin doc-keyed
    count with map-side combine. Candidate volume is
    docs-containing-a-query-term; top-k is a per-query window."""
    from pyspark.sql.window import Window

    ex = docs.select("doc_id", F.explode(tokens()).alias("term"))
    dl = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("dl").cast("decimal(28,18)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    qterms = (
        docs.filter(F.col("doc_id") % query_mod == 0)
        .select(
            F.col("doc_id").alias("q_doc"),
            F.explode(
                F.array_distinct(F.slice(tokens(), 1, query_terms))
            ).alias("term"),
        )
        .distinct()
    )
    exq = ex.join(F.broadcast(qterms.select("term").distinct()), "term")
    tf = exq.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    idf = (
        F.col("n_docs").cast("double")
        - F.col("df_count").cast("double")
        + F.lit(0.5)
    ) / (F.col("df_count").cast("double") + F.lit(0.5))
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    term_score = idf * (
        tfd * F.lit(k1 + 1.0)
        / (tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dld / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .filter(F.col("doc_id") != F.col("q_doc"))
        .join(dl, "doc_id")
        .join(dfc, "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("q_doc", "doc_id")
        .agg(
            F.sum(term_score.cast("decimal(28,18)")).cast("double").alias("bm25"),
            F.count(F.lit(1)).alias("n_matched_terms"),
        )
    )
    w = Window.partitionBy("q_doc").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_doc", "rank", "doc_id", "n_matched_terms", "bm25")
    )


def unigram_surprisal(docs: DataFrame) -> DataFrame:
    """Per-document unigram-LM quality proxy (r7), integer-exact: the
    CCNet-style language-model filter scores each document by its mean
    token surprisal under a unigram model trained on the corpus
    itself. The house rule bans transcendentals (ln is not
    bit-reproducible cross-engine), so surprisal is quantized to WHOLE
    BITS exactly: for token t with count c out of T total,

        bits(t) = floor(log2(T // c)) = length(bin(T // c)) - 1

    — pure integer ops (integer division, binary-string length) that
    both engines compute identically, the same fixed-point discipline
    as graph.pagerank. Per doc: mean bits over all token OCCURRENCES
    (rare tokens -> high surprisal; template spam -> low). One global
    count pass + one doc-keyed agg; the (term -> bits) relation joins
    the exploded tokens on the term-hash shuffle tfidf shares, nothing
    is broadcast except the 1-row total. The scoring join is pinned
    SHUFFLE_HASH with the vocabulary as build side: neither side is
    broadcastable at scale (the token stream is corpus-sized; the
    vocabulary is unbounded -- the tfidf rule), and at test SF the
    static planner would otherwise pick the token stream ITSELF as a
    broadcast build (a guaranteed 100 TB OOM); per-partition
    vocabulary slices always fit."""
    ex = docs.select("doc_id", F.explode(tokens()).alias("term"))
    counts = ex.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    bits = (
        counts.crossJoin(F.broadcast(total))
        .select(
            "term",
            (F.length(F.bin(F.expr("total DIV cnt"))) - 1)
            .cast("bigint")
            .alias("bits"),
        )
    )
    return (
        ex.join(bits.hint("shuffle_hash"), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("bits").alias("sum_bits"),
            (
                F.sum("bits").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("mean_surprisal_bits"),
        )
    )


def bigram_surprisal(docs: DataFrame) -> DataFrame:
    """Per-document bigram-LM quality score with stupid backoff (r9;
    VERDICT r8 item 7) — the context-aware upgrade of
    unigram_surprisal under the same integer-exact discipline. CCNet's
    filter uses a 5-gram LM because context matters: "the the the" has
    LOW unigram surprisal but screams in any conditional model. Scoring
    per token position:

    - position 1 of each doc (no context): unigram bits
      floor(log2(T // c1)) = length(bin(T DIV c1)) - 1;
    - bigram (prev, cur) with corpus count c2 >= BIGRAM_MIN_COUNT:
      conditional bits floor(log2(ctx // c2)) where ctx = occurrences
      of prev as a left context (sum of its bigram counts);
    - rarer bigrams (the singletons a trained LM prunes): stupid
      backoff (Brants et al. 2007) to unigram bits + 2 (alpha = 1/4,
      the power-of-two backoff weight — pure integer arithmetic, no
      transcendental anywhere, bit-identical cross-engine).

    Reported per doc: n_tokens, n_backoff (positions that backed off —
    high fraction = novel-construction text; LOW mean + low backoff =
    templated spam), sum_bits, mean_surprisal_bits.

    Scale shape: pairs are built map-side (two slices zipped — no
    self-join, the bigram_top_pairs trick); the corpus-sized rows then
    cross exactly three shuffles — the (prev, cur) pair count, the
    token unigram count, and the scoring join keyed on the same pair
    key — plus the final doc aggregate. The ctx / pair-bits relations
    are vocabulary-sized derivations of the pair counts. Nothing
    broadcasts except the 1-row grand total; the scoring joins are
    pinned SHUFFLE_HASH (the tfidf rule: an unbounded vocabulary is
    not broadcastable, and at test SF the static planner would pick
    the TOKEN STREAM as the build side — a guaranteed 100 TB OOM)."""
    t = tokens()
    base = docs.select("doc_id", t.alias("t")).filter(F.size("t") >= 1)
    n = F.size(F.col("t"))
    pair = F.zip_with(
        F.slice(F.col("t"), 1, n - 1),
        F.slice(F.col("t"), 2, n - 1),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    pairs_ex = (
        base.filter(n >= 2)
        .select("doc_id", F.explode(pair).alias("p"))
        .select("doc_id", "p.prev", "p.cur")
    )
    uni = base.select(F.explode("t").alias("term")).groupBy("term").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = uni.agg(F.sum("cnt").alias("total"))
    term_bits = uni.crossJoin(F.broadcast(total)).select(
        "term",
        (F.length(F.bin(F.expr("total DIV cnt"))) - 1)
        .cast("bigint")
        .alias("ub"),
    )
    pc = pairs_ex.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))
    ctx = pc.groupBy("prev").agg(F.sum("c2").alias("ctx"))
    pair_bits = (
        pc.join(ctx.hint("shuffle_hash"), "prev")
        .join(
            term_bits.withColumnRenamed("term", "cur").hint("shuffle_hash"),
            "cur",
        )
        .select(
            "prev",
            "cur",
            F.when(
                F.col("c2") >= params.BIGRAM_MIN_COUNT,
                (F.length(F.bin(F.expr("ctx DIV c2"))) - 1).cast("bigint"),
            )
            .otherwise(F.lit(params.BIGRAM_BACKOFF_BITS) + F.col("ub"))
            .alias("bits"),
            F.when(F.col("c2") >= params.BIGRAM_MIN_COUNT, F.lit(0))
            .otherwise(F.lit(1))
            .alias("backoff"),
        )
    )
    scored_pairs = pairs_ex.join(
        pair_bits.hint("shuffle_hash"), ["prev", "cur"]
    ).select("doc_id", "bits", "backoff")
    scored_firsts = (
        base.select("doc_id", F.col("t")[0].alias("term"))
        .join(term_bits.hint("shuffle_hash"), "term")
        .select(
            "doc_id", F.col("ub").alias("bits"), F.lit(0).alias("backoff")
        )
    )
    return (
        scored_pairs.unionByName(scored_firsts)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("backoff").cast("bigint").alias("n_backoff"),
            F.sum("bits").alias("sum_bits"),
            (
                F.sum("bits").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("mean_surprisal_bits"),
        )
    )


def gopher_quality_rules(docs: DataFrame) -> DataFrame:
    """Per-rule hit counts for the Gopher quality heuristics (Rae et
    al. 2021, "Scaling Language Models", §A1.1) — the named published
    ruleset that C4/MassiveText-descended pipelines actually run, and
    the rule-auditing complement to quality_filter_funnel: the funnel
    applies the repo's composite score CUMULATIVELY in pipeline order,
    this report counts each Gopher rule INDEPENDENTLY (the paper's own
    presentation), which is how a curator spots one mis-tuned
    threshold hiding behind an earlier stage.

    Rules (document FAILS if the condition holds; every boundary is an
    integer comparison — no float threshold can flip cross-engine):
      1 word_count        n < 50 OR n > 100000
      2 mean_word_length  outside [3, 10]: sum_len < 3n OR sum_len > 10n
      3 symbol_ratio      EITHER symbol alone exceeds ratio 0.1 of
                          words (Rae et al. test '#' and '...'
                          separately): 10 * n_hash > n OR
                          10 * n_ellipsis > n; the ellipsis side is
                          kept integer-exact as 10 * 3*n_ell_chars >
                          3 * n (r9 ADVICE: the prior combined-sum
                          form flagged docs the paper's per-symbol
                          rule passes)
      4 alpha_words       words containing an alphabetic char < 80%:
                          5 * n_alpha < 4 * n
      5 stopwords         fewer than 2 DISTINCT stop words present
                          (params.STOPWORDS — the repo's tokenizer-
                          matched list stands in for the paper's
                          English function-word list)
    Rows 0 ('all') and 6 ('pass_all') carry the corpus total and the
    all-rules survivor count, so the report is self-normalizing.

    Scale shape: ONE map pass computes all five flags per document
    from shared array expressions (no per-rule operator join), then a
    single global aggregation (7 fixed-width output rows) — the same
    two-step shape as quality_filter_funnel, map-side combined, no
    window, no broadcast."""
    toks = tokens()
    n = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    n_hash = F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))
    # chars removed by deleting every '...' = 3 * n_ellipsis; compare
    # 10 * (3*n_ell) > 3 * n so the ellipsis ratio never touches a
    # division (integer-exact on both engines)
    n_ell3 = F.length("text") - F.length(
        F.replace(F.col("text"), F.lit("..."))
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    stop_arr = F.array(*[F.lit(s) for s in params.STOPWORDS])
    n_stop_distinct = F.size(
        F.array_intersect(F.array_distinct(toks), stop_arr)
    )

    f1 = (n < 50) | (n > 100000)
    f2 = (sum_len < 3 * n) | (sum_len > 10 * n)
    f3 = (F.lit(10) * n_hash > n) | (F.lit(10) * n_ell3 > F.lit(3) * n)
    f4 = F.lit(5) * n_alpha < F.lit(4) * n
    f5 = n_stop_distinct < 2
    flagged = docs.select(
        f1.alias("f1"), f2.alias("f2"), f3.alias("f3"),
        f4.alias("f4"), f5.alias("f5"),
        (~f1 & ~f2 & ~f3 & ~f4 & ~f5).alias("ok"),
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n0"),
        *[F.sum(F.col(f"f{i}").cast("long")).alias(f"n{i}") for i in range(1, 6)],
        F.sum(F.col("ok").cast("long")).alias("n6"),
    )
    return agg.select(
        F.expr(
            "stack(7, 0, 'all', n0, 1, 'word_count', n1, "
            "2, 'mean_word_length', n2, 3, 'symbol_ratio', n3, "
            "4, 'alpha_words', n4, 5, 'stopwords', n5, "
            "6, 'pass_all', n6) AS (rule_no, rule, n_docs)"
        )
    )


def vocab_growth_curve(docs: DataFrame, n_buckets: int = 20) -> DataFrame:
    """Heaps-law vocabulary growth curve: documents in ingestion order
    (doc_id) are cut into ``n_buckets`` equal-width id ranges, and each
    bucket reports the tokens it adds and the token TYPES it is the
    first to contribute, plus both cumulative curves — the corpus-level
    "are we running out of new data" readout (Heaps 1978: V ~ n^beta;
    a crawl whose cum_types curve flattens while cum_tokens grows is
    re-crawling itself, the signal behind data-constrained scaling
    analyses a la Muennighoff et al. 2023). The corpus-granular rollup
    of the same first-occurrence signal gram_novelty_profile reads
    per-document — unigram types here (the Heaps quantity), hashed
    4-grams there, and neither derives from the other.

    Scale shape: the exploded (token, doc_id) relation shuffles
    EXACTLY ONCE — the token-keyed min(doc_id) aggregate, map-side
    combined (min is the cheapest per-key state; a boilerplate token
    in every document costs one aggregate row). Both rollups land on
    <= n_buckets fixed-width rows, so the cumulative window runs over
    n_buckets rows in one task BY CONSTRUCTION (the only single-
    partition window in the family, and provably bounded). The max
    doc_id is a 1-row aggregate broadcast onto both branches; tokens
    aggregate as raw strings (no hash: unigram types are exact on both
    engines, and the agg key is corpus-vocabulary-sized, not
    corpus-sized)."""
    toks_df = docs.select("doc_id", tokens().alias("t")).filter(
        F.size("t") > 0
    )
    mx = toks_df.agg(F.max("doc_id").alias("_mx"))
    bucket = F.expr(f"(doc_id * {n_buckets}) div (_mx + 1)").cast("int")
    per_doc = toks_df.crossJoin(F.broadcast(mx)).select(
        bucket.alias("bucket"), F.size("t").cast("bigint").alias("n_toks"), "t"
    )
    bt = per_doc.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("bucket_tokens"),
    )
    firsts = (
        toks_df.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("doc_id"))
        .crossJoin(F.broadcast(mx))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    w = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bt.join(firsts, "bucket", "left")
        .select(
            "bucket",
            "n_docs",
            "bucket_tokens",
            F.coalesce("new_types", F.lit(0)).cast("bigint").alias("new_types"),
        )
        .withColumn("cum_tokens", F.sum("bucket_tokens").over(w))
        .withColumn("cum_types", F.sum("new_types").over(w))
    )


def doc_hash_embedding(docs: DataFrame, dim: int = 64) -> DataFrame:
    """Feature-hashed document vectors (the hashing trick, Weinberger
    et al. 2009): every token lands in bucket h mod dim with sign +1/-1
    taken from the hash's NEXT bit, summed per document — a
    deterministic, model-free doc embedding that bridges the text
    stack to the similarity stack (all other ANN here runs on the
    synthetic embeddings table; this one is computed FROM the corpus).
    Emitted SPARSE in long format (doc_id, idx, value) — integer
    values, no array-typed output (the driver-contract hashability
    rule embedding_quantize documents). Signed buckets keep the
    estimator unbiased under collisions (the paper's point), and
    INTEGER values keep every downstream dot product exact.

    Scale shape: one explode + one (doc_id, idx)-keyed integer sum,
    map-side combined; <= dim non-zero rows per document out. ``dim``
    must be a power of two so bucket and sign are bit fields of ONE
    hash (h mod dim / bit log2(dim)) — no second hash pass."""
    assert dim & (dim - 1) == 0, "dim must be a power of two"
    shift = dim.bit_length() - 1
    h = portable_hash64("tok")
    e = docs.select("doc_id", F.explode(tokens()).alias("tok")).select(
        "doc_id",
        F.pmod(h, F.lit(dim)).cast("int").alias("idx"),
        F.when(
            F.shiftright(h, shift).bitwiseAND(F.lit(1)) == 0, F.lit(1)
        )
        .otherwise(F.lit(-1))
        .alias("sign"),
    )
    return (
        e.groupBy("doc_id", "idx")
        .agg(F.sum("sign").cast("bigint").alias("value"))
        .filter(F.col("value") != 0)
    )


def doc_text_knn(docs: DataFrame, k: int = 5, dim: int = 64) -> DataFrame:
    """Similarity search over the TEXT corpus itself: cosine top-k
    between documents using the feature-hashed vectors — "find me
    documents like this one" without an embedding model. Query set =
    doc_id < KNN_NUM_QUERIES (the vec_id convention).

    Everything before the FINAL division is INTEGER-EXACT: the dot
    product joins the two sparse relations on idx and sums integer
    products; squared norms are integer sums; cosine becomes
    dot / sqrt(CAST(na2 * nb2 AS DOUBLE)) — one double op per pair,
    so no fold-order contract is even needed.

    Scale shape: the corpus-side sparse relation shuffles once (the
    embedding aggregate); the 5 query docs' sparse rows broadcast onto
    an idx equi-join (never an all-pairs cross join — the sparse idx
    join IS the candidate generator); norms ride the same aggregate
    shape; per-query top-k windows over scored pairs only."""
    from flink_kafka_filter_transform_spark.operators import params

    emb = doc_hash_embedding(docs, dim=dim)
    norms = emb.groupBy("doc_id").agg(
        F.sum(F.col("value") * F.col("value")).cast("bigint").alias("n2")
    )
    q = emb.filter(F.col("doc_id") < params.KNN_NUM_QUERIES).select(
        F.col("doc_id").alias("q_id"), "idx", F.col("value").alias("q_value")
    )
    dots = (
        emb.join(F.broadcast(q), "idx")
        .filter(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(F.sum(F.col("value") * F.col("q_value")).cast("bigint").alias("dot"))
    )
    qn = norms.select(F.col("doc_id").alias("q_id"), F.col("n2").alias("q_n2"))
    scored = (
        dots.join(norms, "doc_id")
        .join(F.broadcast(qn), "q_id")
        .select(
            "q_id",
            "doc_id",
            (
                F.col("dot").cast("double")
                / F.sqrt((F.col("n2") * F.col("q_n2")).cast("double"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_id", "doc_id", "rank", "cos_sim")
    )

def char_entropy_profile(docs: DataFrame) -> DataFrame:
    """Per-document zeroth-order CHARACTER entropy bound — the
    compressibility quality signal (RedPajama/Dolma ship a zlib
    compression-ratio signal; the zeroth-order entropy coder bound is
    its model-free core, and unlike zlib it is computable EXACTLY in
    both engines): for each doc, sum over characters of
    count * floor(log2(n / count)) whole bits (the repo's established
    integer-bit discipline: length(bin(n DIV c)) - 1 — no
    transcendentals, bit-identical cross-engine). A low bits-per-char
    reading is a repetitive/boilerplate doc (keyboard mashing, menu
    spam); a high one approaches the charset's capacity. Reported:
    total chars, distinct chars, the entropy-bound bits, and integer
    millibits per char (1000 * bits DIV n — the filterable signal).

    Distinct from unigram_surprisal (token-grain surprisal under the
    CORPUS unigram LM — a cross-doc frequency signal): this is each
    document against its OWN char distribution, the self-information
    readout compression approximates. Scale shape: one char explode
    (same row volume as the substring family's windows at k=1), a
    (doc_id, ch)-keyed count with map-side combine, then a doc-keyed
    rollup — two aggregate shuffles, no join, no window, no
    broadcast."""
    c = F.col("text")
    chars = (
        docs.filter(F.length(c) > 0)
        .select(
            "doc_id",
            F.length(c).cast("bigint").alias("n"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length(c)),
                    lambda i: F.substring(c, i, 1),
                )
            ).alias("ch"),
        )
    )
    per_char = chars.groupBy("doc_id", "n", "ch").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    bits = F.length(F.bin(F.expr("n DIV cnt"))) - F.lit(1)
    return (
        per_char.groupBy("doc_id")
        .agg(
            F.first("n").alias("n_chars"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_chars"),
            F.sum(F.col("cnt") * bits).cast("bigint").alias("entropy_bits"),
        )
        .select(
            "doc_id",
            "n_chars",
            "n_distinct_chars",
            "entropy_bits",
            F.expr("(1000 * entropy_bits) DIV n_chars").alias(
                "millibits_per_char"
            ),
        )
    )
