"""Text-analysis operators: tokenization, counting, quality scoring,
language ID, document fingerprinting.

All pure ``pyspark.sql.functions`` column expressions (JVM-side, inside
whole-stage codegen) — a 100 TB corpus pass stays a single narrow
projection stage with zero shuffles and zero Python. The token regexes
avoid backslash classes so identical pattern strings run in DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_RE = "[a-z0-9]+"
# BPE-ish segmentation: letter runs, single digits grouped, other symbols
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# tiny function-word lists for the n-gram/stopword language heuristic
LANG_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "on"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "nicht"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "un", "est", "dans", "que"),
    "zh": ("de", "shi", "le", "zai", "wo", "you", "he", "bu"),
}
LANG_ORDER = ("en", "de", "es", "fr", "zh")  # tie-break priority


def tokens_of(text: Column) -> Column:
    """Lower-cased alphanumeric tokens (array<string>)."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


def bind_once(expr: Column, body) -> Column:
    """Evaluate ``expr`` exactly once per row and hand it to ``body`` as a
    lambda VARIABLE (an O(1) bound-value read).

    An expression captured inside a higher-order-function lambda is
    re-evaluated per element (HOFs sit outside codegen and subexpression
    elimination does not reach lambda bodies) — ``transform(idx, i ->
    element_at(tokens_of(text), i))`` re-tokenizes the document once per
    element, going quadratic.  When the caller has a DataFrame, the fix is
    staging the array as a real column; for Column-level helpers that
    cannot stage, this binder gets the same effect: the single-element
    ``transform`` evaluates ``expr`` once as HOF input, and the lambda
    variable it binds is attribute-like inside ``body`` (nested lambdas
    referencing an OUTER lambda variable read the bound value, they do not
    re-evaluate anything)."""
    return F.get(F.transform(F.array(expr), body), 0)


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens, alnum tokens, BPE-ish pieces,
    distinct tokens, chars. One projection, no shuffle.

    The token array is staged as a real column (the with_quality_score
    pattern): two count columns reference it, and staging guarantees one
    regex pass per row on interpreted paths too (codegen subexpression
    elimination only covers the compiled case)."""
    toks = F.col("_toks")
    return (
        df.withColumn("_toks", tokens_of(F.col(text_col)))
        .select(
            "*",
            F.length(F.col(text_col)).alias("n_chars_computed"),
            F.size(F.split(F.trim(F.col(text_col)), " +")).alias("n_ws_tokens"),
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
            F.size(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_RE), 0)
            ).alias("n_bpe_pieces"),
        )
        .drop("_toks")
    )


def _stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Occurrences (with multiplicity) of any listed word — array filter,
    JVM-side, no explode."""
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring from length / stopword ratio / repetition ratio.

    score = (len_norm + stopword_ratio + distinct_ratio) / 3, rounded to 4
    decimals; every component is an exact int/int division so the value is
    engine-reproducible bit-for-bit.

    The token array is staged as a real column first: the score references
    it six times, and higher-order expressions sit outside codegen's
    subexpression elimination, so inline copies would each re-run the
    token regex per row."""
    toks = F.col("_toks")
    n = F.size(toks)
    stop_hits = _stopword_hits(toks, LANG_STOPWORDS["en"])
    n_distinct = F.size(F.array_distinct(toks))
    len_norm = F.least(n, F.lit(100)) / F.lit(100.0)
    stop_ratio = stop_hits / n
    distinct_ratio = n_distinct / n
    return (
        df.withColumn("_toks", tokens_of(F.col(text_col)))
        .select(
            "*",
            F.size(toks).alias("n_tokens"),
            F.round((len_norm + stop_ratio + distinct_ratio) / F.lit(3), 4).alias(
                "quality_score"
            ),
        )
        .drop("_toks")
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language ID by function-word frequency (n-gram heuristic): count
    stopword occurrences per language, argmax with fixed tie-break order,
    'und' when nothing matches.

    One staged tokenization feeds all five language filters (each filter
    is a higher-order expression outside codegen subexpression
    elimination — inline copies would tokenize the document five times
    per row)."""
    toks = F.col("_toks")
    scores = {
        lang: _stopword_hits(toks, words).alias(f"score_{lang}")
        for lang, words in LANG_STOPWORDS.items()
    }
    with_scores = (
        df.withColumn("_toks", tokens_of(F.col(text_col)))
        .select("*", *scores.values())
        .drop("_toks")
    )
    all_scores = [F.col(f"score_{lang}") for lang in LANG_ORDER]
    pred = F.when(F.greatest(*all_scores) == 0, F.lit("und"))
    remaining = list(LANG_ORDER)
    while remaining:
        lang = remaining.pop(0)
        if remaining:
            rest = [F.col(f"score_{l}") for l in remaining]
            best_rest = rest[0] if len(rest) == 1 else F.greatest(*rest)
            pred = pred.when(F.col(f"score_{lang}") >= best_rest, F.lit(lang))
        else:
            pred = pred.otherwise(F.lit(lang))
    return with_scores.withColumn("lang_pred", pred)


def with_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints:
    * ``fp_exact``   — md5 of the whitespace-normalized lower-cased text
      (exact-dup key),
    * ``fp_content`` — md5 of the sorted distinct token set (order- and
      multiplicity-insensitive content key)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), " +", " ")
    toks = tokens_of(F.col(text_col))
    return df.select(
        "*",
        F.md5(norm).alias("fp_exact"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias(
            "fp_content"
        ),
    )


# regexes shared with any SQL oracle: plain character-class patterns that
# mean the same thing in Java regex (Spark) and RE2-style engines (DuckDB)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
PHONE_RE = r"[+]?[0-9][0-9()\-\s]{6,}[0-9]"


def with_redactions(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrub pass: emails, URLs and phone-shaped numbers replaced with
    typed placeholder tokens — the standard pre-training hygiene step.
    Pure JVM regexp_replace chain (one projection, no shuffle); patterns
    deliberately stay in the engine-portable regex subset so a SQL oracle
    applies the identical rewrite."""
    c = F.col(text_col)
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, URL_RE, "<URL>")
    c = F.regexp_replace(c, PHONE_RE, "<PHONE>")
    return df.select(
        "*",
        c.alias("text_redacted"),
        (c != F.col(text_col)).alias("was_redacted"),
    )


def top_ngrams(
    df: DataFrame, n: int = 2, k: int = 100, text_col: str = "text"
) -> DataFrame:
    """Corpus-level top-k n-grams by document frequency: tokenize (one
    map-side pass), build n-grams, distinct per document, explode, ONE
    count shuffle, windowed top-k with deterministic tie-break.  The
    corpus-stats primitive behind stop-shingle lists and contamination
    checks."""
    from pyspark.sql import Window as W

    # STAGE the token array as a real column before the gram lambda
    # references it: element_at over an attribute is O(1); a captured
    # tokens_of(text) expression would re-tokenize the document per gram
    # (the lambda-capture trap — see bind_once / repetition_signals)
    staged = df.select(tokens_of(F.col(text_col)).alias("_toks"))
    grams = _ngrams_of_tokens(F.col("_toks"), n)
    exploded = staged.select(F.explode(grams).alias("ngram"))
    counts = exploded.groupBy("ngram").agg(F.count(F.lit(1)).alias("doc_freq"))
    # global top-k via orderBy+limit → TakeOrderedAndProject (per-partition
    # partial top-k, no single-partition global window bottleneck); the
    # rank window then runs over only k rows
    top = counts.orderBy(F.col("doc_freq").desc(), F.col("ngram").asc()).limit(k)
    w = W.orderBy(F.col("doc_freq").desc(), F.col("ngram").asc())
    return top.withColumn("rnk", F.row_number().over(w)).select(
        "rnk", "ngram", "doc_freq"
    )


def _sorted_run_stats(grams: Column) -> Column:
    """One fold over the sorted elements → struct(top_cnt, dup_cnt):
    longest run of equal values, and total occurrences in runs > 1.
    ZERO shuffle — the zero-shuffle alternative to explode+groupBy for
    per-row duplicate statistics (shared by :func:`repetition_signals`'s
    n-gram fractions and :func:`gopher_quality_filter`'s duplicate-line
    rule).  The ``''`` init sentinel is safe because every caller feeds
    non-empty strings (tokens / filtered non-empty lines)."""
    zero = F.lit(0).cast("long")

    def merge(acc, x):
        same = x == acc.prev
        return F.struct(
            x.alias("prev"),
            F.when(same, acc.run + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(same, acc.maxrun)
            .otherwise(F.greatest(acc.maxrun, acc.run))
            .alias("maxrun"),
            F.when(same, acc.dup)
            .otherwise(acc.dup + F.when(acc.run > 1, acc.run).otherwise(zero))
            .alias("dup"),
        )

    def finish(acc):
        return F.struct(
            F.greatest(acc.maxrun, acc.run).alias("top_cnt"),
            (acc.dup + F.when(acc.run > 1, acc.run).otherwise(zero)).alias(
                "dup_cnt"
            ),
        )

    init = F.struct(
        F.lit("").alias("prev"), zero.alias("run"),
        zero.alias("maxrun"), zero.alias("dup"),
    )
    return F.aggregate(F.array_sort(grams), init, merge, finish)


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_n: int = 3,
    keep_input_cols: bool = False,
) -> DataFrame:
    """Intra-document repetition signals for quality filtering (the
    Gopher/MassiveText-style rules, Rae et al. 2021 §A1): for each n in
    1..max_n, ``top{n}_frac`` = the share of n-gram occurrences taken by
    the single most frequent n-gram, ``dup{n}_frac`` = the share of
    occurrences whose n-gram appears more than once.  High values mark
    boilerplate / template / degenerate-repetition documents; callers
    threshold (classic cut: top2_frac > 0.2 or dup3_frac > 0.3).

    Plan: ZERO shuffle.  Per doc and per n, the gram array is sorted and
    a single ``aggregate`` fold counts runs of equal grams (longest run =
    top count, runs > 1 = duplicate mass) — everything stays inside one
    narrow whole-stage-codegen projection.  The obvious alternative
    (explode → groupBy(doc, gram)) shuffles every token occurrence of the
    corpus; this shuffles nothing.  Docs too short for an n level get
    0.0.  Fractions rounded to 6 decimals for engine parity.

    The token array is STAGED as a real column (``_toks``) before any
    gram lambda references it: element_at over an attribute is an O(1)
    read, while the former inline ``tokens_of(text)`` capture re-ran the
    token regex once per gram element — O(tokens²) regex work per
    document (the lambda-capture trap, see :func:`bind_once`)."""
    toks = F.col("_toks")

    def _grams(n: int) -> Column:
        # closure, not a defaulted lambda arg: F.transform treats a 2-arg
        # lambda as (value, index) and would pass the index as `n`
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.expr("cast(array() as array<string>)"))

    _run_stats = _sorted_run_stats
    ns = range(1, max_n + 1)
    # keep_input_cols=True carries every input column through (so callers
    # like gopher_quality_filter chain map-side instead of self-joining
    # the signals back on id — a shuffle for nothing)
    base = list(df.columns) if keep_input_cols else [id_col]
    if keep_input_cols:
        out_names = {f"top{n}_frac" for n in ns} | {f"dup{n}_frac" for n in ns}
        tmp_names = {f"_{p}{n}" for n in ns for p in "gts"} | {"_toks"}
        clash = [c for c in base if c in out_names | tmp_names]
        if clash:
            raise ValueError(
                f"input columns {clash} collide with repetition_signals "
                "outputs — rename or drop them first (e.g. a corpus "
                "re-audited after an earlier signals pass)"
            )
    staged = df.select(
        *[F.col(c) for c in base],
        tokens_of(F.col(text_col)).alias("_toks"),
    ).select(
        *[F.col(c) for c in base], *[_grams(n).alias(f"_g{n}") for n in ns]
    ).select(
        *[F.col(c) for c in base],
        *[F.size(f"_g{n}").alias(f"_t{n}") for n in ns],
        *[_run_stats(F.col(f"_g{n}")).alias(f"_s{n}") for n in ns],
    )
    out_cols = []
    for n in ns:
        t, s = F.col(f"_t{n}"), F.col(f"_s{n}")
        out_cols.append(
            F.when(t > 0, F.round(s["top_cnt"] / t, 6)).otherwise(F.lit(0.0))
            .alias(f"top{n}_frac")
        )
        out_cols.append(
            F.when(t > 0, F.round(s["dup_cnt"] / t, 6)).otherwise(F.lit(0.0))
            .alias(f"dup{n}_frac")
        )
    return staged.select(*[F.col(c) for c in base], *out_cols)


def _ngrams_of_tokens(toks: Column, n: int) -> Column:
    """Distinct word n-grams from a token ARRAY.  ``toks`` must be an
    attribute / lambda variable (O(1) reads inside the gram lambda), never
    an inline tokenization expression — a captured expression re-evaluates
    per element and the gram pass goes quadratic per document."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
        )
    )


def ngrams_of(text_col: Column, n: int = 3) -> Column:
    """Distinct word n-grams of a text column (shared by corpus stats and
    contamination checks).  Tokenizes ONCE per row via :func:`bind_once`
    (the gram lambda then reads a bound variable, not a re-evaluated
    capture)."""
    return bind_once(
        tokens_of(text_col), lambda toks: _ngrams_of_tokens(toks, n)
    )


def flag_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_hits: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing at least
    ``min_hits`` distinct word n-grams with any benchmark/eval text —
    the standard guard against test-set leakage into training data.

    Plan: both sides explode to (source, ngram) with per-doc distinct
    n-grams; the benchmark n-gram set (small) is broadcast into the join,
    so the corpus side is one map-side pass + one aggregation keyed by
    doc — no shuffle of the corpus text itself.  Returns
    (id_col, n_hits) for flagged docs."""
    doc_grams = docs.select(
        F.col(id_col), F.explode(ngrams_of(F.col(text_col), n)).alias("ngram")
    )
    bench_grams = (
        benchmark.select(F.explode(ngrams_of(F.col(text_col), n)).alias("ngram"))
        .distinct()
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "ngram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .where(F.col("n_hits") >= min_hits)
    )


def pack_sequences(
    df: DataFrame,
    token_budget: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sequence packing for training: assign whole documents to
    fixed-token-budget packs — ``(doc_id, n_tokens, shard, pack_id,
    pack_offset)``.

    Offset packing, sharded: documents are split across ``n_shards`` by
    ``doc_id % n_shards`` (deterministic, no hash-function skew between
    engines), and within a shard each document's pack is
    ``floor(start_offset / token_budget)`` over the id-ordered running
    token sum.  One window per shard — the shard count bounds window
    partition size, so there is no global single-partition sort at 100 TB.
    A document may straddle a pack boundary by less than its own length
    (offset packing's documented slack vs. strictly-sequential greedy
    fill, which is an inherently serial recurrence)."""
    from pyspark.sql import Window as W

    toks = F.size(tokens_of(F.col(text_col)))
    base = df.select(
        F.col(id_col),
        toks.alias("n_tokens"),
        (F.col(id_col) % n_shards).alias("shard"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return base.select(
        id_col,
        "n_tokens",
        "shard",
        F.floor((cum - F.col("n_tokens")) / token_budget).alias("pack_id"),
        ((cum - F.col("n_tokens")) % token_budget).alias("pack_offset"),
    )


def with_uniform_hash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """A deterministic uniform-[0,1) draw per row: the first 7 hex digits
    of md5(id) scaled down.  Reproducible across engines and runs — the
    right primitive for sampling decisions that must be auditable (a
    seeded ``rand()`` is neither cross-engine nor cross-partitioning
    stable)."""
    u = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 7), 16, 10)
    return df.withColumn("u", (u.cast("double") / F.lit(float(16**7))))


def corpus_mixture(
    df: DataFrame,
    group_cols: tuple = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Data-mixture accounting: per group (source × language by default),
    document count, token sum, and each group's fraction of corpus tokens —
    the numbers a training run needs to set mixture weights (and to verify
    them after sampling).

    Plan: one narrow map-side token count, ONE aggregation shuffle keyed by
    the group columns; the total-token denominator is a single-row
    broadcast-style cross join, never a second corpus pass."""
    toks = F.size(tokens_of(F.col(text_col)))
    per_group = (
        df.select(*group_cols, toks.alias("_n"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("n_tokens"),
        )
    )
    total = per_group.agg(F.sum("n_tokens").alias("_total"))
    return (
        per_group.crossJoin(F.broadcast(total))
        .select(
            *group_cols,
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("_total"), 6).alias("token_frac"),
        )
    )


def training_shards(
    df: DataFrame,
    n_shards: int = 8,
    seed: str = "epoch0",
    id_col: str = "doc_id",
    sub_buckets: int | None = None,
) -> DataFrame:
    """Deterministic pseudo-random shard + position assignment — the
    export step before writing a training corpus as N shard files with a
    reproducible global shuffle.  Each row draws ``h = md5(seed|id)``:
    shard = h mod n_shards, position = rank of h within the shard.  A new
    ``seed`` (e.g. per epoch) reshuffles the whole corpus reproducibly;
    no ``rand()``, so results survive re-runs and repartitioning.

    Scale: the per-shard rank is computed as a TWO-PASS distributed rank,
    never a one-task-per-shard window — each shard is cut into
    ``sub_buckets`` contiguous ``h``-ranges, rows are ranked within
    ``(shard, sub_bucket)`` (n_shards × sub_buckets parallel window
    partitions), and tiny per-bucket row counts (one row per bucket,
    map-side partial aggregation) turn into broadcast cumulative offsets.
    ``shard_pos = offset + local rank`` is exactly the single-window
    result, but an 8-shard export of a trillion rows ranks on thousands of
    tasks instead of 8.  ``sub_buckets`` defaults to ``max(1, 1024 //
    n_shards)`` so total rank parallelism stays ~1k regardless of
    n_shards."""
    from pyspark.sql import Window as W

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    b = sub_buckets if sub_buckets is not None else max(1, 1024 // n_shards)
    if b < 1:
        raise ValueError("sub_buckets must be >= 1")
    reserved = {"h", "shard", "shard_pos", "_sb", "_sb_offset"} & set(df.columns)
    if reserved:
        raise ValueError(f"reserved column names in input: {sorted(reserved)}")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    # h is uniform in [0, 2^32); _sb = h div width gives <= b contiguous
    # h-ranges per shard, so bucket order IS hash order and ranks compose
    width = max(1, -(-(2**32) // b))  # ceil
    hashed = (
        df.withColumn("h", h)
        .withColumn("shard", F.pmod(F.col("h"), F.lit(n_shards)).cast("int"))
        .withColumn("_sb", F.expr(f"CAST(h DIV {width}L AS INT)"))
    )
    offsets = (
        hashed.groupBy("shard", "_sb")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_sb_offset",
            F.coalesce(
                F.sum("_n").over(
                    W.partitionBy("shard")
                    .orderBy(F.col("_sb").asc())
                    .rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .drop("_n")
    )
    w = W.partitionBy("shard", "_sb").orderBy(F.col("h").asc(), F.col(id_col).asc())
    return (
        hashed.join(F.broadcast(offsets), ["shard", "_sb"])
        .withColumn(
            "shard_pos",
            (F.col("_sb_offset") + F.row_number().over(w)).cast("long"),
        )
        .drop("h", "_sb", "_sb_offset")
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict,
    strat_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling — the data-mixing step that
    reweights domains/languages/sources in a training corpus.  Each
    stratum keeps its configured fraction of rows, chosen by the
    per-row uniform hash (so the sample is stable under re-runs,
    repartitioning and incremental corpus growth).  Strata absent from
    ``fractions`` are dropped.  Pure map-side filter: no shuffle, no rand()."""
    frac = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in kv]
    )
    return (
        with_uniform_hash(df, id_col)
        .withColumn("_frac", frac[F.col(strat_col)])
        .where(F.col("_frac").isNotNull() & (F.col("u") < F.col("_frac")))
        .drop("u", "_frac")
    )


def remove_repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_len: int = 1,
) -> DataFrame:
    """Intra-document repetition CLEANUP (the removal counterpart to
    :func:`repetition_signals`): drop every repeat of an already-seen
    line/paragraph within one document, keeping first occurrences in
    order — the classic boilerplate/navigation/footer scrub of web-corpus
    pipelines (RefinedWeb-style line dedup), applied per document so
    cross-document content is untouched.

    ``sep`` is a LITERAL separator ("\\n" lines, "\\n\\n" paragraphs —
    regex metacharacters are quoted before the split, so e.g. "." means a
    dot); spans are compared exactly after trimming trailing carriage
    returns, and spans shorter than ``min_len`` characters are always
    kept — at the default ``min_len=1`` that exempts EMPTY spans, so
    repeated blank separators (paragraph structure) survive.

    Plan: ZERO shuffle, and O(L log L) per document — (span, index)
    pairs are array_sorted so first-occurrence marking is one
    previous-element comparison per sorted position, then the kept
    indices are re-sorted to restore document order (the naive
    array_position-per-span test is O(L²): a 100k-line boilerplate page —
    exactly this scrub's target input — would do ~10¹⁰ string compares in
    one row and stall the whole stage as a straggler).  Adds
    ``text_clean`` plus ``n_spans``/``n_spans_kept`` so callers can
    threshold on how much was removed (a doc losing most of its spans is
    itself a repetition-quality signal)."""
    reserved = ("text_clean", "n_spans", "n_spans_kept", "_spans", "_sorted")
    clash = [c for c in df.columns if c in reserved]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with remove_repeated_spans "
            "outputs/temporaries — rename or drop them first (e.g. a "
            "corpus already scrubbed once)"
        )
    # \Q...\E quotes the separator so F.split (which takes a REGEX) treats
    # it as the same literal concat_ws re-joins with; an embedded \E would
    # end the quote early, so it is re-escaped the way Pattern.quote does
    pattern = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    spans = F.split(F.col(text_col), F.lit(pattern))
    # Spark rtrim() strips only spaces — carriage returns need the regex
    trimmed = F.transform(spans, lambda s: F.regexp_replace(s, "\\r+$", ""))
    # STAGE the trimmed and sorted arrays as real columns before any
    # lambda references them: a captured expression inside a higher-order
    # lambda is re-evaluated per element (HOFs are outside codegen and
    # subexpression elimination does not reach lambda bodies), which
    # would re-split/re-sort the document once per span — O(L² log L).
    # Column references bind as O(1) attribute reads instead (the
    # repetition_signals _g{n}/_s{n} staging pattern).
    staged = df.withColumn("_spans", trimmed).withColumn(
        "_sorted",
        F.array_sort(  # orders by (span text, original index)
            F.transform(
                F.col("_spans"),
                lambda s, i: F.struct(s.alias("s"), i.alias("i")),
            )
        ),
    )
    srt = F.col("_sorted")
    # a sorted element is a FIRST occurrence iff it differs from its
    # predecessor (F.get is 0-based and NULL-safe at -1, unlike the
    # ANSI-erroring element_at(…, 0))
    kept_idx = F.array_sort(
        F.transform(
            F.filter(
                F.transform(
                    srt,
                    lambda x, j: F.struct(
                        x["i"].alias("i"),
                        (
                            (F.length(x["s"]) < min_len)
                            | F.when(j == 0, F.lit(True)).otherwise(
                                x["s"] != F.get(srt, j - 1)["s"]
                            )
                        ).alias("keep"),
                    ),
                ),
                lambda y: y["keep"],
            ),
            lambda y: y["i"],
        )
    )
    kept = F.transform(kept_idx, lambda i: F.element_at(F.col("_spans"), i + 1))
    # NULL text short-circuits to NULL outputs: concat_ws SKIPS a null
    # array (yielding '' — a phantom empty document), while SQL engines
    # propagate NULL through split/filter/join — so without the guard a
    # NULL-text row diverges from any SQL oracle (NULL clean_md5 vs
    # md5('')) and silently "cleans" missing text into empty text.
    not_null = F.col(text_col).isNotNull()
    return staged.select(
        "*",
        F.when(not_null, F.concat_ws(sep, kept)).alias("text_clean"),
        F.when(not_null, F.size("_spans").cast("long")).alias("n_spans"),
        F.when(not_null, F.size(kept).cast("long")).alias("n_spans_kept"),
    ).drop("_spans", "_sorted")


_GOPHER_RULE_COLS = (
    "pass_min_tokens", "pass_max_tokens", "pass_word_len",
    "pass_symbol_ratio", "pass_stopwords", "pass_top2", "pass_dup3",
    "pass_bullet_lines", "pass_ellipsis_lines", "pass_alpha_words",
    "pass_dup_lines",
)

_BULLET_CHARS = ("-", "*", "•")


def gopher_quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopword_hits: int = 2,
    max_top2_frac: float = 0.20,
    max_dup3_frac: float = 0.30,
    max_bullet_frac: float = 0.90,
    max_ellipsis_frac: float = 0.30,
    min_alpha_word_frac: float = 0.80,
    max_dup_line_frac: float = 0.30,
) -> DataFrame:
    """The Gopher/MassiveText quality-rule battery (Rae et al. 2021 §A1.1)
    as one composable keep/drop projection: token-count window, mean word
    length window, hash/ellipsis **symbol-to-word** ratio, minimum count
    of **distinct** English stop words (both as the paper defines them),
    the :func:`repetition_signals` top-2-gram / dup-3-gram cuts, and the
    four line-level rules — bullet-line fraction (≤90% of lines starting
    with a bullet), ellipsis-line fraction (≤30% ending with an
    ellipsis), minimum fraction of words containing an alphabetic
    character (≥80%), and duplicate-LINE fraction (≤30% of line
    occurrences in repeated lines — distinct from the n-gram ``dup3``
    cut).  Line rules are computed over the NON-EMPTY lines of the
    document (split on newline, trailing carriage returns stripped) so
    blank paragraph separators neither dilute the bullet/ellipsis
    denominators nor count as "duplicate content"; word rules split on
    runs of spaces.  Adds one boolean per rule plus ``gopher_keep`` (AND
    of all), so pipelines can both filter and audit WHICH rule fired —
    dropping a third of the corpus with no per-rule attribution is
    undebuggable at 100 TB.  Thresholds default to the published values;
    every component reuses an already-oracle-checked operator (token
    counts, repetition signals, the sorted-run fold), so this adds rule
    wiring, not new arithmetic.  Map-side only (the repetition and
    dup-line folds are zero-shuffle)."""
    # only the EXACT output names clash (the inner repetition_signals call
    # guards its own outputs and _g1.._s3 temps; a prefix test would
    # spuriously reject benign metadata columns like _source or _score)
    reserved = _GOPHER_RULE_COLS + ("gopher_keep", "_lines", "_words", "_toks")
    clash = [c for c in df.columns if c in reserved]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with gopher_quality_filter "
            "outputs/temporaries — rename or drop them first"
        )
    # STAGED as a real column below (the _lines/_words pattern): the token
    # regex is expensive and referenced by six rules — and one of them
    # (mean word length) folds over the array with lambdas, where a
    # captured inline expression would re-evaluate per element
    toks = F.col("_toks")
    n = F.size(toks)
    mean_wlen = F.when(
        n > 0,
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("double")),
            F.lit(0.0), lambda acc, x: acc + x,
        ) / n,
    ).otherwise(F.lit(0.0))
    # symbol-to-WORD ratio per the paper: '#' or '...' occurrences / words
    n_symbols = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit("[#…]|[.][.][.]"), 0)
    )
    symbol_ratio = F.when(n > 0, n_symbols / n).otherwise(F.lit(0.0))
    # >= min_stopword_hits DISTINCT stop words per the paper
    distinct_stops = F.size(
        F.filter(
            F.array_distinct(toks), lambda t: t.isin(*LANG_STOPWORDS["en"])
        )
    )

    # line-level rules: STAGE the non-empty-lines array as a real column
    # before any lambda references it (the lambda-capture re-evaluation
    # trap — see remove_repeated_spans); trailing \r stripped so CRLF and
    # LF corpora score identically.  Both Spark ltrim/rtrim and their SQL
    # twins strip exactly spaces, keeping line rules engine-portable.
    lines = F.filter(
        F.transform(
            F.split(F.col(text_col), "\n"),
            lambda s: F.regexp_replace(s, "\\r+$", ""),
        ),
        lambda s: F.length(s) > 0,
    )
    n_lines = F.size(F.col("_lines"))
    n_bullet = F.size(
        F.filter(
            F.col("_lines"),
            lambda s: F.substring(F.ltrim(s), 1, 1).isin(*_BULLET_CHARS),
        )
    )
    n_ellipsis = F.size(
        F.filter(
            F.col("_lines"),
            lambda s: F.rtrim(s).endswith("...") | F.rtrim(s).endswith("…"),
        )
    )
    bullet_frac = F.when(n_lines > 0, n_bullet / n_lines).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(n_lines > 0, n_ellipsis / n_lines).otherwise(
        F.lit(0.0)
    )
    dup_line_stats = _sorted_run_stats(F.col("_lines"))
    dup_line_frac = F.when(
        n_lines > 0, dup_line_stats["dup_cnt"] / n_lines
    ).otherwise(F.lit(0.0))
    # word rule: whitespace words (runs of spaces), per the paper's "words"
    words = F.split(F.trim(F.col(text_col)), " +")
    n_words = F.size(F.col("_words"))
    n_alpha_words = F.size(
        F.filter(F.col("_words"), lambda w: w.rlike("[A-Za-z]"))
    )
    alpha_frac = F.when(
        (n_words > 0) & (F.element_at(F.col("_words"), 1) != ""),
        n_alpha_words / n_words,
    ).otherwise(F.lit(0.0))

    rep = (
        repetition_signals(
            df, id_col=id_col, text_col=text_col, keep_input_cols=True
        )
        .withColumn("_toks", tokens_of(F.col(text_col)))
        .withColumn("_lines", lines)
        .withColumn("_words", words)
    )
    out = rep.select(
        "*",
        (n >= min_tokens).alias("pass_min_tokens"),
        (n <= max_tokens).alias("pass_max_tokens"),
        mean_wlen.between(min_mean_word_len, max_mean_word_len).alias(
            "pass_word_len"
        ),
        (symbol_ratio <= max_symbol_ratio).alias("pass_symbol_ratio"),
        (distinct_stops >= min_stopword_hits).alias("pass_stopwords"),
        (F.col("top2_frac") <= max_top2_frac).alias("pass_top2"),
        (F.col("dup3_frac") <= max_dup3_frac).alias("pass_dup3"),
        (bullet_frac <= max_bullet_frac).alias("pass_bullet_lines"),
        (ellipsis_frac <= max_ellipsis_frac).alias("pass_ellipsis_lines"),
        (alpha_frac >= min_alpha_word_frac).alias("pass_alpha_words"),
        (dup_line_frac <= max_dup_line_frac).alias("pass_dup_lines"),
    ).drop("_toks", "_lines", "_words")
    # the rule list is static — a dynamic prefix scan would silently AND
    # in any caller column that happens to start with "pass_"
    expr = F.col(_GOPHER_RULE_COLS[0])
    for c in _GOPHER_RULE_COLS[1:]:
        expr = expr & F.col(c)
    return out.withColumn("gopher_keep", expr)
