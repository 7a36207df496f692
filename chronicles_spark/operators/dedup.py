"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (the point of each shape):
* **Exact**: hash-groupBy on a fingerprint — one shuffle keyed by the md5,
  perfectly parallel, skew-free (hashes are uniform).
* **MinHash+LSH**: signatures are computed per-row with array lambdas
  (``array_min`` over transformed shingles — NO explode, NO shuffle), then
  only the b band keys per doc are exploded. Candidate generation is a
  self-equi-join on (band, key): the shuffle carries b rows/doc, not the
  corpus. Verification (true Jaccard) runs only on candidates.
* **SimHash**: again per-row array aggregation; near-dup candidates via
  banding the fingerprint (pigeonhole: hamming ≤ k → some band equal).
* **n-gram Jaccard**: classic inverted-index join on shingles with a
  frequency cutoff to drop super-common shingles (skew control at scale);
  exact Jaccard from the intersection counts.
* **Embedding cosine**: candidate-free brute pair join is quadratic — kept
  only as the verification/baseline; the scale path buckets by
  sign-random-projection (see similarity.py) or IVF centroids first.

All hashes are md5-hex (lexicographic min of uniform hex strings is a
valid min-hash) so the DuckDB oracles reproduce results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens_of

SHINGLE_WIDTH = 3


def shingles_of(text: Column, width: int = SHINGLE_WIDTH) -> Column:
    """Distinct word-``width``-gram shingles (array<string>), computed with
    array lambdas — no explode."""
    toks = tokens_of(text)
    n = F.size(toks)
    # sequence(1, 0) would yield a DESCENDING [1, 0] — guard short docs
    idx = F.when(n >= width, F.sequence(F.lit(1), n - F.lit(width - 1))).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(width)]
        ),
    )
    return F.array_distinct(grams)


def with_shingles(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("shingles", shingles_of(F.col(text_col)))


# ---------------------------------------------------------------------------
# exact


def exact_duplicate_groups(df: DataFrame, key: Column, id_col: str = "doc_id") -> DataFrame:
    """Groups of exact duplicates by a fingerprint key: one hash shuffle.
    Returns (fp, n_docs, keep_id) for groups with >1 member — ``keep_id``
    (min id) is the canonical survivor."""
    return (
        df.select(key.alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH


def minhash_signature(num_hashes: int, shingle_col: str = "shingles") -> list[Column]:
    """num_hashes min-hash values as columns sig_0..sig_{n-1}: per hash i,
    the lexicographic min of md5('<i>|' || shingle). Map-side only."""
    out = []
    for i in range(num_hashes):
        out.append(
            F.array_min(
                F.transform(
                    F.col(shingle_col), lambda s, i=i: F.md5(F.concat(F.lit(f"{i}|"), s))
                )
            ).alias(f"sig_{i}")
        )
    return out


def lsh_band_keys(bands: int, rows: int) -> list[Column]:
    """Band keys: md5 of the concatenated signature slice per band."""
    out = []
    for b in range(bands):
        cols = [F.col(f"sig_{b * rows + r}") for r in range(rows)]
        out.append(F.md5(F.concat_ws("|", *cols)).alias(f"band_{b}"))
    return out


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 8,
    rows: int = 2,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing at least one LSH band.

    Plan shape: project signatures (no shuffle) → explode b band rows/doc →
    self-join on (band_id, band_key) → distinct pairs. The join shuffle is
    O(b·N) rows; hot buckets (identical docs) square only within a bucket."""
    sigs = with_shingles(df.select(id_col, text_col), text_col).select(
        F.col(id_col), *minhash_signature(bands * rows)
    )
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_id"), k.alias("band_key"))
                    for b, k in enumerate(lsh_band_keys(bands, rows))
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band_id", "bk.band_key")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs only.

    Intersection via the inverted-index join restricted to candidates
    (semi-joined first so only candidate docs explode)."""
    cand_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .union(pairs.select("id_b"))
        .distinct()
    )
    sh = (
        with_shingles(df.join(cand_ids, id_col, "left_semi").select(id_col, text_col), text_col)
        .select(id_col, F.col("shingles"), F.size("shingles").alias("n_sh"))
    )
    exploded = sh.select(id_col, "n_sh", F.explode("shingles").alias("sh"))
    a = exploded.alias("sa")
    b = exploded.alias("sb")
    inter = (
        pairs.join(a, F.col("id_a") == F.col(f"sa.{id_col}"))
        .join(
            b,
            (F.col("id_b") == F.col(f"sb.{id_col}")) & (F.col("sa.sh") == F.col("sb.sh")),
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.first("sa.n_sh").alias("n_a"),
            F.first("sb.n_sh").alias("n_b"),
        )
    )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash


def simhash_expr(text_col: str = "text", bits: int = 32) -> Column:
    """SimHash fingerprint as a ``bits``-char bit string.

    Bit p is the sign of Σ over tokens of ±1, where the vote is the high
    bit of hex digit p of md5(token). Pure array aggregation — map-side,
    SQL-lambda form so the identical text runs in the DuckDB oracle."""
    pieces = []
    for p in range(1, bits + 1):
        s = (
            f"aggregate(regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0), 0, "
            f"(acc, t) -> acc + (CASE WHEN instr('0123456789abcdef', "
            f"substr(md5(t), {p}, 1)) - 1 >= 8 THEN 1 ELSE -1 END))"
        )
        pieces.append(f"(CASE WHEN ({s}) > 0 THEN '1' ELSE '0' END)")
    return F.expr("concat(" + ", ".join(pieces) + ")")


def simhash_sql(text_col: str = "text", bits: int = 32, agg_fn: str = "list_aggregate") -> str:
    """The DuckDB-dialect twin of :func:`simhash_expr` (DuckDB's aggregate
    over lists is ``list_reduce``-style; we emit list_sum(list_transform))."""
    pieces = []
    for p in range(1, bits + 1):
        s = (
            f"list_sum(list_transform(regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0), "
            f"t -> CASE WHEN instr('0123456789abcdef', substr(md5(t), {p}, 1)) - 1 >= 8 "
            f"THEN 1 ELSE -1 END))"
        )
        pieces.append(f"(CASE WHEN ({s}) > 0 THEN '1' ELSE '0' END)")
    return "concat(" + ", ".join(pieces) + ")"


def simhash_near_dup_candidates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    bits: int = 32, bands: int = 4,
) -> DataFrame:
    """Near-dup candidates by banding the simhash: hamming(a,b) <= bands-1
    implies at least one of ``bands`` equal slices (pigeonhole)."""
    width = bits // bands
    fp = df.select(F.col(id_col), simhash_expr(text_col, bits).alias("simhash"))
    slices = fp.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.substring("simhash", b * width + 1, width).alias("piece"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", "bk.band_id", "bk.piece")
    a, b = slices.alias("a"), slices.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.piece") == F.col("b.piece"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    # exact hamming distance on the bit strings for the surviving pairs
    ham = F.size(
        F.filter(
            F.zip_with(
                F.split(F.col("sim_a"), ""),
                F.split(F.col("sim_b"), ""),
                lambda x, y: x != y,
            ),
            lambda v: v,
        )
    )
    return pairs.select("id_a", "id_b", ham.alias("hamming"))


# ---------------------------------------------------------------------------
# n-gram Jaccard (inverted index)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.3,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """All pairs with shingle-set Jaccard >= threshold, via the inverted-
    index self-join. ``max_shingle_freq`` drops shingles appearing in more
    than that many docs before the join — the standard skew guard at scale
    (a shingle in f docs contributes f² join rows)."""
    sh = with_shingles(df.select(id_col, text_col), text_col).select(
        id_col, F.col("shingles"), F.size("shingles").alias("n_sh")
    )
    exploded = sh.select(id_col, "n_sh", F.explode("shingles").alias("sh"))
    if max_shingle_freq is not None:
        freq_ok = (
            exploded.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df_freq"))
            .where(F.col("df_freq") <= max_shingle_freq)
            .select("sh")
        )
        exploded = exploded.join(freq_ok, "sh", "left_semi")
    a, b = exploded.alias("a"), exploded.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.first(F.col("a.n_sh")).alias("n_a"),
            F.first(F.col("b.n_sh")).alias("n_b"),
        )
    )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return inter.select("id_a", "id_b", jac.alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup (baseline verification path)


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """All pairs with cosine >= threshold — brute-force O(N²) baseline used
    to verify the bucketed paths; at scale use sign-LSH / IVF from
    similarity.py to generate candidates first.

    Arithmetic: element-wise float32→float64 cast, sequential fold — the
    exact shape DuckDB's list functions use, so results are bit-identical."""
    v = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda side: F.sqrt(
        F.aggregate(
            F.transform(F.col(f"{side}.v"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    cos = F.round(dot / (norm("a") * norm("b")), 6)
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
