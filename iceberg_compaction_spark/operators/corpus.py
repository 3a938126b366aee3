"""Corpus assembly operators: deterministic splits, source mixing,
sequence packing, and PII scrubbing.

These are the operations that turn a curated document table into an
actual training corpus: assign every doc a reproducible train/val/test
split, downsample sources to a target mixture, pack token streams into
fixed-length training sequences, and redact PII before release.

Design rules shared by every operator here:

- **Hash acceptance, never ``rand()``.**  Sampling decisions are a pure
  function of the row key (md5 with a per-operator salt), so reruns,
  retries, and other engines reproduce the same corpus bit-for-bit.
  A salt per operator keeps the split decision independent of the
  mixture decision — hashing the same key for both would correlate
  them (every val doc would also be the first to be dropped by the
  sampler).
- **Narrow where possible.**  Split and mixture are pure scan-side
  filters/projections: no shuffle, no driver state — the shape that
  labels 10^11 rows by just scanning them.
- **Integer arithmetic at decision points** (bucket < rate_ppm), so no
  float formatting or ulp issue can flip a membership decision between
  engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

__all__ = [
    "hash_bucket",
    "train_val_test_split",
    "mixture_sample",
    "pack_sequences",
    "scrub_pii",
    "shuffle_order",
    "dsir_importance_weights",
]


def hash_bucket(key: Column, salt: str, modulus: int) -> Column:
    """Deterministic bucket in [0, modulus): first 8 hex chars of
    ``md5(salt || key)`` as an integer, mod ``modulus``.  Matches the
    DuckDB expression ``('0x' || substr(md5(salt || key), 1, 8))::BIGINT
    % modulus`` exactly (32-bit value, no sign issues)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8), 16, 10)
        .cast("long")
        % modulus
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_ppm: int = 800_000,
    val_ppm: int = 100_000,
    salt: str = "split_",
) -> DataFrame:
    """Assign every row a reproducible split label.

    ``bucket = md5(salt || id) % 1e6``; [0, train) -> train,
    [train, train+val) -> val, rest -> test.  The assignment is a pure
    projection — a doc's split never changes when the corpus grows,
    which is the property that keeps eval sets stable across corpus
    versions (row-number-based splits reshuffle everything on every
    insert).
    """
    b = hash_bucket(F.col(id_col), salt, 1_000_000)
    return df.withColumn(
        "split",
        F.when(b < train_ppm, "train")
        .when(b < train_ppm + val_ppm, "val")
        .otherwise("test"),
    )


def mixture_sample(
    df: DataFrame,
    rates_ppm: dict[str, int],
    id_col: str = "doc_id",
    source_col: str = "source",
    default_ppm: int = 1_000_000,
    salt: str = "mix_",
) -> DataFrame:
    """Downsample each source to its target acceptance rate — the
    training-mixture knob (keep 100% of high-quality sources, 10% of
    the crawl, ...).  Pure scan-side filter via salted hash acceptance;
    sources absent from ``rates_ppm`` keep ``default_ppm``.

    The acceptance hash is salted differently from the split hash so
    mixture membership is independent of split membership.
    """
    rate = None
    for src, ppm in sorted(rates_ppm.items()):
        cond = F.col(source_col) == src
        rate = F.when(cond, ppm) if rate is None else rate.when(cond, ppm)
    rate = F.lit(default_ppm) if rate is None else rate.otherwise(default_ppm)
    b = hash_bucket(F.col(id_col), salt, 1_000_000)
    return df.where(b < rate)


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    capacity: int = 2048,
    n_buckets: int = 32,
) -> DataFrame:
    """Concat-and-cut sequence packing: assign each document its
    position in a fixed-length training-sequence stream.

    Semantics are the standard pretraining layout: within a bucket,
    documents are concatenated in ``id`` order and the token stream is
    cut every ``capacity`` tokens.  Each doc gets the sequence id where
    it STARTS (``tokens_before div capacity``), its offset in that
    sequence, and a flag for whether it straddles a cut point.  (This is
    deliberately not bin packing — no reordering, no driver state; the
    greedy reset of first-fit packing is inherently sequential, while
    the concat-and-cut stream is one window cumsum.)

    Scale shape: docs hash into ``n_buckets`` independent streams
    (bucket = id % n_buckets), so the cumulative window parallelizes
    across buckets; each reducer sees corpus/n_buckets rows.  At 100 TB
    n_buckets is sized to executor count, not 32.  Empty docs are
    excluded (they occupy no stream positions).
    """
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.col(tokens_col).cast("long")
    # integer `div` on longs, NOT float `/` + cast: corpus-scale
    # cumulative sums exceed the 2^53 double mantissa and non-power-of-2
    # capacities can double-round a float quotient across a cut point —
    # `div` matches the oracle's `//` bit-for-bit for every capacity
    cap = int(capacity)
    seq_id = F.expr(f"tokens_before div {cap}")
    end_seq_id = F.expr(f"(cum_tokens - 1) div {cap}")
    return (
        df.where(toks > 0)
        .withColumn("pack_bucket", (F.col(id_col) % n_buckets).cast("long"))
        .withColumn("cum_tokens", F.sum(toks).over(w))
        .withColumn("tokens_before", F.col("cum_tokens") - toks)
        .select(
            F.col(id_col),
            "pack_bucket",
            toks.alias("n_tokens"),
            seq_id.alias("seq_id"),
            (F.col("tokens_before") % capacity).alias("seq_offset"),
            (seq_id != end_seq_id).cast("int").alias("spans_cut"),
        )
    )


# PII patterns restricted to the regex subset Java and RE2 agree on
# (no backrefs, no lookaround): pattern -> replacement tag.
PII_PATTERNS: list[tuple[str, str]] = [
    # order matters: emails first so phone patterns can't eat their digits
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # no leading \b: a word boundary can't precede '(' or '+' (both
    # non-word), which would silently skip "(555) ..." / "+1-..." forms
    (r"(?:\+?1[-. ]?)?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact common PII patterns and count what was removed.

    Adds ``text_scrubbed`` plus an integer hit count per PII class
    (n_email, n_ssn, n_phone, n_ip).  All JVM-side ``regexp_replace`` /
    ``regexp_count`` in one projection — narrow, zero-shuffle,
    whole-stage codegen; at 100 TB this is scan-speed.  Counts are
    computed on the progressively redacted text in the same order as
    the replacements, so overlapping classes (an SSN inside a phone-
    like string) are attributed exactly once, to the first pattern.
    """
    out = df
    cur = F.col(text_col)
    for pat, tag in PII_PATTERNS:
        name = "n_" + tag.strip("<>").lower()
        out = out.withColumn(name, F.regexp_count(cur, F.lit(pat)).cast("int"))
        cur = F.regexp_replace(cur, pat, tag)
    return out.withColumn("text_scrubbed", cur)


def shuffle_order(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle-epoch-0",
    n_buckets: int = 32,
) -> DataFrame:
    """Deterministic distributed training order: assign every doc a
    (bucket, rank-in-bucket) position in a salted pseudo-random
    permutation of the corpus.

    A data loader reads buckets round-robin, so position ``rank`` of
    bucket ``b`` is global position ``rank * n_buckets + b`` of a
    uniformly shuffled epoch — WITHOUT a total-order sort (a global
    ORDER BY funnels 100 TB through one ranking pass; here each bucket
    ranks its corpus/n_buckets share in parallel and no row crosses
    buckets).  Re-salting gives an independent permutation per epoch;
    determinism makes every epoch reproducible and resumable mid-epoch
    (the standard pretraining data-order contract).

    Bucket AND within-bucket order both derive from the same salted
    md5, so the permutation quality is that of the hash; ties broken by
    id for bit-stable output.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("shuffle_bucket").orderBy(
        F.col("__h"), F.col(id_col)
    )
    return (
        df.withColumn("__h", h)
        .withColumn("shuffle_bucket", (F.col("__h") % n_buckets).cast("long"))
        .withColumn("bucket_rank", (F.row_number().over(w) - 1).cast("long"))
        .withColumn(
            "global_pos",
            F.col("bucket_rank") * n_buckets + F.col("shuffle_bucket"),
        )
        .select(F.col(id_col), "shuffle_bucket", "bucket_rank", "global_pos")
    )


def source_curation(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    min_docs: int = 1,
    min_mean_chars: int = 300,
    max_dup_ppm: int = 100_000,
    max_short_ppm: int = 500_000,
    short_chars: int = 100,
) -> DataFrame:
    """Domain/source-level curation verdicts — the C4/Gopher-style stage
    that drops WHOLE sources whose aggregate statistics look like spam,
    boilerplate mirrors, or scrape failures (per-document filters miss
    systematic source-level rot; real pipelines gate on the domain).

    Output: one row per source — ``(source, n_docs, mean_chars,
    short_ppm, dup_ppm, keep)``:

    - ``mean_chars``: floor of the mean document length;
    - ``short_ppm``: fraction of docs under ``short_chars`` (floor ppm);
    - ``dup_ppm``: exact-duplicate fraction, 1 - distinct(fp)/n on the
      normalized-text md5 (the same key as ``exact_dedup``);
    - ``keep``: all gates pass.

    Scale shape: one pre-aggregation keyed on ``(source, fp)`` (the
    two-phase form of the distinct count — partials combine map-side),
    then one aggregation keyed on ``source``; output cardinality is the
    number of SOURCES, so the verdict broadcasts for the follow-up
    document filter (:func:`filter_by_source`).  No windows, no joins
    on the corpus side.
    """
    from iceberg_compaction_spark.operators.text import normalize_text

    per_fp = (
        df.select(
            F.col(source_col).alias("source"),
            F.length(F.col(text_col)).cast("long").alias("chars"),
            F.md5(normalize_text(F.col(text_col))).alias("fp"),
        )
        .groupBy("source", "fp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("chars").alias("chars"),
            F.sum(
                (F.col("chars") < short_chars).cast("long")
            ).alias("short"),
        )
    )
    stats = per_fp.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).alias("n_unique"),
        F.floor(F.sum("chars") / F.sum("n")).cast("long").alias("mean_chars"),
        F.floor(1e6 * F.sum("short") / F.sum("n")).cast("long").alias(
            "short_ppm"
        ),
    )
    return stats.select(
        "source",
        "n_docs",
        "mean_chars",
        "short_ppm",
        F.floor(
            1e6 * (F.col("n_docs") - F.col("n_unique")) / F.col("n_docs")
        )
        .cast("long")
        .alias("dup_ppm"),
    ).withColumn(
        "keep",
        (F.col("n_docs") >= min_docs)
        & (F.col("mean_chars") >= min_mean_chars)
        & (F.col("dup_ppm") <= max_dup_ppm)
        & (F.col("short_ppm") <= max_short_ppm),
    )


def filter_by_source(
    df: DataFrame, verdicts: DataFrame, source_col: str = "source"
) -> DataFrame:
    """Keep only documents whose source passed :func:`source_curation`.
    The verdict table is source-cardinality small — broadcast semi-join,
    the corpus never shuffles."""
    keep = verdicts.where(F.col("keep")).select(
        F.col("source").alias(source_col)
    )
    return df.join(F.broadcast(keep), on=source_col, how="left_semi")


def temperature_mixture_sample(
    df: DataFrame,
    target_fraction_ppm: int = 500_000,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "tmix_",
) -> DataFrame:
    """Temperature-based source mixture (the multilingual-corpus
    rebalancing of mT5/XLM-R: sample source s with probability
    proportional to ``n_s^alpha``), at the exact-arithmetic temperature
    ``alpha = 0.5`` — source weight ``floor(sqrt(n_s))`` — so the
    whole rate computation stays in 64-bit INTEGER math and an external
    oracle reproduces it bit-for-bit (IEEE sqrt is correctly rounded in
    every engine; arbitrary alpha would ride exp/ln and drift).

    Per-source acceptance rate (ppm, capped at 100%), staged so every
    intermediate stays under 2^63 at ANY corpus size (the naive
    ``1e6 * w * target`` numerator overflows int64 near 7e8 rows):
    ``q = 1e6 * N_target // sum_w`` (≤ 1e6 * n_total since w ≥ 1),
    then ``rate = min(q * w_s // n_s, 1e6)`` (``q * w ≤ 1e6 * n_total``
    since ``w ≤ sum_w``) with ``N_target = n_total *
    target_fraction_ppm // 1e6`` — exact to ~9e12 total rows.  Small
    sources are upweighted toward equal share, large sources
    downsampled, total ~= the target fraction.  Acceptance is the
    salted deterministic hash filter the other sampling operators use
    (independent of split and mixture membership).

    Scale shape: one map-side-combined source count (the number of
    sources is tiny), scalar totals broadcast via a 1-row cross join,
    the per-source rate table broadcast back, and the corpus itself is
    ONE scan-side filter — nothing corpus-sized shuffles."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    counts = counts.withColumn(
        "__w", F.floor(F.sqrt(F.col("__n"))).cast("long")
    )
    totals = counts.agg(
        F.sum("__w").cast("long").alias("__sumw"),
        F.sum("__n").cast("long").alias("__ntot"),
    )
    rates = (
        counts.crossJoin(F.broadcast(totals))
        .withColumn(
            "__target",
            F.expr(f"(__ntot * {int(target_fraction_ppm)}L) DIV 1000000L"),
        )
        .withColumn("__q", F.expr("(1000000L * __target) DIV __sumw"))
        .withColumn(
            "__rate_ppm",
            F.least(
                F.expr("(__q * __w) DIV __n"),
                F.lit(1_000_000).cast("long"),
            ),
        )
        .select(source_col, "__rate_ppm")
    )
    b = hash_bucket(F.col(id_col), salt, 1_000_000)
    return (
        df.join(F.broadcast(rates), source_col)
        .where(b < F.col("__rate_ppm"))
        .drop("__rate_ppm")
    )


def sample_exact_k(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    salt: str = "topk_",
) -> DataFrame:
    """Deterministic exactly-k sample without replacement: order rows
    by a salted hash of the key and keep the k smallest — the
    fixed-BUDGET companion to the rate-based samplers (rates give a
    binomial-sized sample; an eval set or a human-review batch needs
    exactly k rows, reproducibly, regardless of corpus growth).  Ties
    are impossible for distinct keys (the full md5 hex is the sort
    key) and the hash makes the pick uniform and independent of the
    other samplers' salts.

    Scale shape: ``orderBy(hash).limit(k)`` compiles to
    TakeOrderedAndProject — a per-partition top-k merged on the driver,
    never a global sort; the corpus is scanned once."""
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return (
        df.withColumn("__h", h)
        .orderBy("__h", id_col)
        .limit(int(k))
        .drop("__h")
    )


def dsir_importance_weights(
    df: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    scale: int = 1_000_000,
) -> DataFrame:
    """Hashed n-gram importance weights for data selection (the DSIR
    shape: "Data Selection via Importance Resampling", Xie et al.
    2023): score every document by how target-like its token
    distribution is, where the target is a designated subset of the
    corpus itself (``is_target`` — e.g. a trusted domain, a
    high-quality source, a language).  Tokens hash into ``n_buckets``
    features; each bucket's importance ratio is
    ``target_count * scale // corpus_count`` (integer-exact — the
    linear-ratio variant of the paper's log-ratio, chosen so no float
    accumulation or libm ulp can flip a value between engines); a
    document's weight is the sum of its tokens' bucket ratios.
    Returns ``(id_col, n_tokens, weight_scaled)`` — resample by weight
    (e.g. ``sample_exact_k`` over a weight-ordered prefix, or
    threshold) to build the selected corpus.  EVERY input document
    gets a row: documents that yield zero tokens (empty text, or text
    with no ``[a-z]`` characters — e.g. entirely non-Latin docs) come
    back with ``n_tokens = 0`` and ``weight_scaled = 0`` rather than
    silently vanishing, so a resampler driven by this frame sees the
    whole corpus (ADVICE r13).

    Scale shape: ONE explode over the corpus; ONE map-side-combinable
    groupBy(bucket) computing target and corpus counts together (a
    conditional aggregate, not two passes); the bucket table is
    n_buckets rows — broadcast into the token->ratio join; ONE
    groupBy(doc) sum.  No window, no Python, no driver state beyond
    the broadcast feature table — the same shape at 10^11 documents
    with executors only ever holding token batches and a 4096-row
    map."""
    toks = (
        df.select(
            F.col(id_col),
            is_target.cast("boolean").alias("__t"),
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("__tok"),
        )
        .where(F.col("__tok") != "")
        .withColumn("__b", hash_bucket(F.col("__tok"), "dsir_", n_buckets))
        .drop("__tok")
    )
    buckets = toks.groupBy("__b").agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("__tb"),
        F.count(F.lit(1)).alias("__rb"),
    )
    ratio = buckets.select(
        "__b",
        F.expr(f"__tb * {int(scale)} div __rb").alias("__ratio"),
    )
    agg = (
        toks.join(F.broadcast(ratio), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("__ratio").cast("long").alias("weight_scaled"),
        )
    )
    # zero-token docs still get a (0, 0) row — one extra equi-join on
    # the id key against the (already distinct) input ids
    return df.select(id_col).distinct().join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("weight_scaled", F.lit(0))
        .cast("long")
        .alias("weight_scaled"),
    )
