"""Corpus assembly operators (operators/corpus.py): splits, mixture,
sequence packing, PII scrub.

The three query-shaped operators are oracle-checked end-to-end by
tests/test_oracle_tail.py (pipeline_split / pipeline_mixture /
pipeline_pack_sequences); this file covers the INVARIANTS the value
hash can't express, and scrub_pii, which needs constructed fixtures —
the synthetic documents table contains no PII-shaped strings.
"""

import pyspark.sql.functions as F
import pytest

from iceberg_compaction_spark.operators import corpus as cp

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_split_is_stable_under_corpus_growth(spark, docs):
    """A doc's split must be a pure function of its id: splitting a
    subset assigns the same labels as splitting the whole corpus."""
    full = {
        r["doc_id"]: r["split"]
        for r in cp.train_val_test_split(docs).select("doc_id", "split").collect()
    }
    sub = cp.train_val_test_split(docs.where(F.col("doc_id") % 3 == 0))
    for r in sub.select("doc_id", "split").collect():
        assert full[r["doc_id"]] == r["split"]


def test_split_proportions_roughly_match(spark, docs):
    counts = dict(
        cp.train_val_test_split(docs)
        .groupBy("split")
        .count()
        .rdd.map(lambda r: (r["split"], r["count"]))
        .collect()
    )
    n = sum(counts.values())
    assert n == docs.count()
    # 500 docs; binomial 3-sigma on 80% is ~±5.4pp
    assert 0.72 <= counts.get("train", 0) / n <= 0.88
    assert 0.04 <= counts.get("val", 0) / n <= 0.16
    assert 0.04 <= counts.get("test", 0) / n <= 0.16


def test_mixture_independent_of_split(spark, docs):
    """The mixture and split hashes are salted differently: the val/test
    fraction inside the sampled corpus must match the global fraction
    (correlated hashes would concentrate or exclude eval docs)."""
    rates = {f"src{i}": 500_000 for i in range(20)}
    sampled = cp.mixture_sample(docs, rates)
    both = cp.train_val_test_split(sampled)
    frac = both.where(F.col("split") != "train").count() / both.count()
    assert 0.1 <= frac <= 0.35  # global is 20%


def test_mixture_default_rate_keeps_unlisted_sources(spark, docs):
    sampled = cp.mixture_sample(docs, {"src0": 0}, default_ppm=1_000_000)
    srcs = {r["source"] for r in sampled.select("source").distinct().collect()}
    assert "src0" not in srcs
    assert len(srcs) == 19


def test_pack_sequences_stream_invariants(spark, docs):
    from iceberg_compaction_spark.operators.text import with_token_counts

    cap, nb = 128, 8
    packed = cp.pack_sequences(
        with_token_counts(docs), tokens_col="ws_tokens", capacity=cap, n_buckets=nb
    ).collect()
    assert packed, "fixture produced no packed docs"
    by_bucket = {}
    for r in packed:
        assert 0 <= r["seq_offset"] < cap
        assert r["pack_bucket"] == r["doc_id"] % nb
        assert r["n_tokens"] > 0
        by_bucket.setdefault(r["pack_bucket"], []).append(r)
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r["doc_id"])
        stream_pos = 0
        for r in rows:
            # each doc starts exactly where the previous one ended
            assert r["seq_id"] * cap + r["seq_offset"] == stream_pos
            end = stream_pos + r["n_tokens"] - 1
            assert r["spans_cut"] == int(stream_pos // cap != end // cap)
            stream_pos += r["n_tokens"]


def test_scrub_pii_redacts_and_counts(spark):
    rows = [
        (1, "contact john.doe+x@example.com or jane@sub.example.org today"),
        (2, "ssn 123-45-6789 phone (555) 123-4567 ip 10.0.0.1"),
        (3, "call +1-555-123-4567 or 555 123 4567"),
        (4, "clean text with no pii at all"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in cp.scrub_pii(df).collect()}

    assert out[1]["n_email"] == 2
    assert out[1]["text_scrubbed"] == "contact <EMAIL> or <EMAIL> today"
    assert out[2]["n_ssn"] == 1
    assert out[2]["n_phone"] == 1
    assert out[2]["n_ip"] == 1
    assert out[2]["text_scrubbed"] == "ssn <SSN> phone <PHONE> ip <IP>"
    assert out[3]["n_phone"] == 2
    assert out[4]["text_scrubbed"] == out[4]["text"]
    for r in out.values():
        assert "@" not in r["text_scrubbed"]


def test_scrub_pii_ssn_not_double_counted_as_phone(spark):
    """An SSN-shaped string must be attributed to the SSN class only —
    counts are taken on the progressively redacted text."""
    df = spark.createDataFrame([(1, "id 123-45-6789")], "doc_id long, text string")
    r = cp.scrub_pii(df).collect()[0]
    assert r["n_ssn"] == 1
    assert r["n_phone"] == 0


def test_chunk_documents_window_invariants(spark, docs):
    from iceberg_compaction_spark.operators import text as tx

    chunk, stride = 16, 8
    out = tx.chunk_documents(docs, chunk_tokens=chunk, stride=stride)
    rows = sorted(
        ((r["doc_id"], r["chunk_id"]), (r["chunk_text"], r["n_tokens"]))
        for r in out.collect()
    )
    toks_by_doc = {
        r["doc_id"]: (r["text"].strip().lower().split() if r["text"].strip() else [])
        for r in docs.collect()
    }
    seen = {}
    for (doc, cid), (text, n) in rows:
        words = text.split(" ") if text else []
        assert len(words) == n <= chunk
        start = cid * stride
        assert toks_by_doc[doc][start : start + chunk] == words
        seen.setdefault(doc, []).append(cid)
    for doc, toks in toks_by_doc.items():
        if not toks:
            assert doc not in seen
            continue
        cids = sorted(seen[doc])
        assert cids == list(range(len(cids)))  # contiguous window ids
        # windows cover the whole doc: last window reaches the final token
        assert cids[-1] * stride + chunk >= len(toks)
        # and no window starts past the end
        assert cids[-1] * stride < max(len(toks), 1)


# --- round 6: epoch shuffle order -------------------------------------------


def test_shuffle_order_is_deterministic_injective_permutation(spark):
    from iceberg_compaction_spark.operators import corpus as cp

    docs = spark.range(500).selectExpr("id as doc_id")
    out = cp.shuffle_order(docs, n_buckets=8).collect()
    assert len(out) == 500
    pos = [r["global_pos"] for r in out]
    assert len(set(pos)) == 500  # injective: a real ordering
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["shuffle_bucket"], []).append(r["bucket_rank"])
    for b, ranks in by_bucket.items():
        assert sorted(ranks) == list(range(len(ranks)))  # contiguous ranks

    # deterministic across runs; different salt => different permutation
    again = cp.shuffle_order(docs, n_buckets=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = cp.shuffle_order(docs, salt="shuffle-epoch-1", n_buckets=8).collect()
    order0 = [r["doc_id"] for r in sorted(out, key=lambda r: r["global_pos"])]
    order1 = [r["doc_id"] for r in sorted(other, key=lambda r: r["global_pos"])]
    assert order0 != order1


def test_source_curation_gates_and_filter(spark):
    """Domain-level curation (round 8): a duplicate-ridden source and a
    short-doc source fail their gates; filter_by_source drops every doc
    of a failed source and keeps the rest untouched."""
    long = "x" * 400
    rows = (
        [(i, "good", long + str(i)) for i in range(4)]
        + [(10 + i, "dupmill", long) for i in range(4)]  # all identical
        + [(20 + i, "shorty", "tiny") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    v = {r["source"]: r for r in cp.source_curation(
        df, min_mean_chars=100, max_dup_ppm=100_000, max_short_ppm=500_000
    ).collect()}
    assert v["good"]["keep"] and v["good"]["dup_ppm"] == 0
    assert not v["dupmill"]["keep"]
    assert v["dupmill"]["dup_ppm"] == 750000  # 4 docs, 1 unique
    assert not v["shorty"]["keep"] and v["shorty"]["short_ppm"] == 1000000
    kept = cp.filter_by_source(
        df,
        cp.source_curation(
            df, min_mean_chars=100, max_dup_ppm=100_000,
            max_short_ppm=500_000,
        ),
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 2, 3]


def test_dsir_weights_rank_target_like_docs_higher(spark):
    """DSIR importance weights: documents from the TARGET distribution
    must score higher on average than off-target documents (that is
    the operator's whole contract), weights are deterministic across
    partitionings, and every doc gets a row."""
    import pyspark.sql.functions as F

    from iceberg_compaction_spark.operators.corpus import (
        dsir_importance_weights,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang", "text")
    w = dsir_importance_weights(docs, F.col("lang") == "en")
    assert w.count() == docs.count()
    joined = w.join(docs.select("doc_id", "lang"), "doc_id")
    avg_w = {
        r["is_t"]: r["aw"]
        for r in joined.groupBy((F.col("lang") == "en").alias("is_t"))
        .agg(F.avg(F.col("weight_scaled") / F.col("n_tokens")).alias("aw"))
        .collect()
    }
    assert avg_w[True] > avg_w[False]

    # partitioning invariance (integer arithmetic end to end)
    w2 = dsir_importance_weights(
        docs.repartition(13), F.col("lang") == "en"
    )
    a = {(r["doc_id"], r["weight_scaled"]) for r in w.collect()}
    b = {(r["doc_id"], r["weight_scaled"]) for r in w2.collect()}
    assert a == b


def test_dsir_weights_keep_zero_token_docs(spark):
    """ADVICE r13: documents yielding zero tokens (empty text, or no
    [a-z] characters at all) must come back with (0, 0), not vanish —
    a resampler driven by the frame has to see the whole corpus."""
    from pyspark.sql import functions as F

    from iceberg_compaction_spark.operators.corpus import (
        dsir_importance_weights,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox", "en"),
            (2, "", "en"),                  # empty
            (3, "1234 5678 !!!", "de"),     # no [a-z] tokens
            (4, "中文文档", "zh"),  # non-Latin
            (5, "another english document", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    w = dsir_importance_weights(docs, F.col("lang") == "en")
    got = {
        r["doc_id"]: (r["n_tokens"], r["weight_scaled"])
        for r in w.collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[2] == (0, 0) and got[3] == (0, 0) and got[4] == (0, 0)
    assert got[1][0] == 4 and got[1][1] > 0
