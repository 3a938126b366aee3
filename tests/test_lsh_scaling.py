"""LSH scale knobs (VERDICT r1 #10): hyperplane bits grow with corpus
size to bound bucket occupancy, and extra hash tables recover the
recall the added bits cost.  Runs at sf0.1 (2000 vectors, 64-dim)."""

import pytest
from pyspark.sql import functions as F

from iceberg_compaction_spark.operators import similarity as sim

SF = "/root/testdata/sf0.1"
TABLE_A_IDS = [(1, 2), (3, 5), (7, 11), (13, 17)]
TABLE_B_IDS = [(19, 23), (29, 31), (37, 41), (43, 47)]


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _pairs(spark, id_pairs):
    emb = _emb(spark)
    ids = sorted({v for p in id_pairs for v in p})
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id").isin(ids)).collect()
    }
    return [(vecs[a], vecs[b]) for a, b in id_pairs]


def test_bits_scale_with_corpus():
    assert sim.n_bits_for_target_occupancy(500, 1024) == 1
    assert sim.n_bits_for_target_occupancy(2000, 128) == 4
    assert sim.n_bits_for_target_occupancy(2_000_000, 128) == 14
    assert sim.n_bits_for_target_occupancy(10**11, 1024) == 24  # capped
    # doubling the corpus adds ~1 bit: occupancy stays flat, not n^2/const
    assert (
        sim.n_bits_for_target_occupancy(4000, 128)
        == sim.n_bits_for_target_occupancy(2000, 128) + 1
    )


def test_bucket_occupancy_bounded_at_sf01(spark):
    n = _emb(spark).count()
    target = 128
    bits = sim.n_bits_for_target_occupancy(n, target)
    pairs = _pairs(spark, (TABLE_A_IDS + TABLE_B_IDS)[:bits])
    v = _emb(spark).select(
        "vec_id", sim.as_double(F.col("embedding")).alias("v")
    ).withColumn("bucket", sim.lsh_bucket(F.col("v"), pairs))
    sizes = [r["c"] for r in v.groupBy("bucket").agg(F.count("*").alias("c")).collect()]
    assert sum(sizes) == n
    # within-bucket pairing cost is far below the quadratic scan
    assert sum(c * c for c in sizes) < (n * n) / 4
    # no single bucket degenerates to a large fraction of the corpus
    # (data-derived hyperplanes are not perfectly balanced; 8x expected
    # occupancy is the observed-safe bound)
    assert max(sizes) <= 8 * (n / (1 << bits)), sorted(sizes, reverse=True)[:5]


def test_second_hash_table_recovers_recall(spark):
    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") % 100 == 0)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.brute_force_topk(emb, queries, k=5).collect()
    }
    ta = _pairs(spark, TABLE_A_IDS)
    tb = _pairs(spark, TABLE_B_IDS)

    single = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.lsh_topk(emb, queries, ta, k=5).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.lsh_topk_multi(emb, queries, [ta, tb], k=5).collect()
    }
    recall_single = len(single & truth) / len(truth)
    recall_multi = len(multi & truth) / len(truth)
    # candidate sets are supersets -> recall is monotone in tables
    assert recall_multi >= recall_single
    # sanity floor only: the testdata embeddings are near-uniform, so
    # absolute top-k recall is inherently modest (true neighbors are not
    # much closer than the bulk); the property under test is the
    # monotone recovery, not a high absolute number
    assert recall_multi > 0.1
    # the union genuinely widened the candidate pool
    assert len(multi) >= len(single)


def test_multi_with_one_table_matches_single(spark):
    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") % 100 == 0)
    ta = _pairs(spark, TABLE_A_IDS)
    a = sorted(map(tuple, sim.lsh_topk(emb, queries, ta, k=5).collect()))
    b = sorted(map(tuple, sim.lsh_topk_multi(emb, queries, [ta], k=5).collect()))
    assert a == b


def test_multi_pairs_dedup_and_threshold(spark):
    """Pairs colliding in BOTH tables appear once; result is a superset
    of the single-table pairs at the same threshold."""
    emb = _emb(spark)
    ta = _pairs(spark, TABLE_A_IDS)
    tb = _pairs(spark, TABLE_B_IDS)
    thr = 985_000
    single = {(r["id_a"], r["id_b"]) for r in sim.lsh_cosine_pairs(emb, ta, thr).collect()}
    rows = sim.lsh_cosine_pairs_multi(emb, [ta, tb], thr).collect()
    multi = {(r["id_a"], r["id_b"]) for r in rows}
    assert len(rows) == len(multi)  # deduped: no pair scored twice
    assert single <= multi
