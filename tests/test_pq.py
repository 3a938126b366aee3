"""Product-quantization ANN (operators/similarity.py pq_*).

The end-to-end value oracle lives in tests/test_oracle_tail.py
(ann_pq); here: codebook/encode invariants, recall sanity vs brute
force, and the plan-shape gates that make PQ the scale path (encode is
shuffle-free; ADC broadcasts the query tables, never the corpus).
"""

import pyspark.sql.functions as F
import pytest

from iceberg_compaction_spark.operators import similarity as sim
from iceberg_compaction_spark.registry import PQ_ANCHOR_IDS, PQ_M

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def codebook(emb):
    anchors = emb.where(F.col("vec_id").isin(PQ_ANCHOR_IDS)).select(
        F.col("vec_id").alias("anchor_code"), "embedding"
    )
    return sim.pq_train_from_anchors(anchors, m=PQ_M)


def test_codebook_shape_and_quantization(codebook, emb):
    d = len(emb.select("embedding").first()[0])
    assert len(codebook) == PQ_M
    assert all(len(sub) == len(PQ_ANCHOR_IDS) for sub in codebook)
    assert all(
        len(entry) == d // PQ_M for sub in codebook for entry in sub
    )
    flat = [v for sub in codebook for e in sub for v in e]
    assert all(isinstance(v, int) for v in flat)
    assert any(v != 0 for v in flat)


def test_encode_anchor_vectors_pick_their_own_code(spark, emb, codebook):
    """Each anchor's subvectors are distance-0 to their own codebook
    entry, so every anchor must encode to its own code in every
    subspace (unless another anchor ties, which the fixture doesn't)."""
    anchors = emb.where(F.col("vec_id").isin(PQ_ANCHOR_IDS))
    codes = {
        r["vec_id"]: r["codes"]
        for r in sim.pq_encode(anchors, codebook).collect()
    }
    order = {v: i for i, v in enumerate(sorted(PQ_ANCHOR_IDS))}
    for vid, cs in codes.items():
        assert cs == [order[vid]] * PQ_M


def test_encode_plan_is_shuffle_free(spark, emb, codebook):
    plan = (
        sim.pq_encode(emb, codebook)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, "PQ encode must be a narrow projection"


def test_adc_kernel_scores_batches_corpus_never_shuffles(spark, emb, codebook):
    """Optimization r15: ADC scoring is a MapInArrow kernel over the
    narrow codes stream with per-batch partial top-k — the corpus is
    never hash-shuffled and never pair-expanded; the only Exchange in
    the plan partitions the reduced candidate stream (batch-local
    top-k survivors) for the global per-query top-k window."""
    queries = emb.where(F.col("vec_id") % 100 == 0)
    plan = (
        sim.pq_topk(emb, queries, codebook)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInArrow" in plan, plan
    # every Exchange partitions the candidate stream by query_id —
    # the corpus side reaches the kernel exchange-free
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert exchanges and all("query_id" in ln for ln in exchanges), exchanges
    # no join of the scored pair stream survives in the plan
    assert "Join" not in plan, plan


def _exact_l2_top5(emb):
    import math

    rows = {
        r["vec_id"]: [math.floor(float(x) * 1000000) for x in r["embedding"]]
        for r in emb.collect()
    }
    exact = set()
    for q in [v for v in rows if v % 100 == 0]:
        ds = sorted(
            (sum((a - b) * (a - b) for a, b in zip(rows[q], rows[n])), n)
            for n in rows
            if n != q
        )
        exact.update((q, n) for _, n in ds[:5])
    return exact


def test_pq_recall_floor_and_training_improves_it(spark, emb, codebook):
    """ADC recall vs exact L2.  Uniform-random 64-dim vectors are PQ's
    worst case (48-bit codes over unstructured data), so the absolute
    floor is modest; the REAL assertion is relative: a corpus-trained
    codebook (pq_train_kmeans) must beat the anchor codebook."""
    queries = emb.where(F.col("vec_id") % 100 == 0)
    exact = _exact_l2_top5(emb)
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.pq_topk(emb, queries, codebook, k=5).collect()
    }
    assert len(approx) == len(exact)
    anchor_recall = len(exact & approx) / len(exact)
    assert anchor_recall >= 0.1, f"PQ recall collapsed: {anchor_recall}"

    trained = sim.pq_train_kmeans(emb, m=PQ_M, k=16, iters=3)
    approx_t = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.pq_topk(emb, queries, trained, k=5).collect()
    }
    trained_recall = len(exact & approx_t) / len(exact)
    assert trained_recall > anchor_recall


def test_adc_distance_is_exact_codebook_distance(spark, emb, codebook):
    """The ADC distance of a doc must equal the exact integer distance
    between the query and the doc's RECONSTRUCTION from the codebook."""
    import math

    queries = emb.where(F.col("vec_id") == 0)
    out = sim.pq_topk(emb, queries, codebook, k=3).collect()
    codes = {
        r["vec_id"]: r["codes"] for r in sim.pq_encode(emb, codebook).collect()
    }
    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    qxm = [math.floor(float(x) * 1000000) for x in qvec]
    sub = len(qxm) // PQ_M
    for r in out:
        recon = [
            v for j in range(PQ_M) for v in codebook[j][codes[r["neighbor_id"]][j]]
        ]
        expect = sum((a - b) * (a - b) for a, b in zip(qxm, recon))
        assert r["adc_dist"] == expect


def test_ivfpq_restricts_to_probe_cluster(spark, emb, codebook):
    """IVF-PQ candidates must be a subset of the query's coarse cluster
    (no cartesian in the plan), and every returned neighbor must share
    the query's cluster assignment."""
    from iceberg_compaction_spark.registry import IVF_CENTROID_IDS

    cent = emb.where(F.col("vec_id").isin(IVF_CENTROID_IDS))
    order = {v: i for i, v in enumerate(sorted(IVF_CENTROID_IDS))}
    mapping = F.create_map(
        *[F.lit(x) for kv in order.items() for x in kv]
    )
    centroids = cent.select(
        mapping[F.col("vec_id")].cast("int").alias("cluster_id"), "embedding"
    )
    queries = emb.where(F.col("vec_id") % 100 == 0)
    out = sim.ivfpq_topk(emb, queries, centroids, codebook, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    assert "BroadcastExchange" in plan

    assign = {
        r["vec_id"]: r["cluster_id"]
        for r in sim.assign_clusters(emb, centroids).collect()
    }
    for r in out.collect():
        assert assign[r["query_id"]] == assign[r["neighbor_id"]]


def test_vectorized_encode_matches_hof_reference(spark, emb, codebook):
    """The Arrow/numpy encode kernel and the pure-HOF reference must be
    bit-identical, including tie direction (first minimal index)."""
    fast = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in sim.pq_encode(emb, codebook).collect()
    )
    ref = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in sim.pq_encode_hof(emb, codebook).collect()
    )
    assert fast == ref


def test_pq_topk_guard_refuses_oversized_corpus(spark):
    """Exhaustive ADC is a baseline, not a scale path: above max_rows it
    must refuse loudly (same contract as cosine_pairs) unless the caller
    acknowledges the quadratic cost (VERDICT r5 #5)."""
    import pytest as _pytest

    from iceberg_compaction_spark.operators import similarity as sim

    emb = spark.range(20).selectExpr(
        "id as vec_id",
        "array(cast(id as float), cast(id+1 as float)) as embedding",
    )
    queries = emb.limit(2)
    codebook = [[[0, 0], [1000000, 1000000]]]
    with _pytest.raises(sim.AllPairsScaleError):
        sim.pq_topk(emb, queries, codebook, k=2, max_rows=10)
    # acknowledged: runs
    assert sim.pq_topk(emb, queries, codebook, k=2, max_rows=100).count() > 0
