"""Throughput-linearity regression gate (VERDICT r5 #7).

The round-5 perturbed-10x fixture (tools/scale_fixture.py) caught a
real scale bug — the curation flagship's exact inverted-index Jaccard
join went df-squared at 10x data.  This promotes that check into the
suite as an opt-in slow marker: ``pytest -m scale`` builds the fixture
once (cached under /tmp keyed by source + factor) and asserts every
tracked query's wall ratio stays at-or-below linear in the data factor.

Default source is sf0.01 (10x of it is sf0.1-sized — minutes, not
hours, under the test session's local[4]); point
``SPARK_GRAFT_SCALE_SRC`` at sf0.1 for the deep run documented in
BASELINE.md.  Quadratic-by-design baselines (ann_topk,
dedup_ngram_jaccard, ann_pq) are deliberately NOT tracked — their
scale twins (ann_lsh/ann_ivf, dedup_minhash_lsh, ann_ivfpq) are.
"""

import os
import time

import pytest

FACTOR = 10
# multiplicative slack for host-steal variance (BASELINE.md documents
# identical runs spreading 25-50 s) + additive grace for fixed overhead
RATIO_SLACK = 1.4
GRACE_S = 2.0

TRACKED = [
    "mor_full",
    "dedup_exact",
    "emb_quantize",
    "dedup_embedding_lsh",
    "ann_lsh",
    "dedup_minhash_lsh",
    "text_quality",
    "pipeline_curation_full",
    # round 6: delta-vs-corpus dedup, changelog diff, DataSource MOR
    "dedup_incremental",
    "cdc_changelog",
    "datasource_mor_read",
    # round 7: span-level dedup (shingle-stream shuffle shape)
    "dedup_span_coverage",
    # round 8: the scaled fixture now shifts orders/events ids per
    # replica (tools/scale_fixture.py scale_orders/scale_events), so the
    # fact-fact join and the per-user sessionization window are
    # exercised at 10x too (VERDICT r7 #1)
    "join_order_revenue",
    "events_sessionize",
    # round 9: the DML surface — distributed predicate scan + one-file
    # artifact write (delete_where) and the partition fan-out write
    # path (partitioned_write), each rebuilt per sf_dir by its fixture
    # (VERDICT r8 #7)
    "dml_delete_where",
    "dml_partitioned_write",
    # round 10: SemDeDup — cluster-restricted ~n^2/k pair generation;
    # k is the paper's scale knob (tracked per VERDICT r9 #5; the
    # k-knob contract itself is test_semantic_dedup_k_knob below)
    "dedup_semantic",
    # round 11: unigram-LM scoring — corpus explode + model fit + a
    # token->p join whose build side (the vocabulary) grows sublinearly
    # with the corpus; tracked to pin that the join stays linear-ish
    "text_unigram_logprob",
    # round 12 (VERDICT r11 #5): the two new data-sized surfaces —
    # position_deletes is a genuinely DISTRIBUTED delete-row read
    # (delete content scales with the data on a delete-heavy table),
    # and the branch changelog pays a lineage walk + delta diff whose
    # data side must stay linear while the walk stays metadata-priced
    "meta_position_deletes",
    "cdc_changelog_branch",
    # round 12: the two new corpus-sized text operators — the line-key
    # window shuffle (cross-document line dedup) and the double-explode
    # pair count (BPE statistics) must both stay linear in the corpus
    "dedup_corpus_lines",
    "text_bpe_pairs",
    # round 12: the two new corpus-sized statistics/scoring operators —
    # the theta-NDV build (per-batch hash + map-side k-smallest combine
    # must keep the candidate stream bounded while the SCAN scales) and
    # the classifier's explode + broadcast-vocab join + doc aggregate
    "stats_theta_ndv",
    "text_classifier_score",
    # round 13 (VERDICT r12 #7): the v3 lineage read — scan-shaped
    # (hidden-pos scan + inlined literal-map id synthesis; the fixture
    # compacts once per sf_dir so the timed read covers BOTH the
    # materialized-column and synthesized classes) — and the snapshot
    # fork's MOR read, which must stay priced by the FORK's data, not
    # the source table's history
    "v3_row_lineage",
    "dml_snapshot_fork",
    # round 13: DSIR importance weights — corpus explode + conditional
    # bucket agg + broadcast feature join + doc sum must stay linear
    "pipeline_dsir_weights",
    # round 14 (VERDICT r13 #3): the geometry tier — WKB encode/decode
    # + bbox predicate (pure batch codec work, must scale with the
    # scan), the Morton tile rollup (JVM integer expressions over a
    # bounded key space), and the tile-bucketed spatial join (tile
    # equi-join + residual; work must stay points + candidates, never
    # pairs x regions beyond shared tiles)
    "geo_bbox_filter",
    "geo_tile_rollup",
    "geo_spatial_join",
    "geo_knn_join",
    "geo_envelope_join",
    # round 14: spec-shape shredding — write-time Arrow-batched decode
    # must stay linear in the scan
    "variant_shredded_read",
    # round 14: the two bounded-key rollups — OHLC's struct-argminmax
    # aggregate and the grouping-sets pyramid expand must both stay
    # scan-priced (key spaces are fixed; only the stream grows)
    "events_ohlc",
    "geo_tile_pyramid",
    # round 15: multi-geometry codec through the envelope join (encode
    # + batch parse + tile join must all stay linear in the scan), and
    # the antimeridian split (two boolean ranges, still scan-priced)
    "geo_multipolygon_join",
    "geo_antimeridian_filter",
    "variant_shredded_nested",
    "variant_shredded_array_obj",
    # round 15: spherical cap-cover join — candidates-per-cap pricing
    # must hold as the point stream grows (caps are fixed, density
    # scales linearly), and the one-parse stats accessor must stay
    # vertex-linear
    "geo_haversine_join",
    "geo_multipolygon_stats",
    # round 15: winnowing — posexplode + two shared-sort window frames
    # must stay linear in the token stream; the pairs join is bucketed
    # by fingerprint
    "dedup_winnow_pairs",
    # round 15: real media decode chains — three Arrow passes must
    # stay linear in the (subset-bounded) payload stream
    "multimodal_pixel_stats",
    "multimodal_audio_stats",
]


def _build_fixture(src: str, factor: int) -> str:
    dst = f"/tmp/icspark-scale-x{factor}-{os.path.basename(src.rstrip('/'))}"
    stamp = os.path.join(dst, "_BUILT")
    if os.path.exists(stamp):
        return dst
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "tools", "scale_fixture.py"),
            str(factor),
            src,
            dst,
        ],
        check=True,
        cwd=repo,
    )
    with open(stamp, "w") as f:
        f.write("ok")
    return dst


def _time(fn, spark, sf_dir: str, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


@pytest.mark.scale
def test_tracked_queries_scale_linearly(spark):
    import __spark_entry__ as entry

    src = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.01")
    scaled = _build_fixture(src, FACTOR)
    qs = entry.queries()
    failures = []
    for name in TRACKED:
        fn = qs[name]
        t_base = _time(fn, spark, src)
        t_scaled = _time(fn, spark, scaled)
        limit = FACTOR * t_base * RATIO_SLACK + GRACE_S
        ok = t_scaled <= limit
        print(
            f"{name}: base {t_base:.2f}s scaled {t_scaled:.2f}s "
            f"ratio {t_scaled / max(t_base, 1e-9):.1f}x "
            f"(limit {limit:.2f}s) {'OK' if ok else 'FAIL'}"
        )
        if not ok:
            failures.append((name, t_base, t_scaled, limit))
    assert not failures, failures


@pytest.mark.scale
def test_semantic_dedup_k_knob_wall(spark):
    """The k-knob contract at data scale: on the 10x fixture, k=16
    must not be slower than k=4 beyond host-variance slack — more,
    smaller clusters means ~4x fewer within-cluster cosine pairs, the
    dominant stage once data is non-trivial (SemDeDup's own scaling
    argument, arXiv:2303.09540)."""
    from pyspark.sql import functions as F

    from iceberg_compaction_spark.operators import similarity as sim

    src = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.01")
    scaled = _build_fixture(src, FACTOR)
    emb = (
        spark.read.parquet(os.path.join(scaled, "embeddings.parquet"))
        .select("vec_id", "embedding")
    )

    def wall(k: int) -> float:
        cents = sim.kmeans_train(emb, k=k, iters=2)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            sim.semantic_dedup(emb, cents, 350000).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    w4, w16 = wall(4), wall(16)
    print(f"semantic dedup wall: k=4 {w4:.2f}s k=16 {w16:.2f}s")
    assert w16 <= w4 * RATIO_SLACK + GRACE_S, (w4, w16)
