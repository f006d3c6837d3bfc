"""Global-farm skew corpus (datagen.generate_skewed_pages_distributed) +
hot-bucket survival: the farm spans every slice, floods one LSH bucket per
band past bucket_cap, and must still come back as ONE cluster via the
min-member star edges — with candidate volume linear, not quadratic."""

from pyspark.sql import functions as F

from cs588_data_science_bug_duplicate_detector_spark.config import DedupConfig
from cs588_data_science_bug_duplicate_detector_spark.datagen import (
    generate_skewed_pages_distributed,
)
from cs588_data_science_bug_duplicate_detector_spark.operators.cc import connected_components
from cs588_data_science_bug_duplicate_detector_spark.operators.minhash import (
    minhash_edges,
    release_cached_deps,
)

N, FRAC, SLICE = 2000, 0.1, 500  # farm of 200 spanning 4 slices


def test_skew_corpus_shape(spark):
    pages = generate_skewed_pages_distributed(
        spark, N, farm_frac=FRAC, slice_size=SLICE
    ).persist()
    assert pages.count() == N
    # members are gid % 10 == 0 — one per stride, in every slice
    farm = pages.where(F.col("url").substr(-9, 9).cast("long") % 10 == 0)
    assert farm.count() == N // 10
    # the template is global: every farm doc shares all but one token
    two = [r.text.split() for r in farm.limit(2).collect()]
    assert len(two[0]) == len(two[1]) == 180
    assert sum(a != b for a, b in zip(*two)) == 2  # one unique token each
    # determinism across re-generation
    again = generate_skewed_pages_distributed(spark, N, farm_frac=FRAC, slice_size=SLICE)
    assert pages.exceptAll(again).count() == 0
    pages.unpersist()


def test_skew_farm_recovered_as_one_cluster_with_bounded_pairs(spark):
    cfg = DedupConfig(bucket_cap=16)  # farm of 200 >> cap: star path engaged
    docs = (
        generate_skewed_pages_distributed(spark, N, farm_frac=FRAC, slice_size=SLICE)
        .select(F.xxhash64("url").alias("doc_id"), "text")
        .persist()
    )
    edges, hot = minhash_edges(docs, "doc_id", "text", cfg)
    edges = edges.persist()
    n_edges = edges.count()
    # hot buckets were actually hit: the farm floods ~1 bucket per band
    # (members whose one-token edit lands inside a band's slots fall out of
    # that band's bucket, so bucket sizes sit a bit under the farm size)
    hot_rows = hot.collect()
    assert hot_rows and max(r.bucket_size for r in hot_rows) >= (N // 10) // 2
    # candidate volume stayed linear-ish: star edges are farm_size-1 per hot
    # bucket, not farm_size^2/2 pairs (which would be ~2e4 for ONE band here)
    assert n_edges < 20 * (N // 10)
    labels = connected_components(edges, vertices=docs.select("doc_id"))
    sizes = labels.groupBy("cluster_id").count()
    assert sizes.agg(F.max("count")).collect()[0][0] == N // 10
    release_cached_deps(edges)
    edges.unpersist()
    docs.unpersist()
