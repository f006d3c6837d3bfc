"""Canonical-representative selection: longest text wins, min-id ties,
singletons pass through — the labels -> deduped-corpus step."""

from cs588_data_science_bug_duplicate_detector_spark.operators.canonical import canonical_docs


def test_canonical_selection(spark):
    docs = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 300), (4, 50), (9, 70)],
        "doc_id long, n_chars long",
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 1), (9, 9)], "doc_id long, cluster_id long"
    )
    got = {r["cluster_id"]: r for r in canonical_docs(docs, labels).collect()}
    assert set(got) == {1, 9}
    # longest wins; 2 vs 3 tie on n_chars=300 -> min doc_id
    assert got[1]["doc_id"] == 2 and got[1]["n_members"] == 4
    assert got[9]["doc_id"] == 9 and got[9]["n_members"] == 1
