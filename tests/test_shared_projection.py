"""r15: the shared-quantized-projection plumbing (`_qn`/`_q_all`/
`_init_vecs`) must be a pure execution-strategy change — trainers and
search tails return BIT-IDENTICAL results with and without a shared
projection, including ivfpq_train's driver-side residual init."""

import pytest
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.clustering import kmeans_fit
from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.pq import (
    ivfpq_topk,
    ivfpq_train,
    pq_topk_adc,
    pq_train,
)
from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.similarity import quantized_norm


@pytest.fixture(scope="module")
def emb(spark):
    # deterministic synthetic embeddings: 48 vectors, 8 dims
    rows = [
        (i, [((i * 31 + d * 17) % 97 - 48) / 7.0 for d in range(8)])
        for i in range(48)
    ]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


def test_kmeans_init_vecs_matches_own_init(spark, emb):
    from pyspark import StorageLevel

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.dedup import portable_hash

    base = kmeans_fit(emb, k=5, iters=2)
    qn = quantized_norm(emb).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        init = [
            r.q
            for r in qn.select("id", "q")
            .orderBy(portable_hash(F.col("id").cast("string")), "id")
            .limit(5)
            .collect()
        ]
        shared = kmeans_fit(
            emb, k=5, iters=2, _q=qn.select("id", "q"), _init_vecs=init
        )
        assert shared == base
    finally:
        qn.unpersist(blocking=False)


def test_pq_train_shared_qn_matches(spark, emb):
    from pyspark import StorageLevel

    base = pq_train(emb, m=4, k=4, iters=2)
    qn = quantized_norm(emb).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        assert pq_train(emb, m=4, k=4, iters=2, _qn=qn) == base
    finally:
        qn.unpersist(blocking=False)


def test_ivfpq_train_and_search_shared_qn_matches(spark, emb):
    from pyspark import StorageLevel

    queries = emb.where(F.col("vec_id") < 3)
    cents0, cbs0 = ivfpq_train(emb, coarse_k=4, m=4, k=4, iters=2)
    r0 = ivfpq_topk(emb, queries, cents0, cbs0, k=3, nprobe=2).orderBy(
        "query_id", "rank"
    ).collect()
    qn = quantized_norm(emb).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        cents1, cbs1 = ivfpq_train(emb, coarse_k=4, m=4, k=4, iters=2, _qn=qn)
        # the driver-computed residual init must reproduce the
        # distributed init bit-for-bit
        assert cents1 == cents0
        assert cbs1 == cbs0
        r1 = ivfpq_topk(
            emb, queries, cents1, cbs1, k=3, nprobe=2,
            _qn=qn, _queries_qn=qn.where(F.col("id") < 3),
        ).orderBy("query_id", "rank").collect()
        assert r1 == r0
    finally:
        qn.unpersist(blocking=False)


def test_pq_adc_shared_queries_qn_matches(spark, emb):
    from pyspark import StorageLevel

    queries = emb.where(F.col("vec_id") < 3)
    cbs = pq_train(emb, m=4, k=4, iters=2)
    r0 = pq_topk_adc(emb, queries, cbs, k=3).orderBy("query_id", "rank").collect()
    qn = quantized_norm(emb).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        r1 = pq_topk_adc(
            emb, queries, cbs, k=3, _qn=qn, _queries_qn=qn.where(F.col("id") < 3)
        ).orderBy("query_id", "rank").collect()
        assert r1 == r0
    finally:
        qn.unpersist(blocking=False)


def test_aligned_select_matches_column_path(spark, tmp_path):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL

    repo = LakeRepo.init(str(tmp_path / "r"))
    sql = LakeSQL(spark, repo, "main")
    sql.sql("CREATE TABLE t (K_Id BIGINT, v STRING, d DOUBLE DEFAULT 1.5)")
    # positional branch (values cast to the target types)
    sql.sql("INSERT INTO t VALUES (1, 'a', 0.5)")
    # named-column branch: d is omitted and takes its DEFAULT
    sql.sql("INSERT INTO t (K_Id, v) VALUES (2, 'b')")
    got = sorted((r.K_Id, r.v, r.d) for r in sql.sql("SELECT * FROM t").collect())
    assert got == [(1, "a", 0.5), (2, "b", 1.5)]
    f = {x.name: x for x in sql.sql("SELECT * FROM t").schema.fields}
    assert f["K_Id"].dataType.simpleString() == "bigint"
    assert f["d"].dataType.simpleString() == "double"
