"""Similarity-search semantics: brute-force top-k is exact (vs numpy); the
LSH bucket path returns a subset ranked identically and finds the identical
vector (recall of the trivial neighbor)."""

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from changedatacapture_spark.functions import similarity as sim

SF = "/root/testdata/sf0.001"


def _corpus():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    return ids, vecs


def test_brute_force_topk_matches_numpy(spark):
    ids, vecs = _corpus()
    q = vecs[0]
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = sim.cosine_topk(emb, list(q), k=10).collect()

    norms = np.linalg.norm(vecs, axis=1)
    cos = vecs @ q / (norms * np.linalg.norm(q))
    order = sorted(range(len(ids)), key=lambda i: (-round(cos[i] * 1e6), ids[i]))[:10]
    exp_ids = [ids[i] for i in order]

    assert [r["vec_id"] for r in got] == exp_ids
    assert got[0]["vec_id"] == 0 and got[0]["cos_micro"] == 1_000_000


def test_lsh_bucket_finds_identical_vector(spark):
    ids, vecs = _corpus()
    q = vecs[7]
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = sim.lsh_bucket_ann(emb, list(q), k=5, n_planes=6).collect()
    assert got, "query bucket empty"
    assert got[0]["vec_id"] == 7, "identical vector must share the query's bucket and rank first"
    assert got[0]["cos_micro"] == 1_000_000


def test_lsh_bucket_is_subset_of_brute_force_ranking(spark):
    ids, vecs = _corpus()
    q = vecs[3]
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    full = {r["vec_id"]: r["cos_micro"] for r in sim.cosine_topk(emb, list(q), k=500).collect()}
    bucketed = sim.lsh_bucket_ann(emb, list(q), k=50, n_planes=4).collect()
    for r in bucketed:
        assert full[r["vec_id"]] == r["cos_micro"], "bucketed score must equal exact score"


def test_embeddings_load_shape(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert emb.select(F.size("embedding")).first()[0] == 64
