"""int8 embedding quantization (textdata.embedding_quantize): oracle
parity is covered by tests/test_queries_oracle.py; here, the property
quantization exists FOR — reconstructed codes preserve neighborhood
structure (recall vs the float top-k) — plus code-range sanity."""

import sys

import numpy as np
import polars as pl
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def codes(ray_session):
    from link_profiler_repo_ray.pipelines.textdata import embedding_quantize

    return pl.from_pandas(embedding_quantize(SF).to_pandas())


def test_code_range_and_shape(codes):
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id"])
    assert len(codes) == emb.num_rows * 64
    assert codes.get_column("code").min() >= 0
    assert codes.get_column("code").max() <= 255
    # every dim uses a real span: both extremes hit somewhere
    per_dim = codes.group_by("dim").agg(
        pl.col("code").min().alias("lo"), pl.col("code").max().alias("hi")
    )
    assert per_dim.get_column("lo").max() == 0
    assert per_dim.get_column("hi").min() == 255


def test_quantized_topk_recall(codes):
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vids = np.asarray(t.column("vec_id").to_pylist())
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(vids)
    emb = emb[order]

    wide = (
        codes.sort(["vec_id", "dim"])
        .get_column("code")
        .to_numpy()
        .reshape(len(emb), 64)
        .astype(np.float64)
    )
    mn, mx = emb.min(axis=0), emb.max(axis=0)
    recon = wide * ((mx - mn) / 255.0) + mn

    def topk(mat, q, k=10):
        x = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = x[q] @ x.T
        sims[q] = -np.inf
        return set(np.argsort(-sims)[:k])

    hits = total = 0
    for q in range(0, len(emb), max(1, len(emb) // 20)):
        exact = topk(emb, q)
        approx = topk(recon, q)
        hits += len(exact & approx)
        total += len(exact)
    recall = hits / total
    assert recall >= 0.9, recall  # int8/dim keeps neighborhoods intact
