"""WebDataset-style tar shard sink/source: lossless round trip,
byte-stable deterministic shards, resumable skip of finished shards."""

import glob
import os
import shutil

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
OUT = "/tmp/lpr_tarshard_test"


@pytest.mark.usefixtures("ray_session")
def test_tar_roundtrip_lossless_and_deterministic():
    from link_profiler_repo_ray.pipelines.textdata import documents_dataset
    from link_profiler_repo_ray.sources import tarshard

    shutil.rmtree(OUT, ignore_errors=True)
    docs = documents_dataset(SF, ["doc_id", "text", "source", "lang"])
    tarshard.write_tar_shards(docs, OUT, docs_per_shard=100)
    files = sorted(glob.glob(os.path.join(OUT, "*.tar")))
    assert len(files) == 5  # 500 docs / 100

    back = (
        tarshard.read_tar_shards(OUT)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text", "source", "lang"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, want)

    # byte-stable: rewriting into a fresh dir reproduces identical files
    out2 = OUT + "_2"
    shutil.rmtree(out2, ignore_errors=True)
    tarshard.write_tar_shards(docs, out2, docs_per_shard=100)
    for f in files:
        g = os.path.join(out2, os.path.basename(f))
        with open(f, "rb") as a, open(g, "rb") as b:
            assert a.read() == b.read(), f
    shutil.rmtree(out2, ignore_errors=True)


@pytest.mark.usefixtures("ray_session")
def test_tar_writer_skips_finished_shards():
    from link_profiler_repo_ray.pipelines.textdata import documents_dataset
    from link_profiler_repo_ray.sources import tarshard

    files = sorted(glob.glob(os.path.join(OUT, "*.tar")))
    assert files, "roundtrip test must run first"
    # corrupt one shard; a resumed write must NOT touch it (resume
    # skips finished partitions — never rewrites)
    with open(files[0], "ab") as fh:
        fh.write(b"sentinel")
    size_before = os.path.getsize(files[0])
    docs = documents_dataset(SF, ["doc_id", "text", "source", "lang"])
    tarshard.write_tar_shards(docs, OUT, docs_per_shard=100)
    assert os.path.getsize(files[0]) == size_before
    shutil.rmtree(OUT, ignore_errors=True)
