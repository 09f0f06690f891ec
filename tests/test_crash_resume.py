"""Hard-crash recovery: SIGKILL the crawl driver process mid-run, then
resume from the checkpoint — the final crawl must equal an
uninterrupted run at WHATEVER point the kill landed (atomic per-round
manifests + drop_rounds_after tail cleanup are the mechanism)."""

import json
import os
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"

_DRIVER = """
import sys, json
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
sys.path.insert(0, {repo!r})
from link_profiler_repo_ray.pipelines.crawl import CrawlConfig, run_crawl
cfg = CrawlConfig(num_seen_shards=2, num_fetchers=2, checkpoint_dir={ck!r},
                  resume={resume}, collect_edges=False, collect_order=False)
res = run_crawl({sf!r}, cfg)
print("COUNTERS " + json.dumps({{k: v for k, v in res.counters.items()
                                 if isinstance(v, (int, float)) and not k.startswith("t_")}}))
ray.shutdown()
"""


def _run_driver(ck: str, resume: bool, kill_when_checkpointed: bool = False):
    import glob

    code = _DRIVER.format(repo="/root/repo", ck=ck, resume=resume, sf=SF)
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    if kill_when_checkpointed:
        # kill the instant the run has produced >= 2 complete rounds —
        # lands mid-crawl at any machine speed (or the process finishes
        # first and the caller skips)
        deadline = time.time() + 120
        while time.time() < deadline and proc.poll() is None:
            if len(glob.glob(os.path.join(ck, "round=*", "manifest.json"))) >= 2:
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                return None
            time.sleep(0.05)
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            return None
    out, _ = proc.communicate(timeout=600)
    for line in out.splitlines():
        if line.startswith("COUNTERS "):
            return json.loads(line[len("COUNTERS "):])
    return None


@pytest.mark.usefixtures("ray_session")
def test_sigkill_mid_crawl_then_resume(tmp_path):
    import glob

    from link_profiler_repo_ray.pipelines.crawl import CrawlConfig, oracle_crawl

    ora = oracle_crawl(SF, CrawlConfig())

    ck = str(tmp_path / "ck")
    first = _run_driver(ck, resume=False, kill_when_checkpointed=True)
    if first is not None:
        pytest.skip("crawl finished before the kill landed (machine too fast)")
    # some checkpoint state must exist for the resume to be meaningful
    assert glob.glob(os.path.join(ck, "round=*", "manifest.json")), "killed before any checkpoint"

    resumed = _run_driver(ck, resume=True)
    assert resumed is not None
    # the resumed run's order log (read back from the per-round parquet
    # lineage) must equal the sequential oracle end-to-end
    import pyarrow as pa

    # per-file reads: a list-of-paths read would hive-infer the
    # "round=NNNNN" dirs as a partition column clashing with the
    # in-file "round" column
    order = pa.concat_tables(
        pq.read_table(f, columns=["seq", "url", "depth"])
        for f in sorted(glob.glob(os.path.join(ck, "round=*", "order.parquet")))
    ).sort_by("seq")
    got = list(zip(order.column("url").to_pylist(), order.column("depth").to_pylist()))
    assert got == ora["order"]
    assert resumed["pages_fetched"] == len(ora["order"])
