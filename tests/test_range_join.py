"""events_range_join: randomized event tables + planted boundary
events vs the DuckDB oracle — pins half-open interval semantics
(ts == start included, ts == end excluded) and the bucket-replication
completeness the closed-form sf corpus alone can't stress."""

import datetime

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BASE = datetime.datetime(2024, 1, 1)


def _write_events(path, ts_list, values):
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(ts_list)), pa.int64()),
            "ts": pa.array(ts_list, pa.timestamp("us")),
            "user_id": pa.array([i % 7 for i in range(len(ts_list))], pa.int64()),
            "event_type": pa.array(["click"] * len(ts_list), pa.string()),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * len(ts_list), pa.string()),
        }
    )
    pq.write_table(tbl, path)


def _oracle(tmp_path):
    import __ray_entry__ as entry

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    return (
        con.execute(entry.oracle_sql()["events_range_join"])
        .fetchdf()
        .sort_values("w_id")
        .reset_index(drop=True)
    )


def _run(tmp_path):
    from link_profiler_repo_ray.pipelines.relational import events_range_join

    return (
        events_range_join(str(tmp_path))
        .to_pandas()
        .sort_values("w_id")
        .reset_index(drop=True)
    )


@pytest.mark.usefixtures("ray_session")
def test_range_join_random_events(tmp_path):
    rng = np.random.RandomState(0)
    n = 600
    # n=600 -> 18 windows spanning 72h; spread events across 60h so
    # they all land inside the covered span, densely hitting every
    # window-duration class and the overlap regions
    offsets_us = rng.randint(0, 60 * 3600 * 1_000_000, size=n)
    ts = [BASE + datetime.timedelta(microseconds=int(o)) for o in sorted(offsets_us)]
    values = np.round(rng.uniform(0, 500, size=n), 2)
    _write_events(tmp_path / "events.parquet", ts, values.tolist())

    got, want = _run(tmp_path), _oracle(tmp_path)
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False, check_exact=True
    )
    # overlap sanity vs a brute-force membership count: at least one
    # event belongs to MORE than one window — the interval-join case a
    # plain equality join can't produce
    n_windows = n // 40 + 3
    memberships = []
    for t in ts:
        t_us = int((t - BASE) / datetime.timedelta(microseconds=1))
        m = sum(
            1
            for w in range(n_windows)
            if w * 4 * 3_600_000_000
            <= t_us
            < w * 4 * 3_600_000_000 + (1 + w % 6) * 3_600_000_000
        )
        memberships.append(m)
    assert int(got["n_events"].sum()) == sum(memberships)
    assert max(memberships) >= 2
    assert (got["category"] == got["w_id"] % 3).all()


@pytest.mark.usefixtures("ray_session")
def test_range_join_boundary_semantics(tmp_path):
    # windows: w_id 0.. (n//40+2).  w0: [00:00, 01:00) (dur 1h);
    # w1: [04:00, 06:00) (dur 2h); w5: [20:00, 02:00 next day) (dur 6h
    # -> spans two buckets, exercising the k=1 replica)
    h = datetime.timedelta(hours=1)
    us = datetime.timedelta(microseconds=1)
    planted = [
        BASE,                 # == w0 start -> included in w0
        BASE + h - us,        # last us of w0 -> included
        BASE + h,             # == w0 end -> EXCLUDED from w0
        BASE + 4 * h,         # w1 start
        BASE + 6 * h - us,    # last us of w1
        BASE + 6 * h,         # w1 end -> excluded (no window covers 06:00)
        BASE + 25 * h,        # inside w5 [20h,26h) via its SECOND bucket [24h,28h)
        BASE + 26 * h - us,   # last us of w5 (also second bucket)
        BASE + 26 * h,        # w5 end -> excluded everywhere (w6 = [24h,25h))
    ]
    # windows exist only up to n_events//40 + 2, so pad the count with
    # far-future filler (matches nothing) until w5 is generated
    filler = [BASE + datetime.timedelta(days=400) for _ in range(150)]
    ts = planted + filler
    values = [100.0 + i for i in range(len(ts))]
    _write_events(tmp_path / "events.parquet", ts, values)

    got, want = _run(tmp_path), _oracle(tmp_path)
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False, check_exact=True
    )
    g = got.set_index("w_id")
    assert g.loc[0, "n_events"] == 2          # start included, end excluded
    assert g.loc[1, "n_events"] == 2
    assert 5 in g.index and g.loc[5, "n_events"] == 2  # second-bucket replica caught both


@pytest.mark.usefixtures("ray_session")
def test_event_funnel_strict_order_planted(tmp_path):
    """Funnel strictness: same-timestamp step-2 events do NOT convert;
    out-of-order chains do not convert; full ordered chains do."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from link_profiler_repo_ray.pipelines import relational

    t0 = 1_700_000_000_000_000
    rows = [
        # user 1: full ordered chain
        (1, "view", t0), (1, "click", t0 + 10), (1, "purchase", t0 + 20),
        # user 2: click at the SAME ts as view -> stops at step 1
        (2, "view", t0), (2, "click", t0),
        # user 3: purchase BEFORE click -> stops at step 2
        (3, "view", t0), (3, "purchase", t0 + 5), (3, "click", t0 + 10),
        # user 4: never viewed
        (4, "click", t0), (4, "purchase", t0 + 5),
    ]
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "value": pa.array([0.0] * len(rows)),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(tbl, sf / "events.parquet")
    got = relational.event_funnel(str(sf)).to_pandas().set_index("step")
    assert got.loc[1, "n_users"] == 3  # users 1,2,3 viewed
    assert got.loc[2, "n_users"] == 2  # users 1,3 clicked after view
    assert got.loc[3, "n_users"] == 1  # only user 1 completed
