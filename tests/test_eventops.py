"""As-of join and range join semantics on hand-built event streams."""

import datetime as dt

import pytest

from dce_spark.functions.eventops import asof_join, range_join_pairs

pytestmark = pytest.mark.spark

T0 = dt.datetime(2025, 6, 1, 12, 0, 0)


def _ev(eid, seconds, user, etype):
    return (eid, T0 + dt.timedelta(seconds=seconds), user, etype, 0.0, "{}")


COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        _ev(1, 0, 1, "view"),
        _ev(2, 10, 1, "purchase"),   # matches view 1
        _ev(3, 20, 1, "view"),
        _ev(4, 20, 1, "purchase"),   # same instant: at-or-before -> view 3
        _ev(5, 30, 1, "view"),       # later view, never matched by 2/4
        _ev(6, 5, 2, "purchase"),    # user 2 has no prior view -> NULLs
        _ev(7, 50, 2, "view"),
        # range-join fixtures (user 3): error at t=1000, clicks around it
        _ev(10, 1000, 3, "error"),
        _ev(11, 701, 3, "click"),    # dt = -299s: inside 300s window
        _ev(12, 1300, 3, "click"),   # dt = +300s: boundary, inclusive
        _ev(13, 1301, 3, "click"),   # dt = +301s: outside
        _ev(14, 980, 4, "click"),    # other user: never paired
    ]
    return spark.createDataFrame(rows, COLS)


def test_asof_join_at_or_before(events):
    out = {r.probe_event_id: r for r in asof_join(
        events, probe_type="purchase", ref_type="view").collect()}
    assert out[2].ref_event_id == 1
    assert out[4].ref_event_id == 3  # equal-ts reference is visible
    assert out[6].ref_event_id is None and out[6].ref_ts_us is None
    assert set(out) == {2, 4, 6}  # one row per probe, refs never emitted


def test_range_join_window_boundary(events):
    pairs = {(r.l_id, r.r_id): r.dt_us for r in range_join_pairs(
        events, left_type="error", right_type="click",
        window_us=300_000_000).collect()}
    assert (10, 11) in pairs and pairs[(10, 11)] == -299_000_000
    assert (10, 12) in pairs and pairs[(10, 12)] == 300_000_000  # inclusive
    assert (10, 13) not in pairs  # outside the window
    assert not any(r == 14 for (_l, r) in pairs)  # cross-user never pairs
    assert len(pairs) == 2


def test_range_join_is_hash_join_not_nested_loop(events):
    plan = range_join_pairs(
        events, "error", "click"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_hypertable_rollup_grains(events):
    from dce_spark.functions.eventops import hypertable_rollup

    rows = hypertable_rollup(events).collect()
    hour = [r for r in rows if r.grain == "hour"]
    day = [r for r in rows if r.grain == "day"]
    assert hour and day
    # the daily grain aggregates its hourly children exactly
    for d in day:
        kids = [h for h in hour
                if h.event_type == d.event_type and h.day_us == d.day_us]
        assert sum(h.events for h in kids) == d.events
        assert d.hour_us is None
