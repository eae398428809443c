"""Event-stream operator tests (windowed counts, sessionization)."""

import datetime

import pytest

from webtext.functions.events import sessionize, windowed_counts


def _ev(eid, user, minutes, etype="click"):
    return {"event_id": eid, "user_id": user,
            "ts": datetime.datetime(2024, 1, 1) +
            datetime.timedelta(minutes=minutes),
            "event_type": etype, "value": 1.0, "props": ""}


def test_windowed_counts_tumbling_hours(ray_session):
    import ray.data

    rows = [_ev(1, 1, 5), _ev(2, 1, 25), _ev(3, 2, 65),
            _ev(4, 2, 70, "view")]
    out = windowed_counts(ray.data.from_items(rows)).take_all()
    got = {(r["event_type"], r["w"]): r["n"] for r in out}
    assert got == {
        ("click", "2024-01-01 00:00:00"): 2,
        ("click", "2024-01-01 01:00:00"): 1,
        ("view", "2024-01-01 01:00:00"): 1,
    }


def test_sessionize_gap_semantics(ray_session):
    import ray.data

    rows = [
        _ev(1, 7, 0), _ev(2, 7, 10), _ev(3, 7, 50),   # gap 40 > 30 → split
        _ev(4, 7, 60),                                 # gap 10 → same
        _ev(5, 8, 0),                                  # single event user
    ]
    out = {r["user_id"]: r["n_sessions"]
           for r in sessionize(ray.data.from_items(rows)).take_all()}
    assert out == {7: 2, 8: 1}


def test_sessionize_deterministic_on_ts_ties(ray_session):
    import ray.data

    rows = [_ev(2, 9, 0), _ev(1, 9, 0), _ev(3, 9, 45)]
    out = sessionize(ray.data.from_items(rows)).take_all()
    assert out[0]["n_sessions"] == 2
