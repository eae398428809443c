"""Event-stream operators over the events table
(event_id, ts:timestamp[us], user_id, event_type, value, props).

The reference is purely batch (SURVEY §2.4: no windows/watermarks); a
large-scale training-data pipeline still needs time-windowed shapes, so
they are provided as first-class operators:

* windowed_counts — tumbling-window aggregate, expressed with the
  combiner pattern: per-batch partial counts (vectorized
  ``floor_temporal`` + Arrow group_by) so the shuffle ships
  (event_type, window, n) triples, never events.
* sessionize — gap-based sessionization per user: one shuffle
  (groupby user_id), then a sorted in-group gap count.  Integer output,
  exactly replicable by a SQL window-function oracle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

SESSION_GAP_MINUTES = 30


def _partial_window_counts(batch: pa.Table) -> pa.Table:
    # the window key travels as a string so engine-side timestamp dtypes
    # (us vs ns) can never skew value comparison
    floored = pc.floor_temporal(batch.column("ts"), unit="hour")
    # second-precision cast: Arrow's %S renders fractional digits for
    # sub-second timestamp units, DuckDB's does not
    w = pc.strftime(floored.cast(pa.timestamp("s")),
                    format="%Y-%m-%d %H:%M:%S")
    t = pa.Table.from_arrays(
        [batch.column("event_type"), w], names=["event_type", "w"])
    agg = t.group_by(["event_type", "w"]).aggregate([("w", "count")])
    return agg.rename_columns(["event_type", "w", "n"])


def windowed_counts(ds):
    """(event_type, w, n): events per type per tumbling 1-hour window."""
    partial = ds.map_batches(_partial_window_counts, batch_format="pyarrow",
                             zero_copy_batch=True)
    summed = partial.groupby(["event_type", "w"]).sum("n")
    return summed.map_batches(
        lambda b: b.rename_columns(["event_type", "w", "n"]),
        batch_format="pyarrow", zero_copy_batch=True)


def sessionize(ds, gap_minutes: int = SESSION_GAP_MINUTES):
    """(user_id, n_sessions): sessions = 1 + #gaps > gap_minutes between
    consecutive events of the user (ordered by ts, then event_id for
    determinism on ts ties)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def count_sessions(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("ts", "ascending"),
                                                ("event_id", "ascending")])
        # normalize the unit before integer math — source timestamps may
        # be s/ms/us depending on the reader
        ts = group.take(idx).column("ts").cast(pa.timestamp("us")) \
                  .cast(pa.int64()).to_pylist()
        sessions = 1
        for prev, cur in zip(ts, ts[1:]):
            if cur - prev > gap_us:
                sessions += 1
        user = group.column("user_id")[0].as_py()
        return pa.Table.from_arrays(
            [pa.array([user], pa.int64()),
             pa.array([sessions], pa.int64())],
            names=["user_id", "n_sessions"])

    return ds.select_columns(["user_id", "ts", "event_id"]) \
             .groupby("user_id").map_groups(count_sessions,
                                            batch_format="pyarrow")
