"""Stream-shaped operators over an ordered, partitioned log (the
`events` table): session windows and as-of joins.

Ray Data has no event-time watermarks; the guide-sanctioned pattern is
groupby(key).map_groups(fn) with the window/as-of logic running in
pandas over the ts-sorted group. Ordering assumption: windows are
computed per key over that key's complete, ts-sorted history — correct
for batch logs; a live stream would need an actor per key-hash bucket
holding open-window state.
"""

from __future__ import annotations

import pandas as pd


def sessionize_group(g: pd.DataFrame, gap_seconds: float) -> pd.DataFrame:
    """Assign session ids within one user's ts-sorted events: a gap >
    gap_seconds starts a new session."""
    g = g.sort_values(["ts", "event_id"], kind="stable")
    new_session = g["ts"].diff().dt.total_seconds() > gap_seconds
    if len(new_session):
        new_session.iloc[0] = True  # NaN > gap is False, but row 0 opens a session
    g["session_idx"] = new_session.cumsum().astype("int64") - 1
    return g


def sessionize(ds, gap_seconds: float = 1800.0):
    """events -> per-session aggregate rows (user_id, session_idx,
    session_start, n_events, total_value)."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = sessionize_group(g, gap_seconds)
        out = g.groupby("session_idx", sort=True).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            n_events=("event_id", "count"),
            total_value=("value", "sum"),
        ).reset_index()
        out["total_value"] = out["total_value"].round(4)
        return out[["user_id", "session_idx", "session_start", "n_events", "total_value"]]

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def asof_join_per_user(ds, right_type: str = "signup", left_type: str = "error"):
    """For each `left_type` event, the most recent prior-or-equal
    `right_type` event of the same user (pd.merge_asof per user group) —
    the as-of join re-expressed as groupby + sorted merge."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == left_type].sort_values("ts", kind="stable")
        right = g[g["event_type"] == right_type].sort_values("ts", kind="stable")
        if left.empty:
            return pd.DataFrame({
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "ts": pd.Series(dtype="datetime64[us]"),
                "asof_event_id": pd.Series(dtype="float64"),
                "asof_ts": pd.Series(dtype="datetime64[us]"),
            })
        merged = pd.merge_asof(
            left[["event_id", "user_id", "ts"]],
            right[["event_id", "ts"]].rename(
                columns={"event_id": "asof_event_id", "ts": "asof_ts"}),
            left_on="ts", right_on="asof_ts", direction="backward",
        )
        return merged[["event_id", "user_id", "ts", "asof_event_id", "asof_ts"]]

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def sliding_hourly_totals(ds, window_hours: int = 3):
    """Sliding event-time window over the hourly tumbling aggregate:
    per hour, the sum of (value, count) over [hour-(w-1)h, hour].

    Fully distributed (VERDICT r4 #5 replaced the driver hour-loop):
    the combiner-first tumbling aggregate reduces the stream to
    O(distinct hours) rows; each hourly row then fans out to the w
    output hours it contributes to (a vectorized w-way expansion — the
    self-join-on-hour-range expressed as flat map + re-aggregate), and a
    second combiner-first groupby sums the contributions. Hour gaps are
    respected (RANGE semantics: a missing hour contributes nothing, and
    only hours present in the input emit an output row — the is_self
    marker carries that through the shuffle). Rounding contract matches
    the SQL oracle: hourly totals round to 4 before the window sum,
    which rounds again. Returns a Dataset (hour, total_{w}h, n_{w}h)
    sorted by hour."""
    import datetime as _dt

    import pyarrow as pa
    import pyarrow.compute as pc

    from .aggregates import preagg_sum_count

    def add_hour(batch: pa.Table) -> pa.Table:
        return pa.table({
            "hour": pc.floor_temporal(batch.column("ts"), unit="hour"),
            "value": batch.column("value"),
        })

    hourly = preagg_sum_count(
        ds.map_batches(add_hour, batch_format="pyarrow"),
        ["hour"], ["value"], "n",
    )

    def expand(batch: pa.Table) -> pa.Table:
        total = pc.round(batch.column("value"), 4)
        n = batch.column("n")
        parts = []
        for k in range(window_hours):
            parts.append(pa.table({
                "hour": pc.add(batch.column("hour"),
                               pa.scalar(_dt.timedelta(hours=k))),
                "total": total,
                "n_ev": n,
                "is_self": pa.array([1 if k == 0 else 0] * batch.num_rows,
                                    type=pa.int64()),
            }))
        return pa.concat_tables(parts)

    out = preagg_sum_count(
        hourly.map_batches(expand, batch_format="pyarrow"),
        ["hour"], ["total", "n_ev", "is_self"], "__contribs",
    )

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch.column("is_self"), 0))
        return pa.table({
            "hour": batch.column("hour"),
            f"total_{window_hours}h": pc.round(batch.column("total"), 4),
            f"n_{window_hours}h": pc.cast(batch.column("n_ev"), pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow").sort("hour")


def grouped_topk(ds, group_col: str, key_col: str, value_col: str, k: int = 3):
    """Top-k keys by summed value per group: distributed combiner-first
    (group, key) aggregate, then a per-group sort-head with rank
    (groupby().map_groups — each group's reduced rows are small)."""
    import pyarrow as pa

    from .aggregates import preagg_sum_count

    agg = preagg_sum_count(ds, [group_col, key_col], [value_col], "__n")

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["total"] = g[value_col].round(4)
        g = g.sort_values(["total", key_col], ascending=[False, True],
                          kind="stable").head(k)
        g["rk"] = range(1, len(g) + 1)
        return g[[group_col, key_col, "total", "rk"]]

    return agg.groupby(group_col).map_groups(topk, batch_format="pandas")
