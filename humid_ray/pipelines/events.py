"""Windowed operators over the ``events`` table.

The custom-operator class the reference lacks (SURVEY §2.10 confirms
it has no streaming/window semantics): tumbling-window aggregation and
gap-based sessionization, expressed Ray-Data-first.

* Tumbling windows need no order at all — the window key is a pure
  row function, so it is a per-batch partial aggregate (combiner)
  plus one small groupby: shuffle volume = |windows x types|, not
  |events|.
* Sessionization needs per-user time order. Events are hashed into
  (user-bucket, time-chunk) groups — ONE shuffle, no per-user groups;
  each group kernel lexsorts (user, ts, event_id) once and derives
  every session with numpy segment ops — no per-event or per-user
  Python. Sessions that touch a chunk boundary (within gap_us of it)
  are merged in a SECOND tiny pass over boundary sessions only
  (<= 2 per user per chunk, never raw events), so NO single user —
  however pathological — can concentrate an unbounded event count in
  one task; the residual assumption is one user's CHUNK count fits a
  task (years of continuous activity = a few thousand rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Sum

from humid_ray.util import round_half_away

HOUR_US = 3_600_000_000
N_SESSION_BUCKETS = 256


def read_events(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def _ts_us(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


_EMPTY_WINDOW_PARTIAL = {
    "window_us": pa.array([], type=pa.int64()),
    "event_type": pa.array([], type=pa.string()),
    "n": pa.array([], type=pa.int64()),
    "total": pa.array([], type=pa.float64()),
}


def _combine_window_rows(win: np.ndarray, et, val: np.ndarray) -> pa.Table:
    """Per-batch combiner: collapse (window, type, value) rows to one
    partial row per (window, type) — shuffle volume becomes
    |windows x types|, not |events|."""
    import pyarrow.compute as pc

    t = pa.table(
        {"window_us": pa.array(win), "event_type": et,
         "n": pa.array(np.ones(len(win), dtype=np.int64)),
         "total": pa.array(val)}
    )
    keys = pa.table({"window_us": t.column("window_us"),
                     "event_type": t.column("event_type")})
    idx = pc.sort_indices(keys, sort_keys=[("window_us", "ascending"),
                                           ("event_type", "ascending")])
    s = t.take(idx)
    w = s.column("window_us").to_numpy(zero_copy_only=False)
    e = np.asarray(s.column("event_type").to_pylist(), dtype=object)
    new = np.r_[True, (w[1:] != w[:-1]) | (e[1:] != e[:-1])]
    starts = np.flatnonzero(new)
    v = s.column("total").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "window_us": pa.array(w[starts]),
            "event_type": pa.array(e[starts].tolist(), type=pa.string()),
            "n": pa.array(np.diff(np.r_[starts, len(w)]).astype(np.int64)),
            "total": pa.array(np.add.reduceat(v, starts)),
        }
    )


def _window_aggregate(sf_dir: str, partial):
    """Shared tail of every window operator: per-batch combined
    partials -> small (window, type) groupby -> timestamp cast +
    rounded-total finalize. One copy, so tumbling and hopping windows
    can never diverge on rounding or timestamp handling."""
    agg = (
        read_events(sf_dir, columns=["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["window_us", "event_type"])
        .aggregate(Sum("n", alias_name="n"), Sum("total", alias_name="total"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        win = t.column("window_us").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "window_start": pa.array(win, type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "event_type": t.column("event_type"),
                "n": t.column("n"),
                "total": pa.array(
                    round_half_away(
                        t.column("total").to_numpy(zero_copy_only=False), 6
                    )
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def windowed_counts(sf_dir: str, window_us: int = HOUR_US):
    """(window_start, event_type, n, total): tumbling-window count and
    value sum. Oracle: GROUP BY date_trunc/time_bucket in SQL."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # empty blocks (empty events table / all-filtered split)
            # would break the reduceat segment indexing below
            return pa.table(_EMPTY_WINDOW_PARTIAL)
        ts = _ts_us(batch.column("ts"))
        win = (ts // window_us) * window_us
        return _combine_window_rows(
            win, batch.column("event_type"),
            batch.column("value").to_numpy(zero_copy_only=False),
        )

    return _window_aggregate(sf_dir, partial)


def hopping_counts(sf_dir: str, window_us: int = HOUR_US,
                   hop_us: int = HOUR_US // 4):
    """(window_start, event_type, n, total) for HOPPING (sliding)
    windows of ``window_us`` advancing every ``hop_us`` — each event
    lands in window_us/hop_us overlapping windows. Same per-batch
    combiner + small groupby shape as the tumbling variant (the event
    fan-out happens INSIDE the kernel; only combined partials shuffle).
    Requires hop_us | window_us, which also makes every one of the k
    hop-aligned starts at or before ts valid (ts - start < window)."""
    if window_us % hop_us:
        raise ValueError("hop_us must divide window_us")
    k = window_us // hop_us

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(_EMPTY_WINDOW_PARTIAL)
        ts = _ts_us(batch.column("ts"))
        last = (ts // hop_us) * hop_us
        offs = (np.arange(k, dtype=np.int64) * hop_us)[None, :]
        win = (last[:, None] - offs).reshape(-1)
        et = batch.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        idx = pa.array(np.repeat(np.arange(batch.num_rows, dtype=np.int64), k))
        val = batch.column("value").to_numpy(zero_copy_only=False)
        return _combine_window_rows(win, et.take(idx), np.repeat(val, k))

    return _window_aggregate(sf_dir, partial)


def sessionize(sf_dir: str, gap_us: int = 30 * 60 * 1_000_000,
               chunk_us: int | None = None):
    """(user_id, session_start, session_end, n_events, total_value):
    gap-based sessions (a new session starts when the inter-event gap
    exceeds ``gap_us``).

    Two-phase chunked shape: phase 1 sessionizes within (user-bucket,
    time-chunk) groups, so even ONE user's events split across chunk
    tasks; sessions within ``gap_us`` of a chunk boundary (<= 2 per
    user per chunk) go to phase 2, which merges boundary chains per
    user over SESSIONS, never events. Merging adjacent sessions iff
    next_start - prev_end <= gap reproduces global sessionization
    exactly (every inter-event gap is either inside a phase-1 session
    or is one of these session-to-session gaps)."""
    if chunk_us is None:
        chunk_us = 256 * gap_us  # boundary sessions ~1/256 of chunks

    def bucket(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch.column("ts"))
        return batch.append_column(
            "bucket", pa.array(_user_buckets(batch))
        ).append_column(
            "chunk", pa.array(np.floor_divide(ts, chunk_us))
        )

    _empty_raw = {
        "user_id": pa.array([], type=pa.int64()),
        "start_us": pa.array([], type=pa.int64()),
        "end_us": pa.array([], type=pa.int64()),
        "n_events": pa.array([], type=pa.int64()),
        "raw_total": pa.array([], type=pa.float64()),
        "boundary": pa.array([], type=pa.bool_()),
    }

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(_empty_raw)
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        ts = _ts_us(group.column("ts"))
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        val = group.column("value").to_numpy(zero_copy_only=False)
        chunk = int(group.column("chunk")[0].as_py())
        lo, hi = chunk * chunk_us, (chunk + 1) * chunk_us
        order = np.lexsort((eid, ts, uid))
        uid, ts, val = uid[order], ts[order], val[order]
        new_sess = np.r_[True, (uid[1:] != uid[:-1]) | (np.diff(ts) > gap_us)]
        starts = np.flatnonzero(new_sess)
        ends = np.r_[starts[1:], len(uid)] - 1
        s_us, e_us = ts[starts], ts[ends]
        # a session can merge across the chunk boundary only if it is
        # its user's FIRST session in the chunk and starts within gap
        # of the lower edge, or the LAST and ends within gap of the
        # upper edge (any other session has a > gap gap on both sides)
        su = uid[starts]
        first = np.r_[True, su[1:] != su[:-1]]
        last = np.r_[su[1:] != su[:-1], True]
        boundary = (first & (s_us - lo <= gap_us)) | (last & (hi - e_us <= gap_us))
        return pa.table(
            {
                "user_id": pa.array(su.astype(np.int64)),
                "start_us": pa.array(s_us.astype(np.int64)),
                "end_us": pa.array(e_us.astype(np.int64)),
                "n_events": pa.array((ends - starts + 1).astype(np.int64)),
                "raw_total": pa.array(np.add.reduceat(val, starts)),
                "boundary": pa.array(boundary),
            }
        )

    def merge_kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({k: _empty_raw[k] for k in list(_empty_raw)[:5]})
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        s_us = group.column("start_us").to_numpy(zero_copy_only=False)
        e_us = group.column("end_us").to_numpy(zero_copy_only=False)
        ne = group.column("n_events").to_numpy(zero_copy_only=False)
        tot = group.column("raw_total").to_numpy(zero_copy_only=False)
        order = np.lexsort((s_us, uid))
        uid, s_us, e_us, ne, tot = (
            uid[order], s_us[order], e_us[order], ne[order], tot[order]
        )
        # per-user sessions are disjoint and chunk-ordered, so sorted
        # by start their ends are sorted too: chain-merge adjacent
        # pairs with next_start - prev_end <= gap
        brk = np.r_[True, (uid[1:] != uid[:-1]) | (s_us[1:] - e_us[:-1] > gap_us)]
        st = np.flatnonzero(brk)
        en = np.r_[st[1:], len(uid)] - 1
        return pa.table(
            {
                "user_id": pa.array(uid[st].astype(np.int64)),
                "start_us": pa.array(s_us[st].astype(np.int64)),
                "end_us": pa.array(e_us[en].astype(np.int64)),
                "n_events": pa.array(np.add.reduceat(ne, st).astype(np.int64)),
                "raw_total": pa.array(np.add.reduceat(tot, st)),
            }
        )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], type=pa.int64()),
                 "session_start": pa.array([], type=pa.timestamp("us")),
                 "session_end": pa.array([], type=pa.timestamp("us")),
                 "n_events": pa.array([], type=pa.int64()),
                 "total_value": pa.array([], type=pa.float64())}
            )
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "session_start": t.column("start_us").cast(pa.timestamp("us")),
                "session_end": t.column("end_us").cast(pa.timestamp("us")),
                "n_events": t.column("n_events"),
                "total_value": pa.array(
                    round_half_away(
                        t.column("raw_total").to_numpy(zero_copy_only=False), 6
                    )
                ),
            }
        )

    raw = (
        read_events(sf_dir, columns=["event_id", "ts", "user_id", "value"])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["bucket", "chunk"])
        .map_groups(kernel, batch_format="pyarrow")
        .materialize()
    )
    interior = raw.map_batches(
        lambda t: t.filter(pc.invert(t.column("boundary"))).drop_columns(
            ["boundary"]
        ),
        batch_format="pyarrow",
    )
    def boundary_only(t: pa.Table) -> pa.Table:
        b = t.filter(t.column("boundary")).drop_columns(["boundary"])
        return b.append_column(
            "bucket", pa.array(_user_buckets(b), type=pa.int64())
        )

    merged = (
        raw.map_batches(boundary_only, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: merge_kernel(
                g.drop_columns(["bucket"]) if "bucket" in g.column_names else g
            ),
            batch_format="pyarrow",
        )
    )
    return interior.union(merged).map_batches(finalize, batch_format="pyarrow")


def _user_buckets(t: pa.Table) -> np.ndarray:
    """The ONE user->bucket routing rule (sessionize, boundary merge,
    funnel): hash before bucketing — raw ``uid % N`` would assume
    well-distributed ids (stride-N assignment hammers one bucket)."""
    from humid_ray.util import UINT64, splitmix64

    uid = t.column("user_id").to_numpy(zero_copy_only=False)
    return (splitmix64(uid.astype(np.int64).view(UINT64))
            % UINT64(N_SESSION_BUCKETS)).astype(np.int64)


DAY_US = 86_400_000_000
N_DISTINCT_SALTS = 16


def distinct_users(sf_dir: str):
    """(day, event_type, n_users): EXACT daily distinct-user counts.

    Scale shape: COUNT(DISTINCT) cannot pre-aggregate to a scalar, so
    the per-batch combiner dedupes (day, type, salt, user) tuples —
    shuffle volume is unique tuples per batch, not events — and the
    groupby key includes a user-hash SALT so one hot day/type never
    lands its whole user set in a single task. Each salted group
    counts its (disjoint) unique users; a second, tiny groupby
    (|days x types x salts| rows) sums the partial counts."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"day_us": pa.array([], type=pa.int64()),
                 "event_type": pa.array([], type=pa.string()),
                 "salt": pa.array([], type=pa.int64()),
                 "user_id": pa.array([], type=pa.int64())}
            )
        from humid_ray.util import UINT64, splitmix64

        day = (_ts_us(t.column("ts")) // DAY_US) * DAY_US
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        salt = (splitmix64(uid.astype(np.int64).view(UINT64))
                % UINT64(N_DISTINCT_SALTS)).astype(np.int64)
        # dedupe within the batch before anything shuffles
        order = np.lexsort((uid, et, day))
        day, et, salt, uid = day[order], et[order], salt[order], uid[order]
        keep = np.r_[True, (day[1:] != day[:-1]) | (et[1:] != et[:-1])
                     | (uid[1:] != uid[:-1])]
        return pa.table(
            {"day_us": pa.array(day[keep]),
             "event_type": pa.array(et[keep].tolist(), type=pa.string()),
             "salt": pa.array(salt[keep]),
             "user_id": pa.array(uid[keep])}
        )

    def count_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"day_us": pa.array([], type=pa.int64()),
                 "event_type": pa.array([], type=pa.string()),
                 "n_users": pa.array([], type=pa.int64())}
            )
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {"day_us": g.column("day_us").slice(0, 1),
             "event_type": g.column("event_type").slice(0, 1),
             "n_users": pa.array([int(len(np.unique(uid)))],
                                 type=pa.int64())}
        )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {"day": t.column("day_us").cast(pa.timestamp("us")),
             "event_type": t.column("event_type"),
             "n_users": t.column("n_users")}
        )

    return (
        read_events(sf_dir, columns=["ts", "event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["day_us", "event_type", "salt"])
        .map_groups(count_group, batch_format="pyarrow")
        .groupby(["day_us", "event_type"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .map_batches(finalize, batch_format="pyarrow")
    )


def asof_join(sf_dir: str, left_type: str = "purchase",
              right_type: str = "click"):
    """(user_id, purchase_id, purchase_ts, click_id, click_ts,
    wait_us): for every ``left_type`` event, the user's most recent
    ``right_type`` event AT OR BEFORE it (null columns when none) —
    the as-of join Ray Data lacks.

    One shuffle: both sides filter at the read and hash into user
    buckets; each bucket kernel lexsorts (ts, side, event_id) once and
    resolves every probe with a segment-reset running argmax — no
    per-row Python, no sort-merge across tasks. Partitioning
    assumption: one user's click+purchase rows fit one task (the
    pre-chunk sessionize assumption; the same two-phase boundary
    split applies if a user ever exceeds a task)."""

    def bucket(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.or_(pc.equal(et, left_type), pc.equal(et, right_type))
        b = batch.filter(keep)
        side = pc.equal(b.column("event_type"), left_type).cast(pa.int8())
        b = b.drop_columns(["event_type"]).append_column("side", side)
        return b.append_column(
            "bucket", pa.array(_user_buckets(b), type=pa.int64())
        )

    _empty = {
        "user_id": pa.array([], type=pa.int64()),
        "purchase_id": pa.array([], type=pa.int64()),
        "purchase_ts": pa.array([], type=pa.timestamp("us")),
        "click_id": pa.array([], type=pa.int64()),
        "click_ts": pa.array([], type=pa.timestamp("us")),
        "wait_us": pa.array([], type=pa.int64()),
    }

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(_empty)
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = _ts_us(g.column("ts"))
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        # clicks sort BEFORE a same-timestamp purchase => "at or before"
        order = np.lexsort((eid, side, ts, uid))
        uid, ts, eid, side = uid[order], ts[order], eid[order], side[order]
        n = len(uid)
        pos = np.arange(n, dtype=np.int64)
        last_click = np.maximum.accumulate(np.where(side == 0, pos, -1))
        seg_start = pos[np.r_[True, uid[1:] != uid[:-1]]]
        seg_id = np.cumsum(np.r_[True, uid[1:] != uid[:-1]]) - 1
        valid = last_click >= seg_start[seg_id]
        is_left = side == 1
        lc, ok = last_click[is_left], valid[is_left]
        cid = np.where(ok, eid[np.maximum(lc, 0)], 0)
        cts = np.where(ok, ts[np.maximum(lc, 0)], 0)
        mask = pa.array(ok)
        return pa.table(
            {
                "user_id": pa.array(uid[is_left].astype(np.int64)),
                "purchase_id": pa.array(eid[is_left].astype(np.int64)),
                "purchase_ts": pa.array(ts[is_left].astype(np.int64)).cast(
                    pa.timestamp("us")
                ),
                "click_id": pc.if_else(mask, pa.array(cid.astype(np.int64)),
                                       pa.scalar(None, type=pa.int64())),
                "click_ts": pc.if_else(
                    mask,
                    pa.array(cts.astype(np.int64)).cast(pa.timestamp("us")),
                    pa.scalar(None, type=pa.timestamp("us")),
                ),
                "wait_us": pc.if_else(
                    mask, pa.array((ts[is_left] - cts).astype(np.int64)),
                    pa.scalar(None, type=pa.int64()),
                ),
            }
        )

    return (
        read_events(sf_dir, columns=["event_id", "ts", "user_id",
                                     "event_type"])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(
            lambda g: kernel(g.drop_columns(["bucket"])
                             if "bucket" in g.column_names else g),
            batch_format="pyarrow",
        )
    )


def running_totals(sf_dir: str):
    """(event_id, user_id, ts, running_cents): per-user cumulative
    spend ordered by (ts, event_id) — the unbounded-preceding window
    function. Value is summed as int64 CENTS (each event rounds once,
    half-away) so the running sum is exact and order-independent in
    its partials. One shuffle into user buckets; each kernel is one
    lexsort + a segment-reset cumsum."""

    def bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", pa.array(_user_buckets(batch), type=pa.int64())
        )

    _empty = {
        "event_id": pa.array([], type=pa.int64()),
        "user_id": pa.array([], type=pa.int64()),
        "ts": pa.array([], type=pa.timestamp("us")),
        "running_cents": pa.array([], type=pa.int64()),
    }

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(_empty)
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = _ts_us(g.column("ts"))
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        val = g.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, val = uid[order], ts[order], eid[order], val[order]
        cents = round_half_away(val * 100.0, 0).astype(np.int64)
        cum = np.cumsum(cents)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        counts = np.diff(np.r_[starts, len(uid)])
        base = np.repeat(cum[starts] - cents[starts], counts)
        return pa.table(
            {
                "event_id": pa.array(eid.astype(np.int64)),
                "user_id": pa.array(uid.astype(np.int64)),
                "ts": pa.array(ts.astype(np.int64)).cast(pa.timestamp("us")),
                "running_cents": pa.array(cum - base),
            }
        )

    return (
        read_events(sf_dir, columns=["event_id", "ts", "user_id", "value"])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(
            lambda g: kernel(g.drop_columns(["bucket"])
                             if "bucket" in g.column_names else g),
            batch_format="pyarrow",
        )
    )


def session_stats(sf_dir: str, gap_us: int = 30 * 60 * 1_000_000):
    """One-row summary: sessions, max session length, users."""
    sess = sessionize(sf_dir, gap_us).materialize()
    n_sessions = sess.count()
    users = sess.groupby("user_id").aggregate(Count(alias_name="k")).count()
    mx = sess.max("n_events") if n_sessions else 0
    return pa.table(
        {
            "n_sessions": pa.array([n_sessions], type=pa.int64()),
            "n_users": pa.array([int(users)], type=pa.int64()),
            "max_session_events": pa.array([int(mx)], type=pa.int64()),
        }
    )


# --- structured-field extraction from raw payloads -------------------------

PROPS_K_PATTERN = '"k": (?P<k>[0-9]+)'


def props_extract(sf_dir: str):
    """(event_id, k): pull the integer ``k`` field out of the raw JSON
    ``props`` payload with one RE2 kernel (``pc.extract_regex``) — the
    log-parsing shape every ingest pipeline starts with (a full JSON
    decode would go through an actor-pool stage; a single scalar field
    doesn't need one). Rows whose payload lacks the field yield null.

    Scale shape: streaming map over pruned columns, no shuffle."""

    def kernel(batch: pa.Table) -> pa.Table:
        props = pc.fill_null(pc.cast(batch.column("props"), pa.string()), "")
        m = pc.extract_regex(props, pattern=PROPS_K_PATTERN)
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_id": batch.column("event_id"), "k": k})

    return read_events(sf_dir, columns=["event_id", "props"]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def props_extract_sql() -> str:
    """DuckDB oracle for ``props_extract`` (same RE2 pattern; DuckDB
    needs an unnamed group + nullif since regexp_extract returns ''
    on no-match)."""
    return (
        "SELECT event_id, CAST(nullif(regexp_extract(coalesce(props,''), "
        "'\"k\": ([0-9]+)', 1), '') AS BIGINT) AS k FROM events"
    )


def range_join(sf_dir: str, left_type: str = "purchase",
               right_type: str = "click",
               window_us: int = 3_600_000_000):
    """(user_id, purchase_id, click_id, gap_us): EVERY ``right_type``
    event within ``window_us`` at-or-before each ``left_type`` event of
    the same user — the banded RANGE join (the as-of join keeps one
    match; this keeps them all, e.g. attribution windows).

    One shuffle into user-hash buckets; each bucket kernel sorts the
    right side once by an encoded (user, ts) key and resolves every
    left row's match RANGE with two vectorized searchsorted calls; the
    pair expansion is a repeat + arange, no per-row Python. Output
    size is the true join cardinality (it IS the answer); the
    per-bucket peak is bounded by the bucket's own pair count, spread
    across 256 hash buckets like sessionize."""

    def bucket(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.or_(pc.equal(et, left_type), pc.equal(et, right_type))
        b = batch.filter(keep)
        side = pc.equal(b.column("event_type"), left_type).cast(pa.int8())
        b = b.drop_columns(["event_type"]).append_column("side", side)
        return b.append_column(
            "bucket", pa.array(_user_buckets(b), type=pa.int64())
        )

    _empty = {
        "user_id": pa.array([], type=pa.int64()),
        "purchase_id": pa.array([], type=pa.int64()),
        "click_id": pa.array([], type=pa.int64()),
        "gap_us": pa.array([], type=pa.int64()),
    }

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(_empty)
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = _ts_us(g.column("ts"))
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        is_l = side == 1
        if not is_l.any() or is_l.all():
            return pa.table(_empty)
        # encode (user rank, ts offset) into one sortable int64 key
        uranks = np.unique(uid)
        urank = np.searchsorted(uranks, uid).astype(np.int64)
        t0 = int(ts.min())
        span = int(ts.max()) - t0 + 2
        assert len(uranks) * span < (1 << 62), "key encode overflow"
        key = urank * span + (ts - t0)
        lk, le = key[is_l], eid[is_l]
        lu, lt = uid[is_l], ts[is_l]
        rk, re_, rt = key[~is_l], eid[~is_l], ts[~is_l]
        order = np.argsort(rk, kind="stable")
        rk, re_, rt = rk[order], re_[order], rt[order]
        # clamp the window start to the same user's key range
        lo = np.searchsorted(rk, np.maximum(lk - window_us,
                                            (lk // span) * span))
        hi = np.searchsorted(rk, lk, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return pa.table(_empty)
        li = np.repeat(np.arange(len(lk)), cnt)
        starts = np.repeat(lo, cnt)
        offs = np.arange(total) - np.repeat(
            np.r_[0, np.cumsum(cnt)[:-1]], cnt
        )
        ri = starts + offs
        return pa.table(
            {"user_id": pa.array(lu[li].astype(np.int64)),
             "purchase_id": pa.array(le[li].astype(np.int64)),
             "click_id": pa.array(re_[ri].astype(np.int64)),
             "gap_us": pa.array((lt[li] - rt[ri]).astype(np.int64))}
        )

    return (
        read_events(sf_dir, columns=["event_id", "ts", "user_id",
                                     "event_type"])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(
            lambda g: kernel(g.drop_columns(["bucket"])
                             if "bucket" in g.column_names else g),
            batch_format="pyarrow",
        )
    )


def range_join_sql(left_type: str = "purchase", right_type: str = "click",
                   window_us: int = 3_600_000_000) -> str:
    """DuckDB oracle for ``range_join`` (plain inequality join)."""
    return (
        "SELECT l.user_id, l.event_id AS purchase_id, "
        "r.event_id AS click_id, "
        "CAST(epoch_us(l.ts) - epoch_us(r.ts) AS BIGINT) AS gap_us "
        "FROM events l JOIN events r ON l.user_id = r.user_id "
        f"AND l.event_type = '{left_type}' "
        f"AND r.event_type = '{right_type}' "
        "AND epoch_us(r.ts) <= epoch_us(l.ts) "
        f"AND epoch_us(r.ts) >= epoch_us(l.ts) - {window_us}"
    )


HLL_P = 12  # 4096 registers


def distinct_users_approx(sf_dir: str, p: int = HLL_P):
    """(event_type, approx_users): HyperLogLog approximate distinct
    users per event type — the MERGEABLE-SKETCH pattern (per-batch
    register partials, max-merge groupby, driver-side estimate; the
    shuffle carries |types| x 2^p bytes, never users).

    SQL-oracled: the whole estimate re-derives in DuckDB (splitmix64
    HUGEINT chain + exact power-of-two register sums + the same
    small-range correction; ``oracles.hll_distinct_users_sql``) —
    the register sum is computed in EXACT integer arithmetic
    (sum of 2^(64-reg), scaled) on both sides so the estimate is
    bit-identical regardless of summation order. pytest additionally
    pins the estimate within 3% of the exact count. Exact salted
    counting exists as ``distinct_users``; this is the fixed-memory
    alternative for cardinalities where even per-group exact sets
    don't fit (e.g. trillions of rows per group)."""
    from humid_ray.util import UINT64, splitmix64

    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        empty = {"event_type": pa.array([], type=pa.string()),
                 "regs": pa.array([], type=pa.binary())}
        if t.num_rows == 0:
            return pa.table(empty)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        h = splitmix64(uid.astype(np.int64).view(UINT64))
        idx = (h >> UINT64(64 - p)).astype(np.int64)
        # sentinel low bits guarantee the value is nonzero and rank
        # tops out at 64 - p + 1
        rest = (h << UINT64(p)) | UINT64((1 << p) - 1)
        # exact vectorized floor(log2(x)) via binary exponent search
        # (float log2 is inexact near powers of two)
        fl = np.zeros(len(rest), dtype=np.int64)
        c = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = c >= (np.uint64(1) << np.uint64(shift))
            fl[big] += shift
            c[big] >>= np.uint64(shift)
        rank = (63 - fl + 1).astype(np.uint8)  # leading zeros + 1
        uniq, inv = np.unique(et, return_inverse=True)
        regs = np.zeros((len(uniq), m), dtype=np.uint8)
        np.maximum.at(regs, (inv, idx), rank)
        return pa.table(
            {"event_type": pa.array(uniq.tolist(), type=pa.string()),
             "regs": pa.array([r.tobytes() for r in regs],
                              type=pa.binary())}
        )

    def merge(g: pa.Table) -> pa.Table:
        empty = {"event_type": pa.array([], type=pa.string()),
                 "approx_users": pa.array([], type=pa.int64())}
        if g.num_rows == 0:
            return pa.table(empty)
        regs = np.zeros(m, dtype=np.uint8)
        for v in g.column("regs"):
            regs = np.maximum(regs, np.frombuffer(v.as_py(), dtype=np.uint8))
        # standard HLL estimate with small-range correction. The
        # register sum sum(2^-reg) is computed EXACTLY as the integer
        # sum(2^(64-reg)) (scaled by 2^64): one float division at the
        # end makes the estimate independent of summation order and
        # bit-identical to the DuckDB HUGEINT oracle.
        import math

        cnts = np.bincount(regs, minlength=65)
        sum_scaled = 0
        for r, c in enumerate(cnts.tolist()):
            if c:
                sum_scaled += c * (1 << (64 - r))
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m * float(1 << 64) / float(sum_scaled)
        zeros = int(cnts[0])
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)
        # floor(x + 0.5): half-away rounding, matching DuckDB round()
        # (Python round() banker's-rounds at exact .5)
        return pa.table(
            {"event_type": g.column("event_type").slice(0, 1),
             "approx_users": pa.array([int(math.floor(est + 0.5))],
                                      type=pa.int64())}
        )

    return (
        read_events(sf_dir, columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .map_groups(merge, batch_format="pyarrow")
    )


# --- approximate quantiles (HDR-histogram sketch) ---------------------------

QSK_K = 7  # sub-buckets per binade = 2^7 -> relative error <= 2^-7


def value_quantiles_sketch(sf_dir: str, qs=(0.5, 0.9, 0.99, 0.999),
                           k: int = QSK_K):
    """(event_type, q, approx_value): per-type approximate quantiles of
    ``value`` from an HDR-histogram-style sketch — each double lands in
    a (binade, 2^k-way sub-bucket) cell, so the sketch is a tiny
    mergeable histogram (per-batch Arrow group_by partials; the shuffle
    carries |types| x |occupied buckets| rows, never values) and the
    reported quantile is the bucket's zero-side edge, within a factor
    2^-k (0.8%) of the true order statistic ``sorted[ceil(q*n)]``.

    Every bucketing step is EXACT double arithmetic (frexp binade
    split, Sterbenz-exact mantissa offset, power-of-two scaling), so
    the whole sketch re-derives bit-for-bit in DuckDB
    (``oracles.value_quantiles_sketch_sql``) — an oracled sketch, like
    the HLL distinct estimate. Finite inputs assumed (testdata domain);
    zero and negatives get sign-mirrored buckets."""
    m_sub = 1 << k
    base = 1 << 40  # positive-zone offset; bid order == value order

    def _bids(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(bid, lower_bound) per value, all-exact float ops."""
        ax = np.abs(x)
        mant, ex = np.frexp(ax)           # ax = mant * 2^ex, mant in [.5,1)
        e = ex - 1
        mprime = mant * 2.0               # [1,2), exact
        sub = np.floor((mprime - 1.0) * m_sub).astype(np.int64)
        mag = e.astype(np.int64) * m_sub + sub
        lb = (1.0 + sub / float(m_sub)) * np.ldexp(1.0, e)
        bid = np.where(x == 0, 0,
                       np.where(x > 0, base + mag, -(base + mag)))
        lbs = np.where(x == 0, 0.0, np.sign(x) * lb)
        return bid, lbs

    def partial(t: pa.Table) -> pa.Table:
        empty = {"event_type": pa.array([], type=pa.string()),
                 "bid": pa.array([], type=pa.int64()),
                 "lb": pa.array([], type=pa.float64()),
                 "n": pa.array([], type=pa.int64())}
        if t.num_rows == 0:
            return pa.table(empty)
        val = t.column("value").to_numpy(zero_copy_only=False)
        bid, lb = _bids(val)
        cells = pa.table(
            {"event_type": t.column("event_type"),
             "bid": pa.array(bid),
             "lb": pa.array(lb)}
        ).group_by(["event_type", "bid", "lb"]).aggregate([("bid", "count")])
        return pa.table(
            {"event_type": cells.column("event_type"),
             "bid": cells.column("bid"),
             "lb": cells.column("lb"),
             "n": cells.column("bid_count").cast(pa.int64())}
        )

    def extract(g: pa.Table) -> pa.Table:
        import math

        empty = {"event_type": pa.array([], type=pa.string()),
                 "q": pa.array([], type=pa.float64()),
                 "approx_value": pa.array([], type=pa.float64())}
        if g.num_rows == 0:
            return pa.table(empty)
        bid = g.column("bid").to_numpy(zero_copy_only=False)
        lb = g.column("lb").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(bid, kind="stable")
        bid, lb, n = bid[order], lb[order], n[order]
        # merge partial rows sharing a bucket
        newb = np.r_[True, bid[1:] != bid[:-1]]
        starts = np.flatnonzero(newb)
        bid_u, lb_u = bid[starts], lb[starts]
        n_u = np.add.reduceat(n, starts)
        cum = np.cumsum(n_u)
        tot = int(cum[-1])
        out_q, out_v = [], []
        for q in qs:
            idx = math.ceil(q * tot)      # same double product as SQL
            pos = int(np.searchsorted(cum, idx, side="left"))
            out_q.append(float(q))
            out_v.append(float(lb_u[pos]))
        return pa.table(
            {"event_type": pa.array([g.column("event_type")[0].as_py()] * len(qs),
                                    type=pa.string()),
             "q": pa.array(out_q),
             "approx_value": pa.array(out_v)}
        )

    return (
        read_events(sf_dir, columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .map_groups(extract, batch_format="pyarrow")
    )


# --- ordered funnel analysis -------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_counts(sf_dir: str, steps: tuple[str, ...] = FUNNEL_STEPS):
    """(step, step_type, users): ordered-funnel completion — how many
    users performed step 1, then step 2 STRICTLY later, then step 3
    strictly later still (the product-analytics sequence-match the
    reference's batch model has no analog for).

    Greedy earliest-completion is exact here: taking the EARLIEST
    qualifying timestamp at each step maximizes the remaining time
    budget (standard exchange argument), so "greedy chain exists" ≡
    "any ordered chain exists" — which is what the SQL oracle's
    chained min-ts CTEs compute.

    Scale shape: only funnel-type rows shuffle, carrying 4 small
    columns (user-hash bucket, user, ts, step index) — one shuffle
    into ``N_SESSION_BUCKETS`` user-hash buckets, never per-user
    groups. The per-bucket kernel sorts (user-rank, ts-rank)-encoded
    int64 keys once per step and advances the surviving users with
    one searchsorted per step; partials are |steps| rows per bucket
    and the final groupby sums |steps| x |buckets| rows.
    """
    n_steps = len(steps)

    _empty_routed = {
        "bucket": pa.array([], type=pa.int64()),
        "user_id": pa.array([], type=pa.int64()),
        "ts_us": pa.array([], type=pa.int64()),
        "si": pa.array([], type=pa.int64()),
    }

    def route(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(_empty_routed)
        et = batch.column("event_type")
        parts = []
        # fan out per STEP POSITION (not per type): a steps tuple with
        # a repeated type (view -> click -> view again) emits one row
        # per matching position, which index_in could not express
        for i, s in enumerate(steps):
            m = pc.fill_null(pc.equal(et, s), False)
            if not pc.any(m).as_py():
                continue
            t = batch.filter(m)
            parts.append(pa.table(
                {
                    "bucket": pa.array(_user_buckets(t)),
                    "user_id": t.column("user_id").cast(pa.int64()),
                    "ts_us": pa.array(_ts_us(t.column("ts"))),
                    "si": pa.array(np.full(t.num_rows, i, dtype=np.int64)),
                }
            ))
        if not parts:
            return pa.table(_empty_routed)
        return pa.concat_tables(parts)

    _zero_partial = pa.table(
        {
            "step": pa.array(np.arange(1, n_steps + 1, dtype=np.int64)),
            "users": pa.array(np.zeros(n_steps, dtype=np.int64)),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _zero_partial
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        si = g.column("si").to_numpy(zero_copy_only=False)
        # encode (user rank, ts RANK) into one sortable int64 key —
        # strictly-greater key ≡ same-user strictly-later event, and
        # ranks bound the product by rows² (a raw ts span would bind
        # at |users|·span and overflow on year-long corpora); a task
        # group would need ~2^31 rows to overflow this encode
        uranks = np.unique(uid)
        urank = np.searchsorted(uranks, uid).astype(np.int64)
        ts_u = np.unique(ts)
        tsr = np.searchsorted(ts_u, ts).astype(np.int64)
        span = len(ts_u) + 1
        assert len(uranks) * span < (1 << 62), "funnel key encode overflow"
        key = urank * span + tsr
        counts = np.zeros(n_steps, dtype=np.int64)
        cur = None  # surviving users' threshold keys (urank·span + tsr)
        for i in range(n_steps):
            k_i = np.sort(key[si == i])
            if i == 0:
                us = k_i // span
                first = (np.r_[True, us[1:] != us[:-1]] if len(us)
                         else np.array([], dtype=bool))
                cur = k_i[first] if len(us) else k_i
            elif len(cur) and len(k_i):
                pos = np.searchsorted(k_i, cur, side="right")
                valid = pos < len(k_i)
                cand = k_i[np.minimum(pos, len(k_i) - 1)]
                valid &= (cand // span) == (cur // span)
                cur = cand[valid]
            else:
                cur = np.array([], dtype=np.int64)
            counts[i] = len(cur)
        return pa.table(
            {
                "step": pa.array(np.arange(1, n_steps + 1, dtype=np.int64)),
                "users": pa.array(counts),
            }
        )

    routed = read_events(
        sf_dir, columns=["ts", "user_id", "event_type"]
    ).map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
    partials = routed.groupby("bucket").map_groups(
        lambda g: kernel(g.drop_columns(["bucket"])
                         if "bucket" in g.column_names else g),
        batch_format="pyarrow",
    )
    # the zero partial guarantees every step row exists even when no
    # bucket saw a given step (or the corpus is empty)
    agg = partials.union(ray.data.from_arrow(_zero_partial)) \
        .groupby("step").aggregate(Sum("users", alias_name="users"))

    def finalize(t: pa.Table) -> pa.Table:
        st = t.column("step").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "step": t.column("step"),
                "step_type": pa.array([steps[int(s) - 1] for s in st],
                                      type=pa.string()),
                "users": t.column("users"),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def funnel_counts_sql(steps: tuple[str, ...] = FUNNEL_STEPS,
                      table: str = "events") -> str:
    """DuckDB oracle for ``funnel_counts``: chained min-ts CTEs — step
    i's per-user timestamp is the earliest event of that type STRICTLY
    after the user's step-(i-1) timestamp (greedy ≡ existence)."""
    ctes, prev = [], None
    for i, s in enumerate(steps, start=1):
        if prev is None:
            ctes.append(
                f"s{i} AS (SELECT user_id, min(epoch_us(ts)) AS t "
                f"FROM {table} WHERE event_type = '{s}' GROUP BY 1)"
            )
        else:
            ctes.append(
                f"s{i} AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t "
                f"FROM {table} e JOIN s{i - 1} p USING (user_id) "
                f"WHERE e.event_type = '{s}' AND epoch_us(e.ts) > p.t "
                "GROUP BY 1)"
            )
        prev = s
    selects = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, '{s}' AS step_type, "
        f"CAST(count(*) AS BIGINT) AS users FROM s{i}"
        for i, s in enumerate(steps, start=1)
    )
    return "WITH " + ", ".join(ctes) + " " + selects


def window_spikes(sf_dir: str, window_us: int = HOUR_US, z: int = 3):
    """(window_start, event_type, n): anomaly windows — tumbling
    windows whose event count exceeds the type's corpus-wide mean by
    more than ``z`` population standard deviations. The monitoring /
    spike-detection composition over ``windowed_counts``.

    The test is ALL-INTEGER:  c > mean + z·σ  ⟺
    nw·c − S > 0  AND  (nw·c − S)² > z²·(nw·Q − S²)
    with S = Σc, Q = Σc², nw = #windows — no float mean/σ whose
    summation order could flip a boundary window, so the operator is
    bit-exact against its SQL oracle.

    Scale shape: windowed counts are already the tiny combined
    aggregate (|windows × types| rows); per-type moments are a
    |types|-row groupby broadcast back as a dict; the spike filter is
    one vectorized pass over the windowed rows."""
    from ray.data.aggregate import Count as _Count

    # consumed twice (moments + spike filter): materialize the TINY
    # combined aggregate (|windows x types| rows) so the events scan
    # and window groupby don't re-execute per consumer
    wc = windowed_counts(sf_dir, window_us=window_us).materialize()

    def with_sq(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        return pa.table(
            {"event_type": t.column("event_type"),
             "n": t.column("n"),
             "n2": pa.array(n * n)}
        )

    moments = (
        wc.map_batches(with_sq, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(_Count(alias_name="nw"), Sum("n", alias_name="s"),
                   Sum("n2", alias_name="q"))
        .take_all()
    )
    # the predicate  nw·c − S > 0 ∧ (nw·c − S)² > z²·(nw·Q − S²)  is
    # MONOTONE in c, so fold it into one integer threshold per type,
    # computed in unbounded Python ints (numpy int64 would wrap on
    # lhs² for year-scale corpora with large bursts):
    #   keep ⟺ nw·c − S > isqrt(z²·D)  with D = nw·Q − S²
    #        ⟺ c ≥ (S + isqrt(z²·D)) // nw + 1
    # (x² > y ⟺ x > isqrt(y) exactly, for integer x ≥ 0)
    import math

    cmin = {}
    for r in moments:
        nw, s, q = int(r["nw"]), int(r["s"]), int(r["q"])
        rt = math.isqrt(z * z * (nw * q - s * s))
        cmin[r["event_type"]] = min((s + rt) // nw + 1, (1 << 62))

    _empty = pa.table(
        {"window_start": pa.array([], type=pa.timestamp("us")),
         "event_type": pa.array([], type=pa.string()),
         "n": pa.array([], type=pa.int64())}
    )

    def spikes(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        c = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(et, return_inverse=True)
        lim = np.array([cmin[v] for v in uniq], dtype=np.int64)[inv]
        kept = t.filter(pa.array(c >= lim))
        return pa.table(
            {"window_start": kept.column("window_start"),
             "event_type": kept.column("event_type"),
             "n": kept.column("n")}
        )

    return wc.map_batches(spikes, batch_format="pyarrow")


def window_spikes_sql(table: str = "events", window_us: int = HOUR_US,
                      z: int = 3) -> str:
    """DuckDB oracle for ``window_spikes``: the identical integer
    test in HUGEINT (overflow-free by construction; any ``window_us``
    / ``z`` the engine accepts is expressible here too)."""
    return (
        f"WITH wc AS (SELECT time_bucket(INTERVAL '{window_us} "
        "microseconds', ts) AS "
        "window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM {table} GROUP BY 1, 2), "
        "mom AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS nw, "
        "CAST(SUM(n) AS HUGEINT) AS s, CAST(SUM(n*n) AS HUGEINT) AS q "
        "FROM wc GROUP BY 1) "
        "SELECT wc.window_start, wc.event_type, wc.n "
        "FROM wc JOIN mom USING (event_type) "
        f"WHERE nw*n > s AND (nw*n - s)*(nw*n - s) > {z * z}*(nw*q - s*s)"
    )


# --- cohort retention ------------------------------------------------------

WEEK_US = 7 * DAY_US

_COHORT_PARTIAL_EMPTY = {
    "cohort_us": pa.array([], type=pa.int64()),
    "week_offset": pa.array([], type=pa.int64()),
    "n_users": pa.array([], type=pa.int64()),
}


def cohort_retention(sf_dir: str):
    """(cohort_week, week_offset, n_users): the retention triangle —
    users are cohorted by the week of their FIRST event; for each
    cohort and each week offset k, count the distinct cohort members
    active k weeks later (offset 0 = the cohort size itself). The
    classic warehouse/product-analytics operator the funnel and
    sessionization queries don't cover.

    Scale shape: the per-batch combiner dedupes (user, week) tuples —
    shuffle volume is distinct activity tuples, never events — and ONE
    exchange routes them into user-hash buckets (``_user_buckets``
    rule), so each user's full week set lands in exactly one kernel:
    per-user min is a lexsort + segment scan, offsets are vectorized,
    and the kernel emits |cohorts x offsets| local partial counts.
    Bucketed users are disjoint, so the final |cohorts x offsets|-row
    groupby sums exact distinct counts. A hot week skews nothing
    (bucketing is by user); a pathological single user contributes at
    most |weeks| tuples."""
    from humid_ray.util import UINT64, splitmix64

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"bucket": pa.array([], type=pa.int64()),
                 "user_id": pa.array([], type=pa.int64()),
                 "week_us": pa.array([], type=pa.int64())}
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        week = (_ts_us(t.column("ts")) // WEEK_US) * WEEK_US
        order = np.lexsort((week, uid))
        uid, week = uid[order], week[order]
        keep = np.r_[True, (uid[1:] != uid[:-1]) | (week[1:] != week[:-1])]
        uid, week = uid[keep], week[keep]
        bucket = (splitmix64(uid.astype(np.int64).view(UINT64))
                  % UINT64(N_SESSION_BUCKETS)).astype(np.int64)
        return pa.table(
            {"bucket": pa.array(bucket),
             "user_id": pa.array(uid),
             "week_us": pa.array(week)}
        )

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(_COHORT_PARTIAL_EMPTY)
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        week = g.column("week_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((week, uid))
        uid, week = uid[order], week[order]
        # partials from different batches may repeat a (user, week)
        keep = np.r_[True, (uid[1:] != uid[:-1]) | (week[1:] != week[:-1])]
        uid, week = uid[keep], week[keep]
        first = np.r_[True, uid[1:] != uid[:-1]]
        # per-user cohort week = the user's first (sorted-min) week,
        # fanned back over the user's rows
        cohort = week[first][np.cumsum(first) - 1]
        offset = (week - cohort) // WEEK_US
        key = np.stack([cohort, offset], axis=1)
        ukey, inv = np.unique(key, axis=0, return_inverse=True)
        n = np.bincount(inv, minlength=len(ukey)).astype(np.int64)
        return pa.table(
            {"cohort_us": pa.array(ukey[:, 0].astype(np.int64)),
             "week_offset": pa.array(ukey[:, 1].astype(np.int64)),
             "n_users": pa.array(n)}
        )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {"cohort_week": t.column("cohort_us").cast(pa.timestamp("us")),
             "week_offset": t.column("week_offset"),
             "n_users": t.column("n_users")}
        )

    return (
        read_events(sf_dir, columns=["ts", "user_id"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby(["cohort_us", "week_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .map_batches(finalize, batch_format="pyarrow")
    )


def cohort_retention_sql(table: str = "events") -> str:
    """DuckDB oracle for ``cohort_retention``: distinct (user, week)
    activity, per-user min week as cohort, grouped offsets — identical
    integer epoch-microsecond week math."""
    return (
        "WITH uw AS (SELECT DISTINCT user_id, "
        f"(epoch_us(ts) // {WEEK_US}) * {WEEK_US} AS w FROM {table}), "
        "fw AS (SELECT user_id, min(w) AS cw FROM uw GROUP BY user_id) "
        "SELECT make_timestamp(cw) AS cohort_week, "
        f"(uw.w - fw.cw) // {WEEK_US} AS week_offset, "
        "CAST(COUNT(*) AS BIGINT) AS n_users "
        "FROM uw JOIN fw USING (user_id) GROUP BY 1, 2"
    )


# --- CDC / upsert compaction: latest event per user -------------------------

_LATEST_EMPTY = {
    "user_id": pa.array([], type=pa.int64()),
    "event_id": pa.array([], type=pa.int64()),
    "ts": pa.array([], type=pa.timestamp("us")),
    "event_type": pa.array([], type=pa.string()),
    "value": pa.array([], type=pa.float64()),
}


def _latest_collapse(t: pa.Table) -> pa.Table:
    """One row per user: the (max ts, then max event_id) event — the
    deterministic arg-max kernel shared by the batch combiner and the
    per-bucket finisher."""
    if t.num_rows == 0:
        return pa.table(_LATEST_EMPTY)
    uid = t.column("user_id").to_numpy(zero_copy_only=False)
    ts = _ts_us(t.column("ts"))
    eid = t.column("event_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts, uid))
    us = uid[order]
    # last row of each user segment = the arg-max under (ts, event_id)
    last = np.flatnonzero(np.r_[us[1:] != us[:-1], True])
    rows = pa.array(order[last], type=pa.int64())
    return pa.table({
        "user_id": t.column("user_id").take(rows),
        "event_id": t.column("event_id").take(rows),
        "ts": t.column("ts").take(rows),
        "event_type": t.column("event_type").take(rows),
        "value": t.column("value").take(rows),
    })


def latest_per_user(sf_dir: str):
    """(user_id, event_id, ts, event_type, value): each user's LATEST
    event, ties broken by max event_id — the CDC/upsert compaction
    operator (apply a changelog to a keyed table, last-writer-wins):
    the shape every incremental training-data refresh reduces to.

    Scale shape: a per-batch arg-max COMBINER collapses each batch to
    one row per user seen in it (raw events never shuffle — a user
    with 10^6 events ships once per batch), then ONE exchange into
    hashed user buckets and the same vectorized kernel finishes the
    arg-max. Both passes are a lexsort + segment-tail gather; the
    tie-break is total, so any combine order yields identical rows."""
    cols = ["user_id", "event_id", "ts", "event_type", "value"]

    def combine(batch: pa.Table) -> pa.Table:
        part = _latest_collapse(batch)
        uid = part.column("user_id").to_numpy(zero_copy_only=False)
        from humid_ray.util import UINT64, splitmix64

        bucket = (splitmix64(uid.astype(np.int64).view(UINT64))
                  % UINT64(N_SESSION_BUCKETS)).astype(np.int64)
        return part.append_column("bucket", pa.array(bucket))

    return (
        read_events(sf_dir, columns=cols)
        .map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(
            lambda g: _latest_collapse(
                g.drop_columns(["bucket"])
                if "bucket" in g.column_names else g
            ),
            batch_format="pyarrow",
        )
    )


def latest_per_user_sql(table: str = "events") -> str:
    """DuckDB oracle for ``latest_per_user``."""
    return (
        "SELECT user_id, event_id, ts, event_type, value "
        f"FROM {table} QUALIFY row_number() OVER "
        "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1"
    )


# --- per-user daily deltas (the LAG window function) ------------------------

_DAY_US = 86_400_000_000


def daily_deltas(sf_dir: str):
    """(user_id, day, day_cents, delta_cents): per-user per-day spend
    in exact int64 cents, with the LAG window — delta vs the user's
    PREVIOUS ACTIVE day (NULL on a user's first day, SQL LAG
    semantics). Value rounds to cents ONCE per event (half-away, the
    engine-wide money rule), so partial sums are order-independent and
    exact.

    Scale shape: a per-batch (user, day) combiner collapses events
    before the exchange (shuffle volume = distinct user-days per
    block, not events); ONE exchange into hashed user buckets (the
    sessionize routing rule — a user's whole history lands in one
    kernel); each bucket kernel is one lexsort + segmented reduce +
    a shifted segment diff. No sort of the full corpus anywhere."""
    from humid_ray.util import round_half_away

    _empty = pa.table({
        "user_id": pa.array([], type=pa.int64()),
        "day_us": pa.array([], type=pa.int64()),
        "cents": pa.array([], type=pa.int64()),
        "bucket": pa.array([], type=pa.int64()),
    })

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        day = (_ts_us(batch.column("ts")) // _DAY_US) * _DAY_US
        val = batch.column("value").to_numpy(zero_copy_only=False)
        cents = round_half_away(val * 100.0, 0).astype(np.int64)
        order = np.lexsort((day, uid))
        uid, day, cents = uid[order], day[order], cents[order]
        new = np.r_[True, (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])]
        starts = np.flatnonzero(new)
        sums = np.add.reduceat(cents, starts)
        t = pa.table({
            "user_id": pa.array(uid[starts]),
            "day_us": pa.array(day[starts]),
            "cents": pa.array(sums.astype(np.int64)),
        })
        return t.append_column(
            "bucket", pa.array(_user_buckets(t), type=pa.int64()))

    _out_empty = pa.table({
        "user_id": pa.array([], type=pa.int64()),
        "day": pa.array([], type=pa.timestamp("us")),
        "day_cents": pa.array([], type=pa.int64()),
        "delta_cents": pa.array([], type=pa.int64()),
    })

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _out_empty
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        day = g.column("day_us").to_numpy(zero_copy_only=False)
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((day, uid))
        uid, day, cents = uid[order], day[order], cents[order]
        # fold cross-block partials of the same (user, day)
        new = np.r_[True, (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])]
        starts = np.flatnonzero(new)
        uid, day = uid[starts], day[starts]
        cents = np.add.reduceat(cents, starts).astype(np.int64)
        first = np.r_[True, uid[1:] != uid[:-1]]
        prev = np.r_[0, cents[:-1]]
        delta = cents - prev
        return pa.table({
            "user_id": pa.array(uid.astype(np.int64)),
            "day": pa.array(day.astype(np.int64)).cast(pa.timestamp("us")),
            "day_cents": pa.array(cents),
            "delta_cents": pa.array(delta, mask=first),
        })

    return (
        read_events(sf_dir, columns=["ts", "user_id", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(
            lambda g: kernel(g.drop_columns(["bucket"])
                             if "bucket" in g.column_names else g),
            batch_format="pyarrow",
        )
    )


def daily_deltas_sql(table: str = "events") -> str:
    """DuckDB oracle for ``daily_deltas``: round-per-event cents, one
    GROUP BY, LAG over (user, day)."""
    return (
        "WITH d AS (SELECT user_id, "
        "time_bucket(INTERVAL 1 day, ts) AS day, "
        "CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents "
        f"FROM {table} GROUP BY user_id, time_bucket(INTERVAL 1 day, ts)) "
        "SELECT user_id, day, cents AS day_cents, "
        "cents - lag(cents) OVER (PARTITION BY user_id ORDER BY day) "
        "AS delta_cents FROM d"
    )
