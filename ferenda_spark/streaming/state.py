"""Custom stateful streaming operator: session windows via
``applyInPandasWithState``.

The batch engine sessionizes with a lag-window scan
(operators/analytics.py::sessionize); a stream cannot window over
"all events so far", so the streaming form keeps per-user state and
emits a session once it is SEALED — no event still admissible under
the watermark could extend or split it.  This is the
``applyInPandasWithState`` extension-point exercise from SURVEY §2.10
— the same Arrow batching as mapInPandas, plus per-key state and
timeouts.

Batch parity under reordering: watermarks bound lateness, not
cross-batch ordering, so an in-watermark event may arrive EARLIER
than everything seen so far — and an earlier open-session scheme that
merged any such event into its single (start, end, count) session
would bridge silences longer than the gap (two batch sessions, one
streamed session: a parity break).  The state is therefore the raw
pending event-time list; each invocation re-splits it exactly the
way the batch scan would, emits the sessions that are sealed
(``end + gap < watermark`` — every future event has ts ≥ watermark,
so nothing can reach back), and keeps only the unsealed suffix.
State per key is bounded by the watermark horizon (events older than
``watermark - gap`` always seal out), the same bound every
watermarked stateful operator carries.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = ("user_id long, session_start timestamp, "
              "session_end timestamp, n_events long")
STATE_SCHEMA = "pending array<long>"

_MS = 1_000_000  # pandas datetime64[ns] → ms divisor is 1e6


def _split_sessions(ms_sorted: list, gap_ms: int) -> list:
    """Sorted epoch-ms list → [(start, end, n)] split on gaps — the
    exact rule the batch sessionizer applies to the full event set."""
    out = []
    s = e = ms_sorted[0]
    n = 1
    for t in ms_sorted[1:]:
        if t - e > gap_ms:
            out.append((s, e, n))
            s, e, n = t, t, 1
        else:
            e = t
            n += 1
    out.append((s, e, n))
    return out


def stateful_sessions(events: DataFrame, gap_minutes: int = 30,
                      user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """events stream (must carry a watermark on ``ts_col``) →
    append-mode stream of CLOSED sessions."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = gap_minutes * 60 * 1000

    def fn(key, pdfs, state):
        user = key[0]

        def rows(sess):
            return pd.DataFrame([{
                "user_id": user,
                "session_start": pd.Timestamp(s, unit="ms"),
                "session_end": pd.Timestamp(e, unit="ms"),
                "n_events": n,
            } for s, e, n in sess])

        if state.hasTimedOut:
            (pending,) = state.get
            state.remove()
            if pending is not None and len(pending):
                # watermark passed last_end + gap: every pending
                # session is sealed
                yield rows(_split_sessions(sorted(pending), gap_ms))
            return

        ts = pd.concat([pd.to_datetime(pdf[ts_col]) for pdf in pdfs])
        ms = (ts.astype("int64") // _MS).tolist()
        if state.exists:
            (pending,) = state.get
            ms = list(pending) + ms
        ms.sort()
        wm = state.getCurrentWatermarkMs()
        sess = _split_sessions(ms, gap_ms)
        # session ends are strictly increasing across the split, so
        # the sealed set is a prefix
        sealed = [x for x in sess if x[1] + gap_ms < wm]
        unsealed = sess[len(sealed):]
        if sealed:
            yield rows(sealed)
        if unsealed:
            cut = unsealed[0][0]
            state.update(([t for t in ms if t >= cut],))
            # must not be earlier than the watermark: an exactly-at-
            # boundary session (end + gap == wm) stays open for a
            # potential ts == wm extension
            state.setTimeoutTimestamp(
                max(unsealed[-1][1] + gap_ms, wm + 1))
        elif state.exists:
            state.remove()

    return (events.groupBy(user_col).applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append",
        GroupStateTimeout.EventTimeTimeout))


FIRST_SEEN_OUT = "key string, first_ts timestamp"
FIRST_SEEN_STATE = "best long, emitted boolean"


def stateful_first_seen(stream: DataFrame, key_col: str = "key",
                        ts_col: str = "ts",
                        horizon_minutes: int = 60) -> DataFrame:
    """Streaming first-occurrence dedup with BATCH-PARITY semantics:
    for every key, emit exactly one ``(key, first_ts)`` row carrying
    the MINIMUM event time — the same winner ``exact_dedup``'s
    min-struct keeper picks in batch — and suppress every other
    occurrence.

    Spark's built-in streaming ``dropDuplicates`` keeps the
    first-ARRIVED row, so under watermark-legal reordering the stream
    and the batch job disagree about which capture of a url is "the
    first" (a determinism break the engine's replay-stable contract
    forbids).  This operator instead buffers a key's current minimum
    until the WATERMARK passes it — at that point no admissible event
    can precede it, so the minimum is final — then emits once and
    holds a tombstone that swallows later duplicates.

    State per key is two scalars, and the tombstone expires
    ``horizon_minutes`` after the emitted timestamp (event-time
    timeout), so state is bounded by the key-arrival horizon exactly
    like ``dropDuplicatesWithinWatermark``: a duplicate arriving
    AFTER its key's tombstone expired re-emits, the documented
    horizon trade every bounded-state streaming dedup makes.  Scale
    shape: groupBy(key) is the stream's one stateful exchange; the
    Arrow batch per key touches only that key's new events.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    horizon_ms = horizon_minutes * 60 * 1000

    def fn(key, pdfs, state):
        k = key[0]

        def out(ms):
            return pd.DataFrame(
                [{"key": k, "first_ts": pd.Timestamp(ms, unit="ms")}])

        if state.hasTimedOut:
            best, emitted = state.get
            if emitted:
                # tombstone expired: forget the key (a later dup
                # would re-emit — the documented horizon trade)
                state.remove()
                return
            # watermark passed `best` unseen-since: the min is final
            state.update((best, True))
            state.setTimeoutTimestamp(
                max(best + horizon_ms, state.getCurrentWatermarkMs() + 1))
            yield out(best)
            return

        ts = pd.concat([pd.to_datetime(pdf[ts_col]) for pdf in pdfs])
        ms = (ts.astype("int64") // _MS).min()
        best, emitted = state.get if state.exists else (None, False)
        if emitted:
            # duplicates while the tombstone lives: swallow, keep the
            # tombstone's own expiry (do not extend on duplicates —
            # a hot key would otherwise pin state forever)
            state.update((best, True))
            state.setTimeoutTimestamp(
                max(best + horizon_ms, state.getCurrentWatermarkMs() + 1))
            return
        best = int(ms) if best is None else min(int(ms), best)
        wm = state.getCurrentWatermarkMs()
        if wm > best:
            # nothing admissible can precede best: emit immediately
            state.update((best, True))
            state.setTimeoutTimestamp(
                max(best + horizon_ms, state.getCurrentWatermarkMs() + 1))
            yield out(best)
        else:
            # still inside the reorder window: wait for the watermark
            # (timeout fires the moment wm passes best)
            state.update((best, False))
            state.setTimeoutTimestamp(max(wm + 1, best + 1))

    return (stream.groupBy(key_col).applyInPandasWithState(
        fn, FIRST_SEEN_OUT, FIRST_SEEN_STATE, "append",
        GroupStateTimeout.EventTimeTimeout))
