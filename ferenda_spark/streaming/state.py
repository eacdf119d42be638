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
