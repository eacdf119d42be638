"""Custom stateful streaming operator: session windows via
``applyInPandasWithState``.

The batch engine sessionizes with a lag-window scan
(operators/analytics.py::sessionize); a stream cannot window over
"all events so far", so the streaming form keeps one tiny state row
per user (session start/end/count, epoch millis) and closes a session
either when a later event arrives past the gap or when the event-time
watermark passes ``last_event + gap`` (state timeout).  This is the
``applyInPandasWithState`` extension-point exercise from SURVEY §2.10
— the same Arrow batching as mapInPandas, plus per-key state and
timeouts.

Ordering contract: events for a key arrive in event-time order across
micro-batches (late rows beyond the watermark are dropped by the
watermark itself); within a batch the operator sorts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = ("user_id long, session_start timestamp, "
              "session_end timestamp, n_events long")
STATE_SCHEMA = "start long, end long, n long"

_MS = 1_000_000  # pandas datetime64[ns] → ms divisor is 1e6


def stateful_sessions(events: DataFrame, gap_minutes: int = 30,
                      user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """events stream (must carry a watermark on ``ts_col``) →
    append-mode stream of CLOSED sessions."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = gap_minutes * 60 * 1000

    def fn(key, pdfs, state):
        user = key[0]

        def row(s, e, n):
            return pd.DataFrame([{
                "user_id": user,
                "session_start": pd.Timestamp(s, unit="ms"),
                "session_end": pd.Timestamp(e, unit="ms"),
                "n_events": n,
            }])

        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            yield row(s, e, n)
            return

        ts = pd.concat([pd.to_datetime(pdf[ts_col]) for pdf in pdfs])
        ts = ts.sort_values()
        ms = (ts.astype("int64") // _MS).tolist()
        if state.exists:
            cur_s, cur_e, cur_n = state.get
        else:
            cur_s, cur_e, cur_n = ms[0], ms[0], 0
            ms = ms  # first event counted in the loop below
        for t in ms:
            if t - cur_e > gap_ms:
                yield row(cur_s, cur_e, cur_n)
                cur_s, cur_e, cur_n = t, t, 1
            else:
                # a later micro-batch may deliver an in-watermark
                # event EARLIER than the open session (watermarks
                # bound lateness, not cross-batch ordering) — the
                # session must extend backwards too
                cur_s = min(cur_s, t)
                cur_e = max(cur_e, t)
                cur_n += 1
        state.update((cur_s, cur_e, cur_n))
        state.setTimeoutTimestamp(cur_e + gap_ms)

    return (events.groupBy(user_col).applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append",
        GroupStateTimeout.EventTimeTimeout))
