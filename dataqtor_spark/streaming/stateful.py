"""Custom stateful streaming operator (north-star: arbitrary per-key state
beyond what windows/dedup built-ins express).

``running_event_stats`` keeps (count, sum) per key across micro-batches via
``applyInPandasWithState`` and emits the updated running aggregate each
batch — the minimal shape of a "per-entity quality tracker" (running null
rate, drift counters, …).  State is one fixed-size tuple per key (bounded
by key cardinality, not stream length); batches arrive as Arrow-backed
pandas frames, so the Python hop is per-batch, not per-row.

Built-ins are still preferred where they fit (SURVEY §2.5 note:
tumbling/session windows and watermark dedup cover the reference-derived
needs); this operator exists for semantics those can't express —
cross-window running totals with custom eviction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def running_event_stats(df: DataFrame, key_col: str = "user_id",
                        value_col: str = "value") -> DataFrame:
    """Per-key running (n_events, total_value), emitted on every update.

    Streaming input → use with update output mode; the latest row per key
    is the current running state.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} long, n_events long, total_value double"
    state_schema = "n long, s double"

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            n, s = state.get
        else:
            n, s = 0, 0.0
        for pdf in pdf_iter:
            n += len(pdf)
            s += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n],
                            "total_value": [s]})

    return (df.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def streaming_sequence_match(df: DataFrame, pattern: list[str],
                             within_minutes: float,
                             key_col: str = "user_id",
                             ts_col: str = "ts",
                             type_col: str = "event_type",
                             tiebreak_col: str = "event_id") -> DataFrame:
    """Streaming CEP: per-key cumulative count of strictly-consecutive
    event sequences matching ``pattern`` with last-minus-first time span
    ≤ ``within_minutes`` — the stateful twin of the batch lead-chain
    form (cep01).

    State per key is exactly the trailing ``len(pattern) - 1`` events
    (timestamps in micros + types) plus the running match count — O(1)
    per key, independent of stream length.  Each micro-batch sorts its
    rows by (ts, tiebreak), prepends the carried tail, counts pattern
    hits whose final element is a NEW row (so a replayed tail never
    recounts), and carries the new tail forward.  Assumes per-key
    batches arrive in event-time order (true for time-ordered sources;
    otherwise add a watermark-sized reorder buffer upstream).

    Use update output mode; the latest row per key is the current count.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    k = len(pattern)
    out_schema = f"{key_col} long, n_matches long"
    state_schema = "tail_ts array<long>, tail_ty array<string>, n long"
    within_us = int(within_minutes * 60 * 1_000_000)

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            tail_ts, tail_ty, n = state.get
            tail_ts, tail_ty = list(tail_ts), list(tail_ty)
        else:
            tail_ts, tail_ty, n = [], [], 0
        rows = [pdf for pdf in pdf_iter if len(pdf)]
        if rows:
            batch = pd.concat(rows).sort_values([ts_col, tiebreak_col])
            new_ts = [int(t.value // 1000) for t in batch[ts_col]]
            new_ty = list(batch[type_col])
            all_ts = tail_ts + new_ts
            all_ty = tail_ty + new_ty
            first_new = len(tail_ts)
            for end in range(len(all_ts)):
                start = end - k + 1
                if start < 0 or end < first_new:
                    continue  # incomplete window, or last element not new
                if all_ty[start:end + 1] == pattern and \
                        all_ts[end] - all_ts[start] <= within_us:
                    n += 1
            tail_ts = all_ts[-(k - 1):] if k > 1 else []
            tail_ty = all_ty[-(k - 1):] if k > 1 else []
        state.update((tail_ts, tail_ty, n))
        yield pd.DataFrame({key_col: [key[0]], "n_matches": [n]})

    return (df.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))
