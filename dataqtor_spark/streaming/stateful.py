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
