"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9; the "custom stateful operators" extension point).

Example operator: per-user running totals — for each micro-batch, update
the user's (event count, value sum) state and emit the new totals. The
state is two numbers per key, so a 100 TB/day stream holds state
proportional to |users|, not |events|; the GroupStateTimeout would evict
idle keys in a production deployment.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_totals(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit keyed state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- bounded-state heavy hitters (Misra-Gries) -----------------------------

HH_OUTPUT_SCHEMA = "user_id long, event_type string, n long"
HH_STATE_SCHEMA = "types array<string>, counts array<long>"


def _make_misra_gries_update(k: int):
    """Build the applyInPandasWithState update fn for a k-counter
    Misra-Gries summary. The MG guarantees are ORDER-FREE, which is what
    makes this a sound streaming operator: for every item,
    ``true - N/k <= est <= true`` (N = items seen for the key), and any
    item with frequency > N/k is guaranteed to be retained — regardless of
    arrival order or micro-batch boundaries. With k larger than the key's
    distinct-item count no decrement ever fires and the summary is EXACT,
    which is the regime the oracled query pins; the error bound at small k
    is pinned separately in tests."""

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            types, counts = state.get
            summary = dict(zip(list(types), [int(c) for c in counts]))
        else:
            summary = {}
        for pdf in batches:
            for t in pdf["event_type"]:
                t = str(t)
                if t in summary:
                    summary[t] += 1
                elif len(summary) < k:
                    summary[t] = 1
                else:  # decrement step: all counters down one, drop zeros
                    summary = {u: c - 1 for u, c in summary.items() if c > 1}
        state.update((list(summary.keys()), list(summary.values())))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(summary),
                "event_type": list(summary.keys()),
                "n": list(summary.values()),
            }
        )

    return update


def heavy_hitters_stream(events: DataFrame, k: int = 8) -> DataFrame:
    """Streaming per-user heavy hitters with BOUNDED keyed state: a
    k-counter Misra-Gries summary per user (state is O(k) per key — at
    100 TB/day the state store holds |users| x k counters, independent of
    event volume, which is the whole point vs an exact per-(user, type)
    count whose key space is unbounded on high-cardinality dimensions)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_misra_gries_update(k),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- bounded-state value histogram (drift detection feed) ------------------

HIST_BINS = 8
HIST_WIDTH = 20.0
HIST_OUTPUT_SCHEMA = "event_type string, bin long, n long"
HIST_STATE_SCHEMA = "bins array<long>"


def _update_value_histogram(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-key fixed-bin histogram of ``value`` in keyed state. Bin =
    clip(floor(value / HIST_WIDTH), 0, HIST_BINS-1) — the same IEEE
    division + floor + two-sided clamp the JVM/batch/oracle forms compute
    (GREATEST(0, LEAST(...)) there), so the streamed counts are
    value-exact including negative outliers; null/NaN values are dropped
    on every side (floor(NaN).astype(int64) is undefined behavior, and
    pandas nulls arrive as NaN in the float64 view). Counting is
    commutative, so the result is order-free across micro-batch
    boundaries; state is HIST_BINS longs per key."""
    import numpy as np

    counts = np.array(list(state.get[0]) if state.exists else [0] * HIST_BINS, dtype=np.int64)
    for pdf in batches:
        v = pdf["value"].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        bins = np.clip(np.floor(v / HIST_WIDTH), 0, HIST_BINS - 1).astype(np.int64)
        counts += np.bincount(bins, minlength=HIST_BINS)
    state.update(([int(c) for c in counts],))
    yield pd.DataFrame(
        {
            "event_type": [key[0]] * HIST_BINS,
            "bin": np.arange(HIST_BINS, dtype=np.int64),
            "n": counts,
        }
    )


def value_histogram_stream(events: DataFrame) -> DataFrame:
    """Streaming per-event-type value histogram with O(bins) keyed state —
    the feed of a distribution-drift monitor: at any trigger the sink holds
    each key's exact running histogram, independent of event volume."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_value_histogram,
        outputStructType=HIST_OUTPUT_SCHEMA,
        stateStructType=HIST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- bounded-state streaming top-k ------------------------------------------

TOPK_OUTPUT_SCHEMA = "event_type string, rank int, value double, event_id long"
TOPK_STATE_SCHEMA = "vals array<double>, ids array<long>"


def _make_topk_update(k: int):
    """Build the applyInPandasWithState update fn for a per-key top-k by
    (value desc, event_id asc). Top-k maintenance is a SEMILATTICE —
    merge-then-truncate is associative and commutative under the total
    order — so the final state is EXACTLY the batch top-k regardless of
    arrival order or micro-batch boundaries, and every intermediate
    emission is pointwise dominated: inserting elements into a sorted set
    only ever improves the occupant of rank r under the order, so
    max(struct(value, -event_id)) per (key, rank) over an update-mode
    sink reconstructs the final state (the monotone-reduction trick the
    other oracled streaming ops use on counts, applied to order
    statistics). NaN/null values are dropped, same as the histogram
    kernel. State is 2k scalars per key — event-volume-independent."""

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            pairs = list(zip(state.get[0], state.get[1]))
        else:
            pairs = []
        for pdf in batches:
            v = pdf["value"].to_numpy(dtype="float64")
            ids = pdf["event_id"].to_numpy(dtype="int64")
            keep = ~pd.isna(v)
            pairs.extend(zip(v[keep].tolist(), ids[keep].tolist()))
            # merge-then-truncate inside the batch loop keeps the working
            # set bounded at |state| + |batch| even on huge partitions
            pairs.sort(key=lambda p: (-p[0], p[1]))
            del pairs[k:]
        state.update(([p[0] for p in pairs], [p[1] for p in pairs]))
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(pairs),
                "rank": pd.Series(range(1, len(pairs) + 1), dtype="int32"),
                "value": [p[0] for p in pairs],
                "event_id": [p[1] for p in pairs],
            }
        )

    return update


def topk_stream(events: DataFrame, k: int = 3) -> DataFrame:
    """Streaming per-event-type top-k records by value with O(k) keyed
    state — the monitoring-feed shape (largest transactions, worst
    latencies) where the full stream is never retained."""
    return events.groupBy("event_type").applyInPandasWithState(
        _make_topk_update(k),
        outputStructType=TOPK_OUTPUT_SCHEMA,
        stateStructType=TOPK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- last-writer-wins upsert (streaming materialized view) ------------------

LWW_OUTPUT_SCHEMA = (
    "user_id long, last_ts timestamp, last_event_id long, "
    "last_type string, last_value double"
)
LWW_STATE_SCHEMA = "ts_ns long, event_id long, event_type string, value double"


def _update_last_writer(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-key latest record by (ts desc, event_id desc) — the streaming
    upsert that maintains a current-state materialized view over a CDC/
    event feed with ONE record of keyed state. Last-writer-wins under a
    total order is a semilattice (max), so the final state is order-free-
    exact across micro-batch boundaries, and each emission is the running
    max — monotone, so max(struct(...)) over an update-mode sink
    reconstructs the final view (the same reduction every oracled
    streaming op here uses)."""
    import numpy as np

    best = tuple(state.get) if state.exists else None
    for pdf in batches:
        if not len(pdf):
            continue
        ts = pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
        eid = pdf["event_id"].to_numpy(dtype="int64")
        i = int(np.lexsort((eid, ts))[-1])  # max ts, ties to max event_id
        cand = (
            int(ts[i]),
            int(eid[i]),
            pdf["event_type"].iloc[i],
            float(pdf["value"].iloc[i]),
        )
        if best is None or cand[:2] > best[:2]:
            best = cand
    state.update(best)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "last_ts": pd.to_datetime([best[0]]),
            "last_event_id": [best[1]],
            "last_type": [best[2]],
            "last_value": [best[3]],
        }
    )


def last_writer_wins_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user current-state view (latest event wins) with one
    record of keyed state — the upsert-into-serving-store shape."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_last_writer,
        outputStructType=LWW_OUTPUT_SCHEMA,
        stateStructType=LWW_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- bounded-state distinct count (KMV sketch) -------------------------------

KMV_OUTPUT_SCHEMA = "event_type string, rank int, h long"
KMV_STATE_SCHEMA = "hs array<long>"


def _make_kmv_update(k: int):
    """Build the applyInPandasWithState update fn for a K-Minimum-Values
    distinct sketch (Bar-Yossef et al. 2002 — public literature): keep the
    k smallest DISTINCT hash values per key. Union-distinct-then-truncate
    is a SEMILATTICE, so the final state is order-free-exact across
    micro-batch boundaries; and the rank-r smallest hash only ever
    DECREASES as data arrives, so min(h) per (key, rank) over an
    update-mode sink reconstructs the final state (the monotone reduction
    again, downward this time). Input rows carry a precomputed ``h``
    column — the md5-nibble 60-bit hash (functions/numeric.py::sql_hash60,
    fed by kmv_distinct_stream): nonnegative, so plain long comparisons
    are the right total order, and reproducible in DuckDB, which is what
    makes the estimate (k-1)·2^60 // h_k (exact HUGEINT/DECIMAL integer
    arithmetic downstream) SQL-oracle-exact. State is k longs per key."""
    import numpy as np

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        hs = np.array(list(state.get[0]) if state.exists else [], dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            hs = np.unique(np.concatenate([hs, pdf["h"].to_numpy(dtype=np.int64)]))
            hs = hs[:k]  # np.unique sorts ascending — keep the k smallest
        state.update((hs.tolist(),))
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(hs),
                "rank": pd.Series(range(1, len(hs) + 1), dtype="int32"),
                "h": hs,
            }
        )

    return update


def kmv_distinct_stream(events: DataFrame, k: int = 64) -> DataFrame:
    """Streaming per-event-type distinct-user sketch with k longs of keyed
    state — the bounded-cardinality monitor: at any trigger the sink holds
    each key's exact k smallest user-hash values, independent of volume.

    The hash is the md5-nibble 60-bit packing (functions/numeric.py::
    sql_hash60) — the SAME engine-reproducible hash under agg_kmv_distinct
    — so the whole sketch AND its estimate are SQL-oracle-exact, not just
    deterministic (what upgraded t_stream_distinct_kmv from rows-only to
    the hash gate)."""
    from pyspark.sql import functions as F

    from ..functions.numeric import spark_hash60

    hashed = events.select(
        "event_type",
        F.expr(f"CAST({spark_hash60('CAST(user_id AS STRING)')} AS BIGINT)").alias("h"),
    )
    return hashed.groupBy("event_type").applyInPandasWithState(
        _make_kmv_update(k),
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- transformWithState (Spark 4 StatefulProcessor API) -------------------
# The successor to applyInPandasWithState: named state variables on a
# handle (value/list/map state), timers, and TTL — composable state instead
# of one monolithic tuple. Same operator implemented both ways so either
# runtime surface is available; equivalence is pinned in
# tests/test_stateful_streaming.py (skipped where google.protobuf — the
# state-server wire protocol's runtime dependency — is not installed).

try:  # pragma: no cover - import shape differs across 4.x point releases
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    _HAS_TWS = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running (count, sum) via a named ValueState."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """The same running-totals operator on the transformWithState API."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# --- order-DEPENDENT sequential state: streaming max drawdown ---------------
#
# Every other operator in this module is deliberately order-free (lattice /
# monotone), because generic micro-batches carry no event-time order. Max
# drawdown is the canonical ORDER-DEPENDENT statistic: it folds a running
# total, its running peak, and the max gap — state that only makes sense
# when each key's rows arrive in event-time order. The streaming form is
# therefore defined over a TIME-ORDERED log (micro-batch n+1 holds only
# events at or after batch n's — what a replayed commit log / per-partition
# Kafka order gives you), with each batch's rows sorted per key before the
# fold. Arithmetic is exact integer cents end to end (floor(value*100) —
# the same quantization as the batch twin queries/stats.py::ts_drawdown),
# so the streaming run is value-exact against the batch window replay.

DD_OUTPUT_SCHEMA = (
    "user_id long, n_events long, end_cents long, peak_cents long, "
    "max_drawdown_cents long"
)
DD_STATE_SCHEMA = "cum long, peak long, dd long, n long"

_PEAK_SEED = -(2**62)  # below any reachable running total


def _update_drawdown(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    cum, peak, dd, n = state.get if state.exists else (0, _PEAK_SEED, 0, 0)
    pdf = pd.concat(list(batches)).sort_values(["tsu", "event_id"])
    vals = pdf["vq"].to_numpy(dtype="int64")
    cums = cum + np.cumsum(vals)
    peaks = np.maximum.accumulate(np.concatenate(([peak], cums)))[1:]
    dd = max(int(dd), int((peaks - cums).max()))
    cum, peak, n = int(cums[-1]), int(peaks[-1]), n + len(vals)
    state.update((cum, peak, dd, n))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "end_cents": [cum],
            "peak_cents": [peak],
            "max_drawdown_cents": [dd],
        }
    )


def drawdown_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user max drawdown over (tsu, event_id)-ordered rows
    with columns (user_id, event_id, tsu, vq). State is four longs per
    key — |users|-proportional, never |events|."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_drawdown,
        outputStructType=DD_OUTPUT_SCHEMA,
        stateStructType=DD_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
