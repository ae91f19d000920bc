"""Streaming CEP — the live faces of operators/cep.py (Flink
`CEP.pattern(stream, ...)`; SURVEY.md §2 exhaustiveness note).

Five keyed automata on ``applyInPandasWithState``, each pinned
stream ≡ batch by tests/test_streaming.py + property tests:

- :func:`cep_first_match_stream` — relaxed-contiguity (followedBy)
  earliest completion: state is (next step index, chain start, last
  matched time); ONE completion row per key, exactly
  ``cep_first_match``.
- :func:`cep_with_timeouts_stream` — the same chain plus Flink's
  TIMEOUT SIDE OUTPUT: event-time timers (re-armed per invocation,
  ms-granular → deadline = floor(horizon_us/1000)+1 so a timer never
  fires while a non-late completion is still admissible) emit the
  timed-out partial when the watermark passes t1 + within — exactly
  ``cep_timed_out``'s horizon cut.
- :func:`cep_strict_matches_stream` — strict contiguity (next):
  a ring buffer of the last k−1 events carries matches across
  micro-batch boundaries; only the longest buffer suffix that is a
  prefix of the pattern is kept (KMP failure function), so most keys
  hold no state at all.
- :func:`cep_not_followed_by_stream` — negative patterns
  (notFollowedBy, r8): per-start greedy partials, gap negatives kill
  in-flight, a trailing negative defers emission until the event-time
  watermark closes the chain's horizon silent; state is the live
  partial list, bounded by one ``within`` horizon of starts plus a
  done marker per emitted key.
- :func:`cep_all_matches_stream` — the skip-till-any-match NFA with
  the full after-match skip enum (r8): the partial set IS the batch
  enumeration's fork tree, strategies apply online in completion
  order, and state is bounded by one horizon's enumeration fanout
  plus self-pruning strategy memory; r9 adds ITERATIVE CONDITIONS
  (per-block predicates over the chain's running value aggregates,
  the live face of ``cep_all_matches(conditions=...)``); r10 adds
  UNBOUNDED looping blocks with ``until`` stop conditions and
  ``greedy`` maximal-run selection (per-(key, type) candidate
  sequences, horizon-pruned stop timestamp lists, and lazy exit
  deadlines in the same state row — the NFA loops as long as the
  data does, cross-checking the batch side's data-dependent slot
  bound), with condition/stop SQL strings compiled through the
  shared restricted grammar so one spec drives both engines.

All five require arrival order to respect event-time order per key
ACROSS micro-batches (the testable contract: an ordered replay makes
stream ≡ batch; out-of-order arrivals would need a watermark-deep
reordering buffer, which Flink CEP also requires for event-time
patterns). For the all-matches NFA the contract additionally keeps a
key's SAME-TIMESTAMP events inside one micro-batch: the batch twin
treats them as simultaneous (distinct (key, type, ts) identity,
same-end ties emitted together), which is unobservable if the group
splits across triggers. WITHIN a micro-batch no order is assumed: each state fn
concatenates every Arrow chunk of its key and sorts once on
(ts, tiebreak) — chunk-local sorting would silently consume events
out of order for keys exceeding arrow.maxRecordsPerBatch rows per
batch (pinned by a small-maxRecordsPerBatch stream≡batch test).

Scale: state per key is a few scalars (or ≤ k−1 events for strict
mode); matching work is O(batch rows); outputs stream in append
mode; state is hash-partitioned by key across executors like every
GroupState operator here. Retention: by default a key that completes
(or times out) keeps its 4-scalar done-marker FOREVER — that is the
price of first-match-EVER semantics (evicting it would let the key
match again on later events), ~40 bytes per completed key; for
streams with unbounded key churn, ``cep_first_match_stream``'s
``done_ttl`` evicts state via event-time timers — done markers once
the watermark passes end_ts + ttl (first match per TTL window), and
PARTIAL chains once idle past the ttl AND past their t1 + within
completion horizon (never while an in-horizon completion is still
admissible) — so state really is bounded by one max(ttl, within)
horizon of active keys, partials included, and callers that want
aligned per-window re-matching can bucket the key by window instead.
The sort-once concat holds a single key's single micro-batch in
memory — bounded by per-key batch volume, not stream length.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

CEP_OUTPUT_SCHEMA = (
    "user_id BIGINT, start_us BIGINT, end_us BIGINT, duration_s DOUBLE"
)
CEP_STATE_SCHEMA = "step_idx INT, t1_us LONG, tprev_us LONG, done BOOLEAN"
CEP_TO_OUTPUT_SCHEMA = (
    "user_id BIGINT, start_us BIGINT, last_us BIGINT, "
    "matched_steps INT, timed_out BOOLEAN"
)


def _parse_within_us(within: str) -> int:
    """'<n> hours' / '<n> minutes' style horizon → microseconds."""
    qty, unit = within.split()
    mult = {
        "second": 1,
        "seconds": 1,
        "minute": 60,
        "minutes": 60,
        "hour": 3600,
        "hours": 3600,
        "day": 86400,
        "days": 86400,
    }[unit.lower()]
    return int(qty) * mult * 1_000_000


def _make_cep_fn(steps: list[str], within_us: int, ttl_us: int | None = None):
    def expiry_ms(t1_us: int, tprev_us: int, done: bool) -> int:
        """Event-time deadline after which this state is dead weight
        (ttl mode only). Done marker: end + ttl (the documented
        re-match window). PARTIAL chain: idle past the ttl AND past
        its completion horizon t1 + within — before t1 + within an
        in-horizon completion is still admissible, so evicting on
        idleness alone could lose a legitimate match when
        ttl < within (the shape the done-marker test pins)."""
        if done:
            return (tprev_us + ttl_us) // 1000 + 1
        return max(t1_us + within_us, tprev_us + ttl_us) // 1000 + 1

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # ttl mode: the state's deadline passed with no new data —
            # evict (done marker: the key may match again on future
            # events; partial: the chain could no longer complete).
            state.remove()
            return
        if state.exists:
            step_idx, t1_us, tprev_us, done = state.get
            if (
                ttl_us is not None
                and expiry_ms(t1_us, tprev_us, done)
                <= state.getCurrentWatermarkMs()
            ):
                # State expired but new data arrived in the same
                # batch (Spark delivers data, not a timeout, then) —
                # evict the stored row NOW, not just the locals: if
                # this batch makes no step-0 progress the update()
                # below is skipped, and the old row (its timer
                # cleared by this invocation, none re-armed) would
                # otherwise sit in the store forever — exactly the
                # key-churn orphan the partial TTL exists to prevent.
                # A batch that does make progress recreates the row
                # via update() later in this same invocation.
                state.remove()
                step_idx, t1_us, tprev_us, done = 0, None, None, False
        else:
            step_idx, t1_us, tprev_us, done = 0, None, None, False
        out = []
        if not done:
            # A key's micro-batch arrives as MULTIPLE Arrow chunks
            # (arrow.maxRecordsPerBatch) in shuffle order — sorting
            # each chunk alone is NOT a global sort and would let the
            # automaton consume events out of event-time order for
            # keys with >10k rows/batch. Concatenate, then sort ONCE
            # (per-key-per-batch rows are bounded in practice).
            chunks = list(pdf_iter)
            pdf = (
                pd.concat(chunks, ignore_index=True)
                .sort_values(["ts_us", "__tb"])
                if chunks
                else pd.DataFrame(columns=["ts_us", "event_type"])
            )
            for ts_us, etype in zip(pdf["ts_us"], pdf["event_type"]):
                if etype != steps[step_idx]:
                    continue
                if step_idx > 0 and ts_us <= tprev_us:
                    continue
                if step_idx == 0:
                    t1_us = int(ts_us)
                tprev_us = int(ts_us)
                step_idx += 1
                if step_idx == len(steps):
                    done = True
                    if tprev_us - t1_us <= within_us:
                        out.append(
                            (
                                key[0],
                                t1_us,
                                tprev_us,
                                round((tprev_us - t1_us) / 1e6, 6),
                            )
                        )
                    break
        else:
            for _ in pdf_iter:  # drain — completed keys ignore new events
                pass
        if step_idx > 0 or done:
            state.update((step_idx, t1_us, tprev_us, done))
            if ttl_us is not None:
                # State TTL (re-armed every invocation — Spark clears
                # timers on each call): evict the done marker once
                # the watermark passes end + ttl (trading
                # first-match-EVER for first-match-per-TTL), and a
                # PARTIAL chain once it is both idle past the ttl and
                # past its t1 + within completion horizon — without
                # the partial deadline, keys that start a chain and
                # never finish accumulate forever under key churn
                # (measured: scripts/state_growth.py showed the
                # done-only TTL leaving the state curve ~linear). A
                # deadline at/below the watermark cannot be armed —
                # leave the row; the entry check above evicts it
                # lazily on the key's next data.
                timer_ms = expiry_ms(t1_us, tprev_us, done)
                if timer_ms > state.getCurrentWatermarkMs():
                    state.setTimeoutTimestamp(timer_ms)
        # step_idx == 0 is indistinguishable from state.exists == False:
        # skipping the update keeps zero-progress keys out of the store
        # (with NoTimeout an entry would otherwise live forever), so
        # state is O(keys with progress), not O(keys ever seen).
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "start_us", "end_us", "duration_s"]
            )

    return fn


def cep_first_match_stream(
    events: DataFrame,
    steps: list[str],
    within: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    done_ttl: str | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming earliest-completion CEP. ``within`` is '<n> hours' /
    '<n> minutes' style; completions emit in append mode as
    (user_id, start_ts, end_ts, duration_s). ``tiebreak_col`` orders
    same-timestamp rows within a batch deterministically (same role as
    event_id in the batch operator's oracle).

    ``done_ttl`` (optional, VERDICT r6 item 5): with the default
    ``None`` a completed key's done marker lives forever —
    first-match-EVER semantics, state O(completed keys) + O(keys with
    partial progress). Set an interval string ('7 days') to EVICT
    state once it is dead weight: the done marker when the event-time
    watermark passes end_ts + ttl (the key may then match again on
    later events — first match per TTL window), and a partial chain
    once it is idle past the ttl AND past its t1 + within completion
    horizon (never earlier, so no in-horizon match is ever lost even
    with ttl < within). State is then bounded by keys ACTIVE within
    one max(ttl, within) horizon — the right setting for unbounded
    key churn. Requires event-time watermarks (``watermark_delay``
    maps to withWatermark)."""
    within_us = _parse_within_us(within)
    ttl_us = None if done_ttl is None else _parse_within_us(done_ttl)
    if ttl_us is not None:
        events = events.withWatermark(ts_col, watermark_delay)
    cols = [
        F.col(key_col).alias("user_id"),
        F.unix_micros(ts_col).alias("ts_us"),
        F.col(type_col).alias("event_type"),
        F.col(tiebreak_col).alias("__tb"),
    ]
    if ttl_us is not None:
        # keep the watermark column itself in the projection so the
        # event-time timers stay driven by it
        cols.append(F.col(ts_col))
    prepared = events.select(*cols)
    out = prepared.groupBy("user_id").applyInPandasWithState(
        _make_cep_fn(steps, within_us, ttl_us),
        outputStructType=CEP_OUTPUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_us is None
            else GroupStateTimeout.EventTimeTimeout
        ),
    )
    return out.select(
        "user_id",
        F.timestamp_micros("start_us").alias("start_ts"),
        F.timestamp_micros("end_us").alias("end_ts"),
        "duration_s",
    )


def _make_cep_to_fn(steps: list[str], within_us: int):
    """State fn for the timeout-emitting variant. Matching differs
    from the plain automaton in ONE rule: a candidate beyond the
    chain's horizon (ts > t1 + within) can no longer extend it — the
    batch operator's prefix-cut — so stalled chains sit in state
    until the WATERMARK passes the horizon and the timer fires the
    timed-out partial (Flink's PatternTimeoutFunction emission
    discipline). Completions emit inline as before; every invocation
    of a live started chain re-arms the event-time timer (Spark
    clears it on each invocation)."""
    k = len(steps)

    def fn(key, pdf_iter, state):
        if state.exists:
            step_idx, t1_us, tprev_us, done = state.get
        else:
            step_idx, t1_us, tprev_us, done = 0, None, None, False
        out = []
        if state.hasTimedOut:
            # watermark passed t1 + within with the chain incomplete
            out.append((key[0], t1_us, tprev_us, step_idx, True))
            state.update((step_idx, t1_us, tprev_us, True))
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "user_id", "start_us", "last_us",
                        "matched_steps", "timed_out",
                    ],
                )
            return
        if not done:
            # Global per-key sort across ALL Arrow chunks of the
            # micro-batch (chunk-local sorts are not a global order —
            # see _make_cep_fn).
            chunks = list(pdf_iter)
            pdf = (
                pd.concat(chunks, ignore_index=True)
                .sort_values(["ts_us", "__tb"])
                if chunks
                else pd.DataFrame(columns=["ts_us", "event_type"])
            )
            for ts_us, etype in zip(pdf["ts_us"], pdf["event_type"]):
                if etype != steps[step_idx]:
                    continue
                if step_idx > 0 and (
                    ts_us <= tprev_us or ts_us - t1_us > within_us
                ):
                    continue  # beyond-horizon events cannot extend
                if step_idx == 0:
                    t1_us = int(ts_us)
                tprev_us = int(ts_us)
                step_idx += 1
                if step_idx == k:
                    done = True
                    out.append((key[0], t1_us, tprev_us, k, False))
                    break
        else:
            for _ in pdf_iter:
                pass
        if step_idx > 0 or done:
            # Timers are ms-granular while the horizon is µs: the
            # timer must land STRICTLY beyond the true horizon, else
            # a floor-truncated value lets the watermark reach it
            # while a non-late completing event at ts <= horizon can
            # still arrive (wm_ms >= timer ⇒ wm_us > horizon_us only
            # with the +1).
            timer_ms = (t1_us + within_us) // 1000 + 1
            if not done and timer_ms <= state.getCurrentWatermarkMs():
                # The watermark already passed this chain's horizon
                # (its key kept receiving events, so the timer never
                # got to fire): the partial is final — emit it inline;
                # re-arming below the watermark would throw.
                out.append((key[0], t1_us, tprev_us, step_idx, True))
                done = True
            state.update((step_idx, t1_us, tprev_us, done))
            if not done:
                # re-arm: cleared on every invocation by Spark
                state.setTimeoutTimestamp(timer_ms)
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "start_us", "last_us",
                    "matched_steps", "timed_out",
                ],
            )

    return fn


def cep_with_timeouts_stream(
    events: DataFrame,
    steps: list[str],
    within: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming CEP with Flink's timeout SIDE OUTPUT: one stream
    carrying both completions (timed_out = false, matched_steps = k)
    and timed-out partials (timed_out = true, matched_steps < k,
    last_ts = last matched event) — the partials emit when the
    EVENT-TIME WATERMARK passes each chain's t1 + within, exactly the
    horizon cut of the batch operators (operators/cep.py
    cep_first_match / cep_timed_out), which the stream-equals-batch
    test pins. Requires in-order arrival per key like the plain
    automaton; ``watermark_delay`` maps to withWatermark."""
    within_us = _parse_within_us(within)
    prepared = events.withWatermark(ts_col, watermark_delay).select(
        F.col(key_col).alias("user_id"),
        F.col(ts_col),
        F.unix_micros(ts_col).alias("ts_us"),
        F.col(type_col).alias("event_type"),
        F.col(tiebreak_col).alias("__tb"),
    )
    out = prepared.groupBy("user_id").applyInPandasWithState(
        _make_cep_to_fn(steps, within_us),
        outputStructType=CEP_TO_OUTPUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.select(
        "user_id",
        F.timestamp_micros("start_us").alias("start_ts"),
        F.timestamp_micros("last_us").alias("last_ts"),
        "matched_steps",
        "timed_out",
    )


# STATE-SCHEMA BREAK (r9, ADVICE r10 note): cur_ts/cur_dead were
# dropped from this schema in r9 (dead code — a kill provably
# requires t1 < ts), which INVALIDATES streaming checkpoints taken by
# cep_no_followed_by_stream queries on r8 trees: state rows no longer
# deserialize on restart. Running queries need fresh checkpoint
# directories after upgrading across r8 -> r9.
CEP_NFB_STATE_SCHEMA = (
    "done BOOLEAN, p_t1 ARRAY<LONG>, p_stage ARRAY<INT>, "
    "p_tprev ARRAY<LONG>, end_us LONG"
)


def _make_cep_nfb_fn(
    pos: list[str],
    neg: list[tuple[int, str]],
    within_us: int,
    ttl_us: int | None = None,
):
    """State fn for streaming notFollowedBy — the live face of the r8
    batch semantics (operators/cep.py::cep_not_followed_by): one
    greedy partial per occurrence of the first positive type, a
    negative kills only the partial whose gap it lands in, and the
    key emits its FIRST valid chain in completion order. A trailing
    negative defers emission until the chain's t1 + within horizon
    closes silent — the event-time timer fires it exactly like the
    batch horizon cut; gap-only patterns emit at the completing event.

    Per-key state is the live partial list [(t1, stage, tprev)], with
    stage == k marking a completed chain pending its silent horizon.
    Partials are bounded by one `within` horizon of starts (dead ones
    are pruned on every event/timer), so state is O(starts within one
    horizon) + one done marker per emitted key (first-match-ever, the
    same documented trade-off as cep_first_match_stream's default).

    Same-timestamp discipline (mirrors the batch open intervals): for
    each distinct timestamp the POSITIVE phase runs first (spawns +
    advances), then the NEGATIVE phase kills with strict comparisons
    — so a negative sharing its timestamp with the positive that
    closes the gap never kills (the batch interval (t_g, t_{g+1}) is
    open), and a partial that just advanced is immune (ts > tprev is
    false). A same-timestamp kill of a same-timestamp-started partial
    is impossible for the same reason (a kill needs ts > tprev and
    tprev >= t1, so t1 < ts always), and duplicate seed events are
    already absorbed by the parts-list membership check — no
    per-timestamp kill memory is needed (ADVICE r9).

    ``ttl_us`` (optional): evict the done marker once the watermark
    passes emitted_end + ttl — first match per TTL window instead of
    first-match-ever, the same contract (and the same eager lazy-
    eviction discipline: an expired marker detected on the data path
    is REMOVED before fresh matching, so a no-progress batch strands
    nothing) as cep_first_match_stream's done_ttl."""
    k = len(pos)
    has_tail = any(g == k for g, _ in neg)
    neg_by_type: dict[str, list[int]] = {}
    for g, t in neg:
        neg_by_type.setdefault(t, []).append(g)

    def hz_us(t1: int) -> int:
        return t1 + within_us

    def hz_ms(t1: int) -> int:
        # strictly beyond the µs horizon (same +1 as the other timers)
        return hz_us(t1) // 1000 + 1

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            done, p_t1, p_stage, p_tprev, end_us = state.get
            parts = [
                [int(a), int(b), int(c)]
                for a, b, c in zip(p_t1, p_stage, p_tprev)
            ]
            if (
                done
                and ttl_us is not None
                and not state.hasTimedOut
                and (end_us + ttl_us) // 1000 + 1
                <= state.getCurrentWatermarkMs()
            ):
                # expired done marker met by DATA (data preempts the
                # timer): evict NOW — the no-progress-batch orphan
                # lesson from _make_cep_fn — and match fresh
                state.remove()
                done, parts, end_us = False, [], None
        else:
            done, parts, end_us = False, [], None
        out: list[tuple] = []
        done_end = [end_us]

        def emit(t1: int, tk: int) -> None:
            out.append((key[0], t1, tk, round((tk - t1) / 1e6, 6)))
            done_end[0] = tk

        def update_done() -> None:
            """Persist the done marker; in ttl mode arm its eviction
            timer (an already-expired marker is not written at all)."""
            if ttl_us is not None:
                t = (done_end[0] + ttl_us) // 1000 + 1
                if t <= state.getCurrentWatermarkMs():
                    if state.exists:
                        state.remove()
                    return
                state.update((True, [], [], [], done_end[0]))
                state.setTimeoutTimestamp(t)
                return
            state.update((True, [], [], [], done_end[0]))

        def settle(wm_ms: int) -> None:
            """Resolve pendings whose horizon the watermark passed
            (earliest valid emits → done) and prune dead partials."""
            nonlocal done, parts
            live = []
            for t1, stg, tp in parts:  # t1-ascending == completion order
                if done:
                    break
                if hz_ms(t1) <= wm_ms:
                    if stg == k:
                        emit(t1, tp)
                        done = True
                    # stg < k: dead partial, drop
                else:
                    live.append([t1, stg, tp])
            parts = [] if done else live

        if state.hasTimedOut:
            if done:
                # only armed in ttl mode: the marker's ttl expired
                state.remove()
                return
            settle(state.getCurrentWatermarkMs())
            if done:
                update_done()
            elif parts:
                state.update(
                    (
                        False,
                        [p[0] for p in parts],
                        [p[1] for p in parts],
                        [p[2] for p in parts],
                        None,
                    )
                )
                state.setTimeoutTimestamp(min(hz_ms(p[0]) for p in parts))
            else:
                state.remove()
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["user_id", "start_us", "end_us", "duration_s"],
                )
            return

        if not done:
            chunks = list(pdf_iter)
            pdf = (
                pd.concat(chunks, ignore_index=True)
                .sort_values(["ts_us", "__tb"])
                if chunks
                else pd.DataFrame(columns=["ts_us", "event_type"])
            )
            rows = list(zip(pdf["ts_us"], pdf["event_type"]))
            i = 0
            while i < len(rows) and not done:
                ts = int(rows[i][0])
                group: list[str] = []
                while i < len(rows) and int(rows[i][0]) == ts:
                    group.append(str(rows[i][1]))
                    i += 1
                # chains whose horizon closed strictly before this
                # event resolve NOW (data preempts the timer); dead
                # partials fall out in the same pass
                new_parts = []
                for t1, stg, tp in parts:
                    if done:
                        break
                    if hz_us(t1) < ts:
                        if stg == k:
                            emit(t1, tp)
                            done = True
                    else:
                        new_parts.append([t1, stg, tp])
                parts = [] if done else new_parts
                if done:
                    break
                # POSITIVE phase: advance every awaiting partial, then
                # seed (a same-ts seed can't advance: strict >)
                completed_now = False
                for etype in group:
                    for p in parts:
                        t1, stg, tp = p
                        if (
                            stg < k
                            and etype == pos[stg]
                            and ts > tp
                            and ts <= hz_us(t1)
                        ):
                            p[1], p[2] = stg + 1, ts
                            if p[1] == k and not has_tail:
                                completed_now = True
                    if etype == pos[0]:
                        if not any(p[0] == ts for p in parts):
                            parts.append([ts, 1, ts])
                            if k == 1 and not has_tail:
                                completed_now = True
                if completed_now:
                    # first completion in event-time order; earliest
                    # start breaks the tie (batch: min (t_k, t1))
                    t1, _, tp = min(
                        p for p in parts if p[1] == k
                    )
                    emit(t1, tp)
                    done = True
                    parts = []
                    break
                # NEGATIVE phase: strict comparisons — see docstring
                for etype in group:
                    gaps = neg_by_type.get(etype)
                    if not gaps:
                        continue
                    parts = [
                        [t1, stg, tp]
                        for t1, stg, tp in parts
                        if not any(
                            stg == g
                            and ts > tp
                            and (g < k or ts <= hz_us(t1))
                            for g in gaps
                        )
                    ]
        else:
            for _ in pdf_iter:  # drain — emitted keys ignore new events
                pass

        if done:
            update_done()
        elif parts:
            # late settle: the watermark may already have passed a
            # pending's horizon (timers can't be armed at/below it)
            settle(state.getCurrentWatermarkMs())
            if done:
                update_done()
            elif parts:
                state.update(
                    (
                        False,
                        [p[0] for p in parts],
                        [p[1] for p in parts],
                        [p[2] for p in parts],
                        None,
                    )
                )
                state.setTimeoutTimestamp(min(hz_ms(p[0]) for p in parts))
            elif state.exists:
                state.remove()
        elif state.exists:
            state.remove()
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "start_us", "end_us", "duration_s"]
            )

    return fn


def cep_not_followed_by_stream(
    events: DataFrame,
    steps: list[str | tuple[str, str]],
    within: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    done_ttl: str | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming Flink ``notFollowedBy`` — the live twin of
    operators/cep.py::cep_not_followed_by (r8 per-start semantics).
    ``steps`` mixes positive type names with ``("not", type)`` markers
    exactly like the batch operator; emits one append-mode row per key
    (user_id, start_ts, end_ts, duration_s), deferred past the
    t1 + within horizon when the pattern carries a trailing negative
    (the match emits only once the event-time watermark closes the
    window silent — Flink's deferred-emission shape). In-order arrival
    per key is the contract, as for the other CEP automata; the
    stream ≡ batch test pins completions AND horizon-closed
    emissions. ``done_ttl`` (optional) evicts the done marker once
    the watermark passes the emitted chain's end + ttl — first match
    per TTL window, same contract as cep_first_match_stream's."""
    from flink_realtime_edu_spark.operators.cep import _split_negatives

    pos, neg = _split_negatives(steps)
    within_us = _parse_within_us(within)
    ttl_us = None if done_ttl is None else _parse_within_us(done_ttl)
    prepared = events.withWatermark(ts_col, watermark_delay).select(
        F.col(key_col).alias("user_id"),
        F.col(ts_col),
        F.unix_micros(ts_col).alias("ts_us"),
        F.col(type_col).alias("event_type"),
        F.col(tiebreak_col).alias("__tb"),
    )
    out = prepared.groupBy("user_id").applyInPandasWithState(
        _make_cep_nfb_fn(pos, neg, within_us, ttl_us),
        outputStructType=CEP_OUTPUT_SCHEMA,
        stateStructType=CEP_NFB_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.select(
        "user_id",
        F.timestamp_micros("start_us").alias("start_ts"),
        F.timestamp_micros("end_us").alias("end_ts"),
        "duration_s",
    )


CEP_AM_OUTPUT_SCHEMA = (
    "user_id BIGINT, start_us BIGINT, end_us BIGINT, "
    "n_events INT, chain_str STRING"
)
CEP_AM_STATE_SCHEMA = "js STRING"  # json-encoded NFA state, see fn


def _make_cep_am_fn(
    blocks: list[tuple[str, int, int | None]],
    within_us: int,
    strategy: str,
    skip_block: int | None,
    cap: int | None,
    conditions: dict | None = None,
    consecutive: set[int] | None = None,
    until: dict | None = None,
    greedy: set[int] | None = None,
    until_reads_value: bool = False,
    complete_at: set[int] | None = None,
):
    """State fn for streaming ALL-matches CEP with after-match skip
    strategies — the live twin of operators/cep.py::cep_after_match_skip.

    The per-key state is the literal skip-till-any-match NFA partial
    set: each partial is (chain, block, taken[, anchor]) and an event
    FORKS extensions (the no-take branch is the surviving original),
    exactly the batch enumeration's stop∪extend slot walk. Identical
    chains reachable under several block assignments collapse in the
    partial dict (anchor = min over assignments, as in batch), and a
    chain's completions all happen at its last TIMESTAMP — events are
    processed in same-timestamp GROUPS (distinct types per ts, the
    batch twin's (key, type, ts) identity), completions dedup by
    chain across the whole group, and strategy memory judges a
    group's candidates as one same-end batch (ADVICE r9: one-at-a-time
    processing double-emitted chains completable through two same-ts
    events and let the first completion's memory suppress same-end
    ties the batch walk keeps). Skip strategies are ONLINE by
    construction — Flink defines them in completion order, which is
    exactly arrival order here:
    skip_to_next remembers emitted starts, skip_past_last_event a
    resume point, skip_to_first/skip_to_last the discard-interval
    list; each memory self-prunes once the event time passes its
    relevance (a future start can never land inside an interval whose
    end precedes it).

    State is bounded by the enumeration fanout inside ONE ``within``
    horizon per key — the same documented explosion as Flink's
    skip-till-any-match NFA — plus the self-pruning strategy memory;
    an event-time timer sweeps keys whose horizons all closed. With a
    ``cap``, a key that emitted anything keeps a compact counter row
    after quiescence (no timer) so the cap stays per-key TOTAL like
    the batch operator's, not per-activity-burst (ADVICE r9).
    Serialized as one json string (variable-length chains).

    ``conditions`` (1-based block index -> ``(v, vsum, vcnt, vmin,
    vmax) -> bool``) is the live face of the batch operator's
    ITERATIVE CONDITIONS: each partial carries the chain's running
    value aggregates, a candidate consumption checks its block's
    predicate against them (the seed is never conditioned), and a
    same-ts group resolves duplicate (type, ts) values MIN-first —
    the batch identity. Python callables here (the automaton is
    already per-event Python) mirror the batch side's SQL strings;
    the stream ≡ batch test passes an equivalent pair.

    ``consecutive`` (1-based block indices) is the live face of the
    batch looping contiguity: the state carries a per-key arrival
    SEQUENCE counter over distinct (type, ts) events (same-ts group
    members numbered in type order — exactly the batch rank's
    (ts, type) order under the in-order arrival contract), each
    partial remembers its last consumed sequence number, and a
    consecutive block's 2nd..nth consumption requires seq = last + 1.
    The counter lives only while the key's row does; an era restart
    after full quiescence is sound because adjacency is a DIFFERENCE
    and no live chain can span a fully-drained gap.

    ``until`` (1-based unbounded block index -> ``(v, event_type) ->
    bool``) / ``greedy`` / unbounded blocks (``mx = None``) are the
    live faces of the r10 batch features: an unbounded block's run
    contiguity rides per-(key, TYPE) candidate sequences (``st["tq"]``
    — same era-restart argument as the all-events counter); stop
    timestamps accumulate per until block (``st["stops"]``, pruned
    once older than one horizon: any partial that could still need
    one would contradict its own within window) and a consumption in
    block >= i from a partial whose last event sits in block <= i is
    rejected when a stop falls STRICTLY between — the batch lastns
    conjunct, with the same same-ts tie rule; a greedy partial picks
    up an exit DEADLINE (``dl`` in its extras) the moment a
    consumable run candidate passes unconsumed (within the chain's
    horizon), after which it may exit at-or-before the deadline and
    is pruned once the clock passes it. Extras are positional:
    [anchor][vsum vcnt vmin vmax][lastr][lasttq][dl].

    STATE-SCHEMA NOTE (r10): pre-r10 checkpoints deserialize fine —
    the json state only GAINS optional keys (tq/stops, setdefault'd)
    and extras lists only lengthen for queries that opt into the new
    features, which no pre-r10 query could have."""
    import json as _json

    k_blocks = len(blocks)
    types = [b[0] for b in blocks]
    mns = [b[1] for b in blocks]
    mxs = [b[2] for b in blocks]
    valued = bool(conditions) or until_reads_value
    conditions = conditions or {}
    ranked = bool(consecutive)
    consecutive = consecutive or set()
    until = until or {}
    greedy = greedy or set()
    # unbounded blocks under default (relaxed) loop contiguity carry a
    # per-(key, type) candidate sequence — the live face of the batch
    # __tr rank; consecutive pins the stricter all-events rank instead
    tranked = any(
        mx is None and (i + 1) not in consecutive
        for i, mx in enumerate(mxs)
    )
    has_greedy = bool(greedy)
    composite = valued or ranked or tranked or has_greedy
    # positional extras layout: [anchor][vsum vcnt vmin vmax][lastr]
    # [lasttq][dl]
    _LASTR_AT = 1 + 4 * valued
    _LASTTQ_AT = _LASTR_AT + (1 if ranked else 0)
    _DL_AT = _LASTTQ_AT + (1 if tranked else 0)
    anchored = strategy in ("skip_to_first", "skip_to_last")
    tail_optional = [False] * k_blocks  # blocks after i all optional?
    opt = True
    for i in range(k_blocks - 1, -1, -1):
        tail_optional[i] = opt
        opt = opt and mns[i] == 0

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = _json.loads(state.get[0])
        else:
            st = {"p": {}, "R": None, "starts": [], "ivls": [], "n": 0}
        # partials dict: key "b|taken|c1,c2,.." -> anchor (or None);
        # composite modes store a LIST instead — [anchor(, vsum, vcnt,
        # vmin, vmax)(, lastr)] — and only the anchor ever needs
        # merging: a chain's value aggregates and last-event sequence
        # are functions of its event set, identical across duplicate
        # block assignments.
        parts: dict = st["p"]
        st.setdefault("q", 0)  # arrival-sequence counter (ranked mode)
        st.setdefault("tq", {})  # per-type candidate sequences (unbounded)
        st.setdefault("stops", {})  # per-until-block stop timestamps
        out: list[tuple] = []

        def val_anchor(val):
            return val[0] if composite else val

        def merge_anchor(val, anchor):
            old = val[0] if composite else val
            m = (
                anchor
                if old is None
                else old
                if anchor is None
                else min(old, anchor)
            )
            return [m, *val[1:]] if composite else m

        def pkey(chain, b, taken):
            return f"{b}|{taken}|{','.join(map(str, chain))}"

        def punpack(s):
            b, taken, cs = s.split("|")
            return [int(x) for x in cs.split(",")], int(b), int(taken)

        def emit(chain):
            out.append(
                (
                    key[0],
                    chain[0],
                    chain[-1],
                    len(chain),
                    "|".join(map(str, chain)),
                )
            )
            st["n"] += 1

        def prune_vs_ts(ts: int) -> None:
            """Drop dead partials and stale strategy memory: nothing
            arriving at >= ts can extend/collide with them."""
            dead = [
                s for s in parts if punpack(s)[0][0] + within_us < ts
            ]
            if has_greedy:
                # a greedy partial whose exit deadline passed can
                # neither extend (its run's next candidate took the
                # sequence slot) nor proceed (exits must be <= dl)
                dead += [
                    s
                    for s, val in parts.items()
                    if s not in dead
                    and val[_DL_AT] is not None
                    and val[_DL_AT] < ts
                ]
            for s in dead:
                del parts[s]
            for i in list(st["stops"]):
                # a stop matters only while some live partial's last
                # event precedes it; any such partial's horizon covers
                # it, so stops older than one horizon are dead weight
                st["stops"][i] = [
                    u for u in st["stops"][i] if u + within_us >= ts
                ]
            st["starts"] = [x for x in st["starts"] if x >= ts]
            st["ivls"] = [iv for iv in st["ivls"] if iv[1] > ts]
            if st["R"] is not None and st["R"] < ts:
                st["R"] = None

        if state.hasTimedOut:
            wm_us = state.getCurrentWatermarkMs() * 1000
            prune_vs_ts(wm_us + 1)
            if parts or st["starts"] or st["ivls"] or st["R"] is not None:
                state.update((_json.dumps(st),))
                state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
            elif cap is not None and st["n"] > 0:
                # the batch operator's cap is per-key TOTAL: keep the
                # emitted-match counter (a compact row, no timer —
                # nothing left to prune) so a key that reached its cap
                # cannot emit again after quiescence (ADVICE r9)
                state.update((_json.dumps(st),))
            else:
                state.remove()
            return

        chunks = list(pdf_iter)
        pdf = (
            pd.concat(chunks, ignore_index=True)
            .sort_values(["ts_us", "__tb"])
            if chunks
            else pd.DataFrame(columns=["ts_us", "event_type", "__v"])
        )
        # SAME-TIMESTAMP grouping (ADVICE r9 medium): the batch twin
        # identifies events by distinct (key, type, ts) and its
        # completion-order walks emit same-end ties TOGETHER before
        # their strategy memory applies. Processing same-ts events one
        # at a time would (a) emit the same ts-chain twice under
        # no_skip when two same-ts events of different types complete
        # it through different block assignments (distinct partial
        # keys, so the per-event chain dedup never sees the pair), and
        # (b) let the first same-ts completion's starts/R/ivls memory
        # wrongly suppress same-end ties the batch walk keeps. So:
        # fork + completion collection run once per distinct
        # timestamp, chains dedup across the whole group, and the
        # strategy judges the group's candidates against the memory in
        # force when the group OPENED. Extensions only ever come from
        # pre-group partials (chains are strictly increasing, so a
        # same-ts event can never extend a chain the group created).
        if valued:
            rows = list(zip(pdf["ts_us"], pdf["event_type"], pdf["__v"]))
        else:
            rows = list(zip(pdf["ts_us"], pdf["event_type"]))
        i = 0
        while i < len(rows):
            ts = int(rows[i][0])
            # distinct types at this ts; valued mode resolves duplicate
            # (type, ts) pairs MIN-first (the batch identity)
            group: dict[str, float | None] = {}
            while i < len(rows) and int(rows[i][0]) == ts:
                et = str(rows[i][1])
                v = float(rows[i][2]) if valued else None
                if et not in group or (valued and v < group[et]):
                    group[et] = v
                i += 1
            if cap is not None and st["n"] >= cap:
                break
            prune_vs_ts(ts)
            if ranked:
                # arrival sequence numbers for this ts-group, assigned
                # in TYPE order (the batch rank's (ts, type) order)
                seqs = {
                    et: st["q"] + 1 + j for j, et in enumerate(sorted(group))
                }
                st["q"] += len(group)
            if tranked:
                # per-TYPE candidate sequences — the live face of the
                # batch __tr rank (every distinct (type, ts) event of
                # a type increments that type's counter)
                tseqs = {et: st["tq"].get(et, 0) + 1 for et in group}
                for et in group:
                    st["tq"][et] = tseqs[et]
            for ui, ufn in until.items():
                # record stop timestamps BEFORE forking: gap checks
                # compare strictly, so a same-group stop never kills a
                # consumption at its own timestamp (the declared tie
                # rule), while later groups see it
                if any(ufn(v, et) for et, v in group.items()):
                    st["stops"].setdefault(str(ui), []).append(ts)
            # FORK extensions of every live partial (the original
            # survives — skip-till-any-match), plus the seed.
            fresh: dict = {}

            def fork(chain, b, taken, anchor, extras=()):
                kk = pkey(chain, b, taken)
                if kk in parts:
                    parts[kk] = merge_anchor(parts[kk], anchor)
                    return
                if kk in fresh:
                    fresh[kk] = merge_anchor(fresh[kk], anchor)
                    return
                fresh[kk] = [anchor, *extras] if composite else anchor

            for etype, v in group.items():
                seq = seqs[etype] if ranked else None
                for s, pval in list(parts.items()):
                    chain, b, taken = punpack(s)
                    if ts <= chain[-1] or ts > chain[0] + within_us:
                        continue
                    panchor = val_anchor(pval)
                    aggs = pval[1:5] if valued else None
                    lastr = pval[_LASTR_AT] if ranked else None
                    lasttq = pval[_LASTTQ_AT] if tranked else None
                    dl = pval[_DL_AT] if has_greedy else None
                    # epsilon closure: this partial may also stand at
                    # the start of any later block once its own
                    # minimum is met
                    bb, tt = b, taken
                    positions = [(bb, tt)]
                    while tt >= mns[bb] and bb + 1 < k_blocks:
                        bb, tt = bb + 1, 0
                        positions.append((bb, tt))
                    for pb, pt in positions:
                        if etype == types[pb] and (
                            mxs[pb] is None or pt < mxs[pb]
                        ):
                            chk = conditions.get(pb + 1)
                            if valued and chk and not chk(v, *aggs):
                                continue  # iterative condition failed
                            if (
                                ranked
                                and pt >= 1
                                and (pb + 1) in consecutive
                                and seq != lastr + 1
                            ):
                                continue  # looping contiguity broken
                            if (
                                mxs[pb] is None
                                and pt >= 1
                                and (pb + 1) not in consecutive
                                and tseqs[etype] != lasttq + 1
                            ):
                                continue  # loop run contiguity broken
                            ufn = until.get(pb + 1)
                            if ufn is not None and ufn(v, etype):
                                continue  # the loop never takes a stop
                            if has_greedy and dl is not None and ts > dl:
                                # greedy: an unconsumed run candidate
                                # forced the exit deadline
                                continue
                            if any(
                                pb + 1 >= ui and b + 1 <= ui
                                and any(
                                    chain[-1] < u < ts
                                    for u in st["stops"].get(str(ui), ())
                                )
                                for ui in until
                            ):
                                continue  # stop strictly inside a gap
                            a = panchor
                            if anchored and pb + 1 == skip_block:
                                # "last": every consumed event
                                # re-anchors; "first": coalesce — only
                                # the block's first consumed event
                                # sets it
                                a = (
                                    ts
                                    if strategy == "skip_to_last"
                                    or panchor is None
                                    else panchor
                                )
                            extras = []
                            if valued:
                                extras += [
                                    aggs[0] + v,
                                    aggs[1] + 1,
                                    min(aggs[2], v),
                                    max(aggs[3], v),
                                ]
                            if ranked:
                                extras.append(seq)
                            if tranked:
                                extras.append(
                                    tseqs[etype]
                                    if (
                                        mxs[pb] is None
                                        and (pb + 1) not in consecutive
                                    )
                                    else None
                                )
                            if has_greedy:
                                extras.append(None)  # dl: run alive
                            fork(chain + [ts], pb, pt + 1, a, extras)
                if etype == types[0] and not (
                    1 in until and until[1](v, etype)
                ):
                    a = (
                        ts
                        if anchored and skip_block == 1
                        else None
                    )
                    # the seed is never conditioned (no prior chain)
                    extras = []
                    if valued:
                        extras += [v, 1, v, v]
                    if ranked:
                        extras.append(seq)
                    if tranked:
                        extras.append(
                            tseqs[etype]
                            if (mxs[0] is None and 1 not in consecutive)
                            else None
                        )
                    if has_greedy:
                        extras.append(None)
                    fork([ts], 0, 1, a, extras)
            # completions among the NEW forks: minimum met and every
            # later block optional — dedup identical chains across the
            # WHOLE group (min anchor; two same-ts events of different
            # types can complete the same ts-chain through different
            # block assignments), order chain-lexicographically
            # (same-end batch ties rank by chain). With complete_at
            # (pattern GROUPS), emission happens EXCLUSIVELY at the
            # listed repetition-boundary blocks — all-or-nothing per
            # repetition; the partial still survives to consume the
            # next repetition (skip-till-any).
            comps: dict[tuple, int | None] = {}
            for s, val in fresh.items():
                chain, b, taken = punpack(s)
                anchor = val_anchor(val)
                if taken >= mns[b] and (
                    b in complete_at
                    if complete_at is not None
                    else tail_optional[b]
                ):
                    c = tuple(chain)
                    old = comps.get(c, "missing")
                    if old == "missing":
                        comps[c] = anchor
                    else:
                        comps[c] = (
                            anchor
                            if old is None
                            else old
                            if anchor is None
                            else min(old, anchor)
                        )
                parts[s] = val
            if has_greedy:
                # an unconsumed run candidate ends every live run it
                # immediately follows: the partial's future exits must
                # happen at-or-before the candidate (the batch lastlead
                # conjunct); candidates beyond the chain's horizon are
                # exempt (the run could not have extended anyway).
                # Fresh forks that consumed the candidate carry its
                # sequence, so lasttq == tseq - 1 never flags them.
                for g in sorted(greedy):
                    gt = types[g - 1]
                    if gt not in group:
                        continue
                    for s, val in parts.items():
                        chain, b, taken = punpack(s)
                        if (
                            b + 1 == g
                            and taken >= 1
                            and val[_DL_AT] is None
                            and val[_LASTTQ_AT] == tseqs[gt] - 1
                            and ts <= chain[0] + within_us
                        ):
                            val[_DL_AT] = ts
            if not comps:
                continue
            cands = sorted(comps)  # chain-lex among same-end ties
            if strategy == "no_skip":
                for c in cands:
                    emit(list(c))
            elif strategy == "skip_to_next":
                for c in cands:
                    if c[0] in st["starts"]:
                        continue
                    emit(list(c))
                    st["starts"].append(c[0])
                # discard partials sharing an emitted start
                for s in [
                    s
                    for s in parts
                    if punpack(s)[0][0] in st["starts"]
                ]:
                    del parts[s]
            elif strategy == "skip_past_last_event":
                batch = [
                    c
                    for c in cands
                    if st["R"] is None or c[0] > st["R"]
                ]
                for c in batch:
                    emit(list(c))
                if batch:
                    st["R"] = ts
                    for s in [
                        s
                        for s in parts
                        if punpack(s)[0][0] <= st["R"]
                    ]:
                        del parts[s]
            else:  # skip_to_first / skip_to_last
                batch = [
                    c
                    for c in cands
                    if not any(
                        lo <= c[0] < hi for lo, hi in st["ivls"]
                    )
                ]
                for c in batch:
                    emit(list(c))
                    a = comps[c]
                    if a is not None and a > c[0]:
                        st["ivls"].append([c[0], a])
                for s in [
                    s
                    for s in parts
                    if any(
                        lo <= punpack(s)[0][0] < hi
                        for lo, hi in st["ivls"]
                    )
                ]:
                    del parts[s]

        if parts or st["starts"] or st["ivls"] or st["R"] is not None:
            state.update((_json.dumps(st),))
            horizon_ms = (
                max(punpack(s)[0][0] for s in parts) + within_us
            ) // 1000 + 1 if parts else state.getCurrentWatermarkMs() + 1
            if horizon_ms > state.getCurrentWatermarkMs():
                state.setTimeoutTimestamp(horizon_ms)
        elif cap is not None and st["n"] > 0:
            # per-key-TOTAL cap memory survives quiescence (see the
            # timed-out branch) — a compact counter row, no timer
            state.update((_json.dumps(st),))
        elif state.exists:
            state.remove()
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "start_us", "end_us", "n_events", "chain_str",
                ],
            )

    return fn


def cep_all_matches_stream(
    events: DataFrame,
    steps: list[str | tuple[str, int, int]],
    within: str,
    strategy: str = "no_skip",
    skip_block: int | None = None,
    max_matches_per_key: int | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    watermark_delay: str = "0 seconds",
    conditions: dict | None = None,
    value_col: str = "value",
    consecutive: set[int] | None = None,
    until: dict[int, str] | None = None,
    greedy: set[int] | None = None,
    _complete_at: set[int] | None = None,
) -> DataFrame:
    """Streaming ALL-matches CEP enumeration with the full after-match
    skip-strategy enum — the live twin of
    operators/cep.py::cep_after_match_skip (all five strategies; same
    ``steps`` block syntax, same anchored ``skip_block``). Emits one
    append-mode row per kept match: (user_id, start_ts, end_ts,
    n_events, chain_str). The batch operator's ``match_no`` is the
    chain-lexicographic rank among kept matches, which is not
    computable online — streaming emits in COMPLETION order (Flink's
    actual emission) and carries no rank; the stream ≡ batch test
    compares the kept-match SETS. ``max_matches_per_key`` caps in
    emission order (Flink's runtime behavior; batch's cap is
    chain-lex — pass None to compare against an uncapped batch run).
    In-order arrival per key is the contract, as for the other
    automata. ``conditions`` (1-based block index -> the batch
    operator's SQL condition STRING, compiled here through the shared
    restricted grammar — one spec drives both engines, VERDICT r9
    item 4 — or a ``(v, vsum, vcnt, vmin, vmax) -> bool`` callable)
    adds the batch operator's ITERATIVE CONDITIONS. ``consecutive``
    (1-based block indices) adds the looping contiguity of
    cep_all_matches(consecutive=...) via a per-key arrival-sequence
    counter in state (see _make_cep_am_fn).

    UNBOUNDED looping blocks (``(type, m, None)`` — oneOrMore /
    timesOrMore), ``until`` (1-based unbounded block index -> stop
    SQL string over ``__v`` / ``event_type``, the SAME string the
    batch operator takes) and ``greedy`` mirror
    cep_all_matches(until=..., greedy=...) under the no_skip
    strategy: loop-run contiguity rides a per-(key, type) candidate
    sequence in state, stop timestamps accumulate per key (pruned
    past one horizon) and kill exactly the chains whose loop gaps
    they fall strictly inside, and a greedy partial picks up an exit
    DEADLINE the moment a consumable run candidate passes unconsumed.
    The NFA never needs the batch side's data-dependent slot bound —
    it loops as long as the data does, so the stream ≡ batch test
    independently cross-checks that bound."""
    from flink_realtime_edu_spark.operators.cep import (
        _normalize_blocks,
        compile_condition,
        compile_stop,
    )

    blocks = _normalize_blocks(steps)
    strategies = (
        "no_skip",
        "skip_to_next",
        "skip_past_last_event",
        "skip_to_first",
        "skip_to_last",
    )
    if strategy not in strategies:
        raise ValueError(f"strategy must be one of {strategies}")
    anchored = strategy in ("skip_to_first", "skip_to_last")
    if anchored and (
        skip_block is None or not 1 <= skip_block <= len(blocks)
    ):
        raise ValueError("anchored strategies need a valid skip_block")
    if not anchored and skip_block is not None:
        raise ValueError(f"{strategy} does not take skip_block")
    if conditions:
        bad = [b for b in conditions if not 1 <= b <= len(blocks)]
        if bad:
            raise ValueError(
                f"condition block indices {bad} outside [1, {len(blocks)}]"
            )
    if consecutive:
        bad = [b for b in consecutive if not 1 <= b <= len(blocks)]
        if bad:
            raise ValueError(
                f"consecutive block indices {bad} outside [1, {len(blocks)}]"
            )
    unbounded = {i for i, (_, _, mx) in enumerate(blocks, 1) if mx is None}
    if unbounded and strategy != "no_skip":
        raise ValueError(
            "unbounded looping blocks are supported under the no_skip "
            "strategy only (batch parity)"
        )
    if until:
        bad = [b for b in until if b not in unbounded]
        if bad:
            raise ValueError(
                f"until applies only to unbounded looping blocks; {bad} "
                f"are bounded"
            )
    if conditions and unbounded & set(conditions):
        raise ValueError(
            "iterative conditions are not supported on unbounded blocks; "
            "use until to stop a loop on data"
        )
    if greedy:
        bad = [g for g in greedy if g not in unbounded]
        if bad:
            raise ValueError(
                f"greedy applies only to unbounded looping blocks; {bad} "
                f"are bounded"
            )
        if len(blocks) in greedy:
            raise ValueError(
                "a greedy block must not be the pattern's last element "
                "(Flink parity)"
            )
        if consecutive and greedy & consecutive:
            raise ValueError(
                "greedy + consecutive on one block is not supported"
            )
    # one spec string drives both engines: strings compile through the
    # shared restricted grammar, callables pass through (legacy)
    conditions = {
        b: compile_condition(c) if isinstance(c, str) else c
        for b, c in (conditions or {}).items()
    } or None
    until_reads_value = any(
        re.search(r"\b__v\b", s) for s in (until or {}).values()
    )
    until_fns = {
        b: compile_stop(s) for b, s in (until or {}).items()
    } or None
    within_us = _parse_within_us(within)
    cols = [
        F.col(key_col).alias("user_id"),
        F.col(ts_col),
        F.unix_micros(ts_col).alias("ts_us"),
        F.col(type_col).alias("event_type"),
        F.col(tiebreak_col).alias("__tb"),
    ]
    if conditions or until_reads_value:
        cols.append(F.col(value_col).cast("double").alias("__v"))
        # valued-mode event identity excludes NULL-valued rows on BOTH
        # engines (ADVICE r10: float(None) would crash the NFA here,
        # while the batch twin's MIN(value) silently ignored them —
        # the shared contract is now an explicit IS NOT NULL on the
        # valued event set, see operators/cep.py::_enumerate_matches)
        events = events.filter(F.col(value_col).isNotNull())
    prepared = events.withWatermark(ts_col, watermark_delay).select(*cols)
    out = prepared.groupBy("user_id").applyInPandasWithState(
        _make_cep_am_fn(
            blocks,
            within_us,
            strategy,
            skip_block,
            max_matches_per_key,
            conditions,
            consecutive,
            until=until_fns,
            greedy=greedy,
            until_reads_value=until_reads_value,
            complete_at=_complete_at,
        ),
        outputStructType=CEP_AM_OUTPUT_SCHEMA,
        stateStructType=CEP_AM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.select(
        "user_id",
        F.timestamp_micros("start_us").alias("start_ts"),
        F.timestamp_micros("end_us").alias("end_ts"),
        "n_events",
        "chain_str",
    )


def cep_group_times_stream(
    events: DataFrame,
    group: list[str | tuple[str, int, int]],
    times: tuple[int, int],
    within: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming PATTERN GROUPS — the live twin of
    operators/cep.py::cep_group_times (``Pattern.begin(sub)
    .times(m, n)``). Where the batch operator unions one flattened
    enumeration per repeat count, the stream runs ONE NFA over the
    fully-flattened ``group × n`` block list whose completions fire
    exclusively at REPETITION BOUNDARIES reachable after ``m`` full
    passes — the same all-or-nothing semantics without parallel
    stateful branches (Spark restricts unions of stateful operators).
    A partial that emits at boundary r survives to consume repetition
    r + 1, exactly the batch union's longer chains; identical event
    sets dedup in the per-group completion dict as usual.

    Restriction: the group's LAST block must be non-optional
    (``mn >= 1``) — a skipped trailing optional would complete with
    its last consumption outside the boundary block, which the
    boundary rule cannot see; the batch operator keeps full
    generality."""
    from flink_realtime_edu_spark.operators.cep import _normalize_blocks

    m, n = times
    if not 1 <= m <= n:
        raise ValueError(f"group times needs 1 <= m <= n, got {times}")
    base = _normalize_blocks(group)
    if any(mx is None for _, _, mx in base):
        raise ValueError(
            "unbounded blocks inside a repeated group are not supported"
        )
    if base[-1][1] < 1:
        raise ValueError(
            "the streaming group twin needs a non-optional last block "
            "in the group (min >= 1)"
        )
    complete_at = {len(base) * r - 1 for r in range(m, n + 1)}
    return cep_all_matches_stream(
        events,
        list(base) * n,
        within,
        key_col=key_col,
        ts_col=ts_col,
        type_col=type_col,
        tiebreak_col=tiebreak_col,
        watermark_delay=watermark_delay,
        _complete_at=complete_at,
    )


CEP_STRICT_OUTPUT_SCHEMA = "user_id BIGINT, start_us BIGINT, end_us BIGINT"
CEP_STRICT_STATE_SCHEMA = "types ARRAY<STRING>, ts_us ARRAY<LONG>"


def _make_cep_strict_fn(steps: list[str], within_us: int | None):
    """State fn for strict-contiguity (next) streaming matches: the
    state is a ring buffer of the key's last k−1 events (type + ts),
    so a pattern spanning a micro-batch boundary still fires. Every
    match position emits, exactly like the batch lead-conjunction
    (overlapping runs of length n emit n−k+1 matches)."""
    k = len(steps)

    def fn(key, pdf_iter, state):
        if state.exists:
            types, ts = state.get
            types, ts = list(types), list(ts)
        else:
            types, ts = [], []
        out = []
        # Global per-key sort across ALL Arrow chunks of the
        # micro-batch (chunk-local sorts are not a global order —
        # see _make_cep_fn).
        chunks = list(pdf_iter)
        pdf = (
            pd.concat(chunks, ignore_index=True).sort_values(["ts_us", "__tb"])
            if chunks
            else pd.DataFrame(columns=["ts_us", "event_type"])
        )
        for t_us, etype in zip(pdf["ts_us"], pdf["event_type"]):
            types.append(str(etype))
            ts.append(int(t_us))
            if len(types) > k:
                del types[0], ts[0]
            if len(types) == k and types == steps:
                if within_us is None or ts[-1] - ts[0] <= within_us:
                    out.append((key[0], ts[0], ts[-1]))
        # Carry only the longest suffix that is a PREFIX of steps (the
        # KMP failure-function insight): any other tail can never be
        # part of a future consecutive match, so most keys carry no
        # state at all — the store stays O(keys mid-pattern).
        carry = 0
        for j in range(min(len(types), k - 1), 0, -1):
            if types[-j:] == steps[:j]:
                carry = j
                break
        if carry:
            state.update((types[-carry:], ts[-carry:]))
        elif state.exists:
            state.remove()
        if out:
            yield pd.DataFrame(out, columns=["user_id", "start_us", "end_us"])

    return fn


def cep_strict_matches_stream(
    events: DataFrame,
    steps: list[str],
    within: str | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Streaming strict-contiguity CEP (Flink `next`): every position
    where a key's CONSECUTIVE events spell ``steps`` — the live form
    of operators/cep.py::cep_strict_matches, which the
    stream-equals-batch test pins. State per key is the last k−1
    events (a bounded ring buffer, independent of stream length), so
    matches crossing micro-batch boundaries fire correctly; in-order
    arrival per key is the contract, as for the other CEP automata."""
    if len(steps) < 2:
        raise ValueError("a CEP pattern needs at least 2 steps")
    within_us = None if within is None else _parse_within_us(within)
    prepared = events.select(
        F.col(key_col).alias("user_id"),
        F.unix_micros(ts_col).alias("ts_us"),
        F.col(type_col).alias("event_type"),
        F.col(tiebreak_col).alias("__tb"),
    )
    out = prepared.groupBy("user_id").applyInPandasWithState(
        _make_cep_strict_fn(steps, within_us),
        outputStructType=CEP_STRICT_OUTPUT_SCHEMA,
        stateStructType=CEP_STRICT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.select(
        "user_id",
        F.timestamp_micros("start_us").alias("start_ts"),
        F.timestamp_micros("end_us").alias("end_ts"),
    )
