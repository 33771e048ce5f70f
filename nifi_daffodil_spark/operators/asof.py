"""As-of join (backward/forward, optional tolerance) — a custom operator
Spark has no built-in for.

For each left row, attach the NEAREST right row of the same key at or
before (backward) / at or after (forward) its timestamp, optionally
nulling matches farther than a max time gap (the standard trades/quotes,
event/state-prevailing shape; the direction+tolerance surface mirrors
DuckDB's ASOF comparison-op family). No reference analog (nifi-daffodil is record-at-a-time); this is a
training-data/analytics addition in the task directive's "operator Spark
lacks" slot, oracle-checked against DuckDB's native ASOF JOIN.

Spark-first re-expression (no range-condition join, which Catalyst would
plan as a broadcast-nested-loop or cartesian over the time dimension):

    union(left tagged 1, right tagged 0)
      -> window per key ORDER BY (ts, side) ROWS UNBOUNDED PRECEDING..CURRENT
      -> last(right-payload struct, ignorenulls=True)
      -> keep left rows

One shuffle on the key, one sort — the same cost as a groupBy over the
union; works at any key cardinality and any time density, no interval
explosion. The right payload travels as ONE struct so the matched columns
always come from the SAME right row (per-column last() could mix rows on
ties).

Determinism: at equal (key, ts) the right row sorts before the left row
(side 0 < 1), matching DuckDB's `l.ts >= r.ts` inclusive semantics. Rows
within the right side that share (key, ts) are ambiguous by definition —
callers should pre-dedup (e.g. row_number by a tiebreak column) as the
graded query does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    right_cols: dict[str, str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join, backward or forward, with optional max-gap tolerance.

    right_cols: {right column -> output alias} for the payload carried from
    the matched right row (defaults to every right column except the key
    and timestamp). Unmatched left rows keep the payload columns null
    (LEFT-join semantics).

    direction: 'backward' (default) matches the LATEST right row with
    r.ts <= l.ts (DuckDB `l.ts >= r.ts`); 'forward' matches the EARLIEST
    right row with r.ts >= l.ts (DuckDB `l.ts <= r.ts`). Forward is the
    same one-shuffle window plan with the time axis reversed (ORDER BY ts
    DESC) — still no range join, still no interval explosion.

    tolerance: max allowed |l.ts - r.ts| in SECONDS (fractional ok,
    microsecond resolution); a match farther away is nulled out. Because
    the as-of match is the NEAREST qualifying right row, nulling a
    too-distant match can never hide a closer one — which is also why the
    oracle can apply tolerance as a CASE over DuckDB's native ASOF result.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_cols is None:
        right_cols = {
            c: f"{c}_r" for c in right.columns if c not in (on, ts)
        }
    payload_fields = [F.col(c).alias(alias) for c, alias in right_cols.items()]
    if tolerance is not None:
        # the matched right row's own ts rides along for the tolerance check
        # (hidden — stripped from the output projection). Only packed when a
        # tolerance is set: the default path shouldn't shuffle a redundant
        # timestamp copy per right row.
        if "_rts" in right_cols.values():
            raise ValueError("right_cols alias '_rts' is reserved")
        payload_fields.append(F.col(ts).alias("_rts"))
    payload = F.struct(*payload_fields)
    # NULL-ts right rows must never match: under asc ordering they would
    # sort FIRST and their payload would propagate to every left row of the
    # key, where SQL ASOF (`l.ts >= r.ts` is NULL) matches nothing
    r = right.filter(F.col(ts).isNotNull()).select(
        F.col(on), F.col(ts), F.lit(0).alias("_side"), payload.alias("_rpay")
    )
    l_cols = left.columns
    lpay_type = r.schema["_rpay"].dataType
    l = left.select(
        *l_cols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(lpay_type).alias("_rpay"),
    )
    # align schemas: right rows carry nulls for the left-only columns
    r_full = r.select(
        *[
            F.col(c) if c in (on, ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_cols
        ],
        "_side",
        "_rpay",
    )
    u = l.unionByName(r_full)
    # backward walks time ascending (preceding rows have r.ts <= l.ts);
    # forward walks it descending (preceding rows have r.ts >= l.ts). In
    # both, _side 0 < 1 puts the equal-ts right row BEFORE the left row —
    # the inclusive bound — and last(ignorenulls) picks the frame row
    # closest to current, i.e. the NEAREST qualifying right row.
    ts_ord = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(on)
        .orderBy(ts_ord, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
    # NULL-ts LEFT rows must never match either: SQL ASOF's comparison is
    # NULL. Backward ordering (asc = NULLS FIRST) happens to give them no
    # preceding right row, but forward ordering (desc = NULLS LAST) sorts
    # them AFTER every right row and last() would hand them the min-ts
    # right payload — so null the match explicitly for both directions.
    matched = matched.withColumn(
        "_m", F.when(F.col(ts).isNotNull(), F.col("_m"))
    )
    if tolerance is not None:
        # exact micros gap via timestampdiff: pure timestamp arithmetic,
        # no session-timezone dependence (the previous ntz->timestamp->
        # unix_micros casts applied the session offset per-value, so two
        # timestamps straddling a DST change in a non-UTC session would
        # shift the gap by the offset delta)
        tol_us = int(round(float(tolerance) * 1_000_000))
        # the ts name is caller-supplied: backtick-quote it so names needing
        # quoting (spaces, dashes, reserved words) parse — F.expr sees raw SQL
        gap = F.abs(F.expr(f"timestampdiff(MICROSECOND, _m._rts, `{ts}`)"))
        matched = matched.withColumn(
            "_m", F.when(gap <= F.lit(tol_us), F.col("_m"))
        )
    out = matched.filter(F.col("_side") == 1).select(
        *l_cols,
        *[F.col(f"_m.{alias}").alias(alias) for alias in right_cols.values()],
    )
    return out
