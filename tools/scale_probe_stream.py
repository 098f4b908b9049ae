"""10x event-volume scale probe for the stateful streaming family
(SCALE.md; VERDICT r6 #2 — the one family without a probe until now).

Claims under test, per stateful operator:

- ``running_user_totals`` (applyInPandasWithState): state is O(|users|)
  — two longs per user — so 10x the event volume over the SAME user
  population must leave the final state-store row count unchanged, and
  per-batch wall must track batch size (rows/sec roughly flat).
- ``sessionized_event_counts`` (session_window + watermark): state is
  bounded by OPEN sessions, not corpus — rows in state must stay
  bounded as the watermark finalizes old sessions during the replay.
- ``deduped_event_counts`` (dropDuplicatesWithinWatermark): seen-key
  state is evicted as the watermark passes; end-of-replay state must
  hold only the keys inside the final watermark horizon, NOT all keys
  ever seen (the property that distinguishes it from dropDuplicates,
  whose state would be 2x corpus).

Method: synthesize events over a fixed population (200 users) and a
fixed 8-day time span at 1x and 10x row counts, write them as 16
time-ranged parquet files with increasing mtimes (the exact-replay
transport from plans/streamq._replay_input), stream with
maxFilesPerTrigger=1 (16 micro-batches), and read per-batch wall,
input rows, and state-store rows from ``query.recentProgress`` — the
same StateOperatorProgress a production monitor scrapes.

Usage: python tools/scale_probe_stream.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ["PYTHONPATH"] = os.pathsep.join(
    [str(REPO)]
    + ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH") else [])
)

from pyspark.sql import functions as F  # noqa: E402

SIZES = [("1x", 20_000), ("10x", 200_000)]
N_USERS = 200
N_FILES = 16
SPAN_H = 192  # 8 days of event time, so watermarks advance mid-replay


def _make_input(spark, n_rows: int) -> str:
    """Deterministic synthetic events over a fixed user population and
    time span, written as N_FILES time-ranged files (increasing
    mtimes) so any maxFilesPerTrigger replays in event-time order."""
    d = tempfile.mkdtemp(prefix="stream_probe_")
    os.makedirs(f"{d}/in")
    per = n_rows // N_FILES
    ev = spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        # event time increases with id: file i covers one contiguous
        # time slice, exactly the _replay_input property
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") * (SPAN_H * 3600 // n_rows))
        ).alias("ts"),
        F.pmod(F.xxhash64("id"), F.lit(N_USERS)).alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(3)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(13)), F.lit(10_000)) / 100.0).alias(
            "value"
        ),
        F.lit("{}").alias("props"),
    )
    for i in range(N_FILES):
        part = ev.filter(
            (F.col("event_id") >= i * per)
            & (
                F.col("event_id") < (i + 1) * per
                if i < N_FILES - 1
                else F.lit(True)
            )
        )
        tmp = f"{d}/__w{i}"
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = f"{d}/in/part-{i:04d}.parquet"
        shutil.move(os.path.join(tmp, src), dst)
        shutil.rmtree(tmp)
        base = 1_600_000_000 + i
        os.utime(dst, (base, base))
    return d


def _run(spark, d: str, op_name: str, agg_fn, output_mode: str):
    """Replay with maxFilesPerTrigger=1 and scrape recentProgress."""
    import uuid

    from web_attack_detection_spark.streaming.windows import (
        stream_events_from_dir,
    )

    name = f"probe_{uuid.uuid4().hex[:8]}"
    src = stream_events_from_dir(spark, f"{d}/in", max_files_per_trigger=1)
    t0 = time.perf_counter()
    q = (
        agg_fn(src)
        .writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        wall = time.perf_counter() - t0
        prog = [p for p in q.recentProgress if p["numInputRows"] > 0]
        batches = [
            {
                "rows": p["numInputRows"],
                "ms": p["durationMs"]["triggerExecution"],
                # a query can stack several stateful operators (e.g.
                # dedupeWithinWatermark feeding a streaming agg) — the
                # scaling claim is about the LARGEST store
                "state_rows": (
                    max(so["numRowsTotal"] for so in p["stateOperators"])
                    if p["stateOperators"]
                    else None
                ),
                "state_by_op": {
                    so["operatorName"]: so["numRowsTotal"]
                    for so in p["stateOperators"]
                },
            }
            for p in prog
        ]
    finally:
        q.stop()
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    return wall, batches


def main() -> int:
    from web_attack_detection_spark.session import build_session
    from web_attack_detection_spark.streaming.windows import (
        deduped_event_counts,
        running_user_totals,
        sessionized_event_counts,
    )

    spark = build_session(app_name="scale_probe_stream")
    spark.sparkContext.setLogLevel("ERROR")

    ops = [
        ("stateful_totals", running_user_totals, "update"),
        (
            "session_windows",
            lambda s: sessionized_event_counts(s, "30 minutes"),
            "append",
        ),
        ("dedup_watermark", deduped_event_counts, "complete"),
    ]
    results: dict[str, dict] = {}
    dirs = {}
    for tag, n in SIZES:
        dirs[tag] = _make_input(spark, n)
    # warm pass: first stream in a process pays ~10 s machinery init
    _run(spark, dirs["1x"], "warm", running_user_totals, "update")
    for op_name, fn, mode in ops:
        for tag, n in SIZES:
            wall, batches = _run(spark, dirs[tag], op_name, fn, mode)
            mid = batches[len(batches) // 2 :]  # steady-state batches
            per_row_us = (
                1000.0
                * sum(b["ms"] for b in mid)
                / max(1, sum(b["rows"] for b in mid))
            )
            results[(op_name, tag)] = {
                "n_rows": n,
                "wall_s": round(wall, 2),
                "n_batches": len(batches),
                "per_row_us": round(per_row_us, 1),
                "state_rows_per_batch": [b["state_rows"] for b in batches],
                "final_state_rows": batches[-1]["state_rows"],
                "max_state_rows": max(
                    b["state_rows"] for b in batches if b["state_rows"] is not None
                ),
            }
            results[(op_name, tag)]["state_by_op_final"] = batches[-1][
                "state_by_op"
            ]
            r = results[(op_name, tag)]
            print(
                f"{op_name:16s} {tag:>3s} rows={n:>7d} wall={r['wall_s']:>6.2f}s "
                f"batches={r['n_batches']} per_row_us={r['per_row_us']:>7.1f} "
                f"max_state={r['max_state_rows']} final_state={r['final_state_rows']} "
                f"by_op={r['state_by_op_final']}"
            )
    print()
    bad = 0
    for op_name, _, _ in ops:
        a, b = results[(op_name, "1x")], results[(op_name, "10x")]
        state_ratio = b["max_state_rows"] / max(1, a["max_state_rows"])
        wall_ratio = b["wall_s"] / a["wall_s"]
        perrow_ratio = b["per_row_us"] / a["per_row_us"]
        verdict = "OK"
        # Bounded-state criteria, per operator semantics:
        # - lifetime totals: state == |users| EXACTLY, both scales
        #   (fixed population; 10x events may not add a single row)
        # - session windows: open sessions only — must not grow ~10x
        # - watermark dedup: state ∝ event RATE × horizon (this probe
        #   grows rate, so 10x state is CORRECT); the bounded-state
        #   claim is state << keys-ever-seen (2x corpus under the
        #   duplicate delivery)
        if op_name == "stateful_totals":
            if not (
                a["max_state_rows"] == b["max_state_rows"] == N_USERS
            ):
                verdict, bad = "STATE != |users|", bad + 1
        elif op_name == "session_windows":
            if state_ratio > 2.0:
                verdict, bad = "OPEN-SESSION STATE GROWS WITH CORPUS", bad + 1
        elif op_name == "dedup_watermark":
            if b["final_state_rows"] > 0.10 * (2 * b["n_rows"]):
                verdict, bad = "DEDUP STATE NOT EVICTED", bad + 1
        if perrow_ratio > 1.5:
            verdict, bad = "PER-ROW COST GROWS", bad + 1
        print(
            f"{op_name:16s} 10x/1x: wall {wall_ratio:0.2f}x  "
            f"per-row {perrow_ratio:0.2f}x  max-state {state_ratio:0.2f}x  "
            f"final-state/keys-seen "
            f"{b['final_state_rows'] / (2 * b['n_rows']):0.4f}  -> {verdict}"
        )
    for d in dirs.values():
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
