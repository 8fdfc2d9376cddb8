"""Streaming-path test for the custom stateful sessionize operator
(applyInPandasWithState): sessions that CLOSE within the processed data
are emitted in the same run; the still-open tail session stays in state
(it would emit on timeout in a long-running stream)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from openetlagent_spark.streaming import sessionize
from openetlagent_spark.streaming.events import EVENT_SCHEMA


def test_streaming_sessionize_emits_closed_sessions(spark, tmp_path):
    # user 1: two sessions separated by a 2h gap (first closes in-batch);
    # user 2: one session only (stays open in state, not emitted).
    rows = [
        Row(event_id=1, ts="2024-01-01 10:00:00", user_id=1, event_type="click", value=1.0, props="{}"),
        Row(event_id=2, ts="2024-01-01 10:10:00", user_id=1, event_type="click", value=2.0, props="{}"),
        Row(event_id=3, ts="2024-01-01 13:00:00", user_id=1, event_type="click", value=4.0, props="{}"),
        Row(event_id=4, ts="2024-01-01 09:00:00", user_id=2, event_type="view", value=8.0, props="{}"),
    ]
    batch = spark.createDataFrame(rows).withColumn("ts", F.to_timestamp("ts"))
    src = str(tmp_path / "events_src")
    batch.write.parquet(src)

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (
        sessionize(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # availableNow + stateful timeouts may keep the query alive past the
    # data batch — poll the sink for the expected row, then stop.
    import time

    deadline = time.time() + 120
    got = []
    while time.time() < deadline:
        got = spark.sql("SELECT * FROM sessions_out").collect()
        if got:
            break
        time.sleep(1)
    q.stop()

    assert len(got) == 1  # only user 1's first (closed) session
    s = got[0]
    assert s.user_id == 1
    assert s.n_events == 2 and s.sum_value == 3.0
    assert s.session_start.strftime("%H:%M") == "10:00"
    assert s.session_end.strftime("%H:%M") == "10:10"
