"""Streaming face of the validation suite: stream==batch equivalence for the
scored scan, cross-batch uniqueness, windowed violation rates, and the
idempotent foreachBatch manifest runner."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from macrobase_spark.operators.audio import score_clips
from macrobase_spark.operators.checks import SuiteConfig
from macrobase_spark.plans.manifest import RunManifest
from macrobase_spark.sources.clips import generate_clips, generate_manifest
from macrobase_spark.streaming.validate import (
    batch_processor,
    stream_duplicate_clips,
    stream_row_violations,
    validate_stream,
    windowed_violation_rates,
)

N = 1200


@pytest.fixture(scope="module")
def clips_src(spark, tmp_path_factory):
    """Clips fixture written as several parquet files so maxFilesPerTrigger=1
    yields a genuinely multi-batch stream."""
    src = str(tmp_path_factory.mktemp("vstream") / "clips")
    generate_clips(spark, N).repartition(4).write.mode("overwrite").parquet(src)
    return src


def _read_stream(spark, src):
    schema = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )


def _drain(out, name, mode="append"):
    q = out.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _sorted_pdf(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_stream_scored_matches_batch(spark, clips_src):
    """The fused decode/SNR/silence scan over a stream produces exactly the
    batch rows — same kernel, two planes."""
    _drain(score_clips(_read_stream(spark, clips_src)), "vscored")
    got = _sorted_pdf(spark.sql("select * from vscored"))
    want = _sorted_pdf(score_clips(spark.read.parquet(clips_src)))
    assert len(got) == len(want) == N
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_duplicates_match_batch_set(spark, clips_src):
    """Cross-batch stateful uniqueness flags exactly the clip_ids the batch
    uniqueness check flags (the fixture plants id%500==7 duplicates)."""
    scored = score_clips(_read_stream(spark, clips_src))
    _drain(stream_duplicate_clips(scored), "vdups")
    got = {
        r["clip_id"]
        for r in spark.sql("select clip_id from vdups").collect()
    }
    batch = score_clips(spark.read.parquet(clips_src))
    want = {
        r["clip_id"]
        for r in batch.groupBy("clip_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter("n > 1")
        .collect()
    }
    assert want, "fixture must plant duplicates"
    assert got == want


def test_stream_row_violations_match_batch(spark, clips_src):
    """Stateless checks + stream-static referential anti-join emit the batch
    violation multiset."""
    manifest = generate_manifest(spark, N)
    scored = score_clips(_read_stream(spark, clips_src))
    _drain(stream_row_violations(scored, manifest), "vviol")
    got = _sorted_pdf(spark.sql("select * from vviol"))
    want = _sorted_pdf(
        stream_row_violations(score_clips(spark.read.parquet(clips_src)), manifest)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_windowed_violation_rates_match_batch(spark, clips_src):
    """Event-time windowed rates over the stream equal the batch windowed
    aggregate (complete mode sidesteps watermark finalization timing)."""
    ts = F.to_timestamp(
        F.lit("2024-01-01 00:00:00").cast("timestamp")
        + F.make_interval(secs=F.substring("clip_id", 6, 12).cast("long") % 600)
    )
    stream = _read_stream(spark, clips_src).withColumn("ts", ts)
    out = windowed_violation_rates(
        score_clips(stream, carry_cols=["ts"]), "ts", "2 minutes"
    )
    _drain(out, "vrates", mode="complete")
    got = _sorted_pdf(spark.sql("select * from vrates"))
    batch = spark.read.parquet(clips_src).withColumn("ts", ts)
    want = _sorted_pdf(
        windowed_violation_rates(score_clips(batch, carry_cols=["ts"]), "ts", "2 minutes")
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_batch_processor_idempotent(spark, clips_src, tmp_path):
    """The foreachBatch body records per-partition verdicts once per
    batch_id — a replay (same id) is a no-op, the next id appends."""
    man_path = str(tmp_path / "run_manifest")
    clips = spark.read.parquet(clips_src)
    process = batch_processor(man_path, SuiteConfig())
    process(clips, 0)
    man = RunManifest(man_path)
    n0 = man.read(spark).count()
    assert n0 > 0
    process(clips, 0)  # replay — must be a no-op
    assert man.read(spark).count() == n0
    process(clips.limit(100), 1)
    n1 = man.read(spark).count()
    assert n1 > n0
    rows = man.read(spark).collect()
    assert {r["lineage"] for r in rows} == {"stream-batch:0", "stream-batch:1"}
    # verdict numbers match a direct batch aggregate
    b0 = [r for r in rows if r["lineage"] == "stream-batch:0"]
    total_rows = sum(r["n_rows"] for r in b0)
    assert total_rows == N


def test_validate_stream_end_to_end_and_resume(spark, clips_src, tmp_path):
    """Full runner: stream in, manifest + violations sink out; a restart from
    the same checkpoint reprocesses nothing."""
    man_path = str(tmp_path / "run_manifest")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "violations")
    manifest = generate_manifest(spark, N)

    def run_once():
        q = validate_stream(
            _read_stream(spark, clips_src),
            man_path,
            ckpt,
            cfg=SuiteConfig(),
            clip_manifest=manifest,
            violations_sink=sink,
            query_name="vall",
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    man = RunManifest(man_path)
    rows1 = man.read(spark).count()
    assert rows1 > 0
    viol1 = spark.read.parquet(sink).count()
    want_viol = stream_row_violations(
        score_clips(spark.read.parquet(clips_src)), manifest
    ).count()
    assert viol1 == want_viol
    # per-batch verdict coverage: every clip counted exactly once overall
    assert (
        man.read(spark).agg(F.sum("n_rows")).collect()[0][0] == N
    )
    run_once()  # restart from the same checkpoint: offsets committed → no-op
    assert man.read(spark).count() == rows1
    assert spark.read.parquet(sink).count() == viol1
