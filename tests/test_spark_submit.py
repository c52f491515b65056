"""Packaging: the engine ships as a zip via spark-submit --py-files and the
validate job runs end-to-end with manifest resume (north rule: 'run via
spark-submit --py-files on a multi-executor cluster')."""

import json
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)


def _zip_engine(dest: Path) -> Path:
    zpath = dest / "engine.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for f in (REPO / "macrobase_spark").rglob("*.py"):
            z.write(f, f.relative_to(REPO))
    return zpath


def _submit(zpath: Path, *args: str) -> dict:
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath),
            str(REPO / "jobs" / "validate.py"),
            *args,
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    last = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(last)


def test_spark_submit_validate_and_resume(tmp_path):
    zpath = _zip_engine(tmp_path)
    mdir = str(tmp_path / "manifest")
    r1 = _submit(zpath, "--n", "3000", "--manifest-dir", mdir, "--master", "local[4]")
    assert r1["rows"] == 3000
    assert r1["violations"] > 0
    assert r1["partitions"] >= 4
    assert r1["clips_per_sec"] > 0
    # resume: everything is already recorded in the manifest
    r2 = _submit(zpath, "--n", "3000", "--manifest-dir", mdir, "--master", "local[4]", "--resume")
    assert r2.get("status") == "nothing to do"


def test_spark_submit_stream_mode(tmp_path, spark):
    """--stream-dir drains a parquet file stream through the foreachBatch
    runner under spark-submit; a second invocation with the same checkpoint
    reprocesses nothing (offsets + manifest lineage)."""
    from macrobase_spark.sources.clips import generate_clips

    src = str(tmp_path / "clips_src")
    generate_clips(spark, 2000).repartition(2).write.parquet(src)
    zpath = _zip_engine(tmp_path)
    mdir = str(tmp_path / "manifest")
    common = [
        "--stream-dir", src,
        "--manifest-dir", mdir,
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--master", "local[4]",
    ]
    r1 = _submit(zpath, *common)
    assert r1["mode"] == "stream"
    assert r1["rows"] == 2000
    assert r1["violations"] > 0
    r2 = _submit(zpath, *common)
    assert r2["rows"] == 2000  # unchanged — nothing reprocessed
    assert r2["manifest_rows"] == r1["manifest_rows"]


def test_spark_submit_declared_constraints(tmp_path):
    """--constraints yaml: the declared suite is evaluated over the clips
    relation in the submitted job and reported as its own JSON line."""
    zpath = _zip_engine(tmp_path)
    conf = tmp_path / "checks.yaml"
    conf.write_text(
        """
schema:
  allow_extra: false
  columns:
    - {name: clip_id, type: string}
    - {name: bytes, type: binary}
    - {name: sr_hz, type: int}
    - {name: dur_ms, type: bigint}   # wrong on purpose: actual is int
    - {name: codec, type: string}
checks:
  - name: schema
    constraints:
      - {type: has_size, min_rows: 1000}
      - {type: is_complete, column: clip_id}
      - {type: has_pattern, column: clip_id, regex: "^clip_[0-9]{12}$"}
  - name: ranges
    level: warning
    constraints:
      - {type: has_min, column: dur_ms, at_least: 1}
      - {type: is_contained_in, column: codec, allowed: [opus, mp3, flac, aac, pcm_s16le]}
"""
    )
    out = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath),
            str(REPO / "jobs" / "validate.py"),
            "--n", "2000", "--manifest-dir", str(tmp_path / "m"),
            "--master", "local[4]", "--constraints", str(conf),
        ],
        capture_output=True, text=True, timeout=600, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [json.loads(ln) for ln in out.stdout.splitlines() if ln.startswith("{")]
    cres = next(l for l in lines if "constraint_results" in l)
    assert cres["verdicts"]["schema"] == "pass"
    sv = {(r["column"], r["issue"]) for r in cres["schema_violations"]}
    assert ("dur_ms", "type_mismatch") in sv
    assert ("transcript", "unexpected") in sv
    by_c = {r["constraint"]: r["status"] for r in cres["constraint_results"]}
    assert by_c["has_size"] == "pass"
    assert by_c["has_pattern:clip_id"] == "pass"
    final = lines[-1]
    assert final["rows"] == 2000


def test_spark_submit_iceberg_incremental(tmp_path, spark):
    """Snapshot-grain resume over an icetable: the first run validates the
    current snapshot; after an append, --resume validates ONLY the new
    rows (incremental scan via the recorded high-water snapshot id); a
    third run with nothing new is a no-op."""
    from macrobase_spark.sources.clips import generate_clips
    from macrobase_spark.sources.icetable import append, create_table

    root = str(tmp_path / "ice")
    clips = generate_clips(spark, 3000, max_payload_ms=50)
    cut = f"clip_{2000:012d}"
    create_table(
        clips.filter("clip_id < '%s'" % cut), root,
        partition_by=["codec"], stat_cols=["dur_ms"],
    )

    zpath = _zip_engine(tmp_path)
    mdir = str(tmp_path / "manifest")
    r1 = _submit(zpath, "--iceberg-root", root, "--manifest-dir", mdir, "--master", "local[4]")
    assert r1["rows"] == 2000

    append(clips.filter("clip_id >= '%s'" % cut), root)
    r2 = _submit(
        zpath, "--iceberg-root", root, "--manifest-dir", mdir,
        "--master", "local[4]", "--resume",
    )
    assert r2["rows"] == 1000  # only the appended snapshot

    r3 = _submit(
        zpath, "--iceberg-root", root, "--manifest-dir", mdir,
        "--master", "local[4]", "--resume",
    )
    assert r3.get("status") == "nothing to do"


def test_spark_submit_metric_anomaly_gate(tmp_path):
    """Each run records its headline metrics; a run whose volume collapses
    vs the trailing history is flagged in metric_anomalies (first runs
    never self-flag)."""
    zpath = _zip_engine(tmp_path)
    mdir = str(tmp_path / "m")
    r1 = _submit(zpath, "--n", "3000", "--manifest-dir", mdir, "--master", "local[4]")
    assert r1["metric_anomalies"] == []
    r2 = _submit(zpath, "--n", "3000", "--manifest-dir", str(tmp_path / "m2"),
                 "--master", "local[4]")
    assert r2["metric_anomalies"] == []  # separate manifest -> fresh history
    # same manifest dir, tenth of the volume -> n_rows collapses vs median
    r3 = _submit(zpath, "--n", "300", "--manifest-dir", mdir, "--master", "local[4]")
    flagged = {a["metric"] for a in r3["metric_anomalies"]}
    assert "n_rows" in flagged
