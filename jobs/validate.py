"""spark-submit entry: run the clips validation suite partition-at-a-time
with checkpointed resume.

    spark-submit --py-files engine.zip jobs/validate.py \
        --n 100000 --manifest-dir /tmp/mb_manifest [--resume]

Packaging: `python -m zipfile -c engine.zip macrobase_spark` produces the
--py-files artifact; on a real cluster the clips source is an Iceberg table
(`spark.read.table(...)`) instead of the synthetic generator, and the
partition list comes from the table's partition metadata.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from macrobase_spark.operators.checks import SuiteConfig, run_suite  # noqa: E402
from macrobase_spark.plans.manifest import RunManifest  # noqa: E402
from macrobase_spark.session import get_spark  # noqa: E402
from macrobase_spark.sources.clips import generate_clips, generate_manifest  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--table", default=None, help="parquet/Iceberg path of an existing clips table (overrides --n synthetic)")
    ap.add_argument(
        "--iceberg-root",
        default=None,
        help="an icetable root (sources/icetable layout): validates the "
        "current snapshot; with --resume, validates ONLY the snapshots "
        "appended since the last recorded run (manifest lineage carries "
        "the high-water snapshot id, so a daily append costs one "
        "incremental scan, never a rescan)",
    )
    ap.add_argument("--manifest-dir", default="/tmp/mb_manifest")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--stream-dir",
        default=None,
        help="validate a parquet file-stream directory via Structured "
        "Streaming micro-batches instead of one batch pass; resume is "
        "automatic (Spark checkpoint offsets + per-batch manifest lineage)",
    )
    ap.add_argument("--checkpoint-dir", default="/tmp/mb_stream_ckpt")
    ap.add_argument("--violations-dir", default=None)
    ap.add_argument(
        "--constraints",
        default=None,
        help="YAML/JSON file declaring a Check suite (constraints.checks_from_config); "
        "evaluated over the scored relation in ONE aggregation pass and printed "
        "before the imperative suite runs",
    )
    args = ap.parse_args()

    spark = get_spark("mb-validate", master=args.master)
    t0 = time.time()

    if args.stream_dir:
        from macrobase_spark.streaming.validate import validate_stream

        schema = spark.read.parquet(args.stream_dir).schema
        stream = spark.readStream.schema(schema).parquet(args.stream_dir)
        q = validate_stream(
            stream,
            args.manifest_dir,
            args.checkpoint_dir,
            cfg=SuiteConfig(),
            violations_sink=args.violations_dir,
        )
        # drain everything currently in the directory and exit (cron-style
        # incremental validation); a long-running deployment replaces this
        # with q.awaitTermination()
        q.processAllAvailable()
        q.stop()
        man = RunManifest(args.manifest_dir).read(spark)
        agg = man.agg(
            F.sum("n_rows").alias("rows"), F.sum("n_violations").alias("viol")
        ).collect()[0]
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "mode": "stream",
                    "manifest_rows": man.count(),
                    "rows": int(agg["rows"] or 0),
                    "violations": int(agg["viol"] or 0),
                    "wall_clock_sec": round(wall, 2),
                }
            )
        )
        return 0
    ice_snap = None
    if args.iceberg_root:
        from macrobase_spark.sources.icetable import (
            current_snapshot_id,
            read_incremental,
            read_table,
        )

        ice_snap = current_snapshot_id(args.iceberg_root)
        last = None
        man = RunManifest(args.manifest_dir)
        if args.resume and man.exists():
            import re as _re

            for r in man.read(spark).select("lineage").distinct().collect():
                m = _re.search(r"#snap=(\d+)", r["lineage"] or "")
                if m:
                    last = max(last or 0, int(m.group(1)))
        if last is not None and last >= ice_snap:
            print(json.dumps({"status": "nothing to do", "snapshot": ice_snap}))
            return 0
        clips = (
            read_incremental(spark, args.iceberg_root, last)
            if last is not None
            else read_table(spark, args.iceberg_root)
        )
        # the referential manifest must span the WHOLE table's id range
        # (an incremental slice is not an orphan set); the row total comes
        # from the snapshot manifest's metadata — zero extra jobs
        from macrobase_spark.sources.icetable import read_manifest as _ice_manifest

        total_rows = sum(e["row_count"] for e in _ice_manifest(args.iceberg_root, ice_snap))
        ref = generate_manifest(spark, total_rows)
    elif args.table:
        from macrobase_spark.sources.table_source import load_table

        clips = load_table(spark, args.table)
        n_rows = clips.count()
        ref = generate_manifest(spark, n_rows)
    else:
        clips = generate_clips(spark, args.n)
        ref = generate_manifest(spark, args.n)

    if args.constraints:
        import yaml  # PyYAML parses JSON too (JSON is a YAML subset)

        from macrobase_spark.operators.constraints import suite_status, verify_config

        conf = yaml.safe_load(Path(args.constraints).read_text())
        out: dict = {}
        if conf.get("schema"):
            from macrobase_spark.operators.constraints import (
                schema_check,
                schema_from_config,
            )

            cols, allow_extra, check_nullable = schema_from_config(conf["schema"])
            out["schema_violations"] = [
                r.asDict()
                for r in schema_check(clips, cols, allow_extra, check_nullable).collect()
            ]
        # column pruning is Catalyst's job: only columns the declared
        # constraints reference reach the scan (bytes stays out unless a
        # `satisfies` expression names it)
        res = verify_config(clips, conf)
        out["constraint_results"] = [r.asDict() for r in res.collect()]
        out["verdicts"] = {r["check"]: r["verdict"] for r in suite_status(res).collect()}
        print(json.dumps(out))

    run_manifest = RunManifest(args.manifest_dir)
    all_parts = [r["codec"] for r in clips.select("codec").distinct().collect()]
    # icetable mode resumes at SNAPSHOT grain (handled above): the
    # incremental rows must be checked for every codec, including codecs
    # already validated in earlier snapshots
    todo = (
        run_manifest.pending(spark, all_parts)
        if args.resume and not args.iceberg_root
        else all_parts
    )
    if not todo:
        print(json.dumps({"status": "nothing to do", "partitions": 0}))
        return 0

    # one suite run over the pending partitions (partition pruning: the
    # filter on the partition column prunes at the source)
    pending_clips = clips.filter(F.col("codec").isin(todo))
    res = run_suite(pending_clips, ref, SuiteConfig())

    verdicts = res.verdicts.collect()
    n_viol = res.violations.count()
    wall = time.time() - t0

    by_part: dict[str, dict] = {}
    for r in verdicts:
        d = by_part.setdefault(
            r["codec"], {"partition": r["codec"], "n_rows": r["n_rows"], "n_violations": 0}
        )
        d["n_violations"] += r["n_violations"]
    rows = [
        {**d, "passed": d["n_violations"] == 0, "wall_clock_sec": wall}
        for d in by_part.values()
    ]
    lineage = (
        f"icetable@{args.iceberg_root}#snap={ice_snap}"
        if args.iceberg_root
        else f"synthetic-clips@n={args.n}"
    )
    run_id = run_manifest.record(spark, rows, lineage=lineage)
    total_rows = sum(d["n_rows"] for d in by_part.values())

    # metric-history anomaly gate: record this run's headline metrics and
    # judge them against the trailing runs (relative-to-median, 50%
    # tolerance — loose by design: a validation run's volume legitimately
    # varies, and the gate is for order-of-magnitude surprises like an
    # empty append or a violation explosion). First run never self-flags.
    from macrobase_spark.plans.metrics_repo import anomaly_check, record_profile

    hist_path = f"{args.manifest_dir.rstrip('/')}_profile_history"
    viol_rate = n_viol / max(total_rows, 1)
    prof = spark.createDataFrame(
        [("run", int(total_rows), int(n_viol), float(viol_rate))],
        "column string, n_rows long, n_violations long, violation_rate double",
    )
    metrics = ["n_rows", "n_violations", "violation_rate"]
    anomalies = []
    import os as _os

    if _os.path.isdir(hist_path):
        from macrobase_spark.plans.metrics_repo import profile_long

        res = anomaly_check(
            spark.read.parquet(hist_path), profile_long(prof, metrics),
            method="relative", threshold=0.5, window=30,
        )
        anomalies = [r.asDict() for r in res.filter(F.col("status") == "anomaly").collect()]
    prev_runs = (
        spark.read.parquet(hist_path).agg(F.max("run_seq")).collect()[0][0]
        if _os.path.isdir(hist_path)
        else 0
    )
    record_profile(prof, hist_path, int(prev_runs or 0) + 1, metrics)

    print(
        json.dumps(
            {
                "run_id": run_id,
                "partitions": len(rows),
                "rows": total_rows,
                "violations": n_viol,
                "wall_clock_sec": round(wall, 2),
                "clips_per_sec": round(total_rows / wall, 1),
                "metric_anomalies": anomalies,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
