"""Dump*/Grid* diagnostics (reference contrib ScoreDumper /
DiagnosticsUtils / DumpClassifier / GridDumpingPipeline)."""

import glob
import json

import numpy as np
from pyspark.sql import functions as F

from macrobase_spark.functions.diagnostics import (
    bounding_box,
    dump_as_json,
    dump_classifier,
    dump_mixture_components,
    dump_scores,
    grid_fixed_increment,
    grid_fixed_size,
)


def _read_json_dir(path):
    rows = []
    for f in sorted(glob.glob(f"{path}/part-*")):
        with open(f) as fh:
            rows += [json.loads(l) for l in fh if l.strip()]
    return rows


def test_grid_fixed_size_matches_reference(spark):
    """createGridFixedSize:61-80 — delta = (hi-lo)/(points-1), 2D cross
    product; 3D+ yields the reference's empty grid."""
    box = [(0.0, 1.0), (10.0, 30.0)]
    g = grid_fixed_size(spark, ["x", "y"], box, 5).collect()
    xs = sorted({r["x"] for r in g})
    ys = sorted({r["y"] for r in g})
    assert len(g) == 25
    assert np.allclose(xs, [0.0 + i * 0.25 for i in range(5)])
    assert np.allclose(ys, [10.0 + i * 5.0 for i in range(5)])
    assert grid_fixed_size(spark, ["x", "y", "z"], box + [(0, 1)], 4).count() == 0


def test_grid_fixed_increment_matches_reference(spark):
    """createGridFixedIncrement:12-32 — points = int((hi-lo)/delta + 1)."""
    g = grid_fixed_increment(spark, ["x"], [(0.0, 1.0)], 0.3).collect()
    vals = sorted(r["x"] for r in g)
    assert np.allclose(vals, [0.0, 0.3, 0.6, 0.9])  # int(1/0.3+1)=4 anchors


def test_bounding_box_and_dump_scores(spark, tmp_path):
    df = spark.createDataFrame(
        [(1.0, 5.0, 0.2), (3.0, -2.0, 0.9), (2.0, 0.0, 0.5)], "x double, y double, s double"
    )
    assert bounding_box(df, ["x", "y"]) == [(1.0, 3.0), (-2.0, 5.0)]
    p = str(tmp_path / "scores")
    dump_scores(df, ["x", "y"], "s", p)
    rows = _read_json_dir(p)
    assert sorted(r["score"] for r in rows) == [0.2, 0.5, 0.9]
    assert all(len(r["metrics"]) == 2 for r in rows)


def test_dump_classifier_passthrough(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, 0.0), (1, 1.0), (2, 0.0), (3, 1.0)], "rid long, _OUTLIER double"
    )
    p = str(tmp_path / "dump.txt")
    out = dump_classifier(df, "_OUTLIER", "rid", p)
    assert out is df  # pass-through (DumpClassifier keeps the stream)
    lines = []
    for f in sorted(glob.glob(f"{p}/part-*")):
        lines += open(f).read().splitlines()
    assert lines == ["0,0", "1,1", "2,0", "3,1"]


def test_dump_mixture_components(tmp_path):
    from macrobase_spark.operators.contrib_stats import GMMModel

    m = GMMModel(
        weights=np.array([0.4, 0.6]),
        means=np.array([[0.0, 1.0], [2.0, 3.0]]),
        covs=np.stack([np.eye(2), 2 * np.eye(2)]),
    )
    paths = dump_mixture_components(m, "t.json", str(tmp_path))
    w = json.load(open(paths[0]))
    assert np.allclose(w, [0.4, 0.6])
    c = json.load(open(paths[1]))
    assert np.allclose(np.array(c)[1], 2 * np.eye(2))
    dump_as_json({"a": np.float64(1.5)}, "obj.json", str(tmp_path))
    assert json.load(open(f"{tmp_path}/obj.json")) == {"a": 1.5}


def test_grid_dumping_pipeline(spark, tmp_path):
    """GridDumpingPipeline end-to-end: dumps land, and the classifier is
    the legacy BatchingPercentileClassifier (r6 cutoff, flag >=)."""
    rng = np.random.default_rng(23)
    rows = [
        (
            int(i),
            "hot" if i < 10 else ("ios" if i % 2 == 0 else "android"),
            round(float(rng.normal(0, 1)), 3) + (40.0 if i < 10 else 0.0),
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "rid long, dev string, m double")
    src = str(tmp_path / "in.parquet")
    df.write.mode("overwrite").parquet(src)
    out_dir = str(tmp_path / "scores")
    from macrobase_spark.pipelines import run_config

    conf = {
        "pipeline": "GridDumpingPipeline",
        "inputURI": f"parquet://{src}",
        "metric": "m",
        "idColumn": "rid",
        "transformType": "MAD",
        "targetPercentile": 0.98,
        "attributes": ["dev"],
        "minSupport": 0.5,
        "minRatioMetric": 1.5,
        "macrobase.diagnostic.dumpScoreGrid": "grid.json",
        "macrobase.diagnostic.gridPointsPerDimension": 11,
        "macrobase.diagnostic.scoreDataFile": "ba.json",
        "macrobase.diagnostic.dumpClassifier": True,
        "queryName": "q1",
        "outDir": out_dir,
    }
    res = run_config(spark, conf)
    flags = {r["rid"]: r["_OUTLIER"] for r in res.classified.collect()}
    # mirror: MAD scores, r6 percentile cutoff, >= flag
    m = np.array([r[2] for r in rows])
    med = np.percentile(m, 50)  # r7 at 0.5 == exact median here (n even)
    mad = np.percentile(np.abs(m - med), 50)
    s = np.abs(m - med) / mad
    n = len(s)
    q = min(max((0.98 * (n + 1) - 1.0) / (n - 1.0), 0.0), 1.0)
    cut = np.quantile(s, q)  # numpy default 'linear' == r7 at adjusted q
    exp = {i: (1.0 if s[i] >= cut else 0.0) for i in range(n)}
    assert flags == exp
    assert sum(flags.values()) >= 10  # planted spikes all flagged
    # dumps exist and have the right shapes
    grid_rows = _read_json_dir(f"{out_dir}/grid.json")
    assert len(grid_rows) == 11 and all("score" in r for r in grid_rows)
    ba = _read_json_dir(f"{out_dir}/ba.json")
    assert len(ba) == n and all(len(r["metricsAfter"]) == 1 for r in ba)
    lines = []
    for f in sorted(glob.glob(f"{out_dir}/q1-dumpClassifier.txt/part-*")):
        lines += open(f).read().splitlines()
    assert len(lines) == n and lines[0].count(",") == 1
    # the explanation names the planted attribute
    hot = [r for r in res.explanation.collect() if r["dev"] == "hot"]
    assert hot
