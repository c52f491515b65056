"""Config-driven pipelines: the reference's YAML/JSON pipeline surface
(reference core/.../pipeline/BasicBatchPipeline.java:78-193,
CubePipeline.java:97-295, PipelineUtils.createPipeline:58-73) executed as
Spark plans. A reference user's config runs unchanged:

    run_config(spark, yaml.safe_load(open("batch.yaml")), base_dir=...)

Supported keys (reference names):
- pipeline: BasicBatchPipeline | CubePipeline
- inputURI: csv://<path> (resolved against base_dir); also accepts
  parquet://<path> and a registered table via table://<name>
- classifier: percentile | predicate | countmeanshift (batch);
  arithmetic | quantile | predicate | meanshift (cube)
- metric, cutoff, includeHi/includeLo, predicate (op string)
- countColumn, meanColumn, stdColumn, quantileColumns {name: level}
- summarizer: apriori/aplinear | fpgrowth | countmeanshift
- attributes, ratioMetric (globalRatio|riskRatio|prevalenceRatio),
  minRatioMetric (default 3.0), minSupport (default 0.25), maxOrder
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from macrobase_spark.operators.classify import (
    OUTLIER_COL,
    arithmetic_cube_classify,
    count_mean_shift_classify,
    percentile_classify,
    predicate_classify,
    predicate_cube_classify,
    quantile_cube_classify,
)
from macrobase_spark.operators.explain import (
    ExplainParams,
    explain,
    meanshift_explain,
)
from macrobase_spark.operators.fpg import fpgrowth_explain
from macrobase_spark.sources.csv_source import load_csv

_METRIC_NAMES = {
    "globalratio": "global_ratio",
    "global_ratio": "global_ratio",
    "riskratio": "risk_ratio",
    "risk_ratio": "risk_ratio",
    "prevalenceratio": "prevalence_ratio",
    "prevalence_ratio": "prevalence_ratio",
}


@dataclass
class PipelineResult:
    classified: DataFrame  # input + _OUTLIER (or accumulator columns)
    explanation: DataFrame  # the violation-row relation


def _double_cols(conf: dict) -> list[str]:
    chain_metrics = [
        m for c in conf.get("classifiers", []) for m in c.get("metricColumns", [])
    ] + list(conf.get("metricColumns", []))
    doubles = [
        c
        for c in [
            conf.get("metric"),
            conf.get("countColumn"),
            conf.get("meanColumn"),
            conf.get("stdColumn"),
            *list(conf.get("quantileColumns", {})),
            *chain_metrics,
        ]
        if c
    ]
    if conf.get("classifier") == "predicate" and isinstance(conf.get("cutoff"), str):
        doubles = [c for c in doubles if c != conf.get("metric")]
    return doubles


def _load(spark: SparkSession, conf: dict, base_dir: str) -> DataFrame:
    """Reference Pipelines.createDataFrameReader (Pipelines.java:56-68):
    scheme → batch reader. csv/xlsx/http/jdbc/parquet."""
    uri = conf["inputURI"]
    scheme, _, path = uri.partition("://")
    if base_dir and not path.startswith("/") and "://" in uri and not scheme.startswith(("http", "jdbc")):
        path = f"{base_dir.rstrip('/')}/{path}"
    if scheme == "csv":
        return load_csv(spark, path, double_cols=_double_cols(conf))
    if scheme == "xlsx":
        from macrobase_spark.sources.xlsx_source import load_xlsx

        return load_xlsx(spark, path)
    if scheme in ("http", "https"):
        from macrobase_spark.sources.rest_source import load_http_csv

        return load_http_csv(spark, uri, double_cols=_double_cols(conf))
    if scheme.startswith("jdbc"):
        from macrobase_spark.sources.jdbc_source import load_jdbc

        query = conf.get("query")
        table = f"({query}) _mb_q" if query else conf["table"]
        return load_jdbc(spark, uri, table)
    if scheme == "parquet":
        return spark.read.parquet(path)
    raise ValueError(f"unsupported inputURI scheme {scheme!r}")


def stream_load(spark: SparkSession, conf: dict, callback, base_dir: str = "") -> int:
    """Reference Pipelines.getStreamingDataLoader (Pipelines.java:70-91):
    scheme → minibatch stream reader, each part delivered to `callback` as
    a DataFrame. http → sentinel-split part stream; csv → fixed-size line
    batches; jdbc → snapshot-offset polling. Returns batches delivered."""
    uri = conf["inputURI"]
    scheme, _, path = uri.partition("://")
    if base_dir and not path.startswith("/") and not scheme.startswith(("http", "jdbc")):
        path = f"{base_dir.rstrip('/')}/{path}"
    if scheme in ("http", "https"):
        from macrobase_spark.sources.rest_source import stream_http_csv

        return stream_http_csv(spark, uri, callback, double_cols=_double_cols(conf))
    if scheme == "csv":
        from macrobase_spark.sources.line_stream import stream_csv_lines

        return stream_csv_lines(
            spark, path, callback, double_cols=_double_cols(conf),
            batch_lines=int(conf.get("maxReadBatchSize", 5000)),
        )
    if scheme.startswith("jdbc"):
        from macrobase_spark.sources.jdbc_source import stream_jdbc

        return stream_jdbc(
            spark, uri, conf["query"], conf.get("idColumn", "id"), callback,
            max_batch_size=int(conf.get("maxReadBatchSize", 5000)),
            poll_interval=float(conf.get("pollInterval", 1.0)),
            max_batches=conf.get("maxBatches"),
            stop_after_empty_polls=conf.get("stopAfterEmptyPolls"),
        )
    raise ValueError(f"unsupported streaming inputURI scheme {scheme!r}")


def _classify(df: DataFrame, conf: dict, cube: bool) -> DataFrame:
    kind = conf.get("classifier", "percentile").lower()
    if not cube:
        if kind == "percentile":
            return percentile_classify(
                df,
                conf["metric"],
                percentile=float(conf.get("cutoff", 0.5)),
                include_high=bool(conf.get("includeHi", True)),
                include_low=bool(conf.get("includeLo", True)),
                method="r6",  # commons-math interpolation, as the reference
            )
        if kind == "predicate":
            return predicate_classify(
                df, conf["metric"], conf.get("predicate", "=="), conf["cutoff"]
            )
        if kind == "countmeanshift":
            pred_col = F.col(conf["metric"])
            from macrobase_spark.operators.classify import predicate_expr

            pred = predicate_expr(pred_col, conf.get("predicate", "=="), conf["cutoff"])
            return count_mean_shift_classify(df, conf["meanColumn"], pred)
        raise ValueError(f"bad batch classifier {kind!r}")
    # cube classifiers
    if kind == "arithmetic":
        return arithmetic_cube_classify(
            df,
            count_col=conf.get("countColumn", "count"),
            mean_col=conf.get("meanColumn", "mean"),
            std_col=conf.get("stdColumn", "std"),
            percentile=float(conf.get("cutoff", 1.0)),
            include_high=bool(conf.get("includeHi", True)),
            include_low=bool(conf.get("includeLo", True)),
        )
    if kind == "quantile":
        qcols = sorted(
            ((float(lvl), name) for name, lvl in conf["quantileColumns"].items())
        )
        return quantile_cube_classify(
            df,
            [(lvl, name) for lvl, name in qcols],
            count_col=conf.get("countColumn", "count"),
            percentile=float(conf.get("cutoff", 1.0)),
            include_high=bool(conf.get("includeHi", True)),
            include_low=bool(conf.get("includeLo", True)),
        )
    if kind == "predicate":
        return predicate_cube_classify(
            df,
            conf["metric"],
            conf.get("predicate", "=="),
            conf["cutoff"],
            count_col=conf.get("countColumn", "count"),
        )
    if kind in ("meanshift", "countmeanshift"):
        from macrobase_spark.operators.classify import count_mean_shift_cube_classify

        return count_mean_shift_cube_classify(
            df,
            conf["metric"],
            conf.get("predicate", "=="),
            conf["cutoff"],
            count_col=conf.get("countColumn", "count"),
            mean_col=conf["meanColumn"],
        )
    raise ValueError(f"bad cube classifier {kind!r}")


def _get_chain_classifier(
    df: DataFrame, conf: dict, metric_cols: list[str], out_col: str
) -> DataFrame:
    """One link of a classifier chain (reference alexp Pipelines.
    getClassifier ids, Pipelines.java:115-240). Detector links keep EVERY
    input column (id_cols=None) so downstream links and the summarizer see
    the attributes."""
    from macrobase_spark.operators.classify import mad_classify, random_classify
    from macrobase_spark.operators.detectors import iforest_score, lof_score, mcd_score

    cid = (conf.get("id") or conf.get("classifier") or "").lower()
    p = {**conf, **(conf.get("parameters") or {})}
    if cid == "percentile":
        return percentile_classify(
            df,
            metric_cols[0],
            percentile=float(p.get("cutoff", 1.0)),
            include_high=bool(p.get("includeHi", True)),
            include_low=bool(p.get("includeLo", True)),
            output_col=out_col,
            method="r6",
        )
    if cid == "predicate":
        return predicate_classify(
            df, metric_cols[0], p.get("predicate", "=="), p["cutoff"], output_col=out_col
        )
    if cid == "mad":
        return mad_classify(
            df, metric_cols[0], threshold=float(p.get("threshold", 2.5)), output_col=out_col
        )
    if cid == "iforest":
        return iforest_score(
            df,
            metric_cols,
            None,
            n_trees=int(p.get("treesCount", 100)),
            subsample=int(p.get("subSampleSize", 256)),
            train_rows=int(p.get("trainSize", 4096)),
            score_col=out_col,
        )
    if cid in ("hst", "hstf"):
        from macrobase_spark.operators.hst import hst_score

        return hst_score(
            df,
            metric_cols,
            None,
            n_trees=int(p.get("treesCount", 100)),
            subsample=int(p.get("subSampleSize", 256)),
            n_dims=int(p.get("subDimensionSize", 0)),
            depth_limit=int(p.get("depthLimit", 10)),
            train_rows=int(p.get("trainSize", 4096)),
            score_col=out_col,
        )
    if cid in ("lof", "lof-bkaluza"):
        return lof_score(
            df,
            metric_cols,
            None,
            k=int(p.get("knn", 5)),
            train_rows=int(p.get("trainSize", 4096)),
            score_col=out_col,
        )
    if cid == "rrcf":
        from macrobase_spark.operators.rrcf import rrcf_score

        return rrcf_score(
            df,
            metric_cols,
            None,
            n_trees=int(p.get("treesCount", 100)),
            subsample=int(p.get("subSampleSize", 256)),
            train_rows=int(p.get("trainSize", 4096)),
            score_col=out_col,
        )
    if cid == "lof-chen":
        from macrobase_spark.operators.detectors import lof_chen_score

        return lof_chen_score(
            df,
            metric_cols,
            None,
            k_lb=int(p.get("minPtsLB", 3)),
            k_ub=int(p.get("minPtsUB", 10)),
            train_rows=int(p.get("trainSize", 4096)),
            score_col=out_col,
        )
    if cid == "loci":
        from macrobase_spark.operators.detectors import loci_score

        return loci_score(
            df,
            metric_cols,
            None,
            alpha=float(p.get("alpha", 0.5)),
            k_sigma=float(p.get("kSigma", 3)),
            score_col=out_col,
        )
    if cid in ("mcd", "fastmcd", "mincovdet"):
        return mcd_score(
            df,
            metric_cols,
            None,
            alpha=float(p.get("alpha", 0.5)),
            stopping_delta=float(p.get("stoppingDelta", 0.001)),
            train_rows=int(p.get("trainSize", 10000)),
            score_col=out_col,
        )
    if cid == "random":
        return random_classify(
            df,
            seed=int(p.get("seed", 42)),
            threshold=0.5 if p.get("binary", True) else None,
            output_col=out_col,
        )
    if cid == "kde":
        from macrobase_spark.operators.contrib_stats import kde_score

        return kde_score(
            df,
            metric_cols,
            None,
            proportion=float(p.get("proportionOfDataToUse", 0.25)),
            bandwidth_multiplier=float(p.get("bandwidthMultiplier", 1.0)),
            train_rows=int(p.get("trainSize", 4096)),
            score_col=out_col,
        )
    if cid in ("gmm", "em-gmm", "expectmaxgmm"):
        from macrobase_spark.operators.contrib_stats import gmm_score

        return gmm_score(
            df,
            metric_cols,
            None,
            k=int(p.get("numMixtures", 3)),
            train_rows=int(p.get("trainSize", 4096)),
            score_col=out_col,
        )
    if cid in ("binnedkde", "binned-kde"):
        from macrobase_spark.operators.contrib_stats import binned_kde_score

        return binned_kde_score(
            df,
            metric_cols[0],
            None,
            num_bins=int(p.get("numBins", 1024)),
            bandwidth_multiplier=float(p.get("bandwidthMultiplier", 1.0)),
            score_col=out_col,
        )
    if cid in ("vargmm", "finitegmm", "dpgmm", "stochvarfinitegmm", "stochvardpgmm"):
        from macrobase_spark.operators.vargmm import vargmm_score

        dp = cid in ("dpgmm", "stochvardpgmm")
        return vargmm_score(
            df,
            metric_cols,
            None,
            k=int(
                p.get("truncatingParameter", 20)
                if dp
                else p.get("numMixtures", 2)
            ),
            kind="dp" if dp else "finite",
            concentration=float(p.get("concentrationParameter", 1.0)),
            train_rows=int(p.get("trainSize", 4096)),
            score_col=out_col,
            stochastic=cid.startswith("stochvar"),
            minibatch=int(p.get("minibatchSize", 10000)),
        )
    if cid == "arima":
        from macrobase_spark.operators.arima import arima_chain_score

        order_col = p.get("timeColumn") or p.get("orderColumn")
        if not order_col:
            raise ValueError("arima chain classifier requires timeColumn")
        return arima_chain_score(
            df,
            metric_cols[0],
            order_col,
            key_cols=list(p.get("keyColumns") or []),
            window=int(p.get("tupleWindow", 100)),  # TUPLE_WINDOW default
            score_col=out_col,
        )
    raise ValueError(f"bad chain classifier id {cid!r}")


def classify_chain(df: DataFrame, confs: list[dict]) -> tuple[DataFrame, str]:
    """Reference Pipelines.getClassifiersChain + processChained
    (Pipelines.java:387-419): each classifier consumes the previous link's
    output column when it names no metricColumns; link i > 0 writes
    `_OUTLIER{i}`. Returns (classified df, final output column)."""
    prev_out: str | None = None
    for i, c in enumerate(confs):
        metric_cols = list(c.get("metricColumns") or [])
        if not metric_cols:
            if prev_out is None:
                raise ValueError("metricColumns not specified for first chain classifier")
            metric_cols = [prev_out]
        out = OUTLIER_COL if i == 0 else f"_OUTLIER{i}"
        df = _get_chain_classifier(df, c, metric_cols, out)
        prev_out = out
    return df, prev_out  # type: ignore[return-value]


def _summarize(
    df: DataFrame, conf: dict, cube: bool, outlier_col: str = OUTLIER_COL
) -> DataFrame:
    kind = conf.get("summarizer", "apriori").lower()
    attrs = list(conf["attributes"])
    min_support = float(conf.get("minSupport", 0.25))
    min_ratio = float(
        conf.get("minRatioMetric", conf.get("minRiskRatio", 3.0))
    )
    metric = _METRIC_NAMES[conf.get("ratioMetric", "globalRatio").lower()]
    max_order = int(conf.get("maxOrder", 3))
    if kind in ("apriori", "aplinear", "fpgrowth"):
        params = ExplainParams(
            attributes=attrs,
            outlier_col=outlier_col,
            count_col=conf.get("countColumn") if cube else None,
            min_support=min_support,
            min_ratio_metric=min_ratio,
            ratio_metric=metric,
            max_order=max_order,
        )
        if kind == "fpgrowth":
            return fpgrowth_explain(df, params)
        return explain(df, params)
    if kind == "countmeanshift":
        return meanshift_explain(
            df,
            attrs,
            min_support=min_support,
            min_mean_shift=float(conf.get("meanShiftRatio", conf.get("minMeanShift", 1.1))),
            max_order=max_order,
        )
    if kind in ("mean", "meandev", "aplmean"):
        from macrobase_spark.operators.explain import meandev_explain

        return meandev_explain(
            df,
            attrs,
            count_col=conf.get("countColumn"),
            mean_col=conf.get("meanColumn", "mean"),
            std_col=conf.get("stdColumn", "std"),
            min_support=min_support,
            min_std_dev=float(conf.get("minStdDev", 3.0)),
            max_order=max_order,
        )
    raise ValueError(f"bad summarizer {kind!r}")


def run_explanation_config(
    spark: SparkSession, conf: dict, base_dir: str = ""
) -> DataFrame:
    """The alexp explanation-benchmark surface (reference
    BenchmarkPipeline + Pipelines.getExplainer, Pipelines.java:245-283):
    run the configured classifier (chain) over the dataset's metricColumns,
    mark the top-`contamination` fraction as points-of-interest, then run
    the configured subspace explainer over them.

    conf keys (reference names): inputURI, metricColumns,
    classifiers: [...] (chain; optional — default iforest over
    metricColumns), explainer: {id: hics|beam|lookout|refout, parameters},
    contamination (default 0.01).
    """
    from pyspark.sql import functions as F

    metric_cols = list(conf["metricColumns"])
    df = _load(spark, {**conf, "metric": None}, base_dir)
    for c in metric_cols:
        df = df.withColumn(c, F.col(c).cast("double"))
    df = df.withColumn("_POINT_ID", F.monotonically_increasing_id())
    chain = conf.get("classifiers") or [{"id": "iforest", "metricColumns": metric_cols}]
    classified, out_col = classify_chain(df, list(chain))
    contamination = float(conf.get("contamination", 0.01))
    cut = classified.agg(
        F.percentile_approx(out_col, 1.0 - contamination, 10000)
    ).collect()[0][0]
    flagged = classified.withColumn("_POI", F.col(out_col) >= F.lit(float(cut)))

    ex = conf.get("explainer") or {"id": "beam"}
    eid = (ex.get("id") or "beam").lower()
    p = {**ex, **(ex.get("parameters") or {})}
    ids = ["_POINT_ID"]
    if eid == "hics":
        from macrobase_spark.operators.hics import hics_subspace_explain

        return hics_subspace_explain(
            flagged,
            metric_cols,
            ids,
            m=int(p.get("m", 50)),
            alpha=float(p.get("alpha", 0.05)),
            cutoff=int(p.get("cutoff", 400)),
            dmax=int(p.get("dmax", -1)),
            topk=int(p.get("topk", 10)),
            stat_test=str(p.get("statTest", "welch_t")),
        )
    if eid == "beam":
        from macrobase_spark.operators.subspace import beam_subspace_explain

        return beam_subspace_explain(
            flagged,
            metric_cols,
            ids,
            max_dim=int(p.get("dmax", 2)),
            beam_width=int(p.get("beamWidth", 100)),
            top_k=int(p.get("topk", 2)),
        )
    if eid == "lookout":
        from macrobase_spark.operators.subspace_explainers import lookout_explain

        return lookout_explain(
            flagged,
            metric_cols,
            ids,
            "_POI",
            budget=int(p.get("budget", 3)),
            dimensionality=int(p.get("dimensionality", 2)),
        )
    if eid == "refout":
        from macrobase_spark.operators.subspace_explainers import refout_explain

        return refout_explain(
            flagged,
            metric_cols,
            ids,
            "_POI",
            d1=float(p.get("d1", 0.7)),
            d2=int(p.get("d2", 2)),
            psize=int(p.get("psize", 100)),
            beam_size=int(p.get("beamSize", 100)),
            topk=int(p.get("topk", 5)),
        )
    raise ValueError(f"bad explainer id {eid!r}")


def _wire_time_column(df: DataFrame, conf: dict) -> tuple[DataFrame, dict]:
    """Reference time-column wiring (alexp Pipelines.parseTimeColumn,
    Pipelines.java:381-385 + LegacyClassifierEvaluationPipeline.java:93-104
    + Pipeline.createAutoGeneratedColumns):

    - `timeColumn: __autogenerated_time` → add a 0,1,2,… row-ordinal double
      column (the reference's generateTimeColumn).
    - `timeColumn` + `timeFormat` → parse the string column with the
      Java-pattern format into UTC epoch SECONDS (double) as a NEW column
      named `!parsed_<col>`, and point the config's timeColumn at it —
      exactly the reference's rename. A literal ".000000" fraction is
      stripped first (TimeUtils.dateTimeToUnixTimestamp does the same).

    One declarative expression each; the session timezone is UTC
    (session.py), so to_timestamp().cast(double) IS the UTC epoch."""
    from pyspark.sql import Window

    tcol = conf.get("timeColumn")
    tfmt = conf.get("timeFormat")
    if not tcol:
        return df, conf
    if tcol == "__autogenerated_time":
        w = Window.orderBy(F.monotonically_increasing_id())
        df = df.withColumn(tcol, (F.row_number().over(w) - 1).cast("double"))
        return df, conf
    if tfmt:
        parsed = f"!parsed_{tcol}"
        df = df.withColumn(
            parsed,
            F.to_timestamp(
                F.regexp_replace(F.col(tcol), r"\.000000", ""), tfmt
            ).cast("double"),
        )
        conf = {**conf, "timeColumn": parsed}
    return df, conf


def _ctx_key(conf: dict, short: str, default):
    """Contextual configs accept both the friendly key and the reference's
    dotted name (contrib ContextualConf.java:7-18)."""
    dotted = f"macrobase.analysis.contextual.{short}"
    return conf.get(short, conf.get(dotted, default))


def _run_contextual(
    spark: SparkSession, conf: dict, base_dir: str
) -> PipelineResult:
    """BasicContextualBatchedPipeline.run:33-75: contextual detection over
    the configured discrete/double attributes, then per-context
    summarization over `attributes`. classified = the (context, outlier)
    relation; explanation = the per-context order-1 summary (or, under
    contextualAPI findContextsGivenOutlierPredicate, the qualifying
    contexts — Interface 2)."""
    from macrobase_spark.operators.contextual import (
        contextual_explain,
        contextual_outliers,
        contextual_search_given_outliers,
    )

    df = _load(spark, conf, base_dir)
    metric = conf["metric"] if isinstance(conf.get("metric"), str) else conf["metrics"][0]
    id_col = conf.get("idColumn")
    if id_col is None:
        id_col = "_ctx_id"
        df = df.withColumn(id_col, F.monotonically_increasing_id())
    kw = dict(
        id_col=id_col,
        tau=float(_ctx_key(conf, "denseContextTau", 0.5)),
        num_intervals=int(_ctx_key(conf, "numIntervals", 10)),
        threshold=float(
            conf.get("cutoff", conf.get("outlierStaticThreshold", 3.0))
        ),
        dependency_pruning=bool(_ctx_key(conf, "pruning.dependency", True)),
    )
    mp = _ctx_key(conf, "maxPredicates", None)
    if mp is not None:
        kw["max_predicates"] = int(mp)
    disc = list(_ctx_key(conf, "discreteAttributes", []) or [])
    dbl = list(_ctx_key(conf, "doubleAttributes", []) or [])
    api = _ctx_key(conf, "api", "findAllContextualOutliers")
    if api == "findContextsGivenOutlierPredicate":
        pred = _ctx_key(conf, "api.outlierPredicates", "")
        contexts = contextual_search_given_outliers(
            df, metric, disc, dbl, outlier_predicate=pred, **kw
        )
        return PipelineResult(contexts, contexts)
    classified = contextual_outliers(df, metric, disc, dbl, **kw)
    attrs = conf.get("attributes") or []
    if attrs:
        explanation = contextual_explain(
            df, metric, disc, dbl, attributes=attrs,
            min_support=float(conf.get("minSupport", 0.25)),
            min_ratio_metric=float(conf.get("minRatioMetric", 1.5)),
            ratio_metric=_METRIC_NAMES.get(
                str(conf.get("ratioMetric", "globalRatio")).lower(), "global_ratio"
            ),
            **kw,
        )
    else:
        explanation = classified.groupBy("context", "level", "context_size").agg(
            F.count(F.lit(1)).alias("n_outliers")
        )
    return PipelineResult(classified, explanation)


def _diag_key(conf: dict, short: str, default=None):
    return conf.get(short, conf.get(f"macrobase.diagnostic.{short}", default))


def _run_grid_dumping(
    spark: SparkSession, conf: dict, base_dir: str
) -> PipelineResult:
    """GridDumpingPipeline.run:30-77: score transform → (grid dump,
    before/after dump, mixture-component dump) → BatchingPercentileClassifier
    (r6 percentile of the score at targetPercentile, flag score >= cutoff,
    NaN maximal — legacy BatchingPercentileClassifier.java:44-64) →
    summarizer. Diagnostic keys accept both short and the reference's
    dotted names (macrobase.diagnostic.*)."""
    from macrobase_spark.functions.diagnostics import (
        dump_before_after,
        dump_classifier,
        dump_mixture_components,
        dump_scored_grid,
    )
    from macrobase_spark.operators.contrib_stats import (
        _collect_sample,
        fit_gmm,
        fit_kde,
        gmm_score,
        kde_score,
    )
    import numpy as np

    df = _load(spark, conf, base_dir)
    metrics = conf.get("metrics") or [conf["metric"]]
    id_col = conf.get("idColumn")
    if id_col is None:
        id_col = "_diag_id"
        df = df.withColumn(id_col, F.monotonically_increasing_id())
    tid = str(
        conf.get("transformType", conf.get("macrobase.analysis.transformType", "MAD"))
    ).lower()
    out_dir = _diag_key(conf, "outDir", "target/scores")
    model = None
    if tid == "kde":
        sample = _collect_sample(df, metrics, int(conf.get("trainSize", 4096)), 42)
        model = fit_kde(sample[np.lexsort(sample.T[::-1])])
        score_with = lambda g: kde_score(g, metrics, None, model=model)  # noqa: E731
    elif tid in ("gmm", "em_gmm", "expectmaxgmm"):
        sample = _collect_sample(df, metrics, int(conf.get("trainSize", 4096)), 42)
        model = fit_gmm(
            sample[np.lexsort(sample.T[::-1])], k=int(conf.get("numMixtures", 3))
        )
        score_with = lambda g: gmm_score(g, metrics, None, model=model)  # noqa: E731
    elif tid == "mad":
        if len(metrics) != 1:
            raise ValueError("MAD transform is univariate")
        m = metrics[0]
        med = float(df.agg(F.percentile(F.col(m), 0.5)).collect()[0][0])
        mad = float(
            df.agg(F.percentile(F.abs(F.col(m) - F.lit(med)), 0.5)).collect()[0][0]
        )
        if mad == 0.0:
            # legacy MAD.java:74-85 — 5% trimmed mean of sorted residuals
            # (degenerate metrics would otherwise NULL every score)
            from pyspark.sql import Window

            resid = df.withColumn("__r", F.abs(F.col(m) - F.lit(med)))
            mad = float(
                resid.withColumn(
                    "__rn", F.row_number().over(Window.orderBy("__r")) - 1
                )
                .withColumn("__nn", F.count(F.lit(1)).over(Window.partitionBy()))
                .where(
                    (F.col("__rn") >= F.floor(F.col("__nn") * 0.05))
                    & (F.col("__rn") < F.floor(F.col("__nn") * 0.95))
                )
                .agg(F.avg("__r"))
                .collect()[0][0]
            )
        score_with = lambda g: g.withColumn(  # noqa: E731
            "_SCORE", F.abs(F.col(m) - F.lit(med)) / F.lit(mad)
        )
    else:
        raise ValueError(f"unsupported grid-dumping transform {tid!r}")
    scored = score_with(df)

    grid_file = _diag_key(conf, "dumpScoreGrid")
    if grid_file:
        dump_scored_grid(
            df,
            metrics,
            score_with,
            f"{out_dir}/{grid_file}",
            points_per_dim=int(_diag_key(conf, "gridPointsPerDimension", 1000)),
        )
    score_file = _diag_key(conf, "scoreDataFile")
    if score_file:
        dump_before_after(
            df, scored, metrics, ["_SCORE"], id_col, f"{out_dir}/{score_file}"
        )
    mix_suffix = _diag_key(conf, "dumpMixtureComponents")
    if mix_suffix and model is not None and hasattr(model, "weights"):
        dump_mixture_components(model, mix_suffix, out_dir)

    # BatchingPercentileClassifier: r6 percentile of the score, flag >=
    from macrobase_spark.operators.legacy_transforms import _r6_fraction

    target = float(conf.get("targetPercentile", 0.99))
    n = scored.count()
    q = _r6_fraction(target * 100.0, n)
    cut = float(scored.agg(F.percentile(F.col("_SCORE"), q)).collect()[0][0])
    classified = scored.withColumn(
        OUTLIER_COL,
        F.when(
            F.isnan("_SCORE") | (F.col("_SCORE") >= F.lit(cut)), 1.0
        ).otherwise(0.0),
    )
    if _diag_key(conf, "dumpClassifier", False):
        name = conf.get("queryName", "default")
        classified = dump_classifier(
            classified, OUTLIER_COL, id_col, f"{out_dir}/{name}-dumpClassifier.txt"
        )
    explanation = _summarize(classified, conf, cube=False)
    return PipelineResult(classified, explanation)


def run_config(spark: SparkSession, conf: dict, base_dir: str = "") -> PipelineResult:
    """Load → classify → explain, per the reference pipeline contract.
    A `classifiers:` LIST runs as a chain (alexp Pipelines.
    getClassifiersChain); the summarizer consumes the final link's output."""
    pipeline = conf.get("pipeline", "BasicBatchPipeline")
    if pipeline == "BasicContextualBatchedPipeline":
        return _run_contextual(spark, conf, base_dir)
    if pipeline == "GridDumpingPipeline":
        return _run_grid_dumping(spark, conf, base_dir)
    cube = pipeline == "CubePipeline"
    # meanshift uses the dedicated summarizer regardless of the summarizer key
    if cube and conf.get("classifier", "").lower() in ("meanshift", "countmeanshift"):
        conf = {**conf, "summarizer": "countmeanshift"}
    if not cube and conf.get("classifier", "").lower() == "countmeanshift":
        conf = {**conf, "summarizer": "countmeanshift"}
    df = _load(spark, conf, base_dir)
    df, conf = _wire_time_column(df, conf)
    if conf.get("classifiers"):
        classified, out_col = classify_chain(df, list(conf["classifiers"]))
        explanation = _summarize(classified, conf, cube, outlier_col=out_col)
    else:
        classified = _classify(df, conf, cube)
        explanation = _summarize(classified, conf, cube)
    return PipelineResult(classified, explanation)
