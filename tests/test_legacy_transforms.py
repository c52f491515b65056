"""Legacy v0.x transforms/stats vs numpy mirrors (reference legacy/
analysis/stats + analysis/transform; file:line map in
operators/legacy_transforms.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from macrobase_spark.operators.legacy_transforms import (
    SpaceSaving,
    acf_fft,
    acf_peaks,
    autocorrelation_df,
    gaussian_fit,
    gaussian_mahalanobis,
    linear_normalize,
    low_metric_transform,
    projection_matrix,
    random_projection,
    truncate_features,
    winsorize,
    z_score,
)


@pytest.fixture(scope="module")
def tdf(spark):
    rng = np.random.default_rng(31)
    rows = [
        (int(i), round(float(rng.normal(10, 4)), 3), round(float(rng.uniform(1, 9)), 3))
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "rid long, x double, y double"), np.array(
        [(r[1], r[2]) for r in rows]
    )


def test_z_score_population_std(spark, tdf):
    df, arr = tdf
    got = {r["rid"]: r["_SCORE"] for r in z_score(df, "x").collect()}
    m, s = arr[:, 0].mean(), arr[:, 0].std()  # population std (/n)
    for i in range(400):
        assert got[i] == pytest.approx(abs(arr[i, 0] - m) / s)


def test_winsorize_r6_bounds(spark, tdf):
    df, arr = tdf
    got = {r["rid"]: r["x"] for r in winsorize(df, ["x"], 5.0).collect()}
    # commons-math R-6: pos = p/100*(n+1), interpolate sorted values
    v = np.sort(arr[:, 0])
    n = len(v)

    def r6(p):
        pos = p / 100 * (n + 1)
        if pos < 1:
            return v[0]
        if pos >= n:
            return v[-1]
        lo = int(np.floor(pos))
        return v[lo - 1] + (pos - lo) * (v[lo] - v[lo - 1])

    lo, hi = r6(5.0), r6(95.0)
    exp = np.clip(arr[:, 0], lo, hi)
    for i in range(400):
        assert got[i] == pytest.approx(exp[i], abs=1e-12)
    assert min(got.values()) == pytest.approx(lo)


def test_linear_normalize_zero_extrema_quirk(spark):
    # all-positive data: the reference's min stays 0 (zero-initialized)
    df = spark.createDataFrame([(i, float(i + 5)) for i in range(10)], "rid long, x double")
    got = {r["rid"]: r["x"] for r in linear_normalize(df, ["x"]).collect()}
    for i in range(10):
        assert got[i] == pytest.approx((i + 5) / 14.0)  # min=0 (!), max=14


def test_low_metric_and_truncate(spark):
    df = spark.createDataFrame(
        [(0, 2.0, 1.0), (1, 0.05, 2.0), (2, -3.0, 3.0)], "rid long, x double, y double"
    )
    got = {r["rid"]: r["x"] for r in low_metric_transform(df, ["x"]).collect()}
    assert got == {0: pytest.approx(0.5), 1: pytest.approx(10.0), 2: pytest.approx(10.0)}
    t = truncate_features(df, ["x", "y"], 1)
    assert "y" not in t.columns and "x" in t.columns


def test_random_projection_matches_numpy(spark, tdf):
    df, arr = tdf
    m = projection_matrix(2, 3, seed=7)
    got = random_projection(df, ["x", "y"], 3, seed=7).collect()
    exp = arr @ m.T
    for r in got:
        i = r["rid"]
        for j in range(3):
            assert r[f"rp{j}"] == pytest.approx(exp[i, j])


def test_acf_fft_matches_direct_sums():
    rng = np.random.default_rng(13)
    v = np.sin(np.arange(200) * 2 * np.pi / 20) + rng.normal(0, 0.1, 200)
    c = acf_fft(v, 40)
    vm = v - v.mean()
    r0 = float(vm @ vm)
    for lag in range(1, 40):
        assert c[lag] == pytest.approx(float(vm[:-lag] @ vm[lag:]) / r0, abs=1e-9)
    # the planted period-20 cycle produces a peak at lag 20
    peaks, max_acf = acf_peaks(c, 0.2)
    assert 20 in peaks and max_acf > 0.5


def test_autocorrelation_df_per_key(spark):
    rows = []
    for i in range(300):
        rows.append(("cyc", int(i), float(np.sin(i * 2 * np.pi / 10))))
        rows.append(("flat", int(i), float(i % 2)))
    df = spark.createDataFrame(rows, "key string, t long, value double")
    res = autocorrelation_df(df, ["key"], "t", "value", 15).collect()
    by = {}
    for r in res:
        by.setdefault(r["key"], {})[r["lag"]] = r["acf"]
    assert by["cyc"][10] == pytest.approx(1.0, abs=0.05)  # period recovered
    assert by["flat"][2] == pytest.approx(1.0, abs=0.05)
    assert by["flat"][1] == pytest.approx(-1.0, abs=0.05)


def test_gaussian_fit_and_mahalanobis(spark, tdf):
    df, arr = tdf
    mean, cov, inv, singular = gaussian_fit(df, ["x", "y"])
    assert not singular
    assert mean == pytest.approx(arr.mean(axis=0))
    assert cov == pytest.approx(np.cov(arr.T, ddof=1), rel=1e-9)
    got = {r["rid"]: r["_SCORE"] for r in gaussian_mahalanobis(df, ["x", "y"], mean, inv).collect()}
    pinv = np.linalg.inv(np.cov(arr.T, ddof=1))
    for i in (0, 17, 399):
        d = arr[i] - arr.mean(axis=0)
        assert got[i] == pytest.approx(float(d @ pinv @ d), rel=1e-6)


def test_gaussian_singular_fallback(spark):
    # y = 2x exactly -> singular covariance -> SVD pseudo-inverse path
    df = spark.createDataFrame(
        [(i, float(i), float(2 * i)) for i in range(20)], "rid long, x double, y double"
    )
    mean, cov, inv, singular = gaussian_fit(df, ["x", "y"])
    assert singular
    assert np.allclose(inv, np.linalg.pinv(cov))


def test_space_saving_bounds():
    ss = SpaceSaving(5)
    rng = np.random.default_rng(3)
    true = {}
    stream = list(rng.choice(list("abcdefgh"), 500, p=[0.4, 0.2, 0.15, 0.1, 0.05, 0.04, 0.03, 0.03]))
    for x in stream:
        ss.observe(x)
        true[x] = true.get(x, 0) + 1
    assert ss.get_total_count() == 500
    # overreport bound: true <= est, and heavy hitters are retained
    counts = ss.get_counts()
    assert len(counts) == 5
    for k, est in counts.items():
        assert est >= true[k]
    top2 = sorted(true, key=true.get)[-2:]
    assert set(top2) <= set(counts)
    ss.multiply_all_counts(0.5)
    assert ss.get_total_count() == 250
