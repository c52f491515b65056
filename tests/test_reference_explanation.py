"""Run the subspace explainers on the alexp fork's OWN benchmark dataset
(synth_multidim_010_000.csv — the HiCS-paper synthetic with ground-truth
relevant subspaces per planted anomaly and the dictated-outlier settings
file), read from the read-only reference tree. Parity evidence: the
engine's explainers recover the reference benchmark's labeled subspaces."""

import csv
import os
import re

import numpy as np
import pytest

REF_CSV = "/root/reference/alexp/data/explanation/hics_datasets/synth_multidim_010_000.csv"
REF_SET = "/root/reference/alexp/data/explanation/hics_datasets_settings/synth_multidim_010_000.yaml"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF_CSV), reason="reference explanation datasets absent"
)


def _load():
    rows = list(csv.reader(open(REF_CSV)))
    hdr = [h.strip() for h in rows[0]]
    feats = [h for h in hdr if h.startswith("var_")]
    fi = [hdr.index(f) for f in feats]
    si = hdr.index("subspaces")
    X = np.array([[float(r[i]) for i in fi] for r in rows[1:]])
    truth = {}
    for k, r in enumerate(rows[1:]):
        s = r[si].strip()
        if s:
            truth[k] = [
                tuple(int(x) for x in grp.split())
                for grp in re.findall(r"\[([0-9 ]+)\]", s)
            ]
    pois = [
        int(m.group(1))
        for m in re.finditer(r"-\s*(\d+)", open(REF_SET).read())
    ]
    return feats, X, truth, pois


def test_hics_recovers_reference_truth_subspaces():
    """The Monte-Carlo contrast search over the reference benchmark data
    ranks the planted 2-D subspaces at the top."""
    from macrobase_spark.operators.hics import hics_search

    feats, X, truth, _ = _load()
    found = hics_search(X, m=40, alpha=0.1, cutoff=20, dmax=2, stat_test="ks", seed=1)
    top = [s for s, _ in found[:8]]
    planted_pairs = {p for subs in truth.values() for p in subs if len(p) == 2}
    hits = planted_pairs & set(top)
    assert len(hits) >= 2, (sorted(planted_pairs), top)


def test_lookout_names_truth_subspace_for_dictated_outliers(spark):
    """LookOut over the dictated outliers (the settings file's POI list):
    most anomalies with a 2-D ground-truth subspace get it named."""
    from macrobase_spark.operators.subspace_explainers import lookout_explain

    feats, X, truth, pois = _load()
    poi_set = set(pois)
    rows = [
        (int(i), *map(float, X[i]), i in poi_set) for i in range(len(X))
    ]
    schema = "id long, " + ", ".join(f"{f} double" for f in feats) + ", poi boolean"
    df = spark.createDataFrame(rows, schema)
    res = {
        r["id"]: r["__REL_SUBSPACES"]
        for r in lookout_explain(
            df, feats, ["id"], "poi", budget=5, n_trees=60, train_rows=1000
        ).collect()
    }
    eligible = [
        i for i in pois if i in truth and any(len(p) == 2 for p in truth[i])
    ]
    assert len(eligible) >= 8
    named = 0
    for i in eligible:
        pairs = [p for p in truth[i] if len(p) == 2]
        label = res.get(i, "")
        if any(f"[{feats[a]},{feats[b]}]" in label for a, b in pairs):
            named += 1
    assert named >= len(eligible) * 0.5, (named, len(eligible))
