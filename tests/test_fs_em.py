"""Fellegi–Sunter EM: parameter recovery, weight arithmetic, e2e dedupe.

The reference learns pair weights from labeled examples
(csv_example/csv_example.py:118 deduper.train()); fs_em.py is the classic
unsupervised alternative (Fellegi & Sunter 1969, Winkler 1988 EM).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dedupe_examples_ray.fs_em import (
    agreement_pattern_counts,
    fs_classify,
    fs_dedupe_dataset,
    fs_em_fit,
)


def _expected_histogram(m, u, p, N):
    """EXACT expected pattern counts under the FS mixture (deterministic —
    no sampling noise, so EM must recover the planted parameters)."""
    m, u = np.asarray(m), np.asarray(u)
    k = len(m)
    pats = np.arange(1 << k, dtype=np.uint32)
    G = ((pats[:, None] >> np.arange(k)[None, :]) & 1).astype(float)
    fm = np.prod(np.where(G == 1, m, 1 - m), axis=1)
    fu = np.prod(np.where(G == 1, u, 1 - u), axis=1)
    return pd.DataFrame({"pattern": pats, "n": N * (p * fm + (1 - p) * fu)})


def test_fs_em_recovers_planted_parameters():
    m = [0.95, 0.9, 0.85, 0.8]
    u = [0.05, 0.1, 0.2, 0.02]
    p = 0.07
    hist = _expected_histogram(m, u, p, N=1_000_000)
    fit = fs_em_fit(hist, n_fields=4)
    assert np.allclose(fit["m"], m, atol=0.02), fit["m"]
    assert np.allclose(fit["u"], u, atol=0.02), fit["u"]
    assert abs(fit["p"] - p) < 0.02, fit["p"]
    # agree weight positive, disagree weight negative, for every field
    assert all(w > 0 for w in fit["agree_weight"])
    assert all(w < 0 for w in fit["disagree_weight"])


def test_fs_em_label_switch_resolved():
    """Init can't flip the classes: m ends up the agreeing (match) side."""
    hist = _expected_histogram([0.9, 0.9], [0.1, 0.1], 0.5, N=10_000)
    fit = fs_em_fit(hist, n_fields=2, init_m=0.2, init_p=0.9)
    assert np.mean(fit["m"]) > np.mean(fit["u"])


def test_fs_em_empty_histogram_raises():
    with pytest.raises(ValueError, match="empty"):
        fs_em_fit(pd.DataFrame({"pattern": [], "n": []}), n_fields=2)
    with pytest.raises(ValueError, match="fields"):
        agreement_pattern_counts(None, [f"f_{i}" for i in range(21)])


def test_pattern_counts_and_classify_arithmetic(ray_session):
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({
        "id_a": pa.array(["a", "b", "c", "d"]),
        "id_b": pa.array(["w", "x", "y", "z"]),
        "f_one": pa.array([1.0, 1.0, 0.0, 0.2]),
        "f_two": pa.array([0.95, 0.1, 0.9, 0.0]),
    })
    ds = rd.from_arrow(t)
    hist = agreement_pattern_counts(ds, ["f_one", "f_two"], agree_threshold=0.88)
    got = dict(zip(hist["pattern"].astype(int), hist["n"].astype(int)))
    # patterns: bit0=f_one, bit1=f_two -> rows: 3, 1, 2, 0
    assert got == {3: 1, 1: 1, 2: 1, 0: 1}
    assert hist["n"].sum() == 4

    fit = {"m": [0.9, 0.9], "u": [0.1, 0.1], "p": 0.5,
           "agree_weight": [np.log2(9.0)] * 2,
           "disagree_weight": [np.log2(1 / 9.0)] * 2}
    out = (fs_classify(ds, fit, ["f_one", "f_two"]).to_pandas()
           .set_index("id_a"))
    w9 = np.log2(9.0)
    assert out.loc["a", "fs_weight"] == pytest.approx(2 * w9)
    assert out.loc["b", "fs_weight"] == pytest.approx(0.0)
    assert out.loc["d", "fs_weight"] == pytest.approx(-2 * w9)
    # p=0.5 -> posterior = sigmoid2(weight): both-agree ~0.988, both-disagree ~0.012
    assert bool(out.loc["a", "fs_match"]) is True
    assert bool(out.loc["d", "fs_match"]) is False
    assert out.loc["b", "fs_posterior"] == pytest.approx(0.5)


def test_fs_dedupe_e2e_matches_gold(ray_session):
    """Unsupervised FS-EM dedupe hits the same gold contract as the trained
    flagship on the synthesized pages corpus (no labels used anywhere)."""
    from dedupe_examples_ray.config import default_page_settings
    from dedupe_examples_ray.evaluate import evaluate_entity_map
    from dedupe_examples_ray.normalize import derive_page_fields
    from dedupe_examples_ray.synth import synth_pages_dataset

    full = synth_pages_dataset(150, seed=11)
    pages = full.drop_columns(["true_id"]).materialize()
    gold = full.select_columns(["url", "true_id"]).to_pandas()
    derived = pages.select_columns(["url", "text"]).map_batches(
        derive_page_fields, batch_format="pyarrow")
    entity, fit = fs_dedupe_dataset(derived, default_page_settings(), "url")
    assert all(mw > uw for mw, uw in zip(fit["m"], fit["u"]))
    scores = evaluate_entity_map(entity.to_pandas(), gold)
    assert scores["f1"] >= 0.99, (scores, fit)


# --------------------------------------------------------- cluster_eval_metrics
def _brute_b3_ari(pred, gold):
    """Independent O(n^2) reference: per-record B3 from pair membership,
    ARI from pair-confusion counts."""
    import itertools

    n = len(pred)
    bp = br = 0.0
    for i in range(n):
        same_p = [j for j in range(n) if pred[j] == pred[i]]
        same_g = [j for j in range(n) if gold[j] == gold[i]]
        both = len(set(same_p) & set(same_g))
        bp += both / len(same_p)
        br += both / len(same_g)
    a = b = c = d = 0
    for i, j in itertools.combinations(range(n), 2):
        sp, sg = pred[i] == pred[j], gold[i] == gold[j]
        a += sp and sg; b += sp and not sg; c += (not sp) and sg; d += not (sp or sg)
    tot = a + b + c + d
    exp = (a + b) * (a + c) / tot
    mx = ((a + b) + (a + c)) / 2
    ari = (a - exp) / (mx - exp) if mx != exp else 1.0
    return bp / n, br / n, ari


def test_cluster_eval_metrics_matches_bruteforce(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.evaluate import cluster_eval_metrics

    pred = ["a", "a", "a", "b", "b", "c", None, None]
    gold = ["x", "x", "y", "y", "y", "z", "z", None]
    ds = rd.from_arrow(pa.table({"p": pa.array(pred), "g": pa.array(gold)}))
    out = cluster_eval_metrics(ds, "p", "g").iloc[0]
    # brute force treats each NULL as its own value on the B3 side? No —
    # SQL GROUP BY puts all NULLs in ONE group; mirror that with a sentinel
    sent_p = [v if v is not None else "__null__" for v in pred]
    sent_g = [v if v is not None else "__null__" for v in gold]
    bp, br, ari = _brute_b3_ari(sent_p, sent_g)
    assert out["b3_precision"] == pytest.approx(bp, abs=1e-6)
    assert out["b3_recall"] == pytest.approx(br, abs=1e-6)
    assert out["ari"] == pytest.approx(ari, abs=1e-6)
    assert out["n_records"] == 8


def test_cluster_eval_metrics_perfect_and_degenerate(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.evaluate import cluster_eval_metrics

    # identical clusterings -> all metrics 1.0
    ds = rd.from_arrow(pa.table({"p": ["a", "a", "b"], "g": ["u", "u", "v"]}))
    out = cluster_eval_metrics(ds, "p", "g").iloc[0]
    assert out["b3_f1"] == 1.0 and out["ari"] == 1.0
    # everything-one-cluster vs all-singletons: B3 precision = 1/n per record
    ds2 = rd.from_arrow(pa.table({"p": ["k"] * 4, "g": ["1", "2", "3", "4"]}))
    out2 = cluster_eval_metrics(ds2, "p", "g").iloc[0]
    assert out2["b3_precision"] == pytest.approx(0.25)
    assert out2["b3_recall"] == 1.0


# ------------------------------------------------------------- TF adjustment
def test_fs_tf_adjustment_rare_vs_common(ray_session):
    """Agreement on a RARE exact value gains bits; on a COMMON value loses
    bits — enough to flip a borderline pair in each direction."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from dedupe_examples_ray.config import Field, Settings
    from dedupe_examples_ray.fs_em import (field_value_frequencies,
                                           fs_classify, fs_classify_tf)

    # corpus: 40 records in city "common", 2 in "rare"
    n = 42
    ids = [f"r{i}" for i in range(n)]
    city = ["common"] * 40 + ["rare", "rare"]
    rec = pa.table({"rid": pa.array(ids), "city": pa.array(city)})
    records_ref = ray.put(rec)
    freqs = field_value_frequencies(
        rd.from_arrow(rec), "city")
    settings = Settings(fields=[Field("name", "string"),
                                Field("city", "exact")],
                        predicates=[], weights={}, bias=0.0, threshold=0.5)

    # two pairs: name disagrees, city agrees — one common-city, one rare-city
    feats = rd.from_arrow(pa.table({
        "id_a": pa.array(["r0", "r40"]),
        "id_b": pa.array(["r1", "r41"]),
        "f_name": pa.array([0.1, 0.1]),
        "f_city": pa.array([1.0, 1.0]),
    }))
    fit = {"m": [0.7, 0.95], "u": [0.05, 0.3], "p": 0.3,
           "agree_weight": [np.log2(0.7 / 0.05), np.log2(0.95 / 0.3)],
           "disagree_weight": [np.log2(0.3 / 0.95), np.log2(0.05 / 0.7)]}
    plain = fs_classify(feats, fit, ["f_name", "f_city"]).to_pandas()
    tf = fs_classify_tf(feats, fit, ["f_name", "f_city"], settings,
                        records_ref, {"city": freqs}, n_records=n).to_pandas()
    # plain: identical weights for both pairs
    assert plain["fs_weight"].iloc[0] == pytest.approx(plain["fs_weight"].iloc[1])
    # TF: common-city pair loses bits (p_v=40/42 > u=0.3), rare gains
    assert tf["fs_tf_adjust"].iloc[0] < 0 < tf["fs_tf_adjust"].iloc[1]
    common_adj = np.log2(0.3) - np.log2(40 / 42)
    rare_adj = np.log2(0.3) - np.log2(2 / 42)
    assert tf["fs_tf_adjust"].iloc[0] == pytest.approx(common_adj, abs=1e-9)
    assert tf["fs_tf_adjust"].iloc[1] == pytest.approx(rare_adj, abs=1e-9)
    # the rare-city pair classifies as a match, the common one does not
    assert bool(tf["fs_match"].iloc[1]) and not bool(tf["fs_match"].iloc[0])


def test_fs_tf_adjustment_clamped_and_gated(ray_session):
    """No adjustment when the field DISAGREES or the value is unknown; the
    per-field adjustment is clamped to +/- max_adjust_bits."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from dedupe_examples_ray.config import Field, Settings
    from dedupe_examples_ray.fs_em import fs_classify_tf

    rec = pa.table({"rid": pa.array(["a", "b", "c", "d"]),
                    "city": pa.array(["x", "x", "y", None])})
    freqs = pa.table({"value": pa.array(["x"]),
                      "n": pa.array([2], pa.int64())})  # "y" unknown
    settings = Settings(fields=[Field("city", "exact")],
                        predicates=[], weights={}, bias=0.0, threshold=0.5)
    feats = rd.from_arrow(pa.table({
        "id_a": pa.array(["a", "c", "a", "d"]),
        "id_b": pa.array(["b", "c", "c", "d"]),
        "f_city": pa.array([1.0, 1.0, 0.0, 1.0]),
    }))
    fit = {"m": [0.9], "u": [0.5], "p": 0.5,
           "agree_weight": [np.log2(0.9 / 0.5)],
           "disagree_weight": [np.log2(0.1 / 0.5)]}
    out = fs_classify_tf(
        feats, fit, ["f_city"], settings, ray.put(rec), {"city": freqs},
        n_records=1_000_000, max_adjust_bits=3.0).to_pandas()
    # pair 0 agrees on known "x": clamp hits (log2(.5)-log2(2e-6) >> 3)
    assert out["fs_tf_adjust"].iloc[0] == pytest.approx(3.0)
    # pair 1 agrees on UNKNOWN value "y" -> no adjustment
    assert out["fs_tf_adjust"].iloc[1] == 0.0
    # pair 2 disagrees -> no adjustment
    assert out["fs_tf_adjust"].iloc[2] == 0.0
    # pair 3 agrees on NULL -> value lookup NaN -> no adjustment
    assert out["fs_tf_adjust"].iloc[3] == 0.0
    with pytest.raises(ValueError, match="frequency table"):
        fs_classify_tf(feats, fit, ["f_city"], settings, ray.put(rec),
                       {"nope": freqs}, n_records=4)


def test_fs_dedupe_tf_adjusted_e2e(ray_session):
    """tf_adjust=True flows through the full unsupervised pipeline and keeps
    the gold contract (rare hosts gain evidence; nothing regresses)."""
    from dedupe_examples_ray.config import default_page_settings
    from dedupe_examples_ray.evaluate import evaluate_entity_map
    from dedupe_examples_ray.normalize import derive_page_fields
    from dedupe_examples_ray.synth import synth_pages_dataset

    full = synth_pages_dataset(120, seed=23)
    gold = full.select_columns(["url", "true_id"]).to_pandas()
    derived = full.select_columns(["url", "text"]).map_batches(
        derive_page_fields, batch_format="pyarrow")
    entity, fit = fs_dedupe_dataset(derived, default_page_settings(), "url",
                                    tf_adjust=True)
    scores = evaluate_entity_map(entity.to_pandas(), gold)
    assert scores["f1"] >= 0.99, (scores, fit)
