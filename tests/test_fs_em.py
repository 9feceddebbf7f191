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
