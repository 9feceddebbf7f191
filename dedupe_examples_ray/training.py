"""Training from labeled pairs + threshold tuning (T5/C6/C7/O4/O5).

The reference trains interactively: ``prepare_training`` samples candidate
pairs, ``console_label`` collects y/n judgments, ``train`` fits weights and
selects predicates, ``write_settings``/``write_training`` persist the result
(csv_example.py:115-144).  Interactivity is out of scope (SURVEY.md §2.3 T5);
this module keeps everything else:

- training file IO — the reference's labeled-pairs JSON shape
  {"match": [[rec_a, rec_b], ...], "distinct": [...]}
- ``train_settings`` — deterministic logistic fit over the labeled pairs'
  feature vectors (the non-interactive ``train()``)
- ``sample_training_pairs`` — candidate-pair sampling for labeling
  (``prepare_training`` sample_size semantics, record_linkage_example.py:127-131)
- ``tune_threshold`` — score-histogram sweep maximizing recall-weighted F
  (``Gazetteer.threshold(recall_weight=...)``, gazetteer_postgres_example.py:303)
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from .config import Settings, fit_logistic, sigmoid
from .scoring import PairScorer


def write_training(path: str, matches: list[tuple[dict, dict]], distincts: list[tuple[dict, dict]]):
    """Labeled-pairs JSON in the reference's training-file shape."""
    with open(path, "w") as f:
        json.dump(
            {
                "match": [[a, b] for a, b in matches],
                "distinct": [[a, b] for a, b in distincts],
            },
            f,
        )


def read_training(path: str) -> tuple[list, list]:
    with open(path) as f:
        d = json.load(f)
    return (
        [tuple(p) for p in d.get("match", [])],
        [tuple(p) for p in d.get("distinct", [])],
    )


def _pairs_to_batch(pairs: list[tuple[dict, dict]], columns: list[str]) -> pa.Table:
    cols: dict = {"id_a": pa.array([f"a{i}" for i in range(len(pairs))]),
                  "id_b": pa.array([f"b{i}" for i in range(len(pairs))])}
    for c in columns:
        cols[f"{c}_a"] = pa.array([a.get(c) for a, _ in pairs])
        cols[f"{c}_b"] = pa.array([b.get(c) for _, b in pairs])
    return pa.table(cols)


def train_settings(
    base: Settings,
    matches: list[tuple[dict, dict]],
    distincts: list[tuple[dict, dict]],
    idf: dict | None = None,
    l2: float = 1e-3,
    iters: int = 500,
    recall: float | None = None,
    candidate_predicates: list[dict] | None = None,
    sample_values: dict | None = None,
    df_map: dict | None = None,
) -> Settings:
    """Fit logistic weights on labeled record pairs -> new Settings artifact.

    Deterministic replacement for ``console_label`` + ``train()``; the result
    round-trips through ``Settings.save``/``load`` like the reference's
    settings file (C7).

    With ``recall`` set, the predicate set is SELECTED too (the reference's
    ``train(recall=0.90)`` cost/recall knob, mysql_example.py:169-174):
    greedy set-cover over ``candidate_predicates`` (default: the base
    settings' predicates) picking the cheapest subset that covers >= recall
    of the labeled matches — see ``select_predicates``.
    """
    cols = sorted({f.column for f in base.fields})
    scorer = PairScorer(base.to_json(), idf_ref=idf)
    X_parts = []
    y_parts = []
    for pairs, label in ((matches, 1.0), (distincts, 0.0)):
        if not pairs:
            continue
        X_parts.append(scorer.features(_pairs_to_batch(pairs, cols)))
        y_parts.append(np.full(len(pairs), label))
    if not X_parts:
        raise ValueError("no labeled pairs")
    X = np.vstack(X_parts)
    y = np.concatenate(y_parts)
    w, b = fit_logistic(X, y, l2=l2, iters=iters)
    out = Settings.from_json(base.to_json())
    out.weights = {name: float(w[j]) for j, name in enumerate(base.feature_names())}
    out.bias = float(b)
    if recall is not None:
        selected, achieved = select_predicates(
            candidate_predicates or base.predicates,
            matches,
            recall=recall,
            sample_values=sample_values,
            df_map=df_map,
        )
        if selected:
            out.predicates = selected
    return out


def _pair_key_sets(spec: dict, pairs: list[tuple[dict, dict]], df_map: dict | None):
    """Per labeled pair: (keys of a, keys of b) under one predicate spec."""
    from .blocking.predicates import emit_keys, emit_tfidf_canopy

    spec = dict(spec)
    kind = spec.pop("kind")
    col = spec.pop("column")
    out = []
    for side in (0, 1):
        arr = pa.array([p[side].get(col) for p in pairs])
        if kind == "tfidf_canopy":
            idx, keys = emit_tfidf_canopy(arr, df=df_map, **spec)
        elif kind == "rare_token":
            idx, keys = emit_keys("token", arr)
        else:
            idx, keys = emit_keys(kind, arr, **spec)
        sets: list[set] = [set() for _ in pairs]
        for i, k in zip(idx, keys.to_pylist()):
            sets[int(i)].add(k)
        out.append(sets)
    return out


def _predicate_cost(spec: dict, values: list, df_map: dict | None) -> float:
    """Comparison-cost estimate from block-size stats over a value sample:
    sum over blocks of n*(n-1)/2 (the Σ|B|² cost shape, SURVEY.md §4)."""
    from collections import Counter

    from .blocking.predicates import emit_keys, emit_tfidf_canopy

    spec = dict(spec)
    kind = spec.pop("kind")
    spec.pop("column", None)
    arr = pa.array(values)
    if kind == "tfidf_canopy":
        idx, keys = emit_tfidf_canopy(arr, df=df_map, **spec)
    elif kind == "rare_token":
        idx, keys = emit_keys("token", arr)
    else:
        idx, keys = emit_keys(kind, arr, **spec)
    sizes = Counter(keys.to_pylist())
    return sum(n * (n - 1) / 2 for n in sizes.values()) + 1.0


def select_predicates(
    candidates: list[dict],
    matches: list[tuple[dict, dict]],
    recall: float = 0.9,
    sample_values: dict | None = None,
    df_map: dict | None = None,
) -> tuple[list[dict], float]:
    """Greedy set-cover predicate selection under a recall constraint —
    the non-interactive ``train(recall=0.90)`` (mysql_example.py:169-174):
    pick the cheapest predicate subset whose blocks cover >= recall of the
    labeled match pairs.

    ``sample_values``: {column: [values...]} sample used for the block-size
    cost estimate (a labeled-data fallback is used when absent).
    ``df_map``: token->df index for tfidf_canopy candidates.
    Returns (selected specs, achieved coverage).
    """
    n = len(matches)
    if n == 0:
        raise ValueError("no labeled match pairs")
    covered = np.zeros(n, dtype=bool)
    cover_vecs = []
    costs = []
    for spec in candidates:
        ka, kb = _pair_key_sets(spec, matches, df_map)
        cover_vecs.append(np.array([bool(a & b) for a, b in zip(ka, kb)]))
        col = spec["column"]
        vals = (
            sample_values.get(col)
            if sample_values and col in sample_values
            else [p[s].get(col) for p in matches for s in (0, 1)]
        )
        costs.append(_predicate_cost(spec, vals, df_map))
    chosen: list[int] = []
    target = recall * n
    while covered.sum() < target:
        best, best_gain = None, 0.0
        for i, vec in enumerate(cover_vecs):
            if i in chosen:
                continue
            new = float((vec & ~covered).sum())
            if new <= 0:
                continue
            gain = new / costs[i]
            if gain > best_gain:
                best, best_gain = i, gain
        if best is None:
            break  # no candidate adds coverage — return best effort
        chosen.append(best)
        covered |= cover_vecs[best]
    return [candidates[i] for i in chosen], float(covered.sum()) / n


def sample_training_pairs(pairs_ds, sample_size: int = 1500, seed: int = 42):
    """Deterministic candidate-pair sample for labeling (O4 semantics)."""
    n = pairs_ds.count()
    frac = min(1.0, sample_size / max(n, 1))
    return pairs_ds.random_sample(frac, seed=seed)


def uncertainty_sample(
    hydrated_tbl: pa.Table,
    settings: Settings,
    k: int,
    idf: dict | None = None,
    exclude: set | None = None,
) -> list[int]:
    """Indices of the ``k`` MOST-UNCERTAIN pairs under the current weights
    (|p - 0.5| smallest) — the reference's active-learning query step
    (``uncertainPairs`` inside ``console_label``, csv_example.py:115-130),
    non-interactive.

    ``hydrated_tbl``: driver-side candidate sample with ``{col}_a/{col}_b``
    columns (bounded by ``sample_size`` — the reference holds its training
    sample in memory the same way).  ``exclude``: already-labeled indices.
    """
    scorer = PairScorer(settings.to_json(), idf_ref=idf)
    X = scorer.features(hydrated_tbl)
    p = sigmoid(X @ settings.weight_vector() + settings.bias)
    unc = np.abs(p - 0.5)
    order = np.argsort(unc, kind="stable")
    excl = exclude or set()
    return [int(i) for i in order if int(i) not in excl][:k]


def active_learning(
    records_ds,
    base: Settings,
    id_col: str,
    label_fn,
    rounds: int = 5,
    k: int = 10,
    sample_size: int = 1500,
    seed: int = 42,
    idf: dict | None = None,
) -> tuple[Settings, list[dict]]:
    """Non-interactive active-learning loop: ``prepare_training`` +
    ``console_label`` + ``train`` (csv_example.py:115-144) with a
    programmatic labeler in place of the REPL.

    Per round: score the blocked candidate SAMPLE under the current weights,
    pick the ``k`` most-uncertain unlabeled pairs, label them via
    ``label_fn(rec_a: dict, rec_b: dict) -> bool`` (dicts carry ``id_col`` +
    every compared field), refit the logistic weights on all labels so far.
    Total label budget = ``rounds * k``.

    Scale posture: blocking + candidate generation + sampling + hydration are
    all distributed (fingerprint -> candidate_pairs -> random_sample ->
    semi_hydrate); only the ``sample_size``-bounded hydrated sample lands on
    the driver — mirroring the reference, whose active learner also trains
    on an in-memory sample.  Returns (trained Settings, per-round history).
    """
    import ray

    from .blocking import fingerprint_dataset
    from .pairs import candidate_pairs
    from .scoring import semi_hydrate

    cols = sorted({f.column for f in base.fields})
    blocks = fingerprint_dataset(records_ds, base, id_col, [])
    pairs = candidate_pairs(
        blocks, id_col, [],
        max_block_size=base.max_block_size, policy=base.oversize_policy,
    )
    sample = sample_training_pairs(pairs, sample_size=sample_size, seed=seed)
    # the reference's prepare_training draws from BOTH a blocked sample
    # (match-dense) and a random-pair sample (distinct-dense) so the learner
    # sees each class (dedupe's blocked/random sample split); build the
    # random side from two independently-seeded id samples zipped pairwise
    import pyarrow.compute as pc_

    ids_ds = sample_training_pairs(
        records_ds.select_columns([id_col]), sample_size=sample_size, seed=seed + 1
    )
    la = [t for t in ray.get(ids_ds.to_arrow_refs()) if t.num_rows]
    rand_tbl = None
    if la:
        ids = pa.concat_tables(la)[id_col].combine_chunks()
        rng = np.random.default_rng(seed + 1)
        p1 = rng.permutation(len(ids))
        p2 = rng.permutation(len(ids))
        a = ids.take(pa.array(p1, pa.int64()))
        b = ids.take(pa.array(p2, pa.int64()))
        keep = pc_.invert(pc_.equal(a, b))
        rand_tbl = pa.table({"id_a": a, "id_b": b}).filter(keep)
    pool = sample.select_columns(["id_a", "id_b"])
    if rand_tbl is not None and rand_tbl.num_rows:
        import ray.data as rd

        pool = pool.union(rd.from_arrow(rand_tbl))
    hyd = semi_hydrate(pool, records_ds, id_col, cols)
    tbls = [t for t in ray.get(hyd.to_arrow_refs()) if t.num_rows]
    if not tbls:
        raise ValueError("no candidate pairs to learn from")
    tbl = pa.concat_tables(tbls).combine_chunks()
    # seeded shuffle: uncertainty ties (e.g. the zero-weight cold start)
    # then interleave blocked and random pairs instead of exhausting the
    # match-dense blocked prefix first
    perm = np.random.default_rng(seed).permutation(tbl.num_rows)
    tbl = tbl.take(pa.array(perm, pa.int64()))

    def rec(side: str, i: int) -> dict:
        out = {id_col: tbl[f"id_{side[0]}"][i].as_py()}
        for c in cols:
            out[c] = tbl[f"{c}_{side[0]}"][i].as_py()
        return out

    cur = Settings.from_json(base.to_json())
    matches: list = []
    distincts: list = []
    labeled: set = set()
    history: list[dict] = []
    for r in range(rounds):
        picked = uncertainty_sample(tbl, cur, k, idf=idf, exclude=labeled)
        if not picked:
            break
        for i in picked:
            labeled.add(i)
            a, b = rec("a", i), rec("b", i)
            (matches if label_fn(a, b) else distincts).append((a, b))
        if matches and distincts:
            # refit on ALL labels so far (the reference refits per label;
            # per-round is the batched equivalent)
            cur = train_settings(cur, matches, distincts, idf=idf)
        history.append(
            {"round": r, "labeled": len(labeled),
             "n_match": len(matches), "n_distinct": len(distincts)}
        )
    return cur, history


def tune_threshold(scored_df, true_pairs: set, recall_weight: float = 1.0) -> float:
    """Pick the score cutoff maximizing the recall-weighted F-score
    (reference O5: ``threshold(messy, recall_weight=1.0)``).

    ``scored_df``: pandas with id_a, id_b, score.  ``true_pairs``: set of
    frozenset id pairs.  Sweeps the observed score quantiles driver-side.
    """
    import pandas as pd  # noqa: F401

    scores = scored_df["score"].to_numpy()
    is_true = np.fromiter(
        (frozenset((a, b)) in true_pairs for a, b in zip(scored_df["id_a"], scored_df["id_b"])),
        dtype=bool,
        count=len(scored_df),
    )
    n_true = max(len(true_pairs), 1)
    best_t, best_f = 0.5, -1.0
    for t in np.unique(np.round(scores, 3)):
        sel = scores >= t
        found = int(sel.sum())
        tp = int((sel & is_true).sum())
        if found == 0:
            continue
        precision = tp / found
        recall = tp / n_true
        if precision + recall == 0:
            continue
        b2 = recall_weight**2
        f = (1 + b2) * precision * recall / (b2 * precision + recall)
        if f > best_f:
            best_f, best_t = f, float(t)
    return best_t
