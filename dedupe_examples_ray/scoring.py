"""Pairwise scoring — actor-pool stage (reference ``Dedupe.score``, T3).

The reference scores pair streams with a trained logistic model over
per-field distances, fanned out over ``num_cores`` subprocesses
(mysql_example/mysql_example.py:269-271, num_cores mysql_example.py:118,134).
Here it is a ``map_batches`` actor pool: the settings artifact (weights +
comparators) and the broadcast IDF stats load once per actor in ``__init__``;
``__call__`` computes a feature matrix per Arrow batch (batched Levenshtein
kernel for string fields — no per-pair Python in the hot path) and applies the
logistic model vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .config import Settings, sigmoid
from .distances import (
    affine_gap_sim,
    batch_jaro_winkler,
    batch_levenshtein_sim,
    cosine_tokens,
    exact_sim,
    haversine_sim,
    jaccard,
    price_sim,
    tokens,
)


class PairScorer:
    """Callable class for ``map_batches(PairScorer, concurrency=N)``.

    Input batches: columns ``id_a, id_b, {field}_a, {field}_b`` (denormalized
    by pair generation).  Output: ``id_a, id_b, score``.
    """

    def __init__(self, settings_json: str, idf_ref=None, keep_features: bool = False):
        self.settings = Settings.from_json(settings_json)
        self.keep_features = keep_features
        self.idf: dict | None = None
        if idf_ref is not None:
            try:
                import ray

                if isinstance(idf_ref, ray.ObjectRef):
                    idf_ref = ray.get(idf_ref)
            except ImportError:
                pass
            self.idf = dict(idf_ref)
        self._w = self.settings.weight_vector()
        self._names = self.settings.feature_names()

    def _field_sim(self, comparator: str, a_list, b_list) -> np.ndarray:
        if comparator == "string":
            return batch_levenshtein_sim(a_list, b_list)
        if comparator == "jaro_winkler":
            return batch_jaro_winkler(a_list, b_list)
        if comparator == "affine_gap":
            return np.array(
                [affine_gap_sim(a or "", b or "") if a and b else 0.0 for a, b in zip(a_list, b_list)]
            )
        if comparator == "text":
            return np.array(
                [cosine_tokens(tokens(a), tokens(b), self.idf) for a, b in zip(a_list, b_list)]
            )
        if comparator in ("exact", "categorical"):
            return np.array([exact_sim(a, b) for a, b in zip(a_list, b_list)])
        if comparator == "price":
            return np.array(
                [price_sim(a, b) if a is not None and b is not None else 0.0 for a, b in zip(a_list, b_list)]
            )
        if comparator == "set":
            return np.array(
                [
                    jaccard(frozenset(a), frozenset(b)) if a and b else 0.0
                    for a, b in zip(a_list, b_list)
                ]
            )
        if comparator == "latlong":
            out = np.zeros(len(a_list))
            for i, (a, b) in enumerate(zip(a_list, b_list)):
                if a is not None and b is not None:
                    out[i] = haversine_sim(a["lat"], a["lng"], b["lat"], b["lng"])
            return out
        raise ValueError(f"unknown comparator {comparator!r}")

    def features(self, batch: pa.Table) -> np.ndarray:
        n = batch.num_rows
        feats: dict[str, np.ndarray] = {}
        for f in self.settings.fields:
            a_list = batch[f"{f.column}_a"].to_pylist()
            b_list = batch[f"{f.column}_b"].to_pylist()
            sim = self._field_sim(f.comparator, a_list, b_list)
            missing = np.array(
                [a is None or b is None or a == "" or b == "" for a, b in zip(a_list, b_list)]
            )
            sim = np.where(missing, 0.0, sim)
            feats[f.feature] = sim
            if f.has_missing:
                feats[f.feature + "__missing"] = missing.astype(np.float64)
        for a, b in self.settings.interactions:
            feats[f"{a}*{b}"] = feats[a] * feats[b]
        X = np.zeros((n, len(self._names)))
        for j, name in enumerate(self._names):
            X[:, j] = feats[name]
        return X

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = self.features(batch)
        score = sigmoid(X @ self._w + self.settings.bias)
        cols = {
            "id_a": batch["id_a"],
            "id_b": batch["id_b"],
            "score": pa.array(score, pa.float64()),
        }
        if self.keep_features:
            for j, name in enumerate(self._names):
                cols["f_" + name.replace("*", "_x_")] = pa.array(X[:, j], pa.float64())
        return pa.table(cols)


def score_pairs(
    pairs_ds,
    settings: Settings,
    idf: dict | None = None,
    concurrency: int | tuple = (1, 4),
    batch_size: int = 4096,
    keep_features: bool = False,
):
    """Score a candidate-pair Dataset -> (id_a, id_b, score) Dataset."""
    idf_ref = None
    if idf is not None:
        import ray

        idf_ref = idf if isinstance(idf, ray.ObjectRef) else ray.put(idf)
    return pairs_ds.map_batches(
        PairScorer,
        fn_constructor_kwargs=dict(
            settings_json=settings.to_json(), idf_ref=idf_ref, keep_features=keep_features
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def threshold_edges(scored_ds, threshold: float):
    """Keep edges with score >= threshold (reference ``partition(..., 0.5)``)."""
    import pyarrow.compute as pc

    return scored_ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["score"], threshold)), batch_format="pyarrow"
    )
