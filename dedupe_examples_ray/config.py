"""Field model + settings artifact.

Plays the role of the reference's field-variable list and settings file:

- fields list -> ``Dedupe(fields)`` (csv_example.py:102-110,
  record_linkage_example.py:109-116, patent_example.py:113-124)
- settings artifact -> ``write_settings`` / ``StaticDedupe(f)`` round-trip
  (csv_example.py:94-97,143-144): a JSON blob holding the compared fields,
  the blocking predicates, the trained logistic weights and the threshold,
  loaded once per scoring actor instead of retraining.
- interactions -> ``Interaction("a", "b")`` (patent_example.py:120-123):
  product feature of two other variables' similarities.
- ``fit_logistic`` replaces the interactive ``console_label``+``train`` loop
  (csv_example.py:130-134) with deterministic full-batch logistic regression
  over programmatically labeled pairs.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

import numpy as np

COMPARATORS = (
    "string",       # batched normalized Levenshtein similarity
    "jaro_winkler",
    "affine_gap",
    "text",         # TF-IDF token cosine (needs corpus IDF stats)
    "token_cosine", # TF-IDF cosine over precomputed list<uint64> token-hash
                    # signatures (normalize.token_signature_array) — the
                    # zero-Python-object scale path for long text fields
    "exact",
    "categorical",
    "price",
    "set",          # Jaccard over list<string>
    "latlong",      # haversine -> similarity
)


@dataclass(frozen=True)
class Field:
    column: str
    comparator: str = "string"
    has_missing: bool = False
    name: str | None = None  # feature name; defaults to column (patent_example.py:114-119 names)

    @property
    def feature(self) -> str:
        return self.name or self.column

    def to_dict(self) -> dict:
        return {
            "column": self.column,
            "comparator": self.comparator,
            "has_missing": self.has_missing,
            "name": self.name,
        }


@dataclass
class Settings:
    fields: list[Field]
    predicates: list[dict] = field(default_factory=list)  # [{"kind","column",**params}]
    interactions: list[tuple[str, str]] = field(default_factory=list)
    weights: dict[str, float] = field(default_factory=dict)
    bias: float = 0.0
    threshold: float = 0.5
    max_block_size: int = 200           # salting cap for hot blocking keys (SURVEY.md §4)
    oversize_policy: str = "salt"       # "salt" | "drop" | "keep"

    def feature_names(self) -> list[str]:
        names = [f.feature for f in self.fields]
        for f in self.fields:
            if f.has_missing:
                names.append(f.feature + "__missing")
        for a, b in self.interactions:
            names.append(f"{a}*{b}")
        return names

    def weight_vector(self) -> np.ndarray:
        return np.array([self.weights.get(n, 0.0) for n in self.feature_names()], dtype=np.float64)

    def to_json(self) -> str:
        return json.dumps(
            {
                "fields": [f.to_dict() for f in self.fields],
                "predicates": self.predicates,
                "interactions": [list(t) for t in self.interactions],
                "weights": self.weights,
                "bias": self.bias,
                "threshold": self.threshold,
                "max_block_size": self.max_block_size,
                "oversize_policy": self.oversize_policy,
            },
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, s: str) -> "Settings":
        d = json.loads(s)
        return cls(
            fields=[Field(**f) for f in d["fields"]],
            predicates=d.get("predicates", []),
            interactions=[tuple(t) for t in d.get("interactions", [])],
            weights=d.get("weights", {}),
            bias=d.get("bias", 0.0),
            threshold=d.get("threshold", 0.5),
            max_block_size=d.get("max_block_size", 200),
            oversize_policy=d.get("oversize_policy", "salt"),
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "Settings":
        with open(path) as f:
            return cls.from_json(f.read())

    def fingerprint(self) -> str:
        """Stable hash for checkpoint-manifest invalidation.

        Folds in the session token-signature width so persisted stages built
        under a different ``SIG_BITS_DEFAULT`` (e.g. pre-32-bit-flip 64-bit
        gazetteer/derive checkpoints) invalidate instead of silently mixing
        widths in the ``token_cosine`` intersection kernel.
        """
        from .normalize import SIG_BITS_DEFAULT

        payload = self.to_json() + f"|sig{SIG_BITS_DEFAULT}"
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


def fit_logistic(
    X: np.ndarray, y: np.ndarray, l2: float = 1e-3, iters: int = 300, lr: float = 1.0
) -> tuple[np.ndarray, float]:
    """Deterministic full-batch logistic regression (gradient descent).

    Replaces the reference's active-learning ``train()`` (mysql_example.py:174)
    when labeled pairs are available programmatically; no randomness.
    """
    n, d = X.shape
    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        g = p - y
        gw = X.T @ g / n + l2 * w
        gb = float(g.mean())
        w -= lr * gw
        b -= lr * gb
    return w, b


def sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(z, -30.0, 30.0)))


def default_page_settings() -> Settings:
    """Settings artifact for the flagship web-pages dedupe pipeline.

    Fields derive from ``normalize.derive_page_fields``; weights are a fixed
    artifact (the ``StaticDedupe`` path, csv_example.py:94-97) chosen so that
    near-duplicate perturbations (title/body edits) score >> threshold and
    unrelated pages score << threshold; validated by the gold-F1 e2e test.
    """
    return Settings(
        fields=[
            Field("title", "string"),
            # body compared via precomputed token-hash signatures — the
            # tokenize cost is per-record at derive time, the per-pair cost is
            # a numpy sorted-intersection (no Python strings in the scorer)
            Field("body_sig", "token_cosine", has_missing=True, name="body"),
            Field("host", "exact"),
            Field("path", "string", has_missing=True),
        ],
        # Selective predicate set: apex host co-blocks mirror copies (the
        # strong key for web dedupe); sorted-token window and char prefix add
        # cross-host coverage without first-token mega-blocks.  Hot keys
        # (generic title words) salt at max_block_size, bounding junk pairs
        # per record regardless of corpus size.
        predicates=[
            {"kind": "whole_field", "column": "host"},
            {"kind": "sorted_tokens", "column": "title", "n": 4},
            {"kind": "prefix", "column": "title", "n": 12},
        ],
        interactions=[],
        weights={
            "title": 6.0,
            "body": 5.0,
            "host": 1.0,
            "path": 1.0,
            "body__missing": -0.5,
            "path__missing": -0.5,
        },
        bias=-7.0,
        threshold=0.5,
        max_block_size=64,
        oversize_policy="salt",
    )


def inventor_settings() -> Settings:
    """Patent-example-style typed-field settings (Set/LatLong/Interaction,
    patent_example.py:113-124): two variables on the same name column plus
    their interaction, haversine latlong, Jaccard sets."""
    return Settings(
        fields=[
            Field("name", "string", name="name_string"),
            Field("name", "text", name="name_text"),
            Field("latlong", "latlong", has_missing=True),
            Field("class", "set", has_missing=True),
            Field("coauthor", "set", has_missing=True),
        ],
        interactions=[("name_string", "name_text")],
        predicates=[{"kind": "first_token", "column": "name"}],
        weights={
            "name_string": 6.0,
            "name_text": 2.0,
            "latlong": 3.0,
            "class": 2.0,
            "coauthor": 2.0,
            "latlong__missing": -0.5,
            "class__missing": -0.5,
            "coauthor__missing": -0.5,
            "name_string*name_text": 1.0,
        },
        bias=-9.0,
        threshold=0.5,
    )
