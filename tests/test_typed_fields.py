"""Patent-example-style typed fields end-to-end: Set / LatLong / Interaction
comparators, plus the normalizer helpers (M4/M5/M10/M12) and training/IO ops."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dedupe_examples_ray.config import Field, Settings, inventor_settings
from dedupe_examples_ray.evaluate import pairs_from_clusters, pairwise_scores
from dedupe_examples_ray.normalize import (
    latlong_struct,
    normalize_string_array,
    null_flag,
    parse_date,
    split_set_field,
)
from dedupe_examples_ray.pipelines import dedupe_dataset
from dedupe_examples_ray.synth import synth_inventors_table


def test_normalizer_helpers():
    ll = latlong_struct(pa.array([1.0, 0.0, None]), pa.array([2.0, 0.0, 3.0]))
    vals = ll.to_pylist()
    assert vals[0] == {"lat": 1.0, "lng": 2.0}
    assert vals[1] is None  # (0,0) sentinel
    s = split_set_field(pa.array(["B**a**none**a", "", None]))
    assert s.to_pylist() == [["a", "b"], None, None]
    assert null_flag(pa.array(["x", None])).to_pylist() == ["false", "true"]
    d = parse_date(pa.array(["02/28/1999", "bogus", None]))
    assert d[0].as_py() == pd.Timestamp("1999-02-28")
    assert d[1].as_py() is None and d[2].as_py() is None


@pytest.mark.parametrize("seed", [42])
def test_inventors_e2e_f1(ray_session, seed):
    import ray.data as rd

    tbl = synth_inventors_table(150, seed)
    gold_ids = tbl["person_id"].to_pylist()
    gold_tids = tbl["true_id"].to_pylist()

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "person_id": t["person_id"],
                "name": normalize_string_array(t["name"]),
                "latlong": latlong_struct(t["lat"], t["lng"]),
                "class": t["class"],
                "coauthor": t["coauthor"],
            }
        )

    ds = rd.from_arrow(tbl.drop_columns(["true_id"])).map_batches(prep, batch_format="pyarrow").materialize()
    entity = dedupe_dataset(
        ds, inventor_settings(), id_col="person_id", scorer_concurrency=2
    ).to_pandas()
    found = pairs_from_clusters(entity["record_id"].tolist(), entity["canon_id"].tolist())
    true = pairs_from_clusters([str(i) for i in gold_ids], gold_tids)
    scores = pairwise_scores(found, true)
    assert scores["f1"] >= 0.97, scores


def test_training_roundtrip_and_threshold(tmp_path):
    from dedupe_examples_ray.training import (
        read_training,
        train_settings,
        tune_threshold,
        write_training,
    )

    base = Settings(
        fields=[Field("name", "string")],
        predicates=[{"kind": "first_token", "column": "name"}],
    )
    matches = [({"name": "acme corp"}, {"name": "acme corp."}) for _ in range(30)]
    distincts = [({"name": "acme corp"}, {"name": "zebra ltd"}) for _ in range(30)]
    p = str(tmp_path / "training.json")
    write_training(p, matches, distincts)
    m2, d2 = read_training(p)
    assert len(m2) == 30 and len(d2) == 30

    fitted = train_settings(base, m2, d2)
    assert fitted.weights["name"] > 0  # similarity increases match probability
    from dedupe_examples_ray.config import sigmoid

    from dedupe_examples_ray.scoring import PairScorer

    sc = PairScorer(fitted.to_json())
    import pyarrow as _pa

    b = _pa.table(
        {
            "id_a": ["x", "y"],
            "id_b": ["p", "q"],
            "name_a": ["acme corp", "acme corp"],
            "name_b": ["acme corp.", "zebra ltd"],
        }
    )
    out = sc(b)["score"].to_pylist()
    assert out[0] > 0.8 and out[1] < 0.2

    scored = pd.DataFrame(
        {
            "id_a": ["a", "b", "c", "d"],
            "id_b": ["w", "x", "y", "z"],
            "score": [0.9, 0.8, 0.4, 0.3],
        }
    )
    true = {frozenset(("a", "w")), frozenset(("b", "x"))}
    t = tune_threshold(scored, true)
    assert 0.4 < t <= 0.8  # cuts off the two false candidates


def test_sources_io(ray_session, tmp_path):
    import ray.data as rd

    from dedupe_examples_ray.sources import (
        read_tagged_sources,
        repair_ragged_lines,
        write_annotated_output,
    )

    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pa.parquet.write_table(pa.table({"rid": [1, 2], "v": ["x", "y"]}), a)
    pa.parquet.write_table(pa.table({"rid": [3], "v": ["z"]}), b)
    tagged = read_tagged_sources([a, b]).to_pandas().sort_values("rid")
    assert tagged["source_file"].tolist() == [0, 0, 1]

    lines = rd.from_items([{"text": "a\tb\tc"}, {"text": "short\tline"}, {"text": "d\te\tf"}])
    fixed = repair_ragged_lines(lines, 3, column_names=["x", "y", "z"]).to_pandas()
    assert len(fixed) == 2 and list(fixed.columns) == ["x", "y", "z"]

    records = rd.from_arrow(pa.table({"rid": ["1", "2"], "payload": ["p", "q"]}))
    entity = rd.from_arrow(
        pa.table(
            {
                "record_id": ["1", "2"],
                "canon_id": ["1", "1"],
                "cluster_score": pa.array([0.9, 0.9], pa.float64()),
            }
        )
    )
    out = write_annotated_output(records, entity, "rid").to_pandas().sort_values("rid")
    assert out["cluster_id"].tolist() == ["1", "1"]
    assert out["payload"].tolist() == ["p", "q"]


def test_register_comparator_plugin():
    import numpy as np

    from dedupe_examples_ray.scoring import PairScorer, register_comparator

    register_comparator("always_half", lambda a, b: np.full(len(a), 0.5))
    s = Settings(fields=[Field("name", "always_half")], weights={"name": 4.0}, bias=-1.0)
    sc = PairScorer(s.to_json())
    out = sc(
        pa.table({"id_a": ["1"], "id_b": ["2"], "name_a": ["x"], "name_b": ["y"]})
    )["score"].to_pylist()
    # sigmoid(0.5*4 - 1) = sigmoid(1)
    assert out[0] == pytest.approx(1 / (1 + np.exp(-1.0)))


def test_us_address_plugin():
    import numpy as np

    from dedupe_examples_ray.plugins import us_address_sim

    a = ["123 N Main St", "123 north main street", "55 Oak Ave Apt 4", ""]
    b = ["123 North Main Street", "456 Elm Rd", "55 Oak Avenue Apt 4", "1 A St"]
    s = us_address_sim(a, b)
    assert s[0] > 0.95          # abbreviation-normalized match
    assert s[1] < 0.6           # different number + street
    assert s[2] > 0.95          # unit matches through Apt normalization
    assert s[3] == 0.0          # empty side
    assert np.all((0.0 <= s) & (s <= 1.0))
