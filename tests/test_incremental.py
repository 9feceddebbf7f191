"""Incremental snapshot-over-snapshot dedup against the persisted signature
store (ops/incremental.py): exact + minhash variants, generation layout,
idempotent re-runs, survivor-only store semantics."""

from __future__ import annotations

import os

import pandas as pd
import pytest

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen sleepy "
    "badgers carry bright copper kettles across the frozen northern river "
    "toward a distant market town full of cheerful merchants and musicians"
)
NEAR = BASE.replace("cheerful", "grumpy").replace("seventeen", "nineteen")
OTHER = (
    "completely unrelated content about spacecraft navigation systems using "
    "stellar parallax measurements combined with onboard atomic clocks to "
    "estimate heliocentric velocity during long interplanetary transfers"
)
THIRD = (
    "a third corpus document describing medieval agriculture crop rotation "
    "patterns three field systems oxen plough teams and the seasonal rhythm "
    "of planting harvesting and fallow years across feudal estates"
)


def _ds(rows):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(rows))


def _to_map(ds):
    df = ds.to_pandas()
    return {r["doc_id"]: (r["keep_id"], r["status"]) for _, r in df.iterrows()}


# ------------------------------------------------------------------- exact
def test_incremental_exact_two_snapshots(ray_session, tmp_path):
    from dedupe_examples_ray.ops import incremental_exact_dedup

    store = str(tmp_path / "store")
    snap_a = _ds(
        [
            {"doc_id": "a0", "text": BASE},
            {"doc_id": "a1", "text": BASE},  # dup within A
            {"doc_id": "a2", "text": OTHER},
        ]
    )
    got_a = _to_map(incremental_exact_dedup(snap_a, store, "A"))
    assert got_a == {
        "a0": ("a0", "unique"),
        "a1": ("a0", "dup_snapshot"),
        "a2": ("a2", "unique"),
    }

    snap_b = _ds(
        [
            {"doc_id": "b0", "text": BASE},  # already in store -> a0
            {"doc_id": "b1", "text": THIRD},
            {"doc_id": "b2", "text": THIRD},  # dup within B
        ]
    )
    got_b = _to_map(incremental_exact_dedup(snap_b, store, "B"))
    assert got_b == {
        "b0": ("a0", "dup_prior"),
        "b1": ("b1", "unique"),
        "b2": ("b1", "dup_snapshot"),
    }
    # generation layout: one immutable dir per snapshot
    gens = sorted(d for d in os.listdir(os.path.join(store, "exact"))
                  if d.startswith("snap-"))
    assert gens == ["snap-A", "snap-B"]


def test_incremental_exact_rerun_is_idempotent(ray_session, tmp_path):
    from dedupe_examples_ray.ops import incremental_exact_dedup

    store = str(tmp_path / "store")
    snap = _ds([{"doc_id": "a0", "text": BASE}, {"doc_id": "a1", "text": OTHER}])
    first = _to_map(incremental_exact_dedup(snap, store, "A"))
    again = _to_map(incremental_exact_dedup(snap, store, "A"))
    # rerun excludes its own generation: no self-collision, same result
    assert first == again == {"a0": ("a0", "unique"), "a1": ("a1", "unique")}
    assert sorted(
        d for d in os.listdir(os.path.join(store, "exact")) if d.startswith("snap-")
    ) == ["snap-A"]


# ----------------------------------------------------------------- minhash
def test_incremental_minhash_two_snapshots(ray_session, tmp_path):
    from dedupe_examples_ray.ops import incremental_minhash_dedup

    store = str(tmp_path / "store")
    snap_a = _ds(
        [
            {"doc_id": "a0", "text": BASE},
            {"doc_id": "a1", "text": NEAR},  # near-dup of a0 within A
            {"doc_id": "a2", "text": OTHER},
        ]
    )
    got_a = _to_map(incremental_minhash_dedup(snap_a, store, "A"))
    assert got_a == {
        "a0": ("a0", "unique"),
        "a1": ("a0", "dup_snapshot"),
        "a2": ("a2", "unique"),
    }

    snap_b = _ds(
        [
            {"doc_id": "b0", "text": NEAR},  # near-dup of stored a0
            {"doc_id": "b1", "text": THIRD},
            {"doc_id": "b2", "text": THIRD + " extra trailing words here"},
        ]
    )
    got_b = _to_map(incremental_minhash_dedup(snap_b, store, "B"))
    assert got_b["b0"] == ("a0", "dup_prior")
    assert got_b["b1"] == ("b1", "unique")
    assert got_b["b2"] == ("b1", "dup_snapshot")


def test_incremental_minhash_store_holds_survivors_only(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from dedupe_examples_ray.ops import incremental_minhash_dedup

    store = str(tmp_path / "store")
    snap_a = _ds(
        [
            {"doc_id": "a0", "text": BASE},
            {"doc_id": "a1", "text": NEAR},  # loses to a0 -> must NOT enter store
        ]
    )
    incremental_minhash_dedup(snap_a, store, "A")
    sig_files = []
    for root, _, files in os.walk(os.path.join(store, "minhash", "sigs")):
        sig_files += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    stored = set()
    for f in sig_files:
        stored |= set(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
    assert stored == {"a0"}

    # a third snapshot near-dup of the LOSER's text still maps to the
    # surviving representative (the store never points at dead docs)
    got_c = _to_map(incremental_minhash_dedup(_ds([{"doc_id": "c0", "text": NEAR}]), store, "C"))
    assert got_c["c0"] == ("a0", "dup_prior")


def test_incremental_minhash_rerun_is_idempotent(ray_session, tmp_path):
    from dedupe_examples_ray.ops import incremental_minhash_dedup

    store = str(tmp_path / "store")
    snap = _ds([{"doc_id": "a0", "text": BASE}, {"doc_id": "a1", "text": OTHER}])
    first = _to_map(incremental_minhash_dedup(snap, store, "A"))
    again = _to_map(incremental_minhash_dedup(snap, store, "A"))
    assert first == again == {"a0": ("a0", "unique"), "a1": ("a1", "unique")}
    gens = sorted(os.listdir(os.path.join(store, "minhash", "sigs")))
    assert gens == ["snap-A"]


def test_incremental_minhash_matches_batch_on_union(ray_session, tmp_path):
    """Incremental A-then-B agrees with one-shot minhash dedup of A∪B on
    which documents survive (representative choice may differ only when a
    bridge doc merges two prior representatives — absent here)."""
    from dedupe_examples_ray.ops import incremental_minhash_dedup, minhash_lsh_dedup

    store = str(tmp_path / "store")
    rows_a = [
        {"doc_id": "a0", "text": BASE},
        {"doc_id": "a1", "text": OTHER},
    ]
    rows_b = [
        {"doc_id": "b0", "text": NEAR},  # dup of a0
        {"doc_id": "b1", "text": THIRD},
    ]
    incremental_minhash_dedup(_ds(rows_a), store, "A")
    got_b = _to_map(incremental_minhash_dedup(_ds(rows_b), store, "B"))

    batch = {
        r["doc_id"]: r["keep_id"]
        for _, r in minhash_lsh_dedup(_ds(rows_a + rows_b)).to_pandas().iterrows()
    }
    for doc in ("b0", "b1"):
        assert got_b[doc][0] == batch[doc], (doc, got_b[doc], batch[doc])


def test_store_bucket_count_pinned_across_snapshots(ray_session, tmp_path):
    """The store's bucket layout is immutable: snapshot 2 reuses snapshot 1's
    count even if its own size would resolve differently, and an explicit
    conflicting num_buckets raises instead of silently misaligning shards."""
    import ray.data as rd

    from dedupe_examples_ray.ops.incremental import incremental_exact_dedup

    store = str(tmp_path / "store")
    a = rd.from_items([{"doc_id": f"a{i}", "text": f"t{i}"} for i in range(10)])
    incremental_exact_dedup(a, store, "A", num_buckets=16).take_all()
    assert open(f"{store}/exact/_NUM_BUCKETS").read() == "16"

    b = rd.from_items([{"doc_id": f"b{i}", "text": f"t{i}"} for i in range(10)])
    out = incremental_exact_dedup(b, store, "B").take_all()  # None -> pinned 16
    assert all(r["status"] == "dup_prior" for r in out)
    assert open(f"{store}/exact/_NUM_BUCKETS").read() == "16"

    with pytest.raises(ValueError, match="misalign"):
        incremental_exact_dedup(b, store, "C", num_buckets=32)


# ------------------------------------------------------------ bloom dedup
def test_bloom_no_false_negatives_and_idempotent(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    from dedupe_examples_ray.ops.incremental import incremental_bloom_dedup

    store = str(tmp_path / "bloomstore")
    snap1 = pd.DataFrame({
        "doc_id": range(100),
        "text": [f"document number {i}" for i in range(100)],
    })
    a1 = incremental_bloom_dedup(rd.from_pandas(snap1), store, "s1").to_pandas()
    assert (a1["status"] == "new").all()
    # snapshot 2: 40 exact repeats of snapshot 1 + 60 novel + 2 internal dups
    snap2 = pd.DataFrame({
        "doc_id": range(1000, 1102),
        "text": ([f"document number {i}" for i in range(40)]
                 + [f"fresh doc {i}" for i in range(60)]
                 + ["fresh doc 0", "fresh doc 1"]),
    })
    a2 = incremental_bloom_dedup(rd.from_pandas(snap2), store, "s2").to_pandas()
    by = a2.set_index("doc_id")["status"]
    # Bloom has NO false negatives: every true prior dup is caught
    assert (by.loc[range(1000, 1040)] == "probably_seen").all()
    assert (by.loc[[1100, 1101]] == "dup_snapshot").all()
    novel = by.loc[range(1040, 1100)]
    # false positives possible but must be rare at this fill factor
    assert (novel == "new").sum() >= 58
    # idempotent re-run of the SAME snapshot id: own generation excluded
    a2b = incremental_bloom_dedup(rd.from_pandas(snap2), store, "s2").to_pandas()
    assert a2.sort_values("doc_id").reset_index(drop=True).equals(
        a2b.sort_values("doc_id").reset_index(drop=True))


def test_bloom_fpr_within_theory(ray_session, tmp_path):
    """With n keys in m bits and k hashes, FPR ~= (1-exp(-kn/m))^k; at the
    test's fill the predicted rate is ~2e-5 — 1000 novel probes should see
    at most a handful of drops (allow 10x slack to stay unflaky)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedupe_examples_ray.ops.incremental import incremental_bloom_dedup

    store = str(tmp_path / "fprstore")
    n, m, k = 5000, 1 << 22, 4
    base = pd.DataFrame({"doc_id": range(n),
                         "text": [f"base {i}" for i in range(n)]})
    incremental_bloom_dedup(rd.from_pandas(base), store, "s1",
                            bits_per_bucket=m, n_hashes=k, num_buckets=4)
    probe = pd.DataFrame({"doc_id": range(10_000, 11_000),
                          "text": [f"probe {i}" for i in range(1000)]})
    out = incremental_bloom_dedup(rd.from_pandas(probe), store, "s2",
                                  bits_per_bucket=m, n_hashes=k,
                                  num_buckets=4).to_pandas()
    fp = int((out["status"] == "probably_seen").sum())
    pred = (1 - np.exp(-k * (n / 4) / m)) ** k
    assert fp <= max(5, int(10 * pred * 1000) + 3), (fp, pred)
