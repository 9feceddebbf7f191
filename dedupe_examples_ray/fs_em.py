"""Fellegi–Sunter unsupervised match-weight estimation via EM.

The reference's scripts learn pair weights from LABELED examples through the
dedupe library's regularized logistic trainer (csv_example/csv_example.py:118
``deduper.train()``; our supervised equivalent is training.train_settings).
Fellegi & Sunter (JASA 1969) with Winkler's EM formulation (1988) is the
classic UNSUPERVISED alternative for exactly this pipeline shape: each
candidate pair's per-field agreement vector ``gamma`` is modeled as drawn
from a two-class mixture — matches M and unmatches U — with independent
per-field Bernoulli agreement rates ``m_j = P(agree_j | M)``,
``u_j = P(agree_j | U)`` and prevalence ``p = P(M)``.  EM recovers
``(m, u, p)`` from the unlabeled pairs, and the fitted per-field log2
likelihood ratios are the classic FS match/unmatch weights.

Distributed shape (the whole point at 10^12 pages): the only corpus-sized
work is ONE streaming ``map_batches`` pass that bit-packs each pair's
agreement vector into a uint32 pattern and emits per-batch pattern COUNTS
(<= 2^k rows per batch, k = #fields); a grouped-sum combiner merges them
into a <= 2^k-row histogram on the driver.  EM then iterates over the
histogram only — 50 EM iterations cost zero additional data passes.
Classification is one more streaming pass applying the fitted weights
(the fit object is a few hundred bytes; it rides in ``fn_kwargs``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "agreement_pattern_counts",
    "fs_em_fit",
    "fs_classify",
    "fs_classify_tf",
    "fs_dedupe_dataset",
    "field_value_frequencies",
    "random_pair_u_rates",
]


def _gamma_bits(t: pa.Table, feature_cols: list[str],
                agree_threshold: float) -> np.ndarray:
    """(n, k) boolean agreement matrix from similarity feature columns."""
    n = t.num_rows
    g = np.empty((n, len(feature_cols)), dtype=bool)
    for j, c in enumerate(feature_cols):
        v = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
        g[:, j] = v >= agree_threshold
    return g


def _patterns(g: np.ndarray) -> np.ndarray:
    """Bit-pack (n, k) agreement rows into uint32 pattern ids."""
    weights = (np.uint32(1) << np.arange(g.shape[1], dtype=np.uint32))
    return (g.astype(np.uint32) * weights[None, :]).sum(axis=1, dtype=np.uint32)


def agreement_pattern_counts(features_ds, feature_cols: list[str],
                             agree_threshold: float = 0.88):
    """Candidate-pair feature Dataset -> agreement-pattern histogram.

    ``features_ds`` carries one float similarity column per field (the
    ``keep_features=True`` output of :func:`~.scoring.score_pairs`, columns
    ``f_<field>``).  Returns a pandas DataFrame ``(pattern: uint32, n:
    int64)`` with at most ``2^len(feature_cols)`` rows — the ONLY thing that
    ever reaches the driver.  One streaming pass + one tiny combiner
    groupby; per-batch output is bounded by the pattern-space size, not the
    batch size.
    """
    if len(feature_cols) > 20:
        raise ValueError(f"{len(feature_cols)} fields -> 2^k pattern space "
                         "too large for the histogram path; bucket fields")
    k = len(feature_cols)

    def count_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"pattern": pa.array([], pa.uint32()),
                             "n": pa.array([], pa.int64())})
        pat = _patterns(_gamma_bits(t, feature_cols, agree_threshold))
        cnt = np.bincount(pat, minlength=1 << k)
        nz = np.nonzero(cnt)[0]
        return pa.table({"pattern": pa.array(nz.astype(np.uint32)),
                         "n": pa.array(cnt[nz].astype(np.int64))})

    from .relational import grouped_sum

    part = features_ds.select_columns(feature_cols).map_batches(
        count_batch, batch_format="pyarrow")
    return grouped_sum(part, ["pattern"], {"n": "n"}).to_pandas()


def fs_em_fit(pattern_counts, n_fields: int, max_iter: int = 2000,
              tol: float = 1e-12, eps: float = 1e-4,
              init_m: float = 0.9, init_p: float = 0.1,
              fixed_u: list | None = None) -> dict:
    """EM over the agreement-pattern histogram (driver-side; <= 2^k rows).

    Returns ``{"m": [...], "u": [...], "p": float, "agree_weight": [...],
    "disagree_weight": [...], "iters": int, "loglik": float}`` — per-field
    ``agree_weight = log2(m/u)`` and ``disagree_weight =
    log2((1-m)/(1-u))``, the Fellegi–Sunter field weights.

    Init: ``u_j`` from the observed per-field agreement rate (candidate
    pairs are overwhelmingly unmatched, so the marginal rate is a good
    unmatch-rate seed), ``m_j = init_m``, ``p = init_p``.  Label switching
    is resolved by forcing mean(m) >= mean(u) at the end.  Probabilities
    are clamped to ``[eps, 1-eps]`` so degenerate fields (always/never
    agreeing) can't zero a likelihood.

    ``fixed_u``: hold the unmatch rates at externally-estimated values
    (Jaro 1989's random-pairing estimator — see
    :func:`fs_dedupe_dataset`) and let EM fit only ``m`` and ``p``.  The
    right mode when BLOCKING IS PRECISE: candidate pairs can be nearly all
    matches, leaving no unmatched class in the histogram for an
    unconstrained mixture to find.
    """
    import pandas as pd

    if isinstance(pattern_counts, pd.DataFrame):
        pats = pattern_counts["pattern"].to_numpy(dtype=np.uint32)
        cnts = pattern_counts["n"].to_numpy(dtype=np.float64)
    else:  # (patterns, counts) tuple
        pats, cnts = (np.asarray(pattern_counts[0], dtype=np.uint32),
                      np.asarray(pattern_counts[1], dtype=np.float64))
    if len(pats) == 0 or cnts.sum() <= 0:
        raise ValueError("empty pattern histogram")
    N = cnts.sum()
    # (P, k) bit matrix of the distinct patterns
    G = ((pats[:, None] >> np.arange(n_fields, dtype=np.uint32)[None, :]) & 1
         ).astype(np.float64)

    clamp = lambda x: np.clip(x, eps, 1.0 - eps)
    marginal = clamp((cnts[:, None] * G).sum(axis=0) / N)
    m = np.full(n_fields, clamp(np.array([init_m]))[0])
    u_is_fixed = fixed_u is not None
    u = (clamp(np.asarray(fixed_u, dtype=np.float64)) if u_is_fixed
         else marginal.copy())
    p = min(max(init_p, eps), 1 - eps)

    def log_f(rates):
        lr, l1r = np.log(rates), np.log1p(-rates)
        return G @ lr + (1.0 - G) @ l1r

    prev_ll = -np.inf
    iters = 0
    for iters in range(1, max_iter + 1):
        lm = log_f(m) + np.log(p)
        lu = log_f(u) + np.log1p(-p)
        hi = np.maximum(lm, lu)
        ll = float((cnts * (hi + np.log(np.exp(lm - hi) + np.exp(lu - hi)))).sum())
        w = 1.0 / (1.0 + np.exp(lu - lm))  # P(M | pattern)
        wm, wu = cnts * w, cnts * (1.0 - w)
        sm, su = wm.sum(), wu.sum()
        p = min(max(sm / N, eps), 1 - eps)
        m = clamp((wm[:, None] * G).sum(axis=0) / max(sm, eps))
        if not u_is_fixed:
            u = clamp((wu[:, None] * G).sum(axis=0) / max(su, eps))
        if np.isfinite(prev_ll) and abs(ll - prev_ll) <= tol * max(1.0, abs(prev_ll)):
            prev_ll = ll
            break
        prev_ll = ll
    if not u_is_fixed and m.mean() < u.mean():
        # label switch: M must be the agreeing class
        m, u, p = u, m, 1.0 - p
    return {
        "m": m.tolist(),
        "u": u.tolist(),
        "p": float(p),
        "agree_weight": (np.log2(m) - np.log2(u)).tolist(),
        "disagree_weight": (np.log2(1 - m) - np.log2(1 - u)).tolist(),
        "iters": iters,
        "loglik": float(prev_ll),
    }


def fs_classify(features_ds, fit: dict, feature_cols: list[str],
                agree_threshold: float = 0.88,
                posterior_threshold: float = 0.5):
    """Apply fitted FS weights to a feature Dataset (one streaming pass).

    Adds ``fs_weight`` (total log2 likelihood ratio), ``fs_posterior``
    (P(M | gamma) under the fitted mixture) and ``fs_match``
    (posterior >= ``posterior_threshold``).  The fit dict is tiny and rides
    in ``fn_kwargs`` — nothing is broadcast, nothing shuffles.
    """
    aw = np.asarray(fit["agree_weight"], dtype=np.float64)
    dw = np.asarray(fit["disagree_weight"], dtype=np.float64)
    prior_lo = float(np.log2(fit["p"]) - np.log2(1.0 - fit["p"]))

    def apply(t: pa.Table) -> pa.Table:
        g = _gamma_bits(t, feature_cols, agree_threshold).astype(np.float64)
        wgt = g @ aw + (1.0 - g) @ dw
        post = 1.0 / (1.0 + np.exp2(-(wgt + prior_lo)))
        t = t.append_column("fs_weight", pa.array(wgt, pa.float64()))
        t = t.append_column("fs_posterior", pa.array(post, pa.float64()))
        return t.append_column(
            "fs_match", pa.array(post >= posterior_threshold))

    return features_ds.map_batches(apply, batch_format="pyarrow")


def random_pair_u_rates(records_ds, settings, id_col: str,
                        feature_cols: list[str],
                        agree_threshold: float = 0.88,
                        n_random: int = 5000, records=None,
                        n_records_hint: int = 0,
                        eps: float = 1e-4) -> list[float]:
    """Estimate per-field unmatch agreement rates ``u_j`` from RANDOM pairs
    (Jaro 1989): pair records uniformly at random — at web scale a random
    pair is unmatched with probability ~1, so the empirical per-field
    agreement rate among random pairs IS ``u_j``.

    Deterministic pseudo-random pairing: ids sort by ``stable_hash`` and id
    ``i`` pairs with ``i + n//2 (mod n)`` — a derangement, no RNG state.
    Only ``min(n_random, n)`` id VALUES reach the driver (the record
    payloads never do); features come from the same scoring kernels as the
    candidate pairs.
    """
    import ray.data as rd

    from .pairs import stable_hash
    from .scoring import score_pairs

    id_tbls = [t for t in records_ds.select_columns([id_col]).iter_batches(
        batch_size=None, batch_format="pyarrow") if t.num_rows]
    ids = pa.concat_tables(id_tbls)[id_col].combine_chunks()
    n = len(ids)
    if n < 2:
        raise ValueError("need >= 2 records for random pairing")
    order = np.argsort(stable_hash(ids.to_numpy(zero_copy_only=False)),
                       kind="stable")
    take = order[: min(n_random, n)]
    partner = order[(np.arange(len(order)) + n // 2) % n][: len(take)]
    pairs = rd.from_arrow(pa.table({"id_a": ids.take(pa.array(take)),
                                    "id_b": ids.take(pa.array(partner))}))
    feats = score_pairs(pairs, settings, records=records,
                        keep_features=True, n_records_hint=n_records_hint)

    def agree_counts(t: pa.Table) -> pa.Table:
        g = _gamma_bits(t, feature_cols, agree_threshold)
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            **{c: pa.array([int(g[:, j].sum())], pa.int64())
               for j, c in enumerate(feature_cols)},
        })

    agg = feats.map_batches(agree_counts, batch_format="pyarrow").to_pandas()
    total = max(int(agg["n"].sum()), 1)
    return [float(np.clip(agg[c].sum() / total, eps, 1 - eps))
            for c in feature_cols]


def fs_dedupe_dataset(records_ds, settings, id_col: str,
                      agree_threshold: float = 0.88,
                      posterior_threshold: float = 0.5,
                      idf: dict | None = None,
                      n_random: int = 5000,
                      tf_adjust: bool = False,
                      broadcast_records_limit: int = 2_000_000):
    """Unsupervised end-to-end dedupe: block -> pair -> feature -> FS-EM ->
    classify -> connected components -> entity map.

    The supervised flagship (:func:`~.pipelines.dedupe.dedupe_dataset`)
    thresholds a trained logistic score; this variant learns the pair model
    with NO labels: ``u`` rates from random pairing
    (:func:`random_pair_u_rates` — blocking here is precise enough that the
    candidate set alone can contain no unmatched class), then EM fits ``m``
    and prevalence on the candidate histogram with ``u`` held fixed, and
    edges keep pairs whose FS posterior passes ``posterior_threshold``.
    Returns ``(entity_map_ds, fit)``.

    Scale notes: features are materialized ONCE (slim — two ids + k doubles
    per candidate pair, the same size class as the score stage's output) and
    fan out to the histogram pass and the classify pass; the EM itself never
    touches pair data again.  Hydration uses the broadcast record map under
    ``broadcast_records_limit`` — for corpora beyond it, compose the sharded
    hydration exactly as pipelines.dedupe does (this entry point targets the
    unsupervised-calibration use case, run on a corpus sample or shard).
    """
    from .blocking import fingerprint_dataset
    from .cluster import build_entity_map, connected_components, member_confidence
    from .pairs import candidate_pairs
    from .scoring import record_map_ref, score_pairs

    carry = sorted({f.column for f in settings.fields})
    records_ds = records_ds.materialize()
    n_records = records_ds.count()

    blocks = fingerprint_dataset(records_ds, settings, id_col, [])
    pairs = candidate_pairs(blocks, id_col, [],
                            max_block_size=settings.max_block_size,
                            policy=settings.oversize_policy)
    if n_records > broadcast_records_limit:
        raise ValueError(
            f"{n_records} records exceed the broadcast budget "
            f"{broadcast_records_limit}; run FS-EM calibration on a shard "
            "or compose sharded hydration (see pipelines.dedupe)")
    records = record_map_ref(records_ds, id_col, carry)
    feats = score_pairs(pairs, settings, idf=idf, records=records,
                        keep_features=True, n_records_hint=n_records)
    feat_cols = [c for c in feats.schema().names if c.startswith("f_")
                 and not c.endswith("__missing")]
    feats = feats.materialize()

    u_rates = random_pair_u_rates(
        records_ds, settings, id_col, feat_cols, agree_threshold,
        n_random=n_random, records=records, n_records_hint=n_records)
    hist = agreement_pattern_counts(feats, feat_cols, agree_threshold)
    fit = fs_em_fit(hist, n_fields=len(feat_cols), fixed_u=u_rates)

    if tf_adjust:
        tf_cols = [f.column for f in settings.fields
                   if f.comparator in ("exact", "categorical")]
        if not tf_cols:
            raise ValueError("tf_adjust=True needs an exact/categorical field")
        freqs = {c: field_value_frequencies(records_ds, c) for c in tf_cols}
        classified = fs_classify_tf(
            feats, fit, feat_cols, settings, records, freqs,
            n_records=n_records, agree_threshold=agree_threshold,
            posterior_threshold=posterior_threshold)
    else:
        classified = fs_classify(feats, fit, feat_cols, agree_threshold,
                                 posterior_threshold)
    edges = classified.filter(expr="fs_match == True").map_batches(
        lambda t: t.select(["id_a", "id_b"]).append_column(
            "score", t["fs_posterior"]),
        batch_format="pyarrow",
    ).materialize()
    labels = connected_components(edges.select_columns(["id_a", "id_b"]))
    conf = member_confidence(edges)
    entity = build_entity_map(records_ds, id_col, labels, confidence_ds=conf)
    return entity, fit


def field_value_frequencies(records_ds, col: str):
    """Per-value occurrence counts for one field — the input to
    term-frequency weight adjustment.  Combiner-shaped ``grouped_sum``; the
    output is vocabulary-sized (distinct values), not corpus-sized.
    Returns an Arrow table ``(value: string, n: int64)``; NULL/empty values
    are excluded (they never count as agreement in the scorer)."""
    import pyarrow.compute as pc

    from .relational import grouped_sum

    def prep(t: pa.Table) -> pa.Table:
        v = pc.cast(t[col], pa.string())
        keep = pc.and_(pc.is_valid(v), pc.not_equal(pc.fill_null(v, ""), ""))
        return pa.table({"value": v.filter(keep)})

    counts = grouped_sum(
        records_ds.select_columns([col]).map_batches(
            prep, batch_format="pyarrow"),
        ["value"], {}, count_col="n")
    return pa.concat_tables(
        [t for t in counts.iter_batches(batch_size=None,
                                        batch_format="pyarrow")
         if t.num_rows] or
        [pa.table({"value": pa.array([], pa.string()),
                   "n": pa.array([], pa.int64())})])


def fs_classify_tf(features_ds, fit: dict, feature_cols: list[str],
                   settings, records_ref, tf_freqs: dict[str, "pa.Table"],
                   n_records: int,
                   agree_threshold: float = 0.88,
                   posterior_threshold: float = 0.5,
                   max_adjust_bits: float = 6.0):
    """Term-frequency-adjusted FS classification (the splink-style TF
    adjustment, public formulation: Fellegi-Sunter with value-specific u).

    A global ``u_j`` says how often two random records agree on field j —
    but agreeing on a RARE value (host ``tiny-blog.example``) is far
    stronger evidence than agreeing on a common one (``blogspot.com``).
    With ``p_v`` = value share, the value-specific unmatch rate for an
    exact-match field is ``u_j(v) = p_v``, so the agreement weight gains
    ``log2(u_j) - log2(p_v)`` bits (positive for rare values, negative for
    common ones), clamped to ``±max_adjust_bits``.

    ``tf_freqs``: ``{field_column: (value, n) Arrow table}`` from
    :func:`field_value_frequencies` — vocabulary-sized, shipped once via
    ``ray.put``.  ``records_ref``: the broadcast record table (same object
    the scorer used) for pair value lookup.  Disagreeing or missing fields
    get no adjustment.  Adds the same columns as :func:`fs_classify` plus
    ``fs_tf_adjust``.
    """
    import ray

    from .cluster import _get_broadcast

    aw = np.asarray(fit["agree_weight"], dtype=np.float64)
    dw = np.asarray(fit["disagree_weight"], dtype=np.float64)
    prior_lo = float(np.log2(fit["p"]) - np.log2(1.0 - fit["p"]))

    exact_cols = {}
    for j, f in enumerate(settings.fields):
        if f.comparator in ("exact", "categorical") and f.column in tf_freqs:
            exact_cols[f.column] = (j, float(fit["u"][j]))
    if not exact_cols:
        raise ValueError("no exact/categorical field has a frequency table")

    if not isinstance(records_ref, ray.ObjectRef):
        records_ref = ray.put(records_ref)
    freq_refs = {c: ray.put(tbl) for c, tbl in tf_freqs.items()}

    def apply(t: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        rec = _get_broadcast(records_ref)
        if isinstance(rec, list):
            # record_map_refs-style broadcast: a list of projected block
            # refs — resolve zero-copy views and concat locally
            import ray as _ray

            blocks = (_ray.get(rec)
                      if rec and not isinstance(rec[0], pa.Table) else rec)
            rec = pa.concat_tables(blocks)
        id_col_name = rec.column_names[0]
        idx = pd.Index(rec[id_col_name].to_pandas())
        ia = idx.get_indexer(t["id_a"].to_pandas())
        ib = idx.get_indexer(t["id_b"].to_pandas())
        g = _gamma_bits(t, feature_cols, agree_threshold).astype(np.float64)
        wgt = g @ aw + (1.0 - g) @ dw
        adj = np.zeros(t.num_rows)
        for col, (j, u_j) in exact_cols.items():
            ftbl = _get_broadcast(freq_refs[col])
            fmap = pd.Series(
                ftbl["n"].to_numpy(zero_copy_only=False).astype(np.float64),
                index=pd.Index(ftbl["value"].to_pandas()))
            va = pc.cast(rec[col], pa.string()).take(
                pa.array(ia, pa.int64())).to_pandas()
            agree = g[:, j] >= 1.0
            p_v = (fmap.reindex(va).to_numpy() / float(max(n_records, 1)))
            # missing frequency (value under min_count or null) -> no adjust
            a = np.log2(max(u_j, 1e-12)) - np.log2(np.clip(p_v, 1e-12, 1.0))
            a = np.where(np.isnan(p_v) | ~agree, 0.0, a)
            adj += np.clip(a, -max_adjust_bits, max_adjust_bits)
        total = wgt + adj
        post = 1.0 / (1.0 + np.exp2(-(total + prior_lo)))
        t = t.append_column("fs_weight", pa.array(total, pa.float64()))
        t = t.append_column("fs_tf_adjust", pa.array(adj, pa.float64()))
        t = t.append_column("fs_posterior", pa.array(post, pa.float64()))
        return t.append_column(
            "fs_match", pa.array(post >= posterior_threshold))

    return features_ds.map_batches(apply, batch_format="pyarrow")
