"""Text-analysis operators for training-data pipelines over ``documents``.

All are single-pass ``map_batches`` stages: language-ID (stopword n-gram
heuristic), quality scoring (length / punctuation / stopword / uppercase
ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (rolling polynomial hash).  Stateful tables (stopword sets,
compiled regexes) load once per actor in ``__init__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish pre-tokenizer: word pieces or single non-space symbols
TOKEN_RE = r"[A-Za-z0-9]+|[^\sA-Za-z0-9]"

_STOPWORDS = {
    "en": frozenset(
        "the of and to in a is that it was for on are with as be at by this have from or one had not but what all were when we there can an your which their".split()
    ),
    "de": frozenset(
        "der die das und ist in den von zu mit sich des auf für nicht ein eine als auch es an werden aus er hat dass sie nach bei um am sind noch wie".split()
    ),
    "fr": frozenset(
        "le la les de des et un une du en est que qui dans pour sur avec au il elle ne pas se ce plus par mais ou si leur je vous nous".split()
    ),
    "es": frozenset(
        "el la los las de del y un una en es que se no por con para su al lo como mas pero sus le ya o este si porque esta entre cuando".split()
    ),
}


def token_count(ds, text_col: str = "text", out_col: str = "n_tokens"):
    """Append a token count (TOKEN_RE matches) — fully vectorized."""

    def fn(t: pa.Table) -> pa.Table:
        arr = t[text_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = pc.count_substring_regex(pc.fill_null(pc.cast(arr, pa.string()), ""), TOKEN_RE)
        return t.append_column(out_col, pc.cast(n, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_score(ds, text_col: str = "text"):
    """Append length/punctuation/stopword/upper ratios and a composite score.

    The heuristics quality filters use on web corpora (public C4/Gopher-style
    rules): documents that are too short, too punctuation-heavy, or nearly
    stopword-free are low quality.
    """

    def fn(t: pa.Table) -> pa.Table:
        arr = t[text_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        s = pc.fill_null(pc.cast(arr, pa.string()), "")
        n_chars = pc.utf8_length(s)
        n_chars_f = pc.cast(pc.max_element_wise(n_chars, 1), pa.float64())
        n_punct = pc.count_substring_regex(s, r"[^\w\s]")
        n_upper = pc.count_substring_regex(s, r"[A-Z]")
        n_words = pc.count_substring_regex(s, r"[A-Za-z0-9]+")
        n_stop = pc.count_substring_regex(
            pc.utf8_lower(s), r"\b(" + "|".join(sorted(_STOPWORDS["en"])) + r")\b"
        )
        punct_ratio = pc.divide(pc.cast(n_punct, pa.float64()), n_chars_f)
        upper_ratio = pc.divide(pc.cast(n_upper, pa.float64()), n_chars_f)
        stop_ratio = pc.divide(
            pc.cast(n_stop, pa.float64()),
            pc.cast(pc.max_element_wise(n_words, 1), pa.float64()),
        )
        # composite in [0,1]: long enough, some stopwords, not punctuation soup
        len_term = pc.min_element_wise(
            pc.divide(pc.cast(n_chars, pa.float64()), 200.0), 1.0
        )
        stop_term = pc.min_element_wise(pc.multiply(stop_ratio, 4.0), 1.0)
        punct_term = pc.max_element_wise(
            pc.subtract(1.0, pc.multiply(punct_ratio, 4.0)), 0.0
        )
        score = pc.multiply(pc.multiply(len_term, punct_term), pc.add(pc.multiply(stop_term, 0.5), 0.5))
        out = t
        for name, col in [
            ("n_chars_text", pc.cast(n_chars, pa.int64())),
            ("punct_ratio", punct_ratio),
            ("upper_ratio", upper_ratio),
            ("stopword_ratio", stop_ratio),
            ("quality", score),
        ]:
            out = out.append_column(name, col)
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


# word-token alphabet used by the language-ID heuristic (latin + accents)
_LANG_TOKEN_RE = r"[a-zà-ÿäöüßéèêëàâîïôûçñ]+"
# descending-lex order fixes the argmax tie-break (fr > es > en > de),
# matching the SQL oracle's CASE ladder
_LANG_ORDER = ("fr", "es", "en", "de")


def _lang_pattern(lang: str) -> str:
    return r"\b(" + "|".join(sorted(_STOPWORDS[lang])) + r")\b"


def _lang_id_batch(t: pa.Table) -> pa.Table:
    """Fully Arrow-vectorized stopword-ratio language ID: per language, ONE
    ``count_substring_regex`` over the lowered text; score = stopword hits /
    word tokens; argmax with descending-lex tie-break; 'und' below 0.03 or on
    empty text.  RE2 kernels end to end — no per-row Python."""
    s = t["text"] if "text" in t.column_names else pa.array([], pa.string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    s = pc.utf8_lower(pc.fill_null(pc.cast(s, pa.string()), ""))
    ntok = pc.cast(pc.count_substring_regex(s, _LANG_TOKEN_RE), pa.float64())
    ntok = np.asarray(ntok)
    denom = np.maximum(ntok, 1.0)
    S = np.stack(
        [
            np.asarray(pc.cast(pc.count_substring_regex(s, _lang_pattern(lg)), pa.float64()))
            / denom
            for lg in _LANG_ORDER
        ]
    )  # (4, n); np.argmax picks the FIRST max -> fr wins ties over es/en/de
    best = S.argmax(axis=0)
    conf = S.max(axis=0) if S.size else np.zeros(0)
    conf = np.where(ntok > 0, conf, 0.0)
    names = np.asarray(_LANG_ORDER, dtype=object)
    pred = np.where((ntok > 0) & (conf > 0.03), names[best], "und")
    return t.append_column("lang_pred", pa.array(pred.tolist(), pa.string())).append_column(
        "lang_conf", pa.array(conf, pa.float64())
    )


def language_id(ds, concurrency=None):
    """Heuristic language-ID over ``text`` -> lang_pred, lang_conf.

    Stateless vectorized stage (regex tables are module constants compiled by
    RE2 inside Arrow); ``concurrency`` kept for API compatibility."""
    return ds.map_batches(_lang_id_batch, batch_format="pyarrow")


import hashlib
import zlib


def _content_hash(data: bytes) -> int:
    """Deterministic 64-bit content hash (first 8 bytes of blake2b, C speed)."""
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


def rolling_hashes(tokens: list[str], window: int = 4, base: int = 1_000_003) -> list[int]:
    """Rabin-Karp rolling hash over token hash stream (public definition)."""
    if not tokens:
        return []
    th = [zlib.crc32(t.encode()) for t in tokens]
    if len(th) < window:
        acc = 0
        for x in th:
            acc = (acc * base + x) & 0xFFFFFFFFFFFFFFFF
        return [acc]
    out = []
    power = pow(base, window - 1, 1 << 64)
    acc = 0
    for i, x in enumerate(th):
        if i >= window:
            acc = (acc - th[i - window] * power) & 0xFFFFFFFFFFFFFFFF
        acc = (acc * base + x) & 0xFFFFFFFFFFFFFFFF
        if i >= window - 1:
            out.append(acc)
    return out


def batch_min_window_hash(token_lists: list, window: int = 4) -> np.ndarray:
    """Min windowed polynomial hash per doc, computed batched.

    Same robust-sketch semantics as ``min(rolling_hashes(tokens))`` (any
    window of ``window`` consecutive tokens surviving an edit keeps the
    fingerprint stable) but vectorized: ONE hash call over the batch's
    concatenated tokens, the w-term polynomial as w shifted multiply-adds on
    the flat array (wrapping uint64), per-doc minima via ``minimum.reduceat``.
    Docs shorter than the window hash their whole token list; empty docs -> 0.
    """
    import pandas as pd

    n = len(token_lists)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    counts = np.array([len(x) for x in token_lists], dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return out
    th = pd.util.hash_array(
        np.concatenate([np.asarray(x, dtype=object) for x in token_lists if x])
    ).astype(np.uint64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    base = np.uint64(1_000_003)
    # windowed polynomial over the flat array: acc[i] = sum th[i+j]*base^(w-1-j)
    w = window
    if total >= w:
        acc = np.zeros(total - w + 1, dtype=np.uint64)
        p = np.uint64(1)
        for j in range(w - 1, -1, -1):
            acc += th[j : total - w + 1 + j] * p
            p = p * base  # wraps mod 2^64, matching the scalar definition
        # valid window starts: fully inside one doc
        for i in np.flatnonzero(counts >= w):
            s, e = offsets[i], offsets[i + 1]
            out[i] = acc[s : e - w + 1].min()
    # short docs: polynomial over the whole token list
    for i in np.flatnonzero((counts > 0) & (counts < w)):
        a = np.uint64(0)
        for x in th[offsets[i] : offsets[i + 1]]:
            a = a * base + x
        out[i] = a
    return out


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition stats per document (public quality heuristics):

    - ``n_words`` / ``dup_word_frac``  — fraction of word occurrences that are
      repeats of an earlier occurrence (``(n - n_distinct) / n``)
    - ``top_word_frac``                — share of the single most frequent word
    - ``n_lines`` / ``dup_line_frac``  — same over non-blank lines

    Boilerplate-heavy web pages (nav bars, keyword stuffing) score high on all
    three.  One batch-wide hash pass (``pd.util.hash_array`` over the
    concatenated token stream), per-doc distinct counts via C-speed
    ``np.unique`` on slices; empty documents score 0 everywhere.
    """
    import re

    import pandas as pd

    # ASCII-explicit (RE2/DuckDB \w is ASCII-only) so the oracle SQL matches
    word_re = re.compile(r"[A-Za-z0-9_]+")

    def fn(t: pa.Table) -> pa.Table:
        texts = [(s or "") for s in t[text_col].to_pylist()]
        n = len(texts)
        toks = [word_re.findall(s.lower()) for s in texts]
        counts = np.array([len(x) for x in toks], dtype=np.int64)
        flat = (
            np.concatenate([np.asarray(x, dtype=object) for x in toks if x])
            if counts.sum()
            else np.array([], dtype=object)
        )
        th = (
            pd.util.hash_array(flat).astype(np.uint64)
            if len(flat)
            else np.array([], np.uint64)
        )
        offs = np.concatenate([[0], np.cumsum(counts)])
        dup_w = np.zeros(n)
        top_w = np.zeros(n)
        dup_l = np.zeros(n)
        n_lines = np.zeros(n, dtype=np.int64)
        for i in range(n):
            c = counts[i]
            if c:
                seg = th[offs[i] : offs[i + 1]]
                uniq, cnt = np.unique(seg, return_counts=True)
                dup_w[i] = (c - len(uniq)) / c
                top_w[i] = cnt.max() / c
            lines = [ln for ln in texts[i].split("\n") if ln.strip()]
            n_lines[i] = len(lines)
            if lines:
                dup_l[i] = (len(lines) - len(set(lines))) / len(lines)
        out = t
        for name, col in [
            ("n_words", pa.array(counts, pa.int64())),
            ("dup_word_frac", pa.array(dup_w, pa.float64())),
            ("top_word_frac", pa.array(top_w, pa.float64())),
            ("n_lines", pa.array(n_lines, pa.int64())),
            ("dup_line_frac", pa.array(dup_l, pa.float64())),
        ]:
            out = out.append_column(name, col)
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_fingerprint(ds, text_col: str = "text", window: int = 4):
    """Append ``fingerprint`` (min windowed token hash — robust to local
    edits) and ``content_hash`` (exact 64-bit hash of the text)."""
    import re

    import pandas as pd

    tok_re = re.compile(r"\w+")

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        toks = [tok_re.findall((s or "").lower()) for s in texts]
        fps = batch_min_window_hash(toks, window)
        arr = np.asarray([s or "" for s in texts], dtype=object)
        chs = pd.util.hash_array(arr).astype(np.uint64) if len(arr) else np.array([], np.uint64)
        return t.append_column("fingerprint", pa.array(fps, pa.uint64())).append_column(
            "content_hash", pa.array(chs, pa.uint64())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def hashed_tfidf_batch(texts: list, dim: int = 4096) -> "np.ndarray":
    """(n_docs, dim) L2-normalized hashing-trick TF vectors — the classic
    fixed-dimension text vectorizer that needs NO global vocabulary (each
    batch is independent; the hash IS the feature index), so it composes with
    any broadcast/ANN stage without a corpus pass."""
    from ..pairs import stable_hash

    n = len(texts)
    out = np.zeros((n, dim), dtype=np.float64)
    for i, tx in enumerate(texts):
        toks = (tx or "").lower().split()
        if not toks:
            continue
        idx = stable_hash(np.asarray(toks, dtype=object)) % dim
        np.add.at(out[i], idx.astype(np.int64), 1.0)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    return out / np.maximum(norms, 1e-12)


class _TextTopK:
    """Per-batch cosine top-k of hashed-TF doc vectors against a broadcast
    probe matrix (text twin of ann._BatchTopK); run as a cached task."""

    def __init__(self, query_ref, id_col: str, text_col: str, k: int, dim: int):
        import ray

        self.qids, self.Q = ray.get(query_ref)  # (m, dim), rows L2-normalized
        self.id_col, self.text_col, self.k, self.dim = id_col, text_col, k, dim

    def __call__(self, t: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        n = t.num_rows
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.string()),
                             "match_id": pa.array([], pa.string()),
                             "score": pa.array([], pa.float64())})
        X = hashed_tfidf_batch(t[self.text_col].to_pylist(), self.dim)
        sims = X @ self.Q.T  # (n, m)
        k = min(self.k, n)
        ids = np.asarray(t[self.id_col].to_pylist(), dtype=object)
        out_q, out_m, out_s = [], [], []
        for j, qid in enumerate(self.qids):
            top = np.argpartition(-sims[:, j], k - 1)[:k]
            out_q.extend([str(qid)] * k)
            out_m.extend(str(x) for x in ids[top])
            out_s.extend(sims[top, j])
        return pa.table({"query_id": pa.array(out_q, pa.string()),
                         "match_id": pa.array(out_m, pa.string()),
                         "score": pa.array(np.asarray(out_s, dtype=np.float64))})


_TEXT_TOPK_CACHE: dict = {}


def _text_topk_cached(t, *, query_ref, id_col, text_col, k, dim):
    """Task-form _TextTopK (warm worker pool, no actor cold-start)."""
    key = (query_ref.hex() if hasattr(query_ref, "hex") else id(query_ref),
           id_col, text_col, k, dim)
    fn = _TEXT_TOPK_CACHE.get(key)
    if fn is None:
        fn = _TextTopK(query_ref, id_col, text_col, k, dim)
        if len(_TEXT_TOPK_CACHE) >= 8:
            _TEXT_TOPK_CACHE.pop(next(iter(_TEXT_TOPK_CACHE)))
        _TEXT_TOPK_CACHE[key] = fn
    return fn(t)


def text_knn(ds, queries: list[tuple], k: int = 10, id_col: str = "doc_id",
             text_col: str = "text", dim: int = 4096):
    """Content-similarity search over a text column: hashed-TF cosine top-k
    per probe text.  Same scale shape as ``ann_brute_force`` — probes
    broadcast once, per-batch top-k candidates, tiny driver merge."""
    import pandas as pd
    import ray

    qids = [q[0] for q in queries]
    Q = hashed_tfidf_batch([q[1] for q in queries], dim)
    ref = ray.put((qids, Q))
    cands = ds.map_batches(
        _text_topk_cached,
        fn_kwargs=dict(query_ref=ref, id_col=id_col,
                       text_col=text_col, k=k, dim=dim),
        batch_format="pyarrow",
    ).to_pandas()
    if cands.empty:
        return pd.DataFrame({"query_id": [], "match_id": [], "score": []})
    cands = cands.sort_values(["query_id", "score", "match_id"],
                              ascending=[True, False, True], kind="stable")
    return cands.groupby("query_id", sort=True).head(k).reset_index(drop=True)


# ------------------------------------------------- unigram LM cross-entropy
def _tokenize_flat(t: pa.Table, text_col: str):
    """(parents, flat_tokens) for whitespace tokens with empties dropped —
    the same regexp_split_to_array(text, '\\s+') convention the DuckDB
    oracles use (blocking/corpus._df_partial)."""
    arr = t[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lists = pc.split_pattern_regex(pc.fill_null(pc.cast(arr, pa.string()), ""), r"\s+")
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
    keep = flat != ""
    return parents[keep], flat[keep]


def unigram_term_freq(ds, text_col: str = "text"):
    """Corpus-wide unigram term frequencies (token, tf) — the LM estimation
    pass.  Per-batch ``value_counts`` combiner collapses each batch to its
    distinct tokens before the ONE bucketed shuffle (`grouped_sum`), so the
    exchange moves Zipf-compressed partials, never token instances."""
    import pandas as pd

    from ..relational import grouped_sum

    def partial(t: pa.Table) -> pa.Table:
        _, flat = _tokenize_flat(t, text_col)
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        counts = pd.Series(flat).value_counts()
        return pa.table({"token": pa.array(counts.index.to_numpy(), pa.string()),
                         "tf": pa.array(counts.to_numpy(), pa.int64())})

    return grouped_sum(ds.map_batches(partial, batch_format="pyarrow"),
                       ["token"], {"tf": "tf"})


_VOCAB_CACHE: dict = {}
_VOCAB_BROADCAST_BUDGET = 2_000_000  # tokens; larger vocabs take the join tier


def _xent_batch(t: pa.Table, *, vocab_ref, text_col, id_col, round_digits):
    """Score one batch against the broadcast (token -> logp) table.  The
    pd.Index is built once per worker per vocab (keyed on ref.hex) — the
    same memo pattern as _text_topk_cached."""
    import pandas as pd
    import ray

    key = vocab_ref.hex()
    cached = _VOCAB_CACHE.get(key)
    if cached is None:
        vt = ray.get(vocab_ref)
        cached = (pd.Index(vt["token"].to_numpy(zero_copy_only=False)),
                  vt["logp"].to_numpy(zero_copy_only=False))
        if len(_VOCAB_CACHE) >= 4:
            _VOCAB_CACHE.pop(next(iter(_VOCAB_CACHE)))
        _VOCAB_CACHE[key] = cached
    idx, logp = cached
    parents, flat = _tokenize_flat(t, text_col)
    n = t.num_rows
    if len(flat) == 0:
        return pa.table({id_col: t[id_col].take(pa.array([], pa.int64())),
                         "xent": pa.array([], pa.float64()),
                         "n_tokens": pa.array([], pa.int64())})
    pos = idx.get_indexer(flat)
    known = pos >= 0  # vocab is built from this corpus, so misses only occur
    # when the caller passes a foreign vocab; unknown tokens are skipped
    # (matches the oracle's inner join)
    lp = logp[pos[known]]
    par = parents[known]
    cnt = np.bincount(par, minlength=n)
    tot = np.bincount(par, weights=-lp, minlength=n)
    nz = cnt > 0
    xent = tot[nz] / cnt[nz]
    if round_digits is not None:
        xent = np.round(xent, round_digits)
    return pa.table({
        id_col: t[id_col].take(pa.array(np.flatnonzero(nz), pa.int64())),
        "xent": pa.array(xent, pa.float64()),
        "n_tokens": pa.array(cnt[nz].astype(np.int64), pa.int64()),
    })


def unigram_xentropy(ds, text_col: str = "text", id_col: str = "doc_id",
                     round_digits: int | None = 4, method: str = "auto"):
    """Per-document unigram cross-entropy in bits — the classic
    corpus-likelihood quality signal (CCNet-style LM filtering with the
    corpus itself as the LM): ``xent = avg over token instances of
    -log2(tf(token)/N)``.  Documents with zero tokens are omitted (SQL inner
    join semantics).

    Two-pass shape: pass 1 estimates the LM (``unigram_term_freq`` — one
    Zipf-compressed shuffle); pass 2 scores every doc.

    ``method="broadcast"`` ships the (token, logp) Arrow table once via
    ``ray.put`` and scores with a per-worker ``pd.Index`` — zero shuffle of
    the corpus.  ``method="join"`` is the 100-TB-vocab tier: the corpus
    explodes to (doc instance, token), hash_joins the vocab on token, and a
    ``grouped_sum`` by doc re-aggregates — three bucketed shuffles but no
    node ever holds the vocab.  ``"auto"`` picks broadcast under
    ``_VOCAB_BROADCAST_BUDGET`` tokens.  Both tiers emit identical tables
    (parity-tested).
    """
    import ray

    from ..relational import grouped_sum, hash_join

    tf = unigram_term_freq(ds, text_col)

    if method == "auto":
        method = "broadcast" if tf.count() <= _VOCAB_BROADCAST_BUDGET else "join"

    if method == "broadcast":
        vt = tf.to_arrow_refs()
        vocab = pa.concat_tables([ray.get(r) for r in vt])
        tfv = vocab["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_total = tfv.sum()
        logp = np.log2(tfv / n_total)
        vocab_ref = ray.put(pa.table({"token": vocab["token"], "logp": pa.array(logp)}))
        return ds.map_batches(
            _xent_batch,
            fn_kwargs=dict(vocab_ref=vocab_ref, text_col=text_col,
                           id_col=id_col, round_digits=round_digits),
            batch_format="pyarrow",
        )

    if method != "join":
        raise ValueError(f"method must be auto/broadcast/join, got {method!r}")

    # join tier: N is a scalar (one tiny aggregate), logp computed vocab-side
    n_total = float(sum(
        b["tf"].to_numpy(zero_copy_only=False).sum()
        for b in tf.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ))

    def to_logp(t: pa.Table) -> pa.Table:
        tfv = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"token": t["token"],
                         "logp": pa.array(np.log2(tfv / n_total))})

    vocab_ds = tf.map_batches(to_logp, batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        parents, flat = _tokenize_flat(t, text_col)
        return pa.table({id_col: t[id_col].take(pa.array(parents, pa.int64())),
                         "token": pa.array(flat, pa.string())})

    inst = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow")
    joined = hash_join(inst, vocab_ds, on="token")
    sums = grouped_sum(
        joined.map_batches(
            lambda t: pa.table({id_col: t[id_col],
                                "neg_lp": pc.negate(t["logp"])}),
            batch_format="pyarrow"),
        [id_col], {"neg_lp": "tot"}, count_col="n_tokens")

    def finish(t: pa.Table) -> pa.Table:
        xent = (t["tot"].to_numpy(zero_copy_only=False)
                / t["n_tokens"].to_numpy(zero_copy_only=False))
        if round_digits is not None:
            xent = np.round(xent, round_digits)
        return pa.table({id_col: t[id_col], "xent": pa.array(xent, pa.float64()),
                         "n_tokens": t["n_tokens"]})

    return sums.map_batches(finish, batch_format="pyarrow")


_SCRIPTS = (
    ("latin", r"\p{Latin}"),
    ("cyrillic", r"\p{Cyrillic}"),
    ("han", r"\p{Han}"),
    ("arabic", r"\p{Arabic}"),
    ("digit", r"[0-9]"),
)


def script_profile(ds, text_col: str = "text", round_digits: int = 6):
    """Append per-document Unicode-script composition: counts and fractions
    of Latin / Cyrillic / Han / Arabic letters and ASCII digits.

    The mixed-script signal web-spam filters use (keyword-stuffed pages mix
    scripts; legitimate documents are script-homogeneous) — complementary to
    :func:`language_id`, which assumes latin text.  One RE2
    ``count_substring_regex`` kernel per script class per batch, zero row
    loops; DuckDB's ``regexp_extract_all`` uses the same RE2 class
    definitions, so the counts are oracle-exact.
    """

    def fn(t: pa.Table) -> pa.Table:
        arr = t[text_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        s = pc.fill_null(pc.cast(arr, pa.string()), "")
        n_chars = pc.cast(pc.utf8_length(s), pa.int64())
        denom = pc.cast(pc.max_element_wise(n_chars, 1), pa.float64())
        out = t.append_column("n_chars_text", n_chars)
        for name, pat in _SCRIPTS:
            cnt = pc.cast(pc.count_substring_regex(s, pat), pa.int64())
            # DuckDB ROUND is half-away-from-zero; Arrow defaults to
            # half-to-even (0.8203125 -> .820312 vs .820313)
            frac = pc.round(pc.divide(pc.cast(cnt, pa.float64()), denom),
                            ndigits=round_digits,
                            round_mode="half_towards_infinity")
            out = out.append_column(f"n_{name}", cnt)
            out = out.append_column(f"frac_{name}", frac)
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def bm25_topk(ds, queries: list[tuple], k: int = 10, text_col: str = "text",
              id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75,
              round_digits: int = 4):
    """Okapi BM25 top-``k`` retrieval: for each (query_id, query_text), the
    ``k`` highest-scoring documents (Robertson et al., TREC-3; the idf uses
    the Lucene ``ln(1 + (N - df + .5)/(df + .5))`` form, always positive).

    The retrieval operator a training-data pipeline needs for targeted
    decontamination and data selection (find the corpus documents closest to
    an eval prompt) — exact, not hashed: contrast :func:`text_knn`, whose
    hashed-TF cosine is the cheap approximate path.

    Scale shape (two passes, no corpus state on the driver):

    1. ONE fused stats pass — per batch: document count + token-count sum
       partials AND per-query-term distinct-doc partials (the DF combiner is
       restricted to the query vocabulary, so each batch contributes at most
       ``n_terms + 1`` rows to the tiny driver merge — never a corpus-vocab
       shuffle).
    2. ONE scoring pass against the broadcast (terms, idf, avgdl) arrays —
       whole-batch token matching via searchsorted, per-doc tf via one
       ``np.unique`` over packed (row, term) codes, dense (batch x query)
       score accumulation, per-batch (score desc, id) top-k so at most
       ``k`` rows per query per block reach the final
       :func:`~dedupe_examples_ray.windows.grouped_top_n` merge.

    Tokens are whitespace-split with empties dropped (the repo's DuckDB
    oracle convention, ``_tokenize_flat``); query tokens are deduplicated
    (bag-of-words query).  Scores are rounded to ``round_digits`` BEFORE
    ranking so ordering is reproducible against a SQL oracle; ties break by
    ascending ``id_col``.  Documents sharing no query term (score 0) are
    absent, SQL-join style.  Returns (query_id, doc_id, score, rank).
    """
    import ray

    from ..windows import grouped_top_n

    if k < 1:
        raise ValueError("k must be >= 1")
    qids = [q for q, _ in queries]
    if len(set(qids)) != len(qids):
        raise ValueError("query ids must be unique")
    qterms = [sorted(set(w for w in str(text).split() if w))
              for _, text in queries]
    terms = np.array(sorted(set(w for ts in qterms for w in ts)), dtype=object)
    if len(terms) == 0:
        raise ValueError("queries contain no tokens")
    # query membership matrix (n_terms x n_queries), tiny
    member = np.zeros((len(terms), len(queries)), dtype=np.float64)
    tpos = {t: i for i, t in enumerate(terms)}
    for qi, ts in enumerate(qterms):
        for w in ts:
            member[tpos[w], qi] = 1.0

    terms_sorted = terms.astype(str)  # sorted already; searchsorted key

    # ---- pass 1: fused corpus stats + query-term DF partials ----
    def stats_partial(t: pa.Table) -> pa.Table:
        parents, flat = _tokenize_flat(t, text_col)
        idx = np.searchsorted(terms_sorted, flat.astype(str))
        np.clip(idx, 0, len(terms_sorted) - 1, out=idx)
        hit = terms_sorted[idx] == flat.astype(str)
        # distinct (doc, term) pairs -> per-term doc-count partial
        codes = np.unique(parents[hit].astype(np.int64) * len(terms) + idx[hit])
        tcounts = np.bincount(codes % len(terms), minlength=len(terms))
        nz = np.flatnonzero(tcounts)
        return pa.table({
            "term_idx": pa.array(np.concatenate([[-1], nz]), pa.int64()),
            "df": pa.array(np.concatenate([[0], tcounts[nz]]), pa.int64()),
            "n_docs": pa.array([t.num_rows] + [0] * len(nz), pa.int64()),
            "dl_sum": pa.array([int(len(flat))] + [0] * len(nz), pa.int64()),
        })

    stats = (ds.select_columns([text_col])
             .map_batches(stats_partial, batch_format="pyarrow")
             .groupby("term_idx")
             .sum(["df", "n_docs", "dl_sum"])
             .to_pandas())
    stats.columns = ["term_idx", "df", "n_docs", "dl_sum"]
    srow = stats[stats["term_idx"] == -1]
    n_corpus = int(srow["n_docs"].sum())
    if n_corpus == 0:
        raise ValueError("empty corpus")
    avgdl = max(float(srow["dl_sum"].sum()) / n_corpus, 1e-12)
    df = np.zeros(len(terms), dtype=np.float64)
    trow = stats[stats["term_idx"] >= 0]
    df[trow["term_idx"].to_numpy()] = trow["df"].to_numpy(np.float64)
    idf = np.log1p((n_corpus - df + 0.5) / (df + 0.5))
    bc = ray.put((terms_sorted, idf, member, avgdl))

    # ---- pass 2: score + per-batch top-k ----
    def score_batch(t: pa.Table) -> pa.Table:
        terms_s, idf_a, member_m, avg = ray.get(bc)
        empty = pa.table({"query_id": pa.array([], pa.string()),
                          id_col: pa.array([], t[id_col].type),
                          "score": pa.array([], pa.float64())})
        parents, flat = _tokenize_flat(t, text_col)
        if len(flat) == 0:
            return empty
        dl = np.bincount(parents, minlength=t.num_rows).astype(np.float64)
        fs = flat.astype(str)
        idx = np.searchsorted(terms_s, fs)
        np.clip(idx, 0, len(terms_s) - 1, out=idx)
        hit = terms_s[idx] == fs
        if not hit.any():
            return empty
        codes, tf = np.unique(
            parents[hit].astype(np.int64) * len(terms_s) + idx[hit],
            return_counts=True)
        rows, tix = codes // len(terms_s), codes % len(terms_s)
        tf = tf.astype(np.float64)
        contrib = idf_a[tix] * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * dl[rows] / avg))
        # dense (batch x queries) accumulation: a term contributes to every
        # query containing it
        S = np.zeros((t.num_rows, member_m.shape[1]), dtype=np.float64)
        np.add.at(S, rows, contrib[:, None] * member_m[tix])
        scale = 10.0 ** round_digits
        S = np.floor(S * scale + 0.5) / scale  # ROUND half-away parity
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out_q, out_i, out_s = [], [], []
        for qi, (qid, _) in enumerate(queries):
            col = S[:, qi]
            cand = np.flatnonzero(col > 0)
            if len(cand) == 0:
                continue
            order = np.lexsort((ids[cand], -col[cand]))[:k]
            sel = cand[order]
            out_q.append(np.full(len(sel), str(qid), dtype=object))
            out_i.append(ids[sel])
            out_s.append(col[sel])
        if not out_q:
            return empty
        return pa.table({"query_id": pa.array(np.concatenate(out_q), pa.string()),
                         id_col: pa.array(np.concatenate(out_i)),
                         "score": pa.array(np.concatenate(out_s), pa.float64())})

    cands = ds.select_columns([id_col, text_col]).map_batches(
        score_batch, batch_format="pyarrow")
    return grouped_top_n(cands, key_cols=["query_id"], by="score", n=k,
                         ascending=False, tie_cols=[id_col], rank_col="rank")


# Gopher stop-word set (Rae et al. 2021, "Scaling Language Models", A1.1):
# a document must contain >= min_stop_hits of these to pass the rule.
_GOPHER_STOPWORDS = ("and", "be", "have", "of", "that", "the", "to", "with")


def gopher_rules(ds, text_col: str = "text", min_words: int = 50,
                 max_words: int = 100_000, min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0, max_symbol_ratio: float = 0.1,
                 max_bullet_frac: float = 0.9, max_ellipsis_frac: float = 0.3,
                 min_alpha_frac: float = 0.8, min_stop_hits: int = 2,
                 round_digits: int = 6):
    """Gopher repetition-free quality rules (Rae et al. 2021, A1.1): the
    standard web-corpus document filter.  Appends the per-document statistics
    and one boolean per the composite gate:

    - ``n_words`` in [min_words, max_words] (whitespace tokens, empties
      dropped — the repo's DuckDB oracle convention);
    - ``mean_word_len`` (chars per token) in [3, 10];
    - ``symbol_ratio`` = (#'#' + #'...' + #'…') / n_words < 0.1
      (non-overlapping counts, Python ``str.count`` semantics);
    - ``bullet_line_frac`` < 0.9 and ``ellipsis_line_frac`` < 0.3 over
      '\\n'-split lines (bullet = space/tab-stripped line starting with
      '-', '*' or '•'; ellipsis = stripped line ending with '...' or '…');
    - ``alpha_word_frac`` (tokens containing [A-Za-z]) > 0.8;
    - ``stopword_hits`` (distinct Gopher stop words present, lowercased
      token equality) >= min_stop_hits.

    NULL text counts as '' (one empty line, zero words); word-denominated
    ratios are NULL at n_words == 0 and fail their rules.  Ratios are
    rounded half-away to ``round_digits`` BEFORE the threshold compare so a
    SQL oracle using ROUND reproduces ``gopher_pass`` bit-exactly.  One
    zero-copy Arrow pass per batch — token and line work is vectorized over
    the flattened list children, never per row.
    """
    scale = 10.0 ** round_digits

    def rnd(x: np.ndarray) -> np.ndarray:
        return np.floor(x * scale + 0.5) / scale

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arr = t[text_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        s = pc.fill_null(pc.cast(arr, pa.string()), "")

        # ---- word-token stats (one flatten, vectorized children) ----
        parents, flat = _tokenize_flat(t, text_col)
        n_words = np.bincount(parents, minlength=n).astype(np.int64)
        tok = pa.array(flat, pa.string())
        wlen = pc.utf8_length(tok).to_numpy(zero_copy_only=False)
        len_sum = np.bincount(parents, weights=wlen, minlength=n)
        alpha = pc.match_substring_regex(tok, "[A-Za-z]").to_numpy(
            zero_copy_only=False)
        alpha_sum = np.bincount(parents, weights=alpha, minlength=n)
        low = pc.utf8_lower(tok).to_numpy(zero_copy_only=False)
        stop_hits = np.zeros(n, dtype=np.int64)
        for w in _GOPHER_STOPWORDS:
            m = low == w
            if m.any():
                stop_hits += np.bincount(parents[m], minlength=n) > 0

        # ---- symbol counts on the raw text ----
        sym = (pc.count_substring(s, "#").to_numpy(zero_copy_only=False)
               + pc.count_substring(s, "...").to_numpy(zero_copy_only=False)
               + pc.count_substring(s, "…").to_numpy(zero_copy_only=False)
               ).astype(np.float64)

        # ---- line stats ('\n' split keeps empties; '' -> one empty line) ----
        lines = pc.split_pattern(s, "\n")
        lparents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        lflat = pc.list_flatten(lines)
        n_lines = np.bincount(lparents, minlength=n).astype(np.float64)
        lt = pc.utf8_ltrim(lflat, characters=" \t")
        bullet = pc.or_(pc.or_(pc.starts_with(lt, "-"), pc.starts_with(lt, "*")),
                        pc.starts_with(lt, "•")).to_numpy(zero_copy_only=False)
        rt = pc.utf8_rtrim(lflat, characters=" \t")
        ell = pc.or_(pc.ends_with(rt, "..."),
                     pc.ends_with(rt, "…")).to_numpy(zero_copy_only=False)
        bullet_frac = rnd(np.bincount(lparents, weights=bullet, minlength=n)
                          / n_lines)
        ell_frac = rnd(np.bincount(lparents, weights=ell, minlength=n) / n_lines)

        nz = n_words > 0
        nwf = n_words.astype(np.float64)
        mean_wlen = np.full(n, np.nan)
        sym_ratio = np.full(n, np.nan)
        alpha_frac = np.full(n, np.nan)
        mean_wlen[nz] = rnd(len_sum[nz] / nwf[nz])
        sym_ratio[nz] = rnd(sym[nz] / nwf[nz])
        alpha_frac[nz] = rnd(alpha_sum[nz] / nwf[nz])

        ok = ((n_words >= min_words) & (n_words <= max_words)
              & nz & (mean_wlen >= min_mean_word_len)
              & (mean_wlen <= max_mean_word_len)
              & (sym_ratio < max_symbol_ratio)
              & (bullet_frac < max_bullet_frac)
              & (ell_frac < max_ellipsis_frac)
              & (alpha_frac > min_alpha_frac)
              & (stop_hits >= min_stop_hits))

        def fcol(x: np.ndarray) -> pa.Array:
            return pa.array(np.where(np.isnan(x), None, x), pa.float64(),
                            from_pandas=True)

        out = t
        for name, col in [
            ("n_words", pa.array(n_words, pa.int64())),
            ("mean_word_len", fcol(mean_wlen)),
            ("symbol_ratio", fcol(sym_ratio)),
            ("bullet_line_frac", pa.array(bullet_frac, pa.float64())),
            ("ellipsis_line_frac", pa.array(ell_frac, pa.float64())),
            ("alpha_word_frac", fcol(alpha_frac)),
            ("stopword_hits", pa.array(stop_hits, pa.int64())),
            ("gopher_pass", pa.array(ok)),
        ]:
            out = out.append_column(name, col)
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def _alnum_doc_tokens(t: pa.Table, text_col: str, min_len: int):
    """(parents, flat) DISTINCT-per-document lowercase alnum tokens of at
    least ``min_len`` chars — the regexp_split_to_array(lower(text),
    '[^a-z0-9]+') convention the PMI oracle uses."""
    import pandas as pd

    arr = t[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    low = pc.utf8_lower(pc.fill_null(pc.cast(arr, pa.string()), ""))
    lists = pc.split_pattern_regex(low, r"[^a-z0-9]+")
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
    keep = pd.Series(flat).str.len().to_numpy() >= min_len
    parents, flat = parents[keep], flat[keep]
    if len(flat) == 0:
        return parents, flat
    dd = pd.DataFrame({"p": parents, "t": flat}).drop_duplicates()
    return dd["p"].to_numpy(), dd["t"].to_numpy(dtype=object)


def _emit_doc_pairs(parents, tokens, max_doc_tokens: int):
    """All unordered within-doc token pairs (a < b), docs with more than
    ``max_doc_tokens`` qualifying tokens excluded (the explicit quadratic
    bound — mirrored by the oracle's HAVING).  Input need not be sorted."""
    import pandas as pd

    if len(parents) == 0:
        return np.array([], object), np.array([], object)
    order = np.lexsort((tokens, parents))
    p, tk = parents[order], tokens[order]
    starts = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
    ends = np.r_[starts[1:], len(p)]
    a_parts, b_parts = [], []
    for s, e in zip(starts, ends):
        k = e - s
        if k < 2 or k > max_doc_tokens:
            continue
        i, j = np.triu_indices(k, 1)
        a_parts.append(tk[s + i])
        b_parts.append(tk[s + j])
    if not a_parts:
        return np.array([], object), np.array([], object)
    return np.concatenate(a_parts), np.concatenate(b_parts)


def _pmi_pair_partial_batch(t: pa.Table, *, vocab_ref, text_col, min_len,
                            max_doc_tokens):
    """Per-batch combiner: within-doc vocab-token pairs -> partial counts.
    Vocab membership comes from the broadcast (token) table, built into a
    per-worker pd.Index once per vocab (same memo pattern as _xent_batch)."""
    import pandas as pd
    import ray

    empty = pa.table({"tok_a": pa.array([], pa.string()),
                      "tok_b": pa.array([], pa.string()),
                      "n_ab": pa.array([], pa.int64())})
    key = ("pmi", vocab_ref.hex())
    cached = _VOCAB_CACHE.get(key)
    if cached is None:
        vt = ray.get(vocab_ref)
        cached = pd.Index(vt["token"].to_numpy(zero_copy_only=False))
        if len(_VOCAB_CACHE) >= 4:
            _VOCAB_CACHE.pop(next(iter(_VOCAB_CACHE)))
        _VOCAB_CACHE[key] = cached
    parents, flat = _alnum_doc_tokens(t, text_col, min_len)
    if len(flat) == 0:
        return empty
    member = cached.get_indexer(flat) >= 0
    a, b = _emit_doc_pairs(parents[member], flat[member], max_doc_tokens)
    if len(a) == 0:
        return empty
    cnt = pd.DataFrame({"a": a, "b": b}).groupby(["a", "b"], sort=False).size()
    lv = cnt.index
    return pa.table({"tok_a": pa.array(lv.get_level_values(0), pa.string()),
                     "tok_b": pa.array(lv.get_level_values(1), pa.string()),
                     "n_ab": pa.array(cnt.to_numpy(), pa.int64())})


def pmi_token_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                    min_len: int = 3, min_df: int = 5, min_pair: int = 5,
                    max_doc_tokens: int = 200, method: str = "auto",
                    round_digits: int = 6, num_buckets: int | None = None):
    """Corpus-wide pointwise mutual information over within-document token
    co-occurrence (Church & Hanks 1990): for distinct per-doc lowercase
    alnum tokens, ``pmi(a,b) = ln(n_ab * N / (df_a * df_b))`` with N = total
    documents.  The standard collocation / phrase-mining signal.

    Scale shape: pass 1 is the Zipf-compressed DF shuffle
    (``unigram-style`` combiner); pass 2 emits within-doc pairs ONLY for
    tokens with ``df >= min_df`` and docs with at most ``max_doc_tokens``
    qualifying tokens — both bounds are explicit and mirrored in the SQL
    oracle, so no hot document or stopword-free vocabulary can go
    quadratic.  Per-batch partial counts collapse each batch to distinct
    pairs before the ONE pair shuffle; final DF attach is a big-big
    ``hash_join`` on token (never a vocabulary broadcast of counts).

    ``method="broadcast"`` ships the vocab token set once via ``ray.put``
    (bytes = O(vocab), bounded by ``_VOCAB_BROADCAST_BUDGET``);
    ``method="join"`` is the giant-vocab tier: distinct (doc, token) rows
    semi-join the vocab, then pair emission runs inside hash buckets of
    ``id_col`` (``bucketed_by_key``).  Both emit identical tables.
    """
    import pandas as pd
    import ray

    from ..relational import grouped_sum, hash_join

    # pass 1: document frequency over distinct per-doc tokens
    def df_partial(t: pa.Table) -> pa.Table:
        _, flat = _alnum_doc_tokens(t, text_col, min_len)
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        counts = pd.Series(flat).value_counts()
        return pa.table({"token": pa.array(counts.index.to_numpy(), pa.string()),
                         "df": pa.array(counts.to_numpy(), pa.int64())})

    df_ds = grouped_sum(
        ds.map_batches(df_partial, batch_format="pyarrow"),
        ["token"], {"df": "df"})
    _df_schema = pa.table({"token": pa.array([], pa.string()),
                           "df": pa.array([], pa.int64())})

    def _min_df_filter(t: pa.Table) -> pa.Table:
        if "df" not in t.column_names:  # schemaless empty-corpus block
            return _df_schema
        return t.filter(pc.greater_equal(t["df"], int(min_df)))

    vocab_ds = df_ds.map_batches(_min_df_filter, batch_format="pyarrow")
    n_docs = ds.count()

    n_vocab = vocab_ds.count()
    if n_vocab == 0:  # fully empty / all-rare corpus: typed empty result
        import ray.data as _rd

        return _rd.from_arrow(pa.table(
            {"tok_a": pa.array([], pa.string()),
             "tok_b": pa.array([], pa.string()),
             "n_ab": pa.array([], pa.int64()),
             "pmi": pa.array([], pa.float64())}))
    if method == "auto":
        method = ("broadcast" if n_vocab <= _VOCAB_BROADCAST_BUDGET
                  else "join")

    if method == "broadcast":
        vocab = pa.concat_tables(
            [ray.get(r) for r in vocab_ds.to_arrow_refs()],
            promote_options="default").combine_chunks()
        if "token" not in vocab.column_names:  # fully empty corpus
            vocab = _df_schema
        vocab_ref = ray.put(pa.table({"token": vocab["token"]}))
        pair_partials = ds.map_batches(
            _pmi_pair_partial_batch,
            fn_kwargs=dict(vocab_ref=vocab_ref, text_col=text_col,
                           min_len=min_len, max_doc_tokens=max_doc_tokens),
            batch_format="pyarrow")
    elif method == "join":
        from ..windows import bucketed_by_key

        def explode(t: pa.Table) -> pa.Table:
            parents, flat = _alnum_doc_tokens(t, text_col, min_len)
            return pa.table(
                {id_col: t[id_col].take(pa.array(parents, pa.int64())),
                 "token": pa.array(flat, pa.string())})

        inst = ds.select_columns([id_col, text_col]).map_batches(
            explode, batch_format="pyarrow")
        vt = hash_join(inst, vocab_ds, on="token").select_columns(
            [id_col, "token"])

        def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
            # id_col values keep doc integrity inside one bucket
            codes, _ = pd.factorize(df[id_col], sort=False)
            a, b = _emit_doc_pairs(codes,
                                   df["token"].to_numpy(dtype=object),
                                   max_doc_tokens)
            if len(a) == 0:
                return pd.DataFrame({"tok_a": pd.Series([], dtype=str),
                                     "tok_b": pd.Series([], dtype=str),
                                     "n_ab": pd.Series([], dtype="int64")})
            cnt = (pd.DataFrame({"tok_a": a, "tok_b": b})
                   .groupby(["tok_a", "tok_b"], sort=False).size()
                   .rename("n_ab").reset_index())
            return cnt

        pair_partials = bucketed_by_key(
            vt, id_col, bucket_pairs,
            num_buckets=num_buckets or 256)
    else:
        raise ValueError(f"method must be auto/broadcast/join, got {method!r}")

    pairs = grouped_sum(pair_partials, ["tok_a", "tok_b"], {"n_ab": "n_ab"})
    _pair_schema = pa.table({"tok_a": pa.array([], pa.string()),
                             "tok_b": pa.array([], pa.string()),
                             "n_ab": pa.array([], pa.int64())})

    def _min_pair_filter(t: pa.Table) -> pa.Table:
        if "n_ab" not in t.column_names:
            return _pair_schema
        return t.filter(pc.greater_equal(t["n_ab"], int(min_pair)))

    pairs = pairs.map_batches(_min_pair_filter, batch_format="pyarrow")

    # DF attach: two big-big hash joins on token (vocab never broadcast with
    # counts); PMI finishes vectorized.
    da = vocab_ds.map_batches(
        lambda t: pa.table({"tok_a": t["token"], "df_a": t["df"]}),
        batch_format="pyarrow")
    db = vocab_ds.map_batches(
        lambda t: pa.table({"tok_b": t["token"], "df_b": t["df"]}),
        batch_format="pyarrow")
    joined = hash_join(hash_join(pairs, da, on="tok_a"), db, on="tok_b")

    def finish(t: pa.Table) -> pa.Table:
        n_ab = t["n_ab"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfa = t["df_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfb = t["df_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.log(n_ab * float(n_docs) / (dfa * dfb))
        if round_digits is not None:
            pmi = np.round(pmi, round_digits)
        return pa.table({"tok_a": t["tok_a"], "tok_b": t["tok_b"],
                         "n_ab": pc.cast(t["n_ab"], pa.int64()),
                         "pmi": pa.array(pmi, pa.float64())})

    return joined.map_batches(finish, batch_format="pyarrow")
