"""Byte-pair-encoding tokenizer training + encoding (Sennrich, Haddow &
Birch, ACL 2016, "Neural Machine Translation of Rare Words with Subword
Units") — the tokenizer-construction step of a training-data pipeline.

The algorithm iterates on the WORD-FREQUENCY table, not the corpus: one
combiner pass compresses the corpus to (word, freq) — Zipf makes this table
orders of magnitude smaller than the token stream — then each merge round
(1) counts adjacent-symbol pairs weighted by word frequency, (2) takes the
globally most frequent pair (ties broken lexicographically, so training is
deterministic), (3) rewrites that pair to one symbol in every word.

Tiers (same pattern as ``ops.graph.pagerank``):

- **driver tier** (word table under budget): pull the (word, freq) table
  once, run the textbook indexed implementation in-process.  Merge rounds
  touch only words CONTAINING the merged pair (an inverted pair->words
  index), so 50 merges over 10^5 distinct words are sub-second.
- **streaming tier**: the word table stays a Dataset; each round is one
  ``map_batches`` pair-count combiner (per-batch partial counts -> tiny
  driver merge of at most |pairs-per-batch| rows) + one ``map_batches``
  merge-application pass.  Per-round driver state is ONE pair; the word
  table is never collected.  Cost: O(n_merges) streaming passes — at web
  scale the word table is cached in the object store and each pass is
  embarrassingly parallel.

Both tiers produce identical merge lists (parity-tested).  ``bpe_encode``
applies a trained merge list to a text column with a per-batch word memo
(Zipf again: each batch re-encodes few distinct words).
"""

from __future__ import annotations

import pyarrow as pa

_EOW = "</w>"
_DRIVER_BPE_BUDGET = 256 << 20


def _word_symbols(word: str) -> tuple:
    return tuple(word) + (_EOW,)


def _pair_counts_py(words: dict) -> dict:
    """{symbol-tuple: freq} -> {(a, b): weighted count}."""
    counts: dict = {}
    for syms, freq in words.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + freq
    return counts


def _merge_word(syms: tuple, pair: tuple) -> tuple:
    a, b = pair
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train_reference(word_freqs: dict, n_merges: int,
                        min_freq: int = 2) -> list[tuple]:
    """Textbook implementation over {word: freq} (the driver tier and the
    test oracle).  Returns the ordered merge list [(left, right), ...]."""
    words = {_word_symbols(w): f for w, f in word_freqs.items()}
    merges: list[tuple] = []
    for _ in range(n_merges):
        counts = _pair_counts_py(words)
        if not counts:
            break
        # max by (count, then LEXICOGRAPHICALLY SMALLEST pair) — deterministic
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        pair = best[0]
        merges.append(pair)
        words = {_merge_word(s, pair): f for s, f in words.items()}
    return merges


def word_frequencies(ds, text_col: str = "text", lowercase: bool = True):
    """Corpus -> (word, freq) Dataset via the combiner-shaped grouped_sum
    (whitespace words; the Zipf compression that makes BPE train on the
    vocabulary, not the corpus)."""
    import pyarrow.compute as pc

    from ..relational import grouped_sum

    def explode(t: pa.Table) -> pa.Table:
        s = pc.cast(pc.fill_null(t[text_col], ""), pa.string())
        if lowercase:
            s = pc.utf8_lower(s)
        lists = pc.split_pattern_regex(s, r"\s+")
        flat = pc.list_flatten(lists)
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({"word": flat})

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    return grouped_sum(exploded, ["word"], {}, count_col="freq")


def _pair_partial_syms(t: pa.Table) -> pa.Table:
    """Per-batch weighted pair counts over (syms: list<string>, freq) rows —
    the streaming-tier combiner (at most |distinct pairs in batch| rows out)."""
    syms_col = t["syms"].to_pylist()
    freqs = t["freq"].to_numpy(zero_copy_only=False)
    counts: dict = {}
    for syms, f in zip(syms_col, freqs):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + int(f)
    ks = list(counts)
    return pa.table({"a": pa.array([k[0] for k in ks], pa.string()),
                     "b": pa.array([k[1] for k in ks], pa.string()),
                     "n": pa.array([counts[k] for k in ks], pa.int64())})


def _apply_merges(syms: tuple, merges: list[tuple],
                  ranks: dict | None = None) -> tuple:
    """Apply an ordered merge list to one symbol tuple (training order =
    rank order, the standard greedy-by-rank application)."""
    if not merges:
        return syms
    if ranks is None:
        ranks = {p: r for r, p in enumerate(merges)}
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms = (syms[:best_i] + (syms[best_i] + syms[best_i + 1],)
                + syms[best_i + 2:])
    return syms


def bpe_train(ds, text_col: str = "text", n_merges: int = 50,
              min_freq: int = 2, lowercase: bool = True,
              tier: str = "auto") -> list[tuple]:
    """Train BPE merges over a text-column Dataset.  Returns the ordered
    merge list.  See module docstring for the tier semantics."""
    wf = word_frequencies(ds, text_col=text_col, lowercase=lowercase
                          ).materialize()
    size = wf.size_bytes() or 0
    if tier == "driver" or (tier == "auto" and size <= _DRIVER_BPE_BUDGET):
        import ray

        tbls = ray.get(wf.to_arrow_refs())
        freqs: dict = {}
        for t in tbls:
            if t.num_rows:
                for w, f in zip(t["word"].to_pylist(),
                                t["freq"].to_numpy(zero_copy_only=False)):
                    freqs[w] = freqs.get(w, 0) + int(f)
        return bpe_train_reference(freqs, n_merges, min_freq=min_freq)

    # ---- streaming tier: the symbolized word table stays distributed and
    # is REWRITTEN once per round (per-round work O(distinct words), driver
    # state one pair + the partial-count frame) ----
    def to_syms(t: pa.Table) -> pa.Table:
        syms = [list(_word_symbols(w)) for w in t["word"].to_pylist()]
        return pa.table({"syms": pa.array(syms, pa.list_(pa.string())),
                         "freq": t["freq"]})

    cur = wf.map_batches(to_syms, batch_format="pyarrow").materialize()
    merges: list[tuple] = []
    for _ in range(n_merges):
        parts = cur.map_batches(_pair_partial_syms,
                                batch_format="pyarrow").to_pandas()
        if parts.empty:
            break
        agg = parts.groupby(["a", "b"], as_index=False, sort=False)["n"].sum()
        agg = agg.sort_values(["n", "a", "b"], ascending=[False, True, True],
                              kind="stable")
        top = agg.iloc[0]
        if int(top["n"]) < min_freq:
            break
        pair = (str(top["a"]), str(top["b"]))
        merges.append(pair)

        def apply_one(t: pa.Table, _p=pair) -> pa.Table:
            syms = [list(_merge_word(tuple(s), _p))
                    for s in t["syms"].to_pylist()]
            return pa.table({"syms": pa.array(syms, pa.list_(pa.string())),
                             "freq": t["freq"]})

        cur = cur.map_batches(apply_one, batch_format="pyarrow").materialize()
    return merges


def bpe_encode(ds, merges: list[tuple], text_col: str = "text",
               out_col: str = "bpe_tokens", lowercase: bool = True):
    """Apply a trained merge list: appends ``out_col`` (list<string> of BPE
    symbols per document, ``</w>``-terminated words) and ``n_bpe_tokens``.
    Per-batch word memo keeps the greedy merge loop off the hot path."""
    import pyarrow.compute as pc

    ranks = {p: r for r, p in enumerate(merges)}

    def fn(t: pa.Table) -> pa.Table:
        s = pc.cast(pc.fill_null(t[text_col], ""), pa.string())
        if lowercase:
            s = pc.utf8_lower(s)
        memo: dict = {}
        toks_per_doc: list = []
        for text in s.to_pylist():
            toks: list = []
            for w in text.split():
                got = memo.get(w)
                if got is None:
                    got = _apply_merges(_word_symbols(w), merges, ranks)
                    memo[w] = got
                toks.extend(got)
            toks_per_doc.append(toks)
        out = t.append_column(out_col, pa.array(toks_per_doc,
                                                pa.list_(pa.string())))
        return out.append_column(
            "n_bpe_tokens",
            pa.array([len(x) for x in toks_per_doc], pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")
