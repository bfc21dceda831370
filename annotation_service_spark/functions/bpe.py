"""Byte-pair encoding: distributed-scale training + Arrow-batched
encoding.

Token counts drive packing (operators/curation.py), pricing, and
length filtering; a whitespace proxy drifts badly on code/URLs. This
module implements real BPE (Sennrich et al. 2016) with the correct
scale split:

- **Word-frequency aggregation is the distributed pass** — one
  map-side-combinable groupBy over the corpus (the same shape as
  vocab_topk). This is how production tokenizer trainers work:
  merges are computed from the *word-frequency table*, which is
  vocabulary-sized, not corpus-sized.
- **Merge learning runs on the driver** over that table (pure
  Python, deterministic tie-break: highest pair count, then
  lexicographically smallest pair). n_merges iterations over a dict
  — microseconds to seconds, independent of corpus size.
- **Encoding is Arrow-batched mapInPandas** with the merge ranks in
  the closure (broadcast) and a per-batch word cache — each distinct
  word is encoded once per batch regardless of repetition.

BPE is iterative/greedy, hence not SQL-expressible — correctness is
pinned by differential tests against an independent in-test
implementation plus the partition property (tokens re-concatenate to
the word), not a DuckDB oracle.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freqs(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    min_count: int = 1,
    max_words: int | None = 1_000_000,
) -> dict[str, int]:
    """Corpus word-frequency table (whitespace words): ONE distributed
    map-side-combinable aggregation.

    The DEFAULT is bounded: ``max_words=1_000_000`` keeps only the
    top-N by (count desc, word) via TakeOrdered — per-partition heaps
    + a driver merge of max_words rows, never a full sort or an
    unbounded collect. The web-scale vocabulary is unbounded (typos,
    URLs — plausibly billions of distinct tokens at 100 TB), so an
    unbounded-collect default is a driver-OOM trap; 1M words ≈ tens
    of MB on the driver and exceeds every public BPE trainer's
    retained vocabulary. ``min_count`` additionally drops the
    singleton tail below a frequency floor (the min_frequency knob of
    public BPE trainers). Callers wanting the exact unbounded table
    (differential tests, small corpora) opt in with
    ``max_words=None`` — an explicit, visible choice.
    A cap APPROXIMATES the merge list: merge learning is exact over
    the retained table, and pair mass carried by dropped tail words
    can in principle shift a merge decision — for corpora under the
    cap (every test regime here) the table, and hence the merges,
    are exactly the unbounded ones.

    .. versionchanged:: r8
        The default changed from unbounded to ``max_words=1_000_000``.
        Callers whose vocabulary exceeds the cap get a different
        (truncated) table than before, signalled by the RuntimeWarning
        below — pin ``max_words=None`` to keep the old exact behavior,
        or pass an explicit cap at 100 TB call sites."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    w = df.select(
        F.explode(F.filter(F.split(t, r"\s+"), lambda x: x != "")).alias("w")
    )
    agg = w.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    if min_count > 1:
        agg = agg.where(F.col("c") >= min_count)
    if max_words is not None:
        # orderBy+limit plans as TakeOrderedAndProject: per-partition
        # heaps + driver merge of max_words rows, not a global sort
        agg = agg.orderBy(F.col("c").desc(), "w").limit(max_words)
    rows = agg.collect()
    if max_words is not None and len(rows) == max_words:
        # the cap BOUND: the table is (almost certainly) truncated and
        # merge learning becomes approximate — loud, not silent
        # (pass max_words=None for the exact unbounded table, or raise
        # the cap / min_count)
        import warnings

        warnings.warn(
            f"word_freqs: vocabulary hit the max_words cap ({max_words}); "
            "the frequency table is truncated to the top-N and BPE "
            "merges learned from it are approximate — pass "
            "max_words=None (exact) or raise the cap/min_count",
            RuntimeWarning,
            stacklevel=2,
        )
    return {r["w"]: r["c"] for r in rows}


def train_bpe(freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Classic Sennrich merge learning over a word-frequency dict.
    Deterministic: ties on pair count break to the lexicographically
    smallest pair, so the merge list is reproducible anywhere."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(word): c for word, c in freqs.items() if word
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        a, b = best
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merging of one word (GPT-2 style, no
    end-of-word marker)."""
    sym = list(word)
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) per document. The merge
    ranks travel in the task closure (broadcast-sized: one pair per
    merge); a per-batch word cache encodes each distinct word once."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode(it):
        cache: dict[str, list[str]] = {}
        for pdf in it:
            toks_col = []
            for text in pdf[text_col].astype(str):
                if lowercase:
                    text = text.lower()
                toks: list[str] = []
                for w in text.split():
                    got = cache.get(w)
                    if got is None:
                        got = _encode_word(w, ranks)
                        cache[w] = got
                    toks.extend(got)
                toks_col.append(toks)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "tokens": toks_col,
                    "n_tokens": [len(t) for t in toks_col],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        encode, "id long, tokens array<string>, n_tokens long"
    )
