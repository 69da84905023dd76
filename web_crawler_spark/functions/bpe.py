"""Byte-pair-encoding tokenizer (Sennrich et al., ACL'16) — the real merge
algorithm behind `bpe_token_stats`, replacing the round-2 alnum-run proxy.

Pipeline position: token counting is the single most-used statistic in a
training-data pipeline, so this is a first-class op, not a stand-in. The
committed merge table (web_crawler_spark/data/bpe_merges.json, learned
deterministically from the sf0.001 documents fixture by
tools/gen_bpe_vocab.py) is tiny and closure-broadcast; application is an
Arrow-batched pandas UDF whose per-word work is memoised, so the per-row
cost is a dict lookup — no per-row Python beyond the Arrow batch loop.

Determinism: learning is greedy most-frequent-pair with ties broken by
lexicographic pair order; application merges the lowest-rank pair first
(all occurrences), ties by leftmost position. Both are pure functions of
(corpus word frequencies, n_merges), so the committed table is
byte-reproducible and the DuckDB oracle can restate per-document counts as
a word → n_tokens lookup join (web_crawler_spark/data/bpe_word_tokens
.parquet, generated from the same merge table).

Reference parity: the reference engine has no tokenizer — this op is part
of the training-data-pipeline surface the brief adds on top of the
reference's own operator set.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Dict, Iterable, List, Tuple

import pandas as pd
from pyspark.sql.functions import pandas_udf

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "data")
MERGES_JSON = os.path.join(DATA_DIR, "bpe_merges.json")
WORD_TOKENS_PARQUET = os.path.join(DATA_DIR, "bpe_word_tokens.parquet")


def learn_merges(word_freqs: Dict[str, int], n_merges: int
                 ) -> List[Tuple[str, str]]:
    """Greedy BPE merge learning: at each step merge the most frequent
    adjacent symbol pair (frequency-weighted by word counts); ties broken
    by lexicographic pair order so the result is a pure function of the
    input. Stops early when no pair occurs at least twice."""
    vocab = {tuple(w): f for w, f in sorted(word_freqs.items())}
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Dict[Tuple[str, str], int] = {}
        for sym, freq in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: Dict[Tuple[str, ...], int] = {}
        for sym, freq in vocab.items():
            out: List[str] = []
            i = 0
            while i < len(sym):
                if (i < len(sym) - 1 and sym[i] == best[0]
                        and sym[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = freq
        vocab = new_vocab
    return merges


class BpeTokenizer:
    """Applies a learned merge table: repeatedly merge the lowest-rank
    adjacent pair (all occurrences, leftmost first) until none applies —
    the standard BPE inference loop, memoised per word."""

    def __init__(self, merges: Iterable[Tuple[str, str]]):
        self.merges = [tuple(m) for m in merges]
        self.ranks = {m: i for i, m in enumerate(self.merges)}
        self._encode_word = lru_cache(maxsize=65536)(self._encode_uncached)

    def _encode_uncached(self, word: str) -> Tuple[str, ...]:
        sym: List[str] = list(word)
        while len(sym) > 1:
            ranked = [(self.ranks[p], i)
                      for i, p in enumerate(zip(sym, sym[1:]))
                      if p in self.ranks]
            if not ranked:
                break
            rank, _ = min(ranked)
            a, b = self.merges[rank]
            out: List[str] = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return tuple(sym)

    def encode(self, word: str) -> Tuple[str, ...]:
        return self._encode_word(word)

    def count_text(self, text: str) -> int:
        """Token count of a document: whitespace pretokenize, sum per-word
        BPE token counts (words are independent, as in subword-nmt)."""
        return sum(len(self._encode_word(w)) for w in (text or "").split())


@lru_cache(maxsize=1)
def load_tokenizer(path: str = MERGES_JSON) -> BpeTokenizer:
    with open(path) as f:
        return BpeTokenizer([tuple(m) for m in json.load(f)["merges"]])


#: per-python-worker tokenizer (keyed by merge-table identity) — built once
#: per worker PROCESS, not per Arrow batch, so the per-word lru_cache
#: actually accumulates across batches (a fresh tokenizer per batch would
#: silently discard the memoisation the design relies on)
_WORKER_TOKENIZERS: Dict[Tuple[Tuple[str, str], ...], BpeTokenizer] = {}


@lru_cache(maxsize=1)
def bpe_token_count_udf():
    """Arrow-batched token counter over the committed merge table. The
    merge list rides the task closure (a few hundred strings); per-word
    encodes are memoised inside each python worker, so steady-state cost
    is one dict lookup per word occurrence."""
    merges = tuple(load_tokenizer().merges)

    @pandas_udf("bigint")
    def _count(texts: pd.Series) -> pd.Series:
        # keyed by the merges tuple itself (hashable) — a raw hash() key
        # could collide between two different merge tables in one worker
        tok = _WORKER_TOKENIZERS.get(merges)
        if tok is None:
            tok = _WORKER_TOKENIZERS.setdefault(merges, BpeTokenizer(merges))
        return texts.map(tok.count_text).astype("int64")

    return _count
