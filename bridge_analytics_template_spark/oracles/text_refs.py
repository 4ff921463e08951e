"""Reference-derived oracle generators for text-tier operators whose
hash/iterative cores SQL cannot express: xxhash64 SimHash near-dup pairs
and BPE tokenizer training.

Tokenization parity: ws_tokens (functions/text.py) is
``split(trim(lower(text)), '\\s+')`` — the Python twin
``re.split(r"\\s+", t.strip().lower())`` is pinned token-identical on the
fixture by the green BPE equality test (tests/test_bpe.py) and the
pretokenizer oracle family.
"""

from __future__ import annotations

import functools
import re
from collections import Counter

from . import oracle_sf_dir
from .emit import read_fixture, values_sql
from .hashes import xxhash64_str

_M64 = (1 << 64) - 1


def _ws_tokens(text: str) -> list[str]:
    return re.split(r"\s+", text.strip().lower())


@functools.lru_cache(maxsize=4)
def _simhash_sql(sf_dir: str) -> str:
    """llm/dedup.py::simhash + simhash_near_dups (bits=64, xxhash64,
    max_hamming=3): per-doc bit votes from each token's hash (multiplicity
    kept), signature bit j set iff the vote sum is positive; pairs are all
    (a < b) with Hamming distance <= 3 — the 4x16 banding has recall 1 by
    pigeonhole, so the banded join equals the all-pairs filter."""
    t = read_fixture("documents", "doc_id", "text")
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    sigs: dict[int, int] = {}
    for i, s in zip(ids, texts):
        votes = [0] * 64
        for tok in _ws_tokens(s):
            h = xxhash64_str(tok) & _M64
            for j in range(64):
                votes[j] += 1 if h & (1 << j) else -1
        sig = 0
        for j in range(64):
            if votes[j] > 0:
                sig |= 1 << j
        sigs[int(i)] = sig
    ordered = sorted(sigs)
    rows = []
    for x, a in enumerate(ordered):
        for b in ordered[x + 1 :]:
            ham = bin(sigs[a] ^ sigs[b]).count("1")
            if ham <= 3:
                rows.append((a, b, ham))
    return values_sql(
        rows,
        [("doc_a", "b"), ("doc_b", "b"), ("hamming", "i")],
        order_by="doc_a, doc_b",
    )


def simhash_pairs_oracle() -> str:
    return _simhash_sql(oracle_sf_dir())


def _py_train_bpe(word_freq: dict[str, int], n_merges: int):
    """The pure-Python BPE trainer (same reference as tests/test_bpe.py):
    max-count merge per round, ties to the lexicographically smallest
    pair."""
    vocab = {tuple(w): f for w, f in word_freq.items()}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        new_vocab: dict[tuple, int] = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


@functools.lru_cache(maxsize=4)
def _bpe_sql(sf_dir: str, n_merges: int) -> str:
    t = read_fixture("documents", "text")
    wf: Counter = Counter()
    for s in t.column("text").to_pylist():
        for w in _ws_tokens(s):
            if w:
                wf[w] += 1
    merges = _py_train_bpe(dict(wf), n_merges)
    rows = [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)]
    return values_sql(
        rows,
        [("rank", "i"), ("sym_a", "s"), ("sym_b", "s"), ("cnt", "b")],
        order_by="rank",
    )


def bpe_merges_oracle() -> str:
    return _bpe_sql(oracle_sf_dir(), 8)
