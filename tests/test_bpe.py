"""BPE trainer: exact agreement with a pure-Python reference on the same
word-frequency table (merge choices AND pair counts, in order)."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

from bridge_analytics_template_spark.catalog import load
from bridge_analytics_template_spark.llm.bpe import train_bpe

N_MERGES = 8


def _py_train_bpe(word_freq: dict[str, int], n_merges: int):
    vocab = {tuple(w): f for w, f in word_freq.items()}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        # deterministic: max count, ties to lexicographically smallest pair
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        new_vocab = {}
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


def test_bpe_matches_python(spark, sf_dir):
    got = train_bpe(load(spark, sf_dir, "documents"), n_merges=N_MERGES)
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    wf: Counter = Counter()
    for t in pdf["text"]:
        for w in re.split(r"\s+", t.strip().lower()):
            if w:
                wf[w] += 1
    want = _py_train_bpe(dict(wf), N_MERGES)
    assert got == want
    assert len(got) == N_MERGES
