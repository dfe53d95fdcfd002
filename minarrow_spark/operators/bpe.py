"""Distributed BPE vocabulary training — learn a byte-pair-encoding merge
table from a document corpus, Spark-first.

The standard industrial shape (what tokenizer trainers do over web-scale
corpora): the CORPUS-SIZED work is one pass building the word histogram
(explode → map-side-combined groupBy — the only shuffle, vocab-cardinality
output); the merge loop then runs on the histogram, which is MODEL STATE
(a vocabulary is MBs at 100 TB corpus scale — same argument as k-means
centroids), truncated to the top ``max_words`` types for a hard bound.
Encoding with the learned table goes back to the cluster as a chain of
literal `replace` calls — pure codegen, zero shuffle, linear in corpus.

Merge semantics (deterministic, engine-portable — the q30 'bpe' tiers are
DuckDB-oracle-checked bit-for-bit):

* words are symbol strings with ``|`` separators and boundary sentinels:
  ``cat`` → ``|c|a|t|``;
* pair counts weight each adjacent symbol pair by word frequency, counting
  every adjacent position (overlap included);
* the winning pair maximizes (count, then lexicographically-least pair) —
  a total order, no RNG;
* a merge is ONE left-to-right non-overlapping pass of
  ``replace('|a|b|' → '|ab|')`` per word: the boundary anchors make multi-
  char symbols unambiguous ('ab|c' can never match inside '|aab|c|'), at
  the cost that back-to-back repeats of the same pair merge one site per
  pass (the parallel-safe variant — both engines and the trainer agree
  exactly).

Reference parity: the reference has no tokenizer training; this is a
beyond-reference extension in the text-pipeline family (SURVEY §2
extensions), sharing the tokenize contract with functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "|"


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, f) word-frequency table — THE corpus-scale step: one explode +
    one map-side-combined groupBy; output is vocabulary-cardinality."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )


def _wrap(word: str) -> str:
    return SEP + SEP.join(word) + SEP


def bpe_train(
    word_freqs: list[tuple[str, int]], merges: int = 20
) -> list[tuple[str, str, int]]:
    """The merge loop over a (word, freq) histogram (model state; pure
    Python — integer counts, total-order tie-breaks, so the result is
    identical on every run and replayable in SQL). Returns
    [(pair 'a|b', merged 'ab', count-at-merge-time), …]."""
    words = [(_wrap(w), int(f)) for w, f in word_freqs]
    out: list[tuple[str, str, int]] = []
    for _ in range(merges):
        cnt: dict[str, int] = {}
        for s, f in words:
            syms = s[1:-1].split(SEP)
            for i in range(len(syms) - 1):
                pr = syms[i] + SEP + syms[i + 1]
                cnt[pr] = cnt.get(pr, 0) + f
        if not cnt:
            break
        best, c = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merged = best.replace(SEP, "")
        out.append((best, merged, c))
        tgt, rep = SEP + best + SEP, SEP + merged + SEP
        words = [(s.replace(tgt, rep), f) for s, f in words]
    return out


def symbolize(word: Column) -> Column:
    """word → sentinel-wrapped symbol string ('cat' → '|c|a|t|')."""
    return F.concat(F.lit(SEP), F.array_join(F.split(word, ""), SEP), F.lit(SEP))


def bpe_encode(syms: Column, merge_pairs: list[str]) -> Column:
    """Apply a learned merge table to a symbol string: a chain of literal
    replaces — pure whole-stage codegen, zero shuffle, the 100 TB encode
    path. ``merge_pairs`` are 'a|b' strings in training order."""
    out = syms
    for pr in merge_pairs:
        out = F.replace(
            out,
            F.lit(SEP + pr + SEP),
            F.lit(SEP + pr.replace(SEP, "") + SEP),
        )
    return out


def bpe_tokens(syms: Column) -> Column:
    """Symbol string → token array (split on the separator, boundaries
    dropped)."""
    return F.filter(F.split(syms, "\\" + SEP), lambda t: t != "")
