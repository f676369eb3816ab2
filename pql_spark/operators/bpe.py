"""Byte-pair-encoding tokenizer training and application.

The trainer follows the classic word-level BPE recipe (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units"),
structured the way production tokenizer trainers are at corpus scale:

1. the CORPUS-SCALE stage — aggregating the word-frequency table — runs
   distributed (one groupBy with map-side partial aggregation over the
   tokenized corpus; this is the only stage whose cost grows with the
   100 TB input), then
2. the merge loop runs over the BOUNDED word-frequency table (capped at
   ``max_vocab_words`` rows, the same compression sentencepiece / HF
   tokenizers apply), which is a driver-side loop over at most
   ``max_vocab_words`` tuples — deliberately NOT a per-iteration Spark
   job: ``num_merges`` iterations of explode+groupBy over a table this
   small would pay 2·num_merges shuffles to avoid holding ≤ a few MB on
   the driver.

Both halves are deterministic: word ties break lexicographically at the
cap, merge ties break on (freq desc, pair lexicographic), so the merge
table is reproducible run-to-run and engine-to-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

__all__ = [
    "bpe_train", "bpe_apply", "bpe_encode_word", "bytes_to_unicode"
]


def bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 byte->printable-unicode table (Radford et al. 2019,
    ``encoder.py``): every byte value maps to a visible character so
    byte-level symbols survive string handling — printable ASCII and
    latin-1 letters map to themselves, the rest shift into the U+0100
    private-ish range.  Bijective, so token sequences decode back to
    exact UTF-8 bytes."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\u00a1"), ord("\u00ac") + 1))
        + list(range(ord("\u00ae"), ord("\u00ff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


_B2U: dict[int, str] | None = None


def _word_symbols(
    word: str, byte_level: bool, end_of_word: str
) -> tuple[str, ...]:
    """A word's initial symbol sequence: characters + end-of-word
    marker (classic Sennrich), or its UTF-8 bytes through the GPT-2
    byte table (byte-level — no marker; merges never cross words, so
    the boundary is implicit).  Shared by the trainer and the
    per-word encoder so train and apply agree by construction."""
    if not byte_level:
        return tuple(word) + (end_of_word,)
    global _B2U
    if _B2U is None:
        _B2U = bytes_to_unicode()
    return tuple(_B2U[b] for b in word.encode("utf-8"))


def _pair_counts(vocab: list[tuple[tuple[str, ...], int]]) -> dict:
    counts: dict[tuple[str, str], int] = {}
    for syms, freq in vocab:
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + freq
    return counts


def _merge_word(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(syms)
    a, b = pair
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 50,
    max_vocab_words: int = 65536,
    min_pair_freq: int = 2,
    end_of_word: str = "</w>",
    byte_level: bool = False,
) -> DataFrame:
    """Learn a BPE merge table from a document corpus.

    Returns a DataFrame ``(rank int, left string, right string,
    pair_freq long)`` — merge ``rank`` fuses adjacent symbols
    ``left + right``; apply in rank order (:func:`bpe_apply`).

    Words are the whitespace tokens of normalized text (the package's
    canonical ``tokens`` form); each word starts as its character
    sequence with ``end_of_word`` appended as a final separate symbol,
    so learned subwords distinguish word-internal from word-final
    position.  The loop stops early when the best pair's corpus
    frequency drops below ``min_pair_freq``.

    ``byte_level=True`` switches the initial alphabet to each word's
    UTF-8 BYTES through the GPT-2 byte->unicode table (Radford et al.
    2019) with no end-of-word marker — the 256-symbol alphabet covers
    any script (accented text, CJK, emoji) with zero OOV risk, where
    character-level symbols fragment unboundedly.  Token strings
    concatenate and inverse-map back to the exact UTF-8 bytes.

    Scale: the word-frequency aggregate is the corpus-bound stage (one
    shuffle, partial-agg'd map-side); the driver holds only the top
    ``max_vocab_words`` (freq desc, word asc) rows — the standard
    trainer bound, NOT corpus-sized state.
    """
    spark = docs.sparkSession
    wf_rows = (
        docs.select(
            F.explode(tokens(F.col(text_col))).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(max_vocab_words)
        .collect()
    )
    vocab = [
        (_word_symbols(r["word"], byte_level, end_of_word), int(r["freq"]))
        for r in wf_rows
    ]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        best_freq = max(counts.values())
        if best_freq < min_pair_freq:
            break
        # deterministic tie-break: lexicographically smallest pair
        pair = min(p for p, c in counts.items() if c == best_freq)
        merges.append((rank, pair[0], pair[1], best_freq))
        vocab = [(_merge_word(s, pair), f) for s, f in vocab]
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_freq long"
    )


def bpe_encode_word(
    word: str,
    ranks: dict,
    end_of_word: str = "</w>",
    byte_level: bool = False,
) -> list[str]:
    """Encode ONE word with a learned merge-rank dict
    ``{(left, right): rank}`` — greedy lowest-rank-first, the standard
    BPE inference order.  Pure Python; shared by :func:`bpe_apply` and
    the tests' reference implementation.  ``byte_level`` must match
    the trainer's setting (byte symbols vs chars + end-of-word)."""
    syms = list(_word_symbols(word, byte_level, end_of_word))
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_apply(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    end_of_word: str = "</w>",
    out_col: str = "bpe_tokens",
    byte_level: bool = False,
) -> DataFrame:
    """Tokenize a corpus with a learned merge table — returns
    ``(id_col, out_col array<string>, n_bpe_tokens int)``.

    The merge table (≤ ``num_merges`` rows) is collected once and
    closed over by a narrow Arrow kernel — the broadcast-small-dim
    pattern; per-word encodings are memoized per batch, so each
    DISTINCT word in a batch is encoded once regardless of its
    repetition count.  No shuffle at any corpus size.
    """
    import pandas as pd

    from .text import py_tokens

    rank_rows = merges.select("rank", "left", "right").collect()
    ranks = {
        (r["left"], r["right"]): int(r["rank"]) for r in rank_rows
    }

    def kernel(batches):
        memo: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = memo.get(word)
            if got is None:
                got = bpe_encode_word(
                    word, ranks, end_of_word, byte_level
                )
                memo[word] = got
            return got

        for pdf in batches:
            toks_col, counts = [], []
            for t in pdf[text_col]:
                # py_tokens = the Java-\s twin of the Catalyst tokens()
                # used by bpe_train — train and apply MUST tokenize
                # identically or learned merges silently fail to apply
                # on Unicode-whitespace text (ADVICE r7)
                words = py_tokens(t)
                toks: list[str] = []
                for w in words:
                    if w:
                        toks.extend(enc(w))
                toks_col.append(toks)
                counts.append(len(toks))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: toks_col,
                    "n_bpe_tokens": counts,
                }
            )

    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    # derive the id field's type from the input — doc ids may be
    # string/int/uuid, not necessarily long (ADVICE r7)
    out_schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType),
            StructField(out_col, ArrayType(StringType())),
            StructField("n_bpe_tokens", IntegerType()),
        ]
    )
    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel, out_schema
    )
