"""BPE trainer/tokenizer: reference-implementation equivalence,
determinism, and the classic hand-checkable Sennrich example."""

from __future__ import annotations

import pytest

from pql_spark.operators import bpe_apply, bpe_encode_word, bpe_train
from pql_spark.operators.bpe import _merge_word, _pair_counts


def _ref_train(word_freqs, num_merges, min_pair_freq=2, eow="</w>"):
    """Independent driver-side reference: same recipe, separate code
    path from the operator's loop (dict-based, no numpy)."""
    vocab = {tuple(w) + (eow,): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(num_merges):
        counts = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = max(counts.values())
        if best < min_pair_freq:
            break
        pair = min(p for p, c in counts.items() if c == best)
        merges.append((rank, pair[0], pair[1], best))
        vocab = {
            _merge_word(s, pair): f for s, f in vocab.items()
        }
    return merges


def test_sennrich_example_merges():
    # the canonical low/lower/newest/widest corpus: first merges are
    # est (6+3), est</w>, lo (5+2), low, ...
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = _ref_train(freqs, 4)
    assert merges[0][1:3] == ("e", "s") and merges[0][3] == 9
    assert merges[1][1:3] == ("es", "t")
    assert merges[2][1:3] == ("est", "</w>")
    assert merges[3][1:3] == ("l", "o") and merges[3][3] == 7


def test_bpe_train_matches_reference(spark):
    rows = [
        (i, t)
        for i, t in enumerate(
            ["low low low low low lower lower newest newest",
             "newest newest newest newest widest widest widest",
             "the cat sat on the mat the cat",
             "the dog sat on the log the dog"] * 3
        )
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["rank"], r["left"], r["right"], r["pair_freq"])
        for r in bpe_train(docs, num_merges=12).orderBy("rank").collect()
    ]
    # reference word-freq table from the same corpus
    wf = {}
    for _, t in rows:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    assert got == _ref_train(wf, 12)
    assert len(got) == 12


def test_bpe_train_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i % 7}") for i in range(50)],
        "doc_id long, text string",
    )
    a = bpe_train(docs, num_merges=8).collect()
    b = bpe_train(docs, num_merges=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bpe_train_min_freq_stops(spark):
    docs = spark.createDataFrame(
        [(0, "aa bb"), (1, "cc dd")], "doc_id long, text string"
    )
    merges = bpe_train(docs, num_merges=50, min_pair_freq=3).collect()
    assert merges == []  # every pair occurs < 3 times


def test_bpe_encode_word_greedy_rank_order():
    ranks = {("e", "s"): 0, ("es", "t"): 1, ("est", "</w>"): 2,
             ("l", "o"): 3, ("lo", "w"): 4}
    assert bpe_encode_word("lowest", ranks) == ["low", "est</w>"]
    assert bpe_encode_word("low", ranks) == ["low", "</w>"]
    assert bpe_encode_word("xyz", ranks) == ["x", "y", "z", "</w>"]


def test_bpe_apply_matches_per_word_encoder(spark):
    docs = spark.createDataFrame(
        [(0, "newest widest low"), (1, "the newest LOW"), (2, "")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, num_merges=6)
    ranks = {
        (r["left"], r["right"]): r["rank"] for r in merges.collect()
    }
    out = {
        r["doc_id"]: (list(r["bpe_tokens"]), r["n_bpe_tokens"])
        for r in bpe_apply(docs, merges).collect()
    }
    for did, text in [(0, "newest widest low"), (1, "the newest LOW")]:
        want = []
        for w in text.lower().split():
            want.extend(bpe_encode_word(w, ranks))
        assert out[did] == (want, len(want))
    assert out[2] == ([], 0)


def test_bpe_apply_compresses(spark):
    docs = spark.createDataFrame(
        [(i, "compression compression compression works works")
         for i in range(20)],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, num_merges=30, min_pair_freq=2)
    toks = bpe_apply(docs, merges).collect()
    chars = len("compression compression compression works works")
    # with 30 merges over a 2-word corpus, tokens/doc must be far below
    # character count and at least the word count
    assert all(5 <= r["n_bpe_tokens"] < chars // 2 for r in toks)


@pytest.mark.parametrize("cap", [2, 4])
def test_bpe_vocab_cap_deterministic(spark, cap):
    # cap keeps the TOP-freq words with lexicographic ties — training
    # on the capped table equals reference-training on that table
    docs = spark.createDataFrame(
        [(0, "aa aa aa bb bb cc cc dd")], "doc_id long, text string"
    )
    got = [
        (r["rank"], r["left"], r["right"], r["pair_freq"])
        for r in bpe_train(docs, num_merges=5, max_vocab_words=cap)
        .orderBy("rank").collect()
    ]
    wf_all = {"aa": 3, "bb": 2, "cc": 2, "dd": 1}
    top = dict(
        sorted(wf_all.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
    )
    assert got == _ref_train(top, 5)



def test_bpe_train_apply_agree_on_unicode_whitespace(spark):
    """Train tokenizes with Catalyst (Java \\s, ASCII-only); apply must
    use the same class.  U+00A0/U+2028 are whitespace to Python's \\s
    but NOT to Java's — both sides must treat them as word characters
    (ADVICE r7 regression)."""
    # U+00A0 joins each 'low low' into ONE Java-\s word; U+2028 joins
    # the last two 'newest's into one word
    text = (
        "low\u00a0low low\u00a0low newest newest\u2028newest"
    )
    docs = spark.createDataFrame(
        [(0, text)] * 4, "doc_id long, text string"
    )
    merges = bpe_train(docs, num_merges=8, min_pair_freq=2)
    ranks = {
        (r["left"], r["right"]): r["rank"] for r in merges.collect()
    }
    out = bpe_apply(docs, merges).head()
    # the words the TRAINER saw (Java \s splits only on ASCII ws)
    want = []
    for w in ["low\u00a0low", "low\u00a0low", "newest",
              "newest\u2028newest"]:
        want.extend(bpe_encode_word(w, ranks))
    assert list(out["bpe_tokens"]) == want


def test_bpe_apply_string_doc_ids(spark):
    """bpe_apply derives the id field type from the input schema —
    string ids must round-trip, not fail or miscast (ADVICE r7)."""
    docs = spark.createDataFrame(
        [("doc-a", "newest widest low"), ("doc-b", "the newest low")],
        "doc_id string, text string",
    )
    merges = bpe_train(docs, num_merges=4)
    out = bpe_apply(docs, merges)
    assert dict(out.dtypes)["doc_id"] == "string"
    got = {r["doc_id"] for r in out.collect()}
    assert got == {"doc-a", "doc-b"}


# ---------------------------------------------------------------- byte-level


def test_bytes_to_unicode_table():
    from pql_spark.operators.bpe import bytes_to_unicode

    t = bytes_to_unicode()
    assert len(t) == 256 and len(set(t.values())) == 256  # bijective
    assert t[ord("a")] == "a" and t[ord("!")] == "!"  # printable fixed
    assert ord(t[0x20]) >= 256  # space shifted out of band
    assert 0xAD in t and ord(t[0xAD]) >= 256  # soft hyphen shifted


def test_byte_level_hand_example(spark):
    """Multi-byte char: 'h\u00e9\u00e9' is bytes (h, C3, A9, C3, A9)
    through the GPT-2 table -> first merge is the \u00e9 byte pair,
    then greedy growth; tokens round-trip to the exact UTF-8 bytes."""
    from pql_spark.operators.bpe import bytes_to_unicode

    b2u = bytes_to_unicode()
    u2b = {c: b for b, c in b2u.items()}
    word = "h\u00e9\u00e9"
    docs = spark.createDataFrame(
        [(i, word + " " + word) for i in range(4)],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, num_merges=4, byte_level=True)
    got = [(r["left"], r["right"]) for r in merges.orderBy("rank").collect()]
    e1, e2 = b2u[0xC3], b2u[0xA9]  # UTF-8 bytes of \u00e9
    assert got[0] == (e1, e2)
    assert got[1] == ("h", e1 + e2)
    assert got[2] == ("h" + e1 + e2, e1 + e2)
    out = bpe_apply(docs, merges, byte_level=True).head()
    toks = list(out["bpe_tokens"])
    # the whole word fused into one token, twice (two words per doc)
    assert toks == ["h" + e1 + e2 + e1 + e2] * 2
    # round trip: concatenated tokens inverse-map to the exact bytes
    raw = bytes(u2b[c] for c in "".join(toks))
    assert raw.decode("utf-8") == word + word


def test_byte_level_cjk_round_trip(spark):
    """Whitespace-free CJK text: every char is 3 UTF-8 bytes; the
    256-symbol alphabet has no OOV and tokens always decode back."""
    from pql_spark.operators.bpe import bytes_to_unicode

    b2u = bytes_to_unicode()
    u2b = {c: b for b, c in b2u.items()}
    text = "\u7684\u662f\u5728\u7684\u662f"
    docs = spark.createDataFrame(
        [(i, text) for i in range(3)], "doc_id long, text string"
    )
    merges = bpe_train(docs, num_merges=12, byte_level=True)
    out = bpe_apply(docs, merges, byte_level=True).head()
    toks = list(out["bpe_tokens"])
    assert toks  # tokenized, no crash on whitespace-free script
    raw = bytes(u2b[c] for c in "".join(toks))
    assert raw.decode("utf-8") == text
    # with 12 merges over a 15-byte word the token count compresses
    assert out["n_bpe_tokens"] < 15


def test_byte_level_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "repeat repeat tokens tokens byte") for i in range(6)],
        "doc_id long, text string",
    )
    a = [tuple(r) for r in
         bpe_train(docs, num_merges=10, byte_level=True)
         .orderBy("rank").collect()]
    b = [tuple(r) for r in
         bpe_train(docs, num_merges=10, byte_level=True)
         .orderBy("rank").collect()]
    assert a == b and len(a) > 0


def test_byte_level_matches_reference(spark):
    """byte-level trainer == the independent reference loop run over
    byte-symbol words (same recipe, byte alphabet)."""
    from pql_spark.operators.bpe import bytes_to_unicode

    b2u = bytes_to_unicode()
    corpus = ["low lower low", "newest low newest"]
    docs = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    got = [
        (r["rank"], r["left"], r["right"], r["pair_freq"])
        for r in bpe_train(docs, num_merges=8, byte_level=True)
        .orderBy("rank").collect()
    ]
    # reference: word freqs over the whole corpus, byte symbols
    wf = {}
    for t in corpus:
        for w in t.lower().split():
            wf[w] = wf.get(w, 0) + 1
    vocab = {
        tuple(b2u[b] for b in w.encode("utf-8")): f for w, f in wf.items()
    }
    merges = []
    for rank in range(8):
        counts = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pp = (syms[i], syms[i + 1])
                counts[pp] = counts.get(pp, 0) + f
        if not counts:
            break
        best = max(counts.values())
        if best < 2:
            break
        pair = min(p for p, c in counts.items() if c == best)
        merges.append((rank, pair[0], pair[1], best))
        vocab = {_merge_word(s, pair): f for s, f in vocab.items()}
    assert got == merges and len(got) > 0
