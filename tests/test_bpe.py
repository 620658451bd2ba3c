"""BPE vocabulary induction (operators/bpe.py) pinned against an
independent pure-Python reference implementation (the mst.py
Kruskal-cross-check pattern): full merge-table equality, final
segmentations, apply-side token counts, and the left-to-right
run-merge semantics the regex formulation must reproduce.
"""

from __future__ import annotations

import re
from collections import Counter

from graph500_spark.operators.bpe import (
    END_OF_WORD,
    bpe_learn,
    bpe_token_counts,
    bpe_vocab,
)

TOKEN_RE = re.compile("[A-Za-z0-9]+")


# --- independent reference implementation (Sennrich alg. 1) ---------------


def ref_word_freqs(texts):
    c = Counter()
    for t in texts:
        c.update(TOKEN_RE.findall(t.lower()))
    return c


def ref_merge_word(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def ref_bpe(texts, num_merges, min_count=2):
    freqs = ref_word_freqs(texts)
    segs = {w: tuple(w) + (END_OF_WORD,) for w in freqs}
    merges = []
    for rank in range(num_merges):
        pc = Counter()
        for w, n in freqs.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        (a, b), n = best
        if n < min_count:
            break
        merges.append((rank, a, b, a + b, n))
        segs = {w: ref_merge_word(s, a, b) for w, s in segs.items()}
    return merges, segs, freqs


# --- fixtures -------------------------------------------------------------

TOY = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
]


class TestBpeLearn:
    def test_toy_merge_table_matches_reference(self, spark):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(TOY)], "doc_id: long, text: string"
        )
        merges_df, words_df = bpe_learn(spark, docs, num_merges=10)
        got = [
            (r.rank, r.left, r.right, r.merged, r.pair_count)
            for r in merges_df.orderBy("rank").collect()
        ]
        want, segs, _ = ref_bpe(TOY, 10)
        assert got == want
        got_segs = {
            r.word: tuple(r.syms.split(" ")) for r in words_df.collect()
        }
        assert got_segs == segs

    def test_run_merge_is_left_to_right(self, spark):
        # 'aaaa' → a a a a </w>; merge (a,a) must give 'aa aa </w>',
        # not 'aa a a </w>' — the lookaround-regex semantics.
        docs = spark.createDataFrame(
            [(0, "aaaa aaaa aaaa")], "doc_id: long, text: string"
        )
        merges_df, words_df = bpe_learn(spark, docs, num_merges=1)
        (m,) = merges_df.collect()
        assert (m.left, m.right) == ("a", "a")
        (w,) = words_df.collect()
        assert w.syms == "aa aa </w>"

    def test_min_count_stops_early(self, spark):
        docs = spark.createDataFrame(
            [(0, "ab cd")], "doc_id: long, text: string"
        )  # every pair occurs once
        merges_df, _ = bpe_learn(spark, docs, num_merges=5, min_count=2)
        assert merges_df.count() == 0

    def test_sf0001_corpus_matches_reference(self, spark):
        sf = "/root/testdata/sf0.001"
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        texts = [r.text for r in docs.select("text").collect()]
        merges_df, words_df = bpe_learn(spark, docs, num_merges=25)
        got = [
            (r.rank, r.left, r.right, r.merged, r.pair_count)
            for r in merges_df.orderBy("rank").collect()
        ]
        want, segs, freqs = ref_bpe(texts, 25)
        assert got == want
        got_segs = {
            r.word: tuple(r.syms.split(" ")) for r in words_df.collect()
        }
        assert got_segs == segs

        # apply side: per-doc subword counts against the reference
        counts = {
            r.doc_id: (r.n_tokens, r.n_bpe_tokens)
            for r in bpe_token_counts(docs, words_df).collect()
        }
        for r in docs.select("doc_id", "text").collect():
            ws = TOKEN_RE.findall(r.text.lower())
            want_n = (len(ws), sum(len(segs[w]) for w in ws))
            assert counts[r.doc_id] == want_n, r.doc_id

        # vocab consistency: symbol frequencies sum to total subwords
        vocab = bpe_vocab(words_df).collect()
        total_syms = sum(v.freq for v in vocab)
        assert total_syms == sum(
            len(segs[w]) * n for w, n in freqs.items()
        )
