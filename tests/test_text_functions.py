"""Unit tests for text-analysis functions on constructed inputs
(the synthetic documents table is word-soup, so language/quality
behavior is pinned here on real sentences)."""

from __future__ import annotations

from pyspark.sql import Row

from openetlagent_spark.functions.text import (
    with_char_classes,
    with_fingerprint,
    with_lang_id,
    with_quality,
    with_token_counts,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="hello world  foo"),
            Row(doc_id=2, text=""),
            Row(doc_id=3, text="   "),
            Row(doc_id=4, text="a-b c3d!"),
        ]
    )
    got = {r.doc_id: (r.token_count, r.bpe_token_count) for r in with_token_counts(df).collect()}
    assert got[1] == (3, 3)
    assert got[2] == (0, 0)
    assert got[3] == (0, 0)
    # "a-b c3d!" -> bpe pieces: a, -, b, c, 3, d, !
    assert got[4] == (2, 7)


def test_char_classes(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="ab1 .x")])
    r = with_char_classes(df).collect()[0]
    assert (r.n_chars, r.n_letters, r.n_digits, r.n_spaces, r.n_punct) == (6, 3, 1, 1, 1)


def test_quality_bounds_and_order(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat on the mat and it is a good day for everyone " * 8),
            Row(doc_id=2, text="$$$ ### 123"),
        ]
    )
    got = {r.doc_id: r.quality for r in with_quality(df).collect()}
    assert 0.0 <= got[2] < got[1] <= 1.0


def test_lang_id_real_sentences(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog and it is fast"),
            Row(doc_id=2, text="le chat est sur la table et il mange une pomme pour le dîner"),
            Row(doc_id=3, text="der hund ist ein gutes tier und die katze ist nicht schlecht"),
            Row(doc_id=4, text="el perro es un animal y la casa es grande para los niños"),
            Row(doc_id=5, text="我 的 朋友 是 一个 好 人 他 不 在 这 里"),
            Row(doc_id=6, text="zzz qqq xxx"),
        ]
    )
    got = {r.doc_id: r.lang_pred for r in with_lang_id(df).collect()}
    assert got == {1: "en", 2: "fr", 3: "de", 4: "es", 5: "zh", 6: "unknown"}


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="Hello   World"),
            Row(doc_id=2, text="hello world"),
            Row(doc_id=3, text="different entirely"),
        ]
    )
    got = {r.doc_id: r.fingerprint for r in with_fingerprint(df).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]
    assert len(got[1]) == 32  # md5 hex


def test_repetition_fractions(spark):
    from openetlagent_spark.functions.text import with_repetition

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b c a b"),   # 6 2-grams, 4 distinct
            Row(doc_id=2, text="spam spam spam spam"),  # all 2-grams identical
            Row(doc_id=3, text="all words here differ"),
            Row(doc_id=4, text="x"),               # shorter than n
            Row(doc_id=5, text=""),
        ]
    )
    got = {
        r.doc_id: (round(r.dup_2gram_frac, 6), round(r.dup_3gram_frac, 6))
        for r in with_repetition(df).collect()
    }
    assert got[1] == (round(1 - 4 / 6, 6), 0.0)
    assert got[2] == (round(1 - 1 / 3, 6), 0.5)
    assert got[3] == (0.0, 0.0)
    assert got[4] == (0.0, 0.0)
    assert got[5] == (0.0, 0.0)


def test_vocab_oov(spark):
    from openetlagent_spark.functions.text import vocab_oov

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat on the mat"),
            Row(doc_id=2, text="the dog sat on the rug"),
            Row(doc_id=3, text="zyxwv qqqq zzzz"),  # all rare
        ]
    )
    # vocabulary of size 4 = {the(4), on(2), sat(2), cat? ...} — ties on
    # count 2 break token-asc: on < sat, so vocab = {the, on, sat, cat}
    got = {r.doc_id: r for r in vocab_oov(df, top_k=4).collect()}
    assert got[1].n_tokens == 6
    # in-vocab for doc1: the, sat, on, the, cat -> 5; oov: mat
    assert got[1].n_oov == 1
    assert got[3].n_oov == 3 and got[3].oov_rate == 1.0
    assert abs(got[1].oov_rate - 1 / 6) < 1e-12


def test_vocab_oov_deterministic_tiebreak(spark):
    from openetlagent_spark.functions.text import vocab_oov

    # every token appears exactly once: top_k selects lexicographically
    df = spark.createDataFrame([Row(doc_id=1, text="b a d c")])
    out = vocab_oov(df, top_k=2).collect()[0]
    # vocab = {a, b}; oov = {c, d}
    assert out.n_tokens == 4 and out.n_oov == 2


def test_bpe_pair_counts(spark):
    from openetlagent_spark.functions.text import bpe_pair_counts

    df = spark.createDataFrame(
        [Row(doc_id=1, text="abab ab"), Row(doc_id=2, text="ba"), Row(doc_id=3, text="")]
    )
    got = {(r.pair_left, r.pair_right): r.n_pairs for r in bpe_pair_counts(df, k=10).collect()}
    # 'abab' -> ab, ba, ab; 'ab' -> ab; 'ba' -> ba; '' -> none
    assert got == {("a", "b"): 3, ("b", "a"): 2}


def test_bpe_pair_counts_topk_tiebreak(spark):
    from openetlagent_spark.functions.text import bpe_pair_counts

    df = spark.createDataFrame([Row(doc_id=1, text="xy yz zx")])
    rows = bpe_pair_counts(df, k=2).collect()
    # all three pairs count 1; (count desc, pair asc) keeps xy, yz? ->
    # ordering is left asc: ('x','y') < ('y','z') < ('z','x')
    assert [(r.pair_left, r.pair_right) for r in rows] == [("x", "y"), ("y", "z")]


def test_unicode_nfc_composes_and_matches_duckdb(spark):
    """NFC composes combining sequences, leaves the ligature (canonical,
    not compatibility), preserves NULL — and agrees byte-for-byte with
    DuckDB's nfc_normalize on multilingual samples."""
    import duckdb
    import unicodedata

    from openetlagent_spark.functions.text import with_unicode_nfc

    samples = [
        "Café",          # e + combining acute -> é
        "Nöel",          # o + combining diaeresis -> ö
        "ﬁle",            # ﬁ ligature: unchanged under NFC
        "plain ascii",
        "한국어 가",  # Hangul jamo compose to a syllable
        None,
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(samples)], "doc_id int, text string"
    )
    got = {r.doc_id: r.text for r in with_unicode_nfc(df).collect()}
    con = duckdb.connect()
    for i, t in enumerate(samples):
        if t is None:
            assert got[i] is None
            continue
        assert got[i] == unicodedata.normalize("NFC", t)
        assert got[i] == con.execute("SELECT nfc_normalize(?)", [t]).fetchone()[0]
    assert got[0] == "Caf\u00e9" and len(got[0]) == 4 and len(samples[0]) == 5
    assert got[2] == "ﬁle"  # ligature survives


def test_bpe_train_learns_expected_merges(spark):
    from openetlagent_spark.functions.text import bpe_train

    # corpus: 'abab' x3, 'ab' x2 -> round 1 merges (a,b) [8 pairs];
    # round 2 merges (ab,ab) [3 pairs]
    df = spark.createDataFrame(
        [("abab abab abab ab ab",)], "text string"
    )
    rows = bpe_train(df, "text", n_merges=2).orderBy("merge_rank").collect()
    assert [(r.merge_rank, r.pair_left, r.pair_right, r.merged, r.n_pairs) for r in rows] == [
        (1, "a", "b", "ab", 8),
        (2, "ab", "ab", "abab", 3),
    ]


def test_bpe_train_greedy_overlap_and_exhaustion(spark):
    from openetlagent_spark.functions.text import bpe_train

    # 'aaa': (a,a) counts twice (overlap) but greedy merge leaves [aa, a];
    # only 2 merges are learnable from a 3-char word — round 3 finds no
    # pairs and the loop stops early with 2 rows
    df = spark.createDataFrame([("aaa",)], "text string")
    rows = bpe_train(df, "text", n_merges=3).orderBy("merge_rank").collect()
    assert [(r.merge_rank, r.pair_left, r.pair_right, r.n_pairs) for r in rows] == [
        (1, "a", "a", 2),
        (2, "aa", "a", 1),
    ]


def test_bpe_train_weighted_by_word_frequency(spark):
    from openetlagent_spark.functions.text import bpe_train

    # 'xy' appears in 3 docs, 'zz' in 1 -> (x,y) outweighs (z,z)
    df = spark.createDataFrame(
        [("xy",), ("xy",), ("xy",), ("zz",)], "text string"
    )
    rows = bpe_train(df, "text", n_merges=1).collect()
    assert [(r.pair_left, r.pair_right, r.n_pairs) for r in rows] == [("x", "y", 3)]


def test_bpe_train_validates(spark):
    import pytest

    from openetlagent_spark.functions.text import bpe_train

    df = spark.createDataFrame([("a",)], "text string")
    with pytest.raises(ValueError):
        bpe_train(df, "text", n_merges=0)


def test_bpe_encode_applies_learned_merges(spark):
    from openetlagent_spark.functions.text import bpe_encode, bpe_train

    df = spark.createDataFrame([(1, "abab abab ab"), (2, "cd")], "doc_id long, text string")
    merges = [
        (r.pair_left, r.pair_right)
        for r in bpe_train(df, "text", n_merges=2).orderBy("merge_rank").collect()
    ]
    assert merges == [("a", "b"), ("ab", "ab")]
    out = {r.doc_id: (r.n_chars_tok, r.n_bpe_tokens) for r in bpe_encode(df, merges).collect()}
    # doc 1: 'abab'->[abab] x2, 'ab'->[ab]: 10 chars -> 3 symbols
    assert out[1] == (10, 3)
    # doc 2: 'cd' untouched by the merge table
    assert out[2] == (2, 2)


def test_bpe_encode_empty_and_no_merges(spark):
    from openetlagent_spark.functions.text import bpe_encode

    df = spark.createDataFrame([(1, ""), (2, "xyz")], "doc_id long, text string")
    out = {r.doc_id: (r.n_chars_tok, r.n_bpe_tokens) for r in bpe_encode(df, []).collect()}
    assert out[1] == (0, 0)
    assert out[2] == (3, 3)


def test_bpe_encode_boundary_collision_merges(spark):
    # (t,h) then (h,e): after 'th' forms, 'h'+'e' must NOT merge across
    # the new symbol's boundary — 'the' encodes to [th, e], 2 tokens
    # (a naive single-separator replace chain yields 1)
    from openetlagent_spark.functions.text import bpe_encode

    df = spark.createDataFrame([(1, "the")], "doc_id long, text string")
    out = bpe_encode(df, [("t", "h"), ("h", "e")]).first()
    assert (out.n_chars_tok, out.n_bpe_tokens) == (3, 2)


def test_bpe_encode_matches_trainer_fold_on_adversarial_tables(spark):
    import random

    from openetlagent_spark.functions.text import bpe_encode

    def fold(sym, a, b):
        out = []
        for x in sym:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        return out

    random.seed(7)
    rows, want = [], {}
    for i in range(60):
        w = "".join(random.choice("abc") for _ in range(random.randint(1, 9)))
        rows.append((i, w))
    merges = [("a", "b"), ("ab", "c"), ("c", "a"), ("b", "b")]
    for i, w in rows:
        sym = list(w)
        for a, b in merges:
            sym = fold(sym, a, b)
        want[i] = len(sym)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.n_bpe_tokens for r in bpe_encode(df, merges).collect()}
    assert got == want


def test_tokenize_ids_roundtrip_and_oov(spark):
    from pyspark.sql import Row

    from openetlagent_spark.functions.text import tokenize_ids

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta alpha gamma"),
            Row(doc_id=2, text="alpha beta beta"),
            Row(doc_id=3, text="zeta"),          # rare → OOV at top_k=3
            Row(doc_id=4, text=None),            # NULL text drops
        ]
    )
    out = {r.doc_id: r for r in tokenize_ids(docs, top_k=3).collect()}
    assert set(out) == {1, 2, 3}
    # vocabulary by (count desc, token asc): alpha(3)=1, beta(3)=2, gamma(1)=3
    assert out[1].token_ids == [1, 2, 1, 3]
    assert out[2].token_ids == [1, 2, 2]
    assert out[3].token_ids == [0] and out[3].n_oov == 1
    assert out[1].n_tokens == 4 and out[1].n_oov == 0
    # ids are ints, order preserved under repartition
    re = {r.doc_id: r.token_ids for r in tokenize_ids(docs.repartition(7), top_k=3).collect()}
    assert re == {k: v.token_ids for k, v in out.items()}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        tokenize_ids(docs, top_k=0)


def test_collocations_topk_hand_computed(spark):
    """PMI-ratio ranking over a tiny corpus: the repeated pair ranks
    by n*N/(left*right); min_count floors hapax pairs."""
    from pyspark.sql import Row

    from openetlagent_spark.functions.text import collocations_topk

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="new york new york new york is big"),
         Row(doc_id=2, text="big apple big apple rare pair")]
    )
    got = collocations_topk(docs, "text", k=10, min_count=2).collect()
    pairs = {(r.w1, r.w2): r for r in got}
    assert ("rare", "pair") not in pairs  # hapax floored
    assert ("new", "york") in pairs and ("big", "apple") in pairs
    ny = pairs[("new", "york")]
    # marginals over the bigram table: hand-check the ratio
    # bigrams doc1: new,york / york,new / new,york / york,new /
    # new,york / york,is / is,big ; doc2: big,apple / apple,big /
    # big,apple / apple,rare / rare,pair  -> N = 12
    # n(new,york)=3 left(new)=3 right(york)=3 -> 3*12/9 = 4.0
    assert ny.n == 3 and ny.score == 4.0
    import pytest

    with pytest.raises(ValueError, match="min_count"):
        collocations_topk(docs, min_count=0)


def test_skipgram_pairs_window_and_symmetry(spark):
    """Hand-checked window-2 pairs over 'a b c': forward (a,b,1),
    (b,c,1), (a,c,2) plus mirrors; duplicate docs double the counts;
    min_count floors."""
    from pyspark.sql import Row

    from openetlagent_spark.functions.text import skipgram_pairs

    df = spark.createDataFrame([Row(text="a b c"), Row(text="a b c"),
                                Row(text=None)])
    out = {(r.center, r.context, r.dist): r.n
           for r in skipgram_pairs(df, "text", window=2, min_count=1).collect()}
    assert out[("a", "b", 1)] == 2 and out[("b", "a", 1)] == 2
    assert out[("a", "c", 2)] == 2 and out[("c", "a", 2)] == 2
    assert out[("b", "c", 1)] == 2
    assert len(out) == 6  # 3 forward pairs, both directions
    # window=1 drops the distance-2 pair
    out1 = {(r.center, r.context, r.dist)
            for r in skipgram_pairs(df, "text", window=1, min_count=1).collect()}
    assert ("a", "c", 2) not in out1 and ("a", "b", 1) in out1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="window"):
        skipgram_pairs(df, "text", window=0)


def test_unigram_sampling_table_three_quarter_power(spark):
    """count^(3/4) computed as ((x*x)*x) then two sqrts: for counts
    16 and 1 the scaled masses are 8 and 1 → probs 8/9 and 1/9."""
    import math

    from pyspark.sql import Row

    from openetlagent_spark.functions.text import unigram_sampling_table

    df = spark.createDataFrame([Row(text="hot " * 15 + "hot"),
                                Row(text="rare")])
    out = {r.token: r for r in unigram_sampling_table(
        df, "text", alpha_num=3, alpha_log2_den=2, k=10).collect()}
    assert out["hot"].n == 16 and out["rare"].n == 1
    assert out["hot"].scaled == 8.0 and out["rare"].scaled == 1.0
    assert out["hot"].prob == 8.0 / 9.0
    assert math.isclose(out["hot"].prob + out["rare"].prob, 1.0)
    # alpha = 1/1 (num=1, den=2^0) reproduces raw proportions
    raw = {r.token: r.prob for r in unigram_sampling_table(
        df, "text", alpha_num=1, alpha_log2_den=0, k=10).collect()}
    assert raw["hot"] == 16.0 / 17.0


def test_text_readability_counts_and_score(spark):
    from openetlagent_spark.functions.text import text_readability

    rows = [
        (1, "The cat sat. The dog ran!"),   # 2 sentences, 6 words
        (2, "word"),                          # fragment -> 1 sentence
        (3, "   "),                           # zero words -> NULL score
        (4, None),                            # dropped
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in text_readability(df, "doc_id").collect()}
    assert set(got) == {1, 2, 3}
    r1 = got[1]
    assert (r1.n_sentences, r1.n_words) == (2, 6)
    # syllable runs: e-a-a-e-o-a  -> "the cat sat the dog ran" vowel
    # groups = 6
    assert r1.n_syllables == 6
    assert r1.flesch == 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert got[2].n_sentences == 1
    assert got[3].flesch is None and got[3].n_words == 0
