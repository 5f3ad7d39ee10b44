"""BPE trainer semantics: hand-computed merges on the classic Sennrich
corpus, and greedy left-to-right pairing on equal-symbol runs (the case
where a naive replace scheme would double-merge). The registered step
query's full-corpus hash parity runs in test_oracle_parity."""

from __future__ import annotations

from clinical_search_data_pipeline_spark.operators.bpe import (
    bpe_merge_step,
    bpe_train,
    word_vocab,
)
from tests.conftest import SF_SMOKE


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_train_matches_hand_computed_merges(spark):
    # Sennrich et al. 2016 example vocabulary: low x3, lower x2,
    # newest x4, widest x1.
    docs = _docs(
        spark,
        ["low low low lower lower", "newest newest newest newest widest"],
    )
    merges = bpe_train(docs, 3)
    # Round 1: w-e appears in lower(2) + newest(4) = 6 — the unique max.
    # Round 2: l-o (5) ties s-t (5); '|l||o|' < '|s||t|' lexicographically.
    # Round 3: s-t (5).
    assert merges == [("|w||e|", 6), ("|l||o|", 5), ("|s||t|", 5)]


def test_equal_symbol_run_merges_greedily_left_to_right(spark):
    # 'aaaa' -> (aa)(aa); 'aaa' -> (aa)(a): floor(k/2) merges, leftmost
    # first — adjacent matches must not share delimiter characters.
    rows = {
        r["word"]: r["sym_after"]
        for r in bpe_merge_step(_docs(spark, ["aaaa aaa"])).collect()
    }
    assert rows == {"aaaa": "|aa||aa|", "aaa": "|aa||a|"}


def test_vocab_is_weighted_and_clean(spark):
    vocab = {
        r["word"]: (r["wf"], r["s"])
        for r in word_vocab(_docs(spark, ["ab ab b", "b ab"])).collect()
    }
    assert vocab == {"ab": (3, "|a||b|"), "b": (2, "|b|")}


def test_train_stops_when_no_pairs_remain(spark):
    # Single-char words only: zero adjacent pairs, trainer returns early.
    assert bpe_train(_docs(spark, ["a b a"]), 5) == []


# ---------------------------------------------------------------------------
# Property: the delimited-string replace scheme IS greedy leftmost BPE
# pairing. Python's str.replace has the same leftmost non-overlapping
# semantics as Spark/DuckDB `replace` (proven for the engines by the tests
# above + oracle parity), so the scheme itself can be fuzzed engine-free.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_SYMS = ["a", "b", "c", "ab", "bc", "aa"]


def _encode(syms):
    return "|" + "||".join(syms) + "|"


def _greedy_merge(syms, a, b):
    """Reference BPE merge: scan left to right, merge non-overlapping
    (a, b) occurrences."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@given(
    st.lists(st.sampled_from(_SYMS), min_size=1, max_size=12),
    st.sampled_from(_SYMS),
    st.sampled_from(_SYMS),
)
@settings(max_examples=300, deadline=None)
def test_replace_scheme_equals_greedy_merge(syms, a, b):
    got = _encode(syms).replace(f"|{a}||{b}|", f"|{a}{b}|")
    assert got == _encode(_greedy_merge(syms, a, b))


def test_two_merge_plan_equals_sequential_trainer(spark):
    """The unrolled in-plan two-merge program must pick exactly the merges
    the sequential trainer picks, on the classic corpus."""
    from clinical_search_data_pipeline_spark.operators.bpe import bpe_two_merges

    docs = _docs(
        spark,
        ["low low low lower lower", "newest newest newest newest widest"],
    )
    rows = bpe_two_merges(docs).collect()
    assert {(r["pair1"], r["pair2"]) for r in rows} == {("|w||e|", "|l||o|")}
    after = {r["word"]: r["sym_after"] for r in rows}
    assert after["lower"] == "|lo||we||r|"
    assert after["newest"] == "|n||e||we||s||t|"
    assert after["low"] == "|lo||w|"


def test_bpe_step_empty_corpus(spark):
    from clinical_search_data_pipeline_spark.operators.bpe import bpe_two_merges

    empty = _docs(spark, []).limit(0)
    assert bpe_merge_step(empty).count() == 0
    assert bpe_two_merges(empty).count() == 0


def test_tokenize2_hand_counts(spark):
    """After merges (w,e) then (l,o): low->2 tokens, lower->3, newest->5,
    widest->6 — document totals follow."""
    from clinical_search_data_pipeline_spark.operators.bpe import bpe_tokenize2

    docs = _docs(
        spark,
        ["low low low lower lower", "newest newest newest newest widest"],
    )
    got = {r["doc_id"]: r.asDict() for r in bpe_tokenize2(docs).collect()}
    assert got[0] == {"doc_id": 0, "n_words": 5, "n_bpe_tokens": 3 * 2 + 2 * 3}
    assert got[1] == {"doc_id": 1, "n_words": 5, "n_bpe_tokens": 4 * 5 + 6}


def test_train_n_equals_sequential_trainer(spark):
    """The no-collect n-merge program must pick EXACTLY the sequential
    trainer's merges, in order, for n beyond the unrolled-two special case
    — pinned at n=4 and n=6 on the classic corpus plus fixture docs."""
    from clinical_search_data_pipeline_spark.operators.bpe import bpe_train_n
    from clinical_search_data_pipeline_spark.sources.readers import read_table

    corpora = [
        _docs(
            spark,
            ["low low low lower lower", "newest newest newest newest widest"],
        ),
        read_table(spark, SF_SMOKE, "documents").limit(40),
    ]
    for docs in corpora:
        for n in (4, 6):
            seq = bpe_train(docs, n)
            dec = [
                (r.pair, int(r.freq))
                for r in bpe_train_n(docs, n).orderBy("step").collect()
            ]
            assert dec == seq, (n, seq, dec)


def test_train_n_truncates_when_pairs_run_out(spark):
    """Degenerate corpus (single-char words): the merge table truncates at
    the same point the sequential trainer breaks, instead of erroring."""
    from clinical_search_data_pipeline_spark.operators.bpe import bpe_train_n

    docs = _docs(spark, ["a b a b c", "c a b"])
    seq = bpe_train(docs, 5)
    dec = [
        (r.pair, int(r.freq))
        for r in bpe_train_n(docs, 5).orderBy("step").collect()
    ]
    assert dec == seq
    assert len(dec) < 5
