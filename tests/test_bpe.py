"""BPE tokenizer train/apply semantics (ts19 + pl08's token counts).

The oracle sweep proves Spark == DuckDB end to end; these tests prove the
three implementations of the SAME algorithm (Python trainer, Spark fold,
DuckDB fold) agree piecewise, and that training finds planted signals."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMALL
from tests.test_pipeline_semantics import _write_documents
from xarray_sql_spark.queries import REGISTRY
from xarray_sql_spark.queries.bpe_tokenizer import (
    _apply_merge,
    bpe_ctes,
    bpe_merges,
    bpe_vocab_df,
    train_merges,
)


def test_apply_merge_is_one_greedy_left_to_right_pass():
    # the fused token participates in the SAME pass
    assert _apply_merge(list("aaa"), "a", "a") == ["aa", "a"]
    assert _apply_merge(list("abab"), "a", "b") == ["ab", "ab"]
    # no partial-token matches: 'ba' tail never fuses with a following 'b'
    assert _apply_merge(["ba", "b"], "a", "b") == ["ba", "b"]
    # fused result can be an operand of a LATER rule only
    out = _apply_merge(list("abc"), "a", "b")
    assert _apply_merge(out, "ab", "c") == ["abc"]


def test_trainer_finds_planted_dominant_pair():
    # 'u x' dominates by weighted count (90) over 'q u' (80); after the
    # first merge absorbs u+x, 'q u' is the clear runner-up
    sample = [("quick", 50), ("quux", 30), ("lux", 30), ("tux", 30)]
    merges = train_merges(sample, n_merges=2)
    assert merges == [("u", "x"), ("q", "u")]


def test_python_trainer_matches_duckdb_unrolled_trainer(spark):
    """The oracle self-trains in SQL; the Spark side trains in Python from
    a collected sample. Extract the oracle's b0..bN merge rows and pin
    byte-equality with the Python trainer on the real fixture."""
    n = 8
    merges_py = bpe_merges(spark, SF_SMALL)
    union = " UNION ALL ".join(
        f"SELECT {i} AS rank, pa, pb FROM b{i}" for i in range(n)
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_SMALL}/documents.parquet')"
        )
        rows = con.execute(
            f"WITH {bpe_ctes()} SELECT * FROM ({union}) ORDER BY rank"
        ).fetchall()
    finally:
        con.close()
    merges_sql = [(pa, pb) for _, pa, pb in rows]
    assert merges_sql == merges_py


def test_spark_fold_chain_matches_python_apply(spark, tmp_path):
    """Segment a crafted vocabulary through the Spark fold chain and
    through the Python reference apply; the token lists must be equal
    word for word."""
    texts = ["banana bandana cabana " * 3, "banana banal anabas", "nab ban"]
    sf = _write_documents(tmp_path, texts)
    merges = bpe_merges(spark, sf)
    vocab = {r.word: r.toks for r in bpe_vocab_df(spark, sf).collect()}
    for word, spark_toks in vocab.items():
        toks = list(word)
        for pa, pb in merges:
            toks = _apply_merge(toks, pa, pb)
        assert spark_toks == toks, (word, spark_toks, toks)


def test_ts19_counts_are_internally_consistent(spark):
    rows = REGISTRY["ts19_bpe_tokenize"].fn(spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows:
        # every word is >= 1 subword token; no word splits past its chars
        assert r.n_bpe_tokens >= r.n_ws_tokens
        assert r.tokens_per_word >= 1.0
        assert " " in r.first_word_seg or len(r.first_word_seg) >= 1


def test_ts19_merges_actually_compress(spark):
    """With 8 merges trained on a 31-word-type corpus, the dominant words
    must segment into FEWER tokens than their character count — i.e. the
    apply path demonstrably applies merges (a no-op apply would emit
    char-count tokens and still hash-match a broken oracle twin)."""
    vocab = {r.word: r.n_bpe for r in bpe_vocab_df(spark, SF_SMALL).collect()}
    compressed = [w for w, n in vocab.items() if len(w) >= 2 and n < len(w)]
    assert len(compressed) >= 5, vocab


def test_bpe_trainer_stops_early_when_sample_runs_dry():
    # only one pair available: one real merge, then a clean early stop
    # (review finding: the old AssertionError hard-failed ts19 on
    # degenerate corpora while the oracle silently emptied its CTEs)
    assert train_merges([("ab", 3)], n_merges=3) == [("a", "b")]
    assert train_merges([], n_merges=3) == []


def test_exhausted_sample_segments_identically_in_duckdb():
    """The oracle unrolls a FIXED number of merge levels; when training
    runs dry it must pad with no-op sentinel rules, not empty its cross
    joins. A corpus whose every word fully merges in one step is the
    regression case."""
    words = ["aa"] * 5 + ["bb"] * 3
    merges = train_merges([("aa", 5), ("bb", 3)])
    assert merges == [("a", "a"), ("b", "b")]  # then dry
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE documents AS SELECT ? AS text", [" ".join(words)]
        )
        rows = con.execute(
            f"WITH {bpe_ctes()} SELECT word, toks, n_bpe FROM bpe ORDER BY word"
        ).fetchall()
    finally:
        con.close()
    assert rows == [("aa", ["aa"], 1), ("bb", ["bb"], 1)]


def test_duckdb_self_training_matches_python_on_adversarial_vocab():
    """Property differential (no Spark needed): random small-alphabet
    corpora — where merged tokens overlap and substring-suffix traps
    live (e.g. token 'xa' must NOT satisfy a pa='a' tail check) — must
    segment identically through the DuckDB self-training CTE chain and
    the Python trainer+apply. Exercises training ties, the chr(31)
    accumulator encoding, and multi-char merge operands."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="ab", min_size=1, max_size=6),
            min_size=4,
            max_size=16,
        )
    )
    def prop(words):
        # python reference: wf -> sample -> train -> apply
        wf = {}
        for w in words:
            wf[w] = wf.get(w, 0) + 1
        sample = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:512]
        # degenerate corpora (pairs run dry before _BPE_N_MERGES) are now
        # first-class: train stops early, the oracle pads no-op levels
        merges = train_merges(sample)
        expect = {}
        for w in wf:
            toks = list(w)
            for pa, pb in merges:
                toks = _apply_merge(toks, pa, pb)
            expect[w] = toks
        con = duckdb.connect()
        try:
            con.execute(
                "CREATE TABLE documents AS SELECT ? AS text",
                [" ".join(words)],
            )
            rows = con.execute(
                f"WITH {bpe_ctes()} SELECT word, toks FROM bpe"
            ).fetchall()
        finally:
            con.close()
        got = {w: list(t) for w, t in rows}
        assert got == expect, (words, merges, got, expect)

    prop()


def test_bpe_survives_hostile_characters(spark, tmp_path):
    """Merge operands flow into Spark folds as F.lit values and into the
    oracle as self-trained CTE rows (data, not SQL literals) — quotes,
    backslashes and percent signs in words must therefore segment
    identically end to end. Dominant pairs are planted ON the hostile
    characters so the merges themselves carry them."""
    w1, w2, w3 = 'a"b', "c\\d", "e%f'g"
    texts = [" ".join([w1] * 9 + [w2] * 7 + [w3] * 5)] * 3
    sf = _write_documents(tmp_path, texts)
    spec = REGISTRY["ts19_bpe_tokenize"]
    spark_rows = sorted(
        (r.doc_id, r.n_ws_tokens, r.n_bpe_tokens, r.first_word_seg)
        for r in spec.fn(spark, sf).collect()
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        duck_rows = sorted(
            (r[0], r[1], r[2], r[4]) for r in con.execute(spec.oracle).fetchall()
        )
    finally:
        con.close()
    assert spark_rows == duck_rows
    merges = bpe_merges(spark, sf)
    assert any('"' in pa + pb or "\\" in pa + pb for pa, pb in merges), merges
