from __future__ import annotations

import pytest

from plateau_spark.operators.packing import concat_pack_bins, greedy_pack_bins


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    # two groups, deterministic sizes incl. one oversized doc (id 7)
    sizes = {
        "a": [(0, 300), (1, 900), (2, 100), (3, 700), (4, 50)],
        "b": [(5, 1000), (6, 1), (7, 5000), (8, 999), (9, 2)],
    }
    for g, pairs in sizes.items():
        for i, n in pairs:
            rows.append((i, g, n))
    return spark.createDataFrame(rows, "doc_id long, grp string, n long")


def _collect_bins(df):
    return {
        r["doc_id"]: (r["grp"], r["bin_id"])
        for r in df.select("doc_id", "grp", "bin_id").collect()
    }


def test_concat_pack_matches_prefix_sum(docs):
    out = _collect_bins(concat_pack_bins(docs, ["grp"], "n", 1000, order_col="doc_id"))
    # group a prefix sums: 300,1200,1300,2000,2050 -> bins 0,1,1,1,2
    assert [out[i][1] for i in range(5)] == [0, 1, 1, 1, 2]
    # group b prefix sums: 1000,1001,6001,7000,7002 -> ceil/1000-1 = 0,1,6,6,7
    assert [out[i][1] for i in range(5, 10)] == [0, 1, 6, 6, 7]


def test_greedy_pack_never_overflows_budget(docs):
    out = greedy_pack_bins(docs, ["grp"], "n", 1000, order_col="doc_id")
    rows = sorted(
        out.select("grp", "bin_id", "doc_id", "n").collect(),
        key=lambda r: (r["grp"], r["doc_id"]),
    )
    # replay the greedy policy in plain python per group
    fills: dict[tuple, int] = {}
    for r in rows:
        key = (r["grp"], r["bin_id"])
        fills[key] = fills.get(key, 0) + r["n"]
    for (grp, bin_id), fill in fills.items():
        members = [r for r in rows if r["grp"] == grp and r["bin_id"] == bin_id]
        if len(members) > 1:
            assert fill <= 1000, f"bin {(grp, bin_id)} overflows with {fill}"
    # the oversized doc sits alone in its bin
    oversized = [r for r in rows if r["doc_id"] == 7][0]
    assert fills[("b", oversized["bin_id"])] == 5000


def test_greedy_pack_is_first_fit_contiguous(docs):
    out = _collect_bins(greedy_pack_bins(docs, ["grp"], "n", 1000, order_col="doc_id"))
    # group a: 300 -> b0; 900 overflows -> b1; 100 fits b1(1000)? 900+100=1000 <= 1000 -> b1;
    # 700 overflows -> b2; 50 fits -> b2
    assert [out[i][1] for i in range(5)] == [0, 1, 1, 2, 2]
    # group b: 1000 -> b0 (exact); 1 overflows -> b1; 5000 overflows -> b2 (alone);
    # 999 -> b3; 2 overflows? 999+2>1000 -> b4
    assert [out[i][1] for i in range(5, 10)] == [0, 1, 2, 3, 4]


def test_pack_rejects_global_and_bad_budget(docs):
    with pytest.raises(ValueError):
        concat_pack_bins(docs, [], "n", 1000, order_col="doc_id")
    with pytest.raises(ValueError):
        greedy_pack_bins(docs, ["grp"], "n", 0, order_col="doc_id")
    with pytest.raises(ValueError):
        concat_pack_bins(docs, ["grp"], "n", 1000, order_col=[])


def test_greedy_pack_rejects_null_tokens(spark):
    df = spark.createDataFrame(
        [(0, "a", 100), (1, "a", None), (2, "a", 200)],
        "doc_id long, grp string, n long",
    )
    with pytest.raises(Exception, match="NULL 'n'"):
        greedy_pack_bins(df, ["grp"], "n", 1000, order_col="doc_id").collect()


def test_concat_pack_null_tokens_contribute_zero(spark):
    # NULL tokens: SUM-over-window skips them; an all-NULL prefix must
    # still produce bin 0, not a NULL bin id.
    df = spark.createDataFrame(
        [(0, "a", None), (1, "a", None), (2, "a", 1500), (3, "a", 600)],
        "doc_id long, grp string, n long",
    )
    out = _collect_bins(concat_pack_bins(df, ["grp"], "n", 1000, order_col="doc_id"))
    # prefix sums: 0, 0, 1500, 2100 -> bins 0, 0, 1, 2
    assert [out[i][1] for i in range(4)] == [0, 0, 1, 2]


def test_pack_tie_break_columns_are_deterministic(spark):
    # every row has the same order_key: without the tie-break column the
    # bin assignment is shuffle-order dependent; with it, it's pinned.
    rows = [(i, "a", 7, 600) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, pos long, n long")
    expected = None
    for _ in range(3):
        got_c = {
            r["doc_id"]: r["bin_id"]
            for r in concat_pack_bins(
                df.repartition(8), ["grp"], "n", 1000, order_col=["pos", "doc_id"]
            ).collect()
        }
        got_g = {
            r["doc_id"]: r["bin_id"]
            for r in greedy_pack_bins(
                df.repartition(8), ["grp"], "n", 1000, order_col=["pos", "doc_id"]
            ).collect()
        }
        # concat: doc i ends at 600(i+1) -> bin ceil(600(i+1)/1000)-1
        assert got_c == {i: -(-600 * (i + 1) // 1000) - 1 for i in range(8)}
        # greedy: 600+600 > 1000 -> one doc per bin in doc_id order
        assert got_g == {i: i for i in range(8)}
        if expected is None:
            expected = got_c
        assert got_c == expected


def test_materialize_packed_sequences(spark):
    from plateau_spark.operators.packing import (
        concat_pack_bins,
        materialize_packed_sequences,
    )

    df = spark.createDataFrame(
        [(0, "a", 600, "one"), (1, "a", 600, "two"), (2, "a", 600, "three")],
        "doc_id long, grp string, n long, text string",
    )
    binned = concat_pack_bins(df, ["grp"], "n", 1000, order_col="doc_id")
    out = materialize_packed_sequences(
        binned, ["grp"], "text", order_col="doc_id", sep="|"
    ).collect()
    got = {r["bin_id"]: (r["packed_text"], r["n_docs"]) for r in out}
    # prefix sums 600,1200,1800 -> bins 0,1,1
    assert got == {0: ("one", 1), 1: ("two|three", 2)}


def test_materialize_boundaries_point_at_document_starts(spark):
    """boundaries_col offsets must index the first character of each
    document inside packed_text (the loss-mask contract)."""
    from plateau_spark.operators.packing import materialize_packed_sequences

    df = spark.createDataFrame(
        [("en", 0, 1, "alpha"), ("en", 0, 2, "bee"), ("en", 0, 3, "c"),
         ("en", 1, 4, "solo")],
        "lang string, bin_id long, doc_id long, text string",
    )
    out = materialize_packed_sequences(
        df, ["lang"], "text", order_col="doc_id", sep="\n\n",
        boundaries_col="doc_offsets",
    ).collect()
    for r in out:
        texts = r["packed_text"].split("\n\n")
        assert len(r["doc_offsets"]) == r["n_docs"] == len(texts)
        for off, t in zip(r["doc_offsets"], texts):
            assert r["packed_text"][off:off + len(t)] == t
    # default: no boundaries column
    plain = materialize_packed_sequences(
        df, ["lang"], "text", order_col="doc_id"
    )
    assert "doc_offsets" not in plain.columns
