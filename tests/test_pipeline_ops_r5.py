"""Round-5 pipeline operators: temperature resampling, document
chunking, corpus anti-join dedup, dataset compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --- temperature_resample ---------------------------------------------------


@pytest.fixture(scope="module")
def skewed(spark):
    rows = [(i, "en") for i in range(900)] + [(i + 900, "sw") for i in range(100)]
    return spark.createDataFrame(rows, "k long, lang string")


def test_temperature_resample_flattens_tail(spark, skewed):
    from plateau_spark.operators.sampling import temperature_resample

    out = temperature_resample(
        skewed, ["lang"], key_col="k", target_rows=400, alpha=0.5
    )
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    # alpha=0.5: q_en = 30/(30+10) = .75, q_sw = .25 -> expected 300/100;
    # sw clips at its full 100 rows, en keeps ~1/3 of its rows
    assert counts["sw"] == 100  # clipped: keep_p = min(1, .25*400/100) = 1
    assert 240 <= counts["en"] <= 360  # hash-uniform around 300
    # deterministic: pure function of the key
    again = temperature_resample(
        skewed, ["lang"], key_col="k", target_rows=400, alpha=0.5
    )
    assert sorted(out.collect()) == sorted(again.collect())


def test_temperature_resample_alpha_one_is_proportional(spark, skewed):
    from plateau_spark.operators.sampling import temperature_resample

    out = temperature_resample(skewed, ["lang"], key_col="k", target_rows=500, alpha=1.0)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    # alpha=1: q_g = n_g/N -> keep_p = target/N = 0.5 for every group
    assert 400 <= counts["en"] <= 500 and 35 <= counts["sw"] <= 65


def test_temperature_resample_null_group_participates(spark):
    """Rows with a NULL group key are a real group: they are counted in
    the q-denominator AND survive the (null-safe) join back at their
    implied probability — not counted then silently dropped."""
    from plateau_spark.operators.sampling import temperature_resample

    rows = [(i, "en") for i in range(300)] + [(i + 300, None) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, lang string")
    # alpha=1, target=600 -> keep_p = 1 for every group: ALL rows kept
    out = temperature_resample(df, ["lang"], key_col="k", target_rows=600, alpha=1.0)
    counts = {
        r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()
    }
    assert counts.get("en") == 300
    assert counts.get(None) == 300, "NULL-key rows must survive the join back"
    # and at partial keep rates the NULL group keeps roughly its share
    part = temperature_resample(df, ["lang"], key_col="k", target_rows=300, alpha=1.0)
    pc = {r["lang"]: r["count"] for r in part.groupBy("lang").count().collect()}
    assert 100 <= pc.get(None, 0) <= 200  # ~150 expected


def test_temperature_resample_validates(spark, skewed):
    from plateau_spark.operators.sampling import temperature_resample

    for bad in (dict(alpha=0.0), dict(target_rows=0)):
        with pytest.raises(ValueError):
            temperature_resample(
                skewed, ["lang"], key_col="k",
                **{"target_rows": 100, "alpha": 0.5, **bad},
            )
    with pytest.raises(ValueError):
        temperature_resample(skewed, [], key_col="k", target_rows=100)


# --- chunk_documents --------------------------------------------------------


def test_chunk_documents_covers_text_exactly(spark):
    from plateau_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abc"), (3, ""), (4, None)], "doc_id long, text string"
    )
    out = chunk_documents(df, "doc_id", "text", chunk_chars=4).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r["chunk"])
    # non-overlapping chunks reassemble the document
    assert by_doc == {1: ["abcd", "efgh", "ij"], 2: ["abc"]}  # 3, 4 emit nothing


def test_chunk_documents_overlap(spark):
    from plateau_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "abcdefgh")], "doc_id long, text string")
    out = sorted(
        chunk_documents(df, "doc_id", "text", chunk_chars=4, stride=2).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [r["chunk"] for r in out] == ["abcd", "cdef", "efgh"]
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_chars=4, stride=5)


def test_chunk_documents_no_shuffle(spark):
    from plateau_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "xy" * 100)], "doc_id long, text string")
    plan = (
        chunk_documents(df, "doc_id", "text", chunk_chars=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # narrow explode, no shuffle


# --- dedup_against_corpus ---------------------------------------------------


def test_dedup_against_corpus(spark):
    from plateau_spark.operators.dedup import dedup_against_corpus

    new = spark.createDataFrame(
        [(1, "Hello  World"), (2, "fresh doc"), (3, "another one")],
        "id long, text string",
    )
    ref = spark.createDataFrame(
        [(91, "hello world"), (92, "hello world"), (93, "other")],
        "rid long, body string",
    )
    out = dedup_against_corpus(new, ref, "text", "body").collect()
    # normalization folds case/whitespace: doc 1 is a known duplicate
    assert sorted(r["id"] for r in out) == [2, 3]
    strict = dedup_against_corpus(new, ref, "text", "body", normalize=False).collect()
    assert sorted(r["id"] for r in strict) == [1, 2, 3]


# --- compact_dataset --------------------------------------------------------


def test_compact_dataset_merges_files(spark, tmp_path):
    from plateau_spark.core.store import Store
    from plateau_spark.core.metadata import DatasetMetadata
    from plateau_spark.sources.dataset import (
        compact_dataset,
        read_dataset_as_dataframe,
        store_dataframe_as_dataset,
        update_dataset_from_dataframe,
    )

    store = Store(str(tmp_path / "store"))
    mk = lambda lo, hi: spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(lo, hi)], "k long, g long, v string"
    )
    store_dataframe_as_dataset(
        spark, store, "frag", mk(0, 30), partition_on=["g"], secondary_indices=["v"]
    )
    for lo in (30, 60, 90):  # three appends -> 4 files per key group
        update_dataset_from_dataframe(
            spark, store, "frag", mk(lo, lo + 30), partition_on=["g"]
        )
    before = DatasetMetadata.load(store, "frag")
    assert len(before.partitions) == 12

    meta = compact_dataset(spark, store, "frag")
    assert len(meta.partitions) == 3  # one file per key
    out = read_dataset_as_dataframe(spark, store, "frag")
    assert out.count() == 120
    assert sorted(r["k"] for r in out.collect()) == list(range(120))
    # the rebuilt secondary index still prunes correctly
    got = read_dataset_as_dataframe(spark, store, "frag", predicates=[[("v", "==", "v7")]])
    assert [r["k"] for r in got.collect()] == [7]
    # default gc=False: superseded files survive the commit swap so
    # readers holding the previous commit keep working...
    def _live_unreferenced():
        refs = meta.referenced_keys()
        return [
            k
            for k in store.iter_keys("frag/")
            if k not in refs
            and not any(k.startswith(ref.rstrip("/") + "/") for ref in refs)
            and not k.endswith(".json")
        ]

    assert _live_unreferenced(), "expected superseded files before explicit GC"
    # ...until an explicit GC reclaims them
    from plateau_spark.sources.dataset import garbage_collect_dataset

    garbage_collect_dataset(store, "frag")
    assert not _live_unreferenced(), _live_unreferenced()
    # idempotent: already-compact dataset is a metadata-only no-op
    again = compact_dataset(spark, store, "frag")
    assert {p.file for p in again.partitions.values()} == {
        p.file for p in meta.partitions.values()
    }


def test_compact_dataset_keyless(spark, tmp_path):
    from plateau_spark.core.store import Store
    from plateau_spark.sources.dataset import (
        compact_dataset,
        read_dataset_as_dataframe,
        store_dataframes_as_dataset,
    )

    store = Store(str(tmp_path / "store"))
    dfs = [
        spark.createDataFrame([(i,) for i in range(lo, lo + 10)], "k long")
        for lo in (0, 10, 20)
    ]
    store_dataframes_as_dataset(spark, store, "flat", dfs)
    meta = compact_dataset(spark, store, "flat")
    assert len(meta.partitions) == 1
    assert read_dataset_as_dataframe(spark, store, "flat").count() == 30


# --- schema evolution -------------------------------------------------------


def test_schema_evolution_adds_nullable_column(spark, tmp_path):
    from plateau_spark.core.store import Store
    from plateau_spark.sources.dataset import (
        read_dataset_as_dataframe,
        store_dataframe_as_dataset,
        update_dataset_from_dataframe,
    )

    store = Store(str(tmp_path / "store"))
    v1 = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], "k long, g string, x long")
    store_dataframe_as_dataset(spark, store, "evo", v1, partition_on=["g"])
    v2 = spark.createDataFrame(
        [(3, "a", 30, "new!"), (4, "c", 40, None)],
        "k long, g string, x long, note string",
    )
    # without the flag: strict identity check rejects the extra column
    import pytest as _pytest
    from plateau_spark.core.schema import SchemaValidationError

    with _pytest.raises(SchemaValidationError):
        update_dataset_from_dataframe(spark, store, "evo", v2, partition_on=["g"])

    update_dataset_from_dataframe(
        spark, store, "evo", v2, partition_on=["g"], schema_evolution=True
    )
    out = read_dataset_as_dataframe(spark, store, "evo")
    assert "note" in out.columns
    rows = {r["k"]: r["note"] for r in out.collect()}
    # pre-evolution rows read as NULL for the added column
    assert rows == {1: None, 2: None, 3: "new!", 4: None}
    # predicates on the evolved column work across old and new files
    got = read_dataset_as_dataframe(
        spark, store, "evo", predicates=[[("note", "==", "new!")]]
    )
    assert [r["k"] for r in got.collect()] == [3]


def test_schema_evolution_rejects_drops_and_conflicts(spark, tmp_path):
    from plateau_spark.core.schema import SchemaValidationError
    from plateau_spark.core.store import Store
    from plateau_spark.sources.dataset import (
        store_dataframe_as_dataset,
        update_dataset_from_dataframe,
    )

    store = Store(str(tmp_path / "store"))
    v1 = spark.createDataFrame([(1, "a", 10)], "k long, g string, x long")
    store_dataframe_as_dataset(spark, store, "evo2", v1, partition_on=["g"])
    dropped = spark.createDataFrame([(2, "a")], "k long, g string")
    with pytest.raises(SchemaValidationError, match="additive-only"):
        update_dataset_from_dataframe(
            spark, store, "evo2", dropped, partition_on=["g"], schema_evolution=True
        )
    conflict = spark.createDataFrame([(2, "a", "not-a-long")], "k long, g string, x string")
    with pytest.raises(SchemaValidationError, match="additive-only"):
        update_dataset_from_dataframe(
            spark, store, "evo2", conflict, partition_on=["g"], schema_evolution=True
        )


# --- persistent IVF index ---------------------------------------------------


def test_ivf_index_build_query_and_prune(spark, tmp_path):
    from plateau_spark.core.metadata import DatasetMetadata
    from plateau_spark.core.store import Store
    from plateau_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk_bruteforce,
        query_ivf_index,
    )

    store = Store(str(tmp_path / "store"))
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    build_ivf_index(spark, store, "ann", emb, n_centroids=8, refine_iterations=1)
    meta = DatasetMetadata.load(store, "ann")
    assert meta.partition_keys == ["cell"]
    assert len(meta.metadata["ivf"]["centroids"]) == 8

    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # full probe = exhaustive = exact: must equal brute force
    got = query_ivf_index(spark, store, "ann", queries, k=5, nprobe=8)
    exact = cosine_topk_bruteforce(emb, queries, k=5)
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(
        ((r["query_id"], r["rank"], r["vec_id"]) for r in got.collect())
    ) == sorted((r["query_id"], r["rank"], r["vec_id"]) for r in exact.collect())

    # partial probe prunes files: only the probed cells' partitions scanned
    from plateau_spark.sources.dataset import read_dataset_as_dataframe

    total_files = len(read_dataset_as_dataframe(spark, store, "ann").inputFiles())
    narrow = query_ivf_index(spark, store, "ann", queries.limit(1), k=5, nprobe=2)
    narrow.count()  # materialize once
    # the pruned read inside used an IN-predicate over <=2 cells
    assert total_files == 8


def test_ivf_index_query_null_vector_element(spark, tmp_path):
    """A query vector containing a NULL element must degrade to NULL
    similarity (no result rows for that query), not crash the driver-
    side probe selection (r15 advice: float(None) TypeError)."""
    from plateau_spark.core.store import Store
    from plateau_spark.operators.similarity import build_ivf_index, query_ivf_index

    store = Store(str(tmp_path / "store"))
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    build_ivf_index(spark, store, "ann0", emb, n_centroids=4, refine_iterations=1)
    dim = len(emb.select("embedding").first()[0])
    good = [float(i) / dim for i in range(dim)]
    bad = list(good)
    bad[3] = None
    queries = spark.createDataFrame(
        [(100, good), (101, bad)], "query_id long, embedding array<double>"
    )
    got = query_ivf_index(spark, store, "ann0", queries, k=3, nprobe=4).collect()
    # the NULL-element query yields no rows (NULL cosine everywhere);
    # the clean query still gets its k results
    assert {r["query_id"] for r in got} == {100}
    assert len(got) == 3
