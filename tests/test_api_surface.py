"""plateau.api.* import-path compatibility (reference:
/root/reference/plateau/api/{dataset,serialization}.py — the documented
public entry points; a porting user swaps only the package root)."""

from __future__ import annotations


def test_api_dataset_has_reference_name_set():
    import plateau_spark.api.dataset as d

    # the reference's full plateau.api.dataset __all__ (io/eager.py +
    # io/iter.py + core/utils.py exports)
    for name in [
        "build_dataset_indices",
        "commit_dataset",
        "create_empty_dataset_header",
        "delete_dataset",
        "ensure_store",
        "garbage_collect_dataset",
        "lazy_store",
        "read_dataset_as_dataframes",
        "read_dataset_as_dataframes__iterator",
        "read_table",
        "store_dataframes_as_dataset",
        "store_dataframes_as_dataset__iter",
        "update_dataset_from_dataframes",
        "update_dataset_from_dataframes__iter",
        "write_single_partition",
    ]:
        assert hasattr(d, name), name


def test_api_serialization_surface():
    import plateau_spark.api.serialization as s

    assert s.filter_df_from_predicates is s.apply_predicates
    assert s.format_of("a.parquet") == "parquet"
    assert s.dnf_to_sql([[("a", "==", 1)]]).strip()


def test_api_roundtrip_through_reference_spelling(spark, tmp_path):
    from plateau_spark.api.dataset import (
        ensure_store,
        read_table,
        store_dataframes_as_dataset,
    )

    store = ensure_store(str(tmp_path / "store"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    store_dataframes_as_dataset(spark, store, "ds", [df])
    assert read_table(spark, store, "ds").count() == 2
