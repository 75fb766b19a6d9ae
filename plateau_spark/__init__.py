"""plateau_spark — a PySpark-native rebuild of plateau's capabilities.

A library to manage (create / read / update / delete) large partitioned
tabular datasets stored as Parquet, with a single JSON metadata file
providing atomic lock-free commits, hive-style partitioning, secondary
inverted indexes for partition pruning, and DNF-predicate pushdown scans —
re-expressed on the Spark DataFrame API so that Catalyst/Tungsten provide
the physical execution (vectorized parquet scan, filter/projection
pushdown, shuffle, AQE).

Reference semantics: data-engineering-collective/plateau (see SURVEY.md).
Everything here is a from-scratch Spark-first design, not a port: the
execution substrate is the Spark DataFrame; this package adds the dataset
catalog/commit layer, predicate & schema contracts, index machinery, and
the large-scale data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis).
"""

from plateau_spark.core.predicates import (
    check_predicates,
    columns_in_predicates,
    dnf_to_column,
    dnf_to_sql,
    filter_predicates_by_column,
)
from plateau_spark.core.schema import normalize_schema, normalize_dataframe
from plateau_spark.core.metadata import DatasetMetadata, MetadataConsistencyError
from plateau_spark.sources.dataset import (
    store_dataframe_as_dataset,
    store_dataframes_as_dataset,
    store_dataframes_as_dataset__iter,
    read_dataset_as_dataframe,
    read_dataset_as_dataframes,
    read_dataset_as_dataframe_iterator,
    read_dataset_as_dataframe_groups,
    read_table,
    read_table_as_pandas,
    register_dataset_as_view,
    update_dataset_from_dataframe,
    update_dataset_from_dataframes,
    update_dataset_from_dataframes__iter,
    write_single_partition,
    commit_dataset,
    copy_dataset,
    compact_dataset,
    repartition_dataset,
    delete_rows_from_dataset,
    merge_upsert_into_dataset,
    merge_into_dataset,
    dataset_history,
    generation_at_timestamp,
    restore_dataset,
    read_dataset_changes,
    dataset_generation_diff,
    read_datasets_weighted,
    create_empty_dataset_header,
    delete_dataset,
    garbage_collect_dataset,
    build_dataset_indices,
    join_datasets,
    dataset_size_bytes,
)
from plateau_spark.plans.index import (
    get_indices_as_dataframe,
    index_as_flat_dataframe,
)
from plateau_spark.core.utils import combine_metadata

__all__ = [
    "MetadataConsistencyError",
    "delete_rows_from_dataset",
    "merge_upsert_into_dataset",
    "merge_into_dataset",
    "repartition_dataset",
    "dataset_history",
    "generation_at_timestamp",
    "restore_dataset",
    "read_dataset_changes",
    "dataset_generation_diff",
    "read_datasets_weighted",
    "check_predicates",
    "columns_in_predicates",
    "dnf_to_column",
    "dnf_to_sql",
    "filter_predicates_by_column",
    "normalize_schema",
    "normalize_dataframe",
    "DatasetMetadata",
    "store_dataframe_as_dataset",
    "store_dataframes_as_dataset",
    "store_dataframes_as_dataset__iter",
    "read_dataset_as_dataframe",
    "read_dataset_as_dataframes",
    "read_dataset_as_dataframe_iterator",
    "read_dataset_as_dataframe_groups",
    "read_table",
    "read_table_as_pandas",
    "register_dataset_as_view",
    "explain_datasource_scan",
    "register_plateau_datasource",
    "update_dataset_from_dataframe",
    "update_dataset_from_dataframes",
    "update_dataset_from_dataframes__iter",
    "write_single_partition",
    "commit_dataset",
    "copy_dataset",
    "create_empty_dataset_header",
    "delete_dataset",
    "garbage_collect_dataset",
    "build_dataset_indices",
    "join_datasets",
    "dataset_size_bytes",
    "get_indices_as_dataframe",
    "index_as_flat_dataframe",
    "combine_metadata",
]


from plateau_spark.sources.datasource import (  # noqa: E402
    explain_datasource_scan,
    register_plateau_datasource,
)

__version__ = "0.1.0"
