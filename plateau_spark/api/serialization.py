"""Mirror of the reference's ``plateau.api.serialization``
(/root/reference/plateau/api/serialization.py): predicate/serializer
surface under one import path."""

from plateau_spark.core.predicates import (  # noqa: F401
    apply_predicates,
    check_predicates,
    columns_in_predicates,
    dnf_to_column,
    dnf_to_sql,
    filter_predicates_by_column,
)

# the reference's filter_df_from_predicates: apply a DNF to a frame
# (/root/reference/plateau/serialization/_generic.py)
filter_df_from_predicates = apply_predicates
from plateau_spark.sources.serializers import (  # noqa: F401
    format_of,
    is_payload_file,
    read_files,
    write_staged,
)

__all__ = [
    "apply_predicates",
    "check_predicates",
    "columns_in_predicates",
    "dnf_to_column",
    "dnf_to_sql",
    "filter_df_from_predicates",
    "filter_predicates_by_column",
    "format_of",
    "is_payload_file",
    "read_files",
    "write_staged",
]
