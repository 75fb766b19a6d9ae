"""Mirror of the reference's ``plateau.api.dataset`` import surface
(/root/reference/plateau/api/dataset.py): every dataset-layer entry
point importable from one module, reference-spelled aliases included.
Dask-collection shapes (bag/delayed) are n/a by design (SURVEY §1.4) —
their jobs are the Spark DataFrame itself."""

from plateau_spark import *  # noqa: F401,F403
from plateau_spark import __all__ as _root_all

__all__ = list(_root_all)


# reference-spelled aliases / helpers completing the plateau.api.dataset
# name set (reference __all__: io/eager.py, io/iter.py, core/utils.py)
from plateau_spark.core.store import Store as _Store
from plateau_spark.sources.dataset import (  # noqa: E402
    read_dataset_as_dataframe_iterator as read_dataset_as_dataframes__iterator,
)


def ensure_store(store) -> "_Store":
    """Reference ``ensure_store`` (plateau/core/utils.py): accept a
    root path/url or a Store and return a Store."""
    return store if isinstance(store, _Store) else _Store(store)


def lazy_store(store):
    """Reference ``lazy_store``: a zero-arg factory producing the store
    (the reference defers construction for pickling across dask workers;
    Spark ships only key strings to executors, so laziness is free)."""
    resolved = ensure_store(store)
    return lambda: resolved


__all__ += [
    "ensure_store",
    "lazy_store",
    "read_dataset_as_dataframes__iterator",
]
