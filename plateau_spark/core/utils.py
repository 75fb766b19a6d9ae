"""Metadata-plane helpers shared by the io layer.

``combine_metadata`` mirrors the reference's recursive user-metadata
merge (/root/reference/plateau/io_components/utils.py:30-102):
dicts merge per key, lists concatenate (optionally deduplicated),
equal leaves collapse, and *conflicting scalar leaves are dropped*
(the reference replaces them with an InvalidObject sentinel and strips
it at the end — same observable behavior here).
"""

from __future__ import annotations

from typing import Any

_CONFLICT = object()  # sentinel for irreconcilable scalar leaves


def _merge_two(a: Any, b: Any, append_to_list: bool) -> Any:
    if a == b:
        return a
    if a is None or b is None:
        return b if a is None else a
    if isinstance(a, dict) and isinstance(b, dict):
        return {
            k: _merge_two(a.get(k), b.get(k), append_to_list)
            for k in set(a) | set(b)
        }
    if isinstance(a, list) and isinstance(b, list):
        combined = a + b
        if append_to_list:
            return combined
        # order-stable unique
        seen: list[Any] = []
        for v in combined:
            if v not in seen:
                seen.append(v)
        return seen
    return _CONFLICT


def _strip_conflicts(value: Any) -> Any:
    if isinstance(value, dict):
        out = {}
        for k, v in value.items():
            if isinstance(v, dict):
                nested = _strip_conflicts(v)
                if nested:
                    out[k] = nested
            elif v is not _CONFLICT:
                out[k] = v
        return out
    return value


def combine_metadata(*dicts: dict, append_to_list: bool = True) -> dict:
    """Recursively merge user-metadata dicts (left to right)."""
    merged: Any = dicts[0] if dicts else {}
    for d in dicts[1:]:
        merged = _merge_two(merged, d, append_to_list)
    return _strip_conflicts(merged) if isinstance(merged, dict) else {}


def validate_partition_keys(
    existing_keys: list[str], requested: list[str] | None
) -> list[str]:
    """Hard-error when an update requests partitioning that differs from
    the dataset's existing partition keys (reference:
    plateau/io_components/utils.py:125-153)."""
    if requested is not None and list(requested) != list(existing_keys):
        raise ValueError(
            f"Incompatible partition keys: dataset is partitioned by "
            f"{list(existing_keys)}, update requested {list(requested)}"
        )
    return list(existing_keys)


def raise_if_indices_overlap(
    partition_on: list[str] | None, secondary_indices: list[str] | None
) -> None:
    """Partition keys already carry a primary index from the hive path;
    declaring them as secondary indices is a user error (reference:
    plateau/io_components/utils.py:413-418)."""
    overlap = set(partition_on or []) & set(secondary_indices or [])
    if overlap:
        raise ValueError(
            f"Cannot create secondary index on partition columns: {overlap}"
        )


def normalize_args(*names: str):
    """Central argument canonicalization decorator — the reference's
    ``normalize_args`` contract (plateau/io_components/utils.py:156-278):
    any of the named arguments passed as a bare string is coerced to a
    one-element list, so ``columns="x"`` and ``columns=["x"]`` behave
    identically on every API instead of the string silently iterating
    as characters."""
    import functools
    import inspect

    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            bound = sig.bind_partial(*args, **kwargs)
            for name in names:
                val = bound.arguments.get(name)
                if isinstance(val, str):
                    bound.arguments[name] = [val]
            return fn(*bound.args, **bound.kwargs)

        return wrapper

    return deco
