"""Per-file Bloom-filter sidecars: equality/IN file pruning on
hash-scattered high-cardinality columns.

Zone maps (``plans/zonemaps.py``) prune only range-CLUSTERED columns —
for a hash-scattered column (url, doc_id, customer key) every file
spans the full value range and nothing prunes. Secondary inverted
indexes solve that exactly, but cost a full shuffle to build and grow
with the data. A per-file Bloom filter is the middle tier (the
Parquet/Iceberg bloom idea lifted to the driver-side planner): a fixed
``n_bits`` bitmap per (file, column), built by one scan-side
aggregation (no shuffle of values — map-side ``bit_or`` partials), that
lets the planner drop files for ``==`` / ``in`` literals before Spark
schedules a single task. False positives only cost an extra file scan;
false negatives are impossible, and files written without a bloom
(other formats, pre-existing commits) are never pruned.

Layout: a sidecar parquet ``<uuid>/blooms/<column>/<ts>…`` with rows
``(word: int, label: string, bits: long)`` — the bitmap sliced into
64-bit words, sorted by ``word`` — plus one coverage row per covered
label at ``word = -1``. A point lookup needs only the k probed words,
so the planner reads O(k × matching row groups) via pyarrow filters,
never the whole sidecar (same discipline as ``SecondaryIndex.load``).
At 8192 bits (default) the sidecar is ≤ ~1 KB per file per column.

Hashing is md5-derived (``pmod(conv(substr(md5(value|i),1,15),16,10),
n_bits)``) — computed by JVM codegen at build time and replayed
bit-identically in Python at plan time (and in any other engine), so
the sidecar is portable and the planner needs no Spark session.
"""

from __future__ import annotations

import hashlib
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from plateau_spark.core import naming
from plateau_spark.core.conf import env_int as _env_int
from plateau_spark.core.store import Store

N_BITS_DEFAULT = 1 << 13  # 8192 bits = 1 KB per file per column
K_DEFAULT = 5
COVERAGE_WORD = -1  # marker row: this label HAS a bloom (absence ⇒ never prune)

# value→string rendering must agree between Spark's cast-to-string and
# Python's str(): exact for integrals and strings; floats/dates/bools
# are excluded rather than risking format drift
_BLOOM_OK_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.StringType,
)


def validate_bloom_columns(
    schema: T.StructType, columns: Sequence[str], partition_keys: Sequence[str]
) -> list[str]:
    fields = {f.name: f.dataType for f in schema.fields}
    bad = [c for c in columns if c not in fields]
    if bad:
        raise ValueError(f"bloom_filter_columns not in schema: {bad}")
    keyed = [c for c in columns if c in set(partition_keys)]
    if keyed:
        raise ValueError(
            f"bloom_filter_columns overlap partition keys (already pruned "
            f"exactly): {keyed}"
        )
    unsupported = [
        c for c in columns if not isinstance(fields[c], _BLOOM_OK_TYPES)
    ]
    if unsupported:
        raise ValueError(
            "bloom_filter_columns must be integer or string typed "
            f"(engine-stable rendering): {unsupported}"
        )
    return list(columns)


# hash-family identifier recorded in the metadata entry; a consult that
# sees an unknown family must NOT prune (forward compatibility)
HASH_FAMILY = "md5-km"  # Kirsch-Mitzenmacher double hashing over one md5
_K_MAX = 7  # (k-1)*h2 + h1 must stay under 2^63 with 60-bit h1/h2


def _double_hash_cols(column: str) -> tuple[Column, Column]:
    """(h1, h2) Kirsch-Mitzenmacher bases as codegen expressions. Keep
    these HOISTED into their own projection before the position array:
    generator (explode) inputs are never subexpression-eliminated, so
    inlining the md5+conv chain into k array slots re-evaluates it 2k
    times per row (measured 3-4× the build time)."""
    h = F.md5(F.encode(F.col(column).cast("string"), "UTF-8"))
    h1 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    # force h2 odd so a zero/even stride can't degenerate the probe walk
    h2 = F.conv(F.substring(h, 16, 15), 16, 10).cast("long").bitwiseOR(F.lit(1))
    return h1, h2


def _position_cols(column: str, n_bits: int, k: int) -> list[Column]:
    """k bit positions as codegen expressions — ONE JVM md5 per value,
    positions derived by double hashing (h1 + i*h2: Kirsch-Mitzenmacher,
    asymptotically as good as k independent hashes). NOTE: referencing
    these k expressions in one projection re-evaluates the hash chain
    per slot (fine for tests/small frames); the build path uses
    ``_double_hash_cols`` with an explicit hoist projection instead."""
    if k > _K_MAX:
        raise ValueError(f"k must be <= {_K_MAX}, got {k}")
    h1, h2 = _double_hash_cols(column)
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(int(n_bits))) for i in range(k)
    ]


def bloom_positions(value: Any, n_bits: int, k: int) -> list[int]:
    """Python twin of ``_position_cols`` — bit-identical by construction
    (md5 of the same rendered string, same double-hash walk)."""
    hx = hashlib.md5(str(value).encode()).hexdigest()
    h1 = int(hx[:15], 16)
    h2 = int(hx[15:30], 16) | 1
    return [(h1 + i * h2) % n_bits for i in range(k)]


def build_bloom_dataframe(
    spark: SparkSession,
    store: Store,
    partitions: Sequence,
    column: str,
    *,
    n_bits: int = N_BITS_DEFAULT,
    k: int = K_DEFAULT,
    dtype: T.DataType | None = None,
) -> DataFrame:
    """(word, label, bits) rows for the given partitions' parquet files.

    One scan of ONLY ``column`` (explicit paths, projection-pruned) →
    k codegen hash positions per value → ``groupBy(label, word)``
    ``bit_or`` — the partial aggregation ORs bitmap words map-side, so
    the exchange carries at most ``n_bits/64`` longs per file
    regardless of row count. Non-parquet files get no rows (and no
    coverage marker), so the planner never prunes them.
    """
    pq = [p for p in partitions if p.file.endswith(".parquet")]
    cover = [(COVERAGE_WORD, p.label, 0) for p in pq]
    schema = "word int, label string, bits long"
    if not pq:
        return spark.createDataFrame([], schema)
    file_to_label = [(store.url(p.file), p.label) for p in pq]
    mapping = spark.createDataFrame(file_to_label, "___file string, label string")
    # explicit single-column schema (when the caller knows the type):
    # projection-pruned scan, and a file predating an evolved column
    # reads NULL → zero bits + a coverage marker → correctly pruned for
    # every non-null literal (no rows there can match)
    reader = spark.read
    if dtype is not None:
        reader = reader.schema(T.StructType([T.StructField(column, dtype, True)]))
    scan = (
        reader.parquet(*[u for u, _ in file_to_label])
        .select(F.col(column), F.input_file_name().alias("___file"))
        .where(F.col(column).isNotNull())
    )
    if k > _K_MAX:
        raise ValueError(f"k must be <= {_K_MAX}, got {k}")
    h1, h2 = _double_hash_cols(column)
    rows = (
        scan.join(F.broadcast(mapping), "___file")
        # hoist the md5+conv bases into their own projection: explode
        # inputs are never subexpression-eliminated, so inlining the
        # chain into k array slots costs 2k evaluations per row
        # (measured 3-4x the single-file build time)
        .select("label", h1.alias("__h1__"), h2.alias("__h2__"))
        .select(
            "label",
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            F.col("__h1__") + F.lit(i) * F.col("__h2__"),
                            F.lit(int(n_bits)),
                        )
                        for i in range(k)
                    ]
                )
            ).alias("__pos__"),
        )
        .select(
            F.shiftright(F.col("__pos__"), 6).cast("int").alias("word"),
            F.col("label"),
            # shiftleft() only takes a literal shift in the Python API —
            # the variable-amount shift goes through expr()
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos__ % 64 AS INT))").alias(
                "__bit__"
            ),
        )
        .groupBy("word", "label")
        .agg(F.bit_or("__bit__").alias("bits"))
    )
    return rows.unionByName(spark.createDataFrame(cover, schema))


# --- driver-tier build (small commits) -------------------------------------
#
# A streaming micro-batch or small append commits a handful of KB-scale
# parquet files, but the Spark build path still pays one full job per
# bloom column (scan of the new files + shuffle-to-1 + sidecar write) and
# the merge path another (old sidecar ∪ new rows). For files this small
# that job is pure scheduling floor. The driver tier reads the new files'
# bloom column with pyarrow (bounded by ``_driver_bloom_budget``: default
# 8 MB of data files — metadata-plane scale, same discipline as footer
# harvesting), folds the bit positions with ``bloom_positions`` — the
# documented bit-identical twin of the codegen hash chain — and writes
# the sidecar directly. Anything bigger falls back to the Spark job, so
# at 100 TB the initial corpus-wide build stays distributed while the
# per-commit increment is O(KB) driver work and ZERO Spark jobs.

_DRIVER_BLOOM_BYTES_DEFAULT = 8 << 20
_DRIVER_BLOOM_MAX_FILES = 16
# the Python fold costs ~4 us/value (measured: md5 + 5 dict ORs), so a
# Spark job's ~0.2-0.3 s scheduling floor breaks even near 50-80 k
# values; micro-batch commits sit orders of magnitude below this, bulk
# commits orders above — the gate rarely sits near the boundary
_DRIVER_BLOOM_ROWS_DEFAULT = 50_000


def _driver_bloom_budget() -> int:
    return _env_int(
        "PLATEAU_SPARK_BLOOM_DRIVER_BYTES", _DRIVER_BLOOM_BYTES_DEFAULT
    )


def _driver_bloom_row_budget() -> int:
    return _env_int(
        "PLATEAU_SPARK_BLOOM_DRIVER_ROWS", _DRIVER_BLOOM_ROWS_DEFAULT
    )


def _key_bytes(store: Store, key: str) -> "int | None":
    """Total bytes under ``key`` (a file, or a directory of part files
    as the Spark sidecar writer lays them out); None when unsizeable."""
    try:
        if getattr(store, "_is_local", False):
            import os

            if os.path.isdir(store.path(key)):
                return sum(
                    store.size(k)
                    for k in store.iter_keys(key.rstrip("/") + "/")
                )
        return store.size(key)
    except OSError:
        return None


def build_bloom_rows_driver(
    store: Store,
    partitions: Sequence,
    column: str,
    *,
    n_bits: int,
    k: int,
) -> "list[tuple[int, str, int]] | None":
    """Driver-tier twin of ``build_bloom_dataframe``: returns the same
    (word, label, bits) rows — bit-identical, via ``bloom_positions`` —
    or None when the partitions exceed the driver budget (caller falls
    back to the Spark job). Non-parquet files get no rows, exactly like
    the Spark path; a file missing the column (pre-evolution) yields
    only its coverage marker (the Spark path's explicit-schema NULL
    read does the same)."""
    pq_parts = [p for p in partitions if p.file.endswith(".parquet")]
    if len(pq_parts) > _DRIVER_BLOOM_MAX_FILES:
        return None
    if k > _K_MAX:
        raise ValueError(f"k must be <= {_K_MAX}, got {k}")
    try:
        total = sum(store.size(p.file) for p in pq_parts)
    except OSError:
        return None
    if total > _driver_bloom_budget():
        return None
    row_budget = _driver_bloom_row_budget()
    if getattr(store, "_is_local", False):
        # footer-only row precheck (free locally): the Python fold costs
        # ~4 us/value, so beyond the row budget the Spark job wins even
        # though the bytes fit
        import pyarrow.parquet as _pq

        try:
            if (
                sum(
                    _pq.ParquetFile(store.path(p.file)).metadata.num_rows
                    for p in pq_parts
                )
                > row_budget
            ):
                return None
        except OSError:
            return None
    n_folded = 0
    rows: list[tuple[int, str, int]] = []
    for p in pq_parts:
        acc: dict[int, int] = {}
        try:
            table = store.read_parquet(p.file, columns=[column])
            values = table.column(column).to_pylist()
        except (KeyError, OSError):
            values = []
        except Exception:  # noqa: BLE001 — pyarrow read errors
            # footer-schema check, not exception-message parsing (see
            # plans/index.py column_in_footer): absent column ⇒ the
            # file predates the evolved column and contributes nothing;
            # anything else ⇒ unreadable driver-side, use the Spark path
            from plateau_spark.plans.index import column_in_footer

            if not column_in_footer(store, p.file, column):
                values = []
            else:
                return None
        # object-store guard (no free footer precheck there): bail to
        # the Spark path once the fold exceeds the row budget
        n_folded += len(values)
        if n_folded > row_budget:
            return None
        for v in values:
            if v is None:
                continue
            for pos in bloom_positions(v, n_bits, k):
                w = pos >> 6
                acc[w] = acc.get(w, 0) | (1 << (pos & 63))
        rows.extend(
            # bits stored as SIGNED int64 — the Spark path's shiftleft/
            # bit_or arithmetic is two's-complement, and the consult
            # (load_bloom_words) does signed-python bit probes
            (w, p.label, b - (1 << 64) if b >= (1 << 63) else b)
            for w, b in sorted(acc.items())
        )
        rows.append((COVERAGE_WORD, p.label, 0))
    return rows


def read_bloom_rows(store: Store, key: str) -> list[tuple[int, str, int]]:
    """Whole-sidecar read as (word, label, bits) rows (driver merge)."""
    table = store.read_parquet(key)
    return list(
        zip(
            table.column("word").to_pylist(),
            table.column("label").to_pylist(),
            table.column("bits").to_pylist(),
        )
    )


def persist_bloom_rows(
    rows: "list[tuple[int, str, int]]", store: Store, dataset_uuid: str, column: str
) -> str:
    """Driver-tier twin of ``persist_bloom_dataframe``: one small
    parquet file, sorted by (word, label) so a k-word lookup prunes row
    groups; returns the store key. Schema matches the Spark writer
    (word int32, label string, bits int64) so ``load_bloom_words`` and
    the Spark merge reader consume either interchangeably."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = sorted(rows, key=lambda r: (r[0], r[1]))
    table = pa.table(
        {
            "word": pa.array([r[0] for r in rows], pa.int32()),
            "label": pa.array([r[1] for r in rows], pa.string()),
            "bits": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    key = naming.bloom_key(dataset_uuid, column, _utc_ts())
    buf = io.BytesIO()
    pq.write_table(table, buf)
    store.put_bytes(key, buf.getvalue())
    return key


def persist_bloom_dataframe(
    bloom_df: DataFrame, store: Store, dataset_uuid: str, column: str
) -> str:
    """One small parquet, sorted by word so a k-word lookup prunes row
    groups; returns the store key."""
    key = naming.bloom_key(dataset_uuid, column, _utc_ts())
    (
        # repartition(1), NOT coalesce(1): coalesce propagates the
        # 1-partition constraint upstream and serializes the whole
        # build scan into one task; the shuffle barrier keeps the
        # scan/hash/agg parallel and only funnels the tiny word rows
        bloom_df.repartition(1)
        .sortWithinPartitions("word", "label")
        .write.mode("overwrite")
        .parquet(store.url(key))
    )
    return key


def remove_labels_from_bloom_df(bloom_df: DataFrame, labels: set[str]) -> DataFrame:
    if not labels:
        return bloom_df
    return bloom_df.where(~F.col("label").isin(*[str(x) for x in labels]))


def load_bloom_words(
    store: Store, key: str, words: Sequence[int]
) -> dict[str, dict[int, int]]:
    """label → {word: bits} for the probed words plus the coverage
    marker. pyarrow row-group filters keep the read O(k words)."""
    want = sorted(set(int(w) for w in words) | {COVERAGE_WORD})
    table = store.read_parquet(key, filters=[("word", "in", want)])
    out: dict[str, dict[int, int]] = {}
    for word, label, bits in zip(
        table.column("word").to_pylist(),
        table.column("label").to_pylist(),
        table.column("bits").to_pylist(),
    ):
        out.setdefault(label, {})[word] = bits
    return out


class BloomConsult:
    """Plan-time evaluator for one dataset's bloom sidecars.

    Lazily loads only the probed words of each consulted column, once
    per plan. ``allowed_labels(conjunction)`` returns the labels that
    may satisfy every bloom-constrainable equality literal — or None
    when the conjunction has no such literal. Labels without coverage
    rows always stay allowed.
    """

    def __init__(self, store: Store, blooms: dict[str, dict]):
        self._store = store
        self._blooms = blooms or {}
        # column → (words loaded so far, label → {word: bits})
        self._loaded: dict[str, tuple[set[int], dict[str, dict[int, int]]]] = {}

    @staticmethod
    def _values_for(op: str, val: Any) -> list[Any] | None:
        if op in ("==", "=") and val is not None:
            return [val]
        if op == "in":
            vals = [v for v in val if v is not None]
            # a NULL member means the literal can match null rows, which
            # blooms never cover — unconstrained
            if len(vals) != len(list(val)):
                return None
            return vals
        return None

    def _column_words(self, column: str, values: Sequence[Any]) -> dict[str, dict[int, int]]:
        meta = self._blooms[column]
        n_bits, k = int(meta["n_bits"]), int(meta["k"])
        words: set[int] = set()
        for v in values:
            words.update(p >> 6 for p in bloom_positions(v, n_bits, k))
        ent = self._loaded.get(column)
        if ent is None or not words <= ent[0]:
            need = words | (ent[0] if ent else set())
            table = load_bloom_words(self._store, meta["key"], sorted(need))
            self._loaded[column] = (need, table)
        return self._loaded[column][1]

    def _label_may_contain(
        self, table: dict, label: str, values: Sequence[Any], n_bits: int, k: int
    ) -> bool:
        per_label = table.get(label)
        if per_label is None or COVERAGE_WORD not in per_label:
            return True  # no bloom for this file → never prune
        for v in values:
            ok = True
            for pos in bloom_positions(v, n_bits, k):
                bits = per_label.get(pos >> 6, 0)
                if not (bits >> (pos % 64)) & 1:
                    ok = False
                    break
            if ok:
                return True  # some candidate value may be present
        return False

    def allowed_labels(self, conjunction, labels: Sequence[str]) -> set[str] | None:
        constraints: list[tuple[str, list[Any]]] = []
        for col, op, val in conjunction:
            if col not in self._blooms:
                continue
            # a sidecar built under a different (or unrecorded) hash
            # family cannot be interpreted — never prune on it
            if self._blooms[col].get("hash") != HASH_FAMILY:
                continue
            values = self._values_for(op, val)
            if values is not None and values:
                constraints.append((col, values))
        if not constraints:
            return None
        allowed = set(labels)
        for col, values in constraints:
            meta = self._blooms[col]
            table = self._column_words(col, values)
            n_bits, k = int(meta["n_bits"]), int(meta["k"])
            allowed = {
                l
                for l in allowed
                if self._label_may_contain(table, l, values, n_bits, k)
            }
            if not allowed:
                break
        return allowed


def _utc_ts() -> str:
    from plateau_spark.plans.index import _utc_ts as ts

    return ts()
