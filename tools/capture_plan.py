"""Capture ``.explain("formatted")`` for registry queries into plan files.

Usage: python tools/capture_plan.py <out_dir> <suffix> <query> [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each query, built against
the sf0.01 test data (plan shape, not timing, is the point).
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, "/root/repo")

from __spark_entry__ import queries  # noqa: E402
from plateau_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    out_dir, suffix, names = Path(sys.argv[1]), sys.argv[2], sys.argv[3:]
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("capture-plan")
    spark.sparkContext.setLogLevel("ERROR")
    reg = queries()
    for name in names:
        df = reg[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt ({len(buf.getvalue())} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
