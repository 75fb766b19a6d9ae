"""Mechanical close-out check for the correctness-window rule.

The permanent rule (entry_queries.py QUERIES head comment): any registry
key whose implementing code changed this round must be IN the driver's
50-key correctness window — driver evidence must never lag a code
change. Round 14 applied the rule by hand and missed ~14 keys reachable
only through SHARED HELPERS (r14 verdict, "What's wrong" #1). This tool
derives the touched-key set mechanically and asserts the window covers
it.

Derivation (conservative over-approximation, no Spark session):

1. ``git diff --name-only <base>`` → changed ``plateau_spark`` modules.
   ``<base>`` defaults to the latest driver round-close commit
   (subject ``round N: ...``).
2. A static import graph over ``plateau_spark`` expands the changed set
   to every module that transitively imports a changed module (module
   granularity — exactly the granularity the hand rule missed).
3. ``entry_queries.py`` gets FUNCTION/CONSTANT granularity instead
   (module granularity would flag every key whenever any query is
   edited): top-level defs/assigns whose source segment differs from
   the base version are "changed names"; each key's query function and
   oracle constant expand through their referenced-name closure (so a
   changed shared CTE constant or helper flags its dependents), and
   any ``plateau_spark`` import inside that closure links the key into
   the module graph of step 2.
4. A key is TOUCHED iff its closure hits a changed name or an affected
   module. Exit 1 if any touched key is outside the first-50 window
   and not in ``--swept`` (keys verified out-of-window via
   ``tools/check_parity.py`` — record the sweep in the window head
   comment when you use it).

Usage:
    python tools/check_window.py [--base REF] [--swept k1,k2] [--list]
"""

from __future__ import annotations

import argparse
import ast
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ENTRY = "plateau_spark/entry_queries.py"
WINDOW = 50
_IMPORT_RE = re.compile(
    r"^\s*(?:from\s+(plateau_spark(?:\.[\w.]+)?)\s+import|"
    r"import\s+(plateau_spark(?:\.[\w.]+)?))",
    re.M,
)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def default_base() -> str:
    out = _git("log", "--grep", r"^round [0-9]*:", "-1", "--format=%H")
    if not out.strip():
        raise SystemExit("no round-close commit found; pass --base")
    return out.strip()


def path_to_module(path: str) -> str:
    mod = path[: -len(".py")].replace("/", ".")
    return mod[: -len(".__init__")] if mod.endswith(".__init__") else mod


def module_graph() -> dict[str, set[str]]:
    """module → plateau_spark modules it imports (function-level
    imports included: the regex scans whole files)."""
    graph: dict[str, set[str]] = {}
    for p in (REPO / "plateau_spark").rglob("*.py"):
        rel = p.relative_to(REPO).as_posix()
        mod = path_to_module(rel)
        deps = set()
        for m in _IMPORT_RE.finditer(p.read_text()):
            deps.add(m.group(1) or m.group(2))
        graph[mod] = deps - {mod}
    return graph


def affected_modules(changed: set[str], graph: dict[str, set[str]]) -> set[str]:
    """Changed modules plus every module that transitively imports one.
    ``from plateau_spark.a import x`` also registers the package
    ``plateau_spark.a``'s __init__ re-exports — treat a package as
    affected when any of its submodules is (conservative)."""
    def hits(dep: str) -> bool:
        return any(a == dep or a.startswith(dep + ".") for a in affected)

    affected = set(changed)
    while True:
        grew = False
        for mod, deps in graph.items():
            if mod not in affected and any(hits(d) for d in deps):
                affected.add(mod)
                grew = True
        if not grew:
            return affected


class _EntryIndex:
    """Top-level symbol table of entry_queries.py: name → (source
    segment, referenced top-level names, plateau modules imported
    anywhere inside the definition)."""

    def __init__(self, src: str):
        self.tree = ast.parse(src)
        self.seg: dict[str, str] = {}
        self.refs: dict[str, set[str]] = {}
        self.mods: dict[str, set[str]] = {}
        for node in self.tree.body:
            names: list[str] = []
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                names = [node.name]
            elif isinstance(node, ast.Assign):
                names = [t.id for t in node.targets if isinstance(t, ast.Name)]
            elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
                names = [node.target.id]
            elif isinstance(node, (ast.Import, ast.ImportFrom)):
                mod = getattr(node, "module", None) or ""
                for alias in node.names:
                    bound = alias.asname or alias.name.split(".")[0]
                    # union, not overwrite: repeated `import plateau_spark.x`
                    # statements all bind the name `plateau_spark`
                    if isinstance(node, ast.ImportFrom) and mod.startswith(
                        "plateau_spark"
                    ):
                        self.mods.setdefault(bound, set()).add(mod)
                    elif alias.name.startswith("plateau_spark"):
                        self.mods.setdefault(bound, set()).add(alias.name)
                continue
            if not names:
                continue
            seg = ast.get_source_segment(src, node) or ""
            refs, mods = set(), set()
            for sub in ast.walk(node):
                if isinstance(sub, ast.Name):
                    refs.add(sub.id)
                elif isinstance(sub, ast.ImportFrom) and (sub.module or "").startswith(
                    "plateau_spark"
                ):
                    mods.add(sub.module)
                elif isinstance(sub, ast.Import):
                    mods.update(
                        a.name for a in sub.names
                        if a.name.startswith("plateau_spark")
                    )
            for n in names:
                self.seg[n] = seg
                self.refs[n] = refs
                self.mods[n] = self.mods.get(n, set()) | mods

    def closure(self, name: str) -> tuple[set[str], set[str]]:
        """(top-level names, plateau modules) reachable from ``name``."""
        seen: set[str] = set()
        mods: set[str] = set()
        stack = [name]
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            mods |= self.mods.get(n, set())
            for r in self.refs.get(n, ()):  # only defined names expand
                if r in self.seg and r not in seen:
                    stack.append(r)
        return seen & set(self.seg), mods

    def dict_value_names(self, dict_name: str) -> "dict[str, list[str]]":
        """For a top-level ``NAME = {"key": expr, ...}`` dict, map each
        string key to the Name identifiers in its value expression."""
        for node in self.tree.body:
            targets = []
            if isinstance(node, ast.Assign):
                targets = [t.id for t in node.targets if isinstance(t, ast.Name)]
            elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
                targets = [node.target.id]
            if dict_name not in targets:
                continue
            value = node.value
            if not isinstance(value, ast.Dict):
                break
            out = {}
            for k, v in zip(value.keys, value.values):
                if isinstance(k, ast.Constant) and isinstance(k.value, str):
                    out[k.value] = [
                        s.id for s in ast.walk(v) if isinstance(s, ast.Name)
                    ]
            return out
        raise SystemExit(f"could not locate dict {dict_name} in {ENTRY}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=None, help="ref to diff against")
    ap.add_argument(
        "--swept", default="",
        help="keys parity-checked out of window: comma list, or a path "
        "to a file with one key per line (e.g. grep '^ok' of a full "
        "tools/check_parity.py run)",
    )
    ap.add_argument("--list", action="store_true", help="print the touched keys only")
    args = ap.parse_args()
    base = args.base or default_base()
    if args.swept and Path(args.swept).is_file():
        swept = {
            line.split()[0].rstrip(":")
            for line in Path(args.swept).read_text().splitlines()
            if line.strip()
        }
    else:
        swept = {s for s in args.swept.split(",") if s}

    changed_files = [
        f for f in _git("diff", "--name-only", base).splitlines()
        if f.startswith("plateau_spark/") and f.endswith(".py")
    ]
    changed_mods = {path_to_module(f) for f in changed_files if f != ENTRY}
    graph = module_graph()
    affected = affected_modules(changed_mods, graph) if changed_mods else set()

    new_src = (REPO / ENTRY).read_text()
    idx = _EntryIndex(new_src)
    try:
        old_src = _git("show", f"{base}:{ENTRY}")
        old_seg = _EntryIndex(old_src).seg
    except subprocess.CalledProcessError:
        old_seg = {}
    changed_names = {n for n, s in idx.seg.items() if old_seg.get(n) != s}

    queries = idx.dict_value_names("QUERIES")
    oracles = idx.dict_value_names("ORACLES")
    touched = []
    for key, value_names in queries.items():
        names: set[str] = set()
        mods: set[str] = set()
        for start in value_names + oracles.get(key, []):
            n, m = idx.closure(start)
            names |= n
            mods |= m
        hit_name = names & changed_names
        hit_mod = {m for m in mods if m in affected}
        if hit_name or hit_mod:
            touched.append((key, sorted(hit_name)[:3], sorted(hit_mod)[:3]))

    window = list(queries)[:WINDOW]
    if args.list:
        for key, _, _ in touched:
            print(key)
        return 0
    print(f"base: {base[:12]}  changed modules: {sorted(changed_mods)}")
    print(f"affected modules (import closure): {len(affected)}")
    print(f"changed entry_queries names: {len(changed_names)}")
    print(f"touched keys: {len(touched)} / {len(queries)}; window={len(window)}")
    missing = []
    for key, via_n, via_m in touched:
        where = (
            "window" if key in window else "SWEPT" if key in swept else "MISSING"
        )
        if where == "MISSING":
            missing.append(key)
        print(f"  [{where:7}] {key}  via {via_n or via_m}")
    if missing:
        print(
            f"\nFAIL: {len(missing)} touched keys outside the window and "
            f"not --swept: {missing}\nEither rotate them into the first "
            f"{WINDOW} QUERIES entries or parity-sweep them "
            f"(tools/check_parity.py) and pass --swept."
        )
        return 1
    print("\nOK: every touched key is in the window or parity-swept")
    return 0


if __name__ == "__main__":
    sys.exit(main())
