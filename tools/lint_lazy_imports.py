"""Lint: no `hiss_cube_spark` imports inside executor-run function bodies.

Bug class (FOUR instances in three rounds — fits.py r5, decode_image_np
r6, spectrum_rows_from_fits r7, write_rice_fits r7): a function shipped to
Python workers (pandas_udf / mapInPandas / applyInPandas / mapPartitions /
UDTF) lazily does `from hiss_cube_spark... import ...` in its BODY. On an
executor whose cwd isn't the repo root the import raises
ModuleNotFoundError — and when the body wraps per-item work in
`try/except`, the error is swallowed and the operator returns silently
EMPTY results. Module-level imports are safe: `_serde.register_self`
registers every package module for cloudpickle by-value serialization, so
closures carry the code with them.

Detection: AST over every package module + `__spark_entry__.py`/`bench.py`.
Executor entry points are (a) functions decorated `@pandas_udf`/`@udtf`,
(b) functions passed to `mapInPandas`/`applyInPandas`/`mapPartitions`/
`foreachPartition`/`applyInPandasWithState`/`transformWithStateInPandas`/
`foreach`/`foreachBatch` or wrapped in a `pandas_udf(...)`/`udtf(...)`
call. The check is TRANSITIVE over the same-module call graph (the r7
instance was a helper *called from* the mapInPandas fn, not the fn
itself). Any `import hiss_cube_spark` / `from hiss_cube_spark ...`
statement lexically inside a reachable function body fails the lint.

Usage: python tools/lint_lazy_imports.py [root]    (exit 1 on findings)
"""

from __future__ import annotations

import ast
import os
import sys

EXECUTOR_METHODS = {
    "mapInPandas",
    "applyInPandas",
    "applyInPandasWithState",
    "transformWithStateInPandas",
    "mapPartitions",
    "mapPartitionsWithIndex",
    "foreachPartition",
    "foreach",
    "foreachBatch",
    "mapInArrow",
}
EXECUTOR_DECORATORS = {"pandas_udf", "udtf", "udf"}
PKG = "hiss_cube_spark"


def _dec_name(d: ast.expr) -> str:
    if isinstance(d, ast.Call):
        d = d.func
    if isinstance(d, ast.Attribute):
        return d.attr
    if isinstance(d, ast.Name):
        return d.id
    return ""


def _callee_name(c: ast.expr) -> str:
    if isinstance(c, ast.Attribute):
        return c.attr
    if isinstance(c, ast.Name):
        return c.id
    return ""


def check_source(src: str, path: str) -> list[str]:
    """Return findings as 'path:line: message' strings."""
    tree = ast.parse(src)

    # index every function def by name (module-unique enough for this
    # codebase; collisions just widen the closure, never narrow it)
    funcs: dict[str, list[ast.AST]] = {}
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            funcs.setdefault(node.name, []).append(node)

    roots: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if any(_dec_name(d) in EXECUTOR_DECORATORS for d in node.decorator_list):
                roots.add(node.name)
        if isinstance(node, ast.Call):
            callee = _callee_name(node.func)
            # df.mapInPandas(fn, ...) / grouped.applyInPandas(fn, ...)
            if callee in EXECUTOR_METHODS:
                for a in list(node.args) + [k.value for k in node.keywords]:
                    if isinstance(a, ast.Name):
                        roots.add(a.id)
                    elif isinstance(a, (ast.Lambda,)):
                        roots.add(f"<lambda@{a.lineno}>")
                        funcs[f"<lambda@{a.lineno}>"] = [a]
            # fn wrapped imperatively: pandas_udf(fn, ...) / udtf(cls)
            if callee in EXECUTOR_DECORATORS:
                for a in node.args:
                    if isinstance(a, ast.Name):
                        roots.add(a.id)

    # transitive closure over same-module calls
    seen: set[str] = set()
    work = [r for r in roots if r in funcs]
    while work:
        name = work.pop()
        if name in seen:
            continue
        seen.add(name)
        for fnode in funcs.get(name, []):
            for sub in ast.walk(fnode):
                # direct calls AND function-valued references (e.g.
                # `s.map(_decode)`) — over-approximate on purpose
                if isinstance(sub, ast.Call):
                    c = _callee_name(sub.func)
                    if c in funcs and c not in seen:
                        work.append(c)
                elif isinstance(sub, ast.Name) and sub.id in funcs and sub.id not in seen:
                    work.append(sub.id)

    findings = []
    for name in sorted(seen):
        for fnode in funcs.get(name, []):
            for sub in ast.walk(fnode):
                bad = None
                if isinstance(sub, ast.ImportFrom) and sub.module and (
                    sub.module == PKG or sub.module.startswith(PKG + ".")
                ):
                    bad = f"from {sub.module} import ..."
                elif isinstance(sub, ast.Import) and any(
                    al.name == PKG or al.name.startswith(PKG + ".")
                    for al in sub.names
                ):
                    bad = f"import {PKG}..."
                if bad:
                    findings.append(
                        f"{path}:{sub.lineno}: lazy '{bad}' inside "
                        f"executor-reachable function '{name}' — hoist to "
                        "module level (ModuleNotFoundError on executors "
                        "with a foreign cwd; silently-empty results if "
                        "wrapped in try/except)"
                    )
    return findings


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    targets = []
    for dirpath, _dirs, files in os.walk(os.path.join(root, PKG)):
        targets += [os.path.join(dirpath, f) for f in files if f.endswith(".py")]
    for extra in ("__spark_entry__.py", "bench.py"):
        p = os.path.join(root, extra)
        if os.path.exists(p):
            targets.append(p)

    all_findings: list[str] = []
    for path in sorted(targets):
        with open(path) as fh:
            src = fh.read()
        try:
            all_findings += check_source(src, os.path.relpath(path, root))
        except SyntaxError as e:  # broken file is its own failure
            all_findings.append(f"{path}: syntax error: {e}")

    for f in all_findings:
        print(f)
    print(
        f"lint_lazy_imports: {len(all_findings)} finding(s) over "
        f"{len(targets)} files"
    )
    return 1 if all_findings else 0


if __name__ == "__main__":
    sys.exit(main())
