"""Import gate: the whole package must byte-compile and the driver entry
module must import and expose a sane registry — WITHOUT a SparkSession.

This is the guard against the round-2 failure mode: a single SyntaxError
anywhere under polardbx_cdc_spark/ killed queries.py at import time, which
emptied CORRECTNESS, broke bench.py, and stopped pytest collection. These
tests are Spark-free and run in < 5 s, so they fail fast and first.
"""
from __future__ import annotations

import compileall
import importlib.util
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_package_byte_compiles():
    ok = compileall.compile_dir(
        str(REPO / "polardbx_cdc_spark"), quiet=2, force=True
    )
    assert ok, "compileall found a file that does not parse"


def test_top_level_scripts_byte_compile():
    for script in ("__spark_entry__.py", "bench.py"):
        ok = compileall.compile_file(str(REPO / script), quiet=2, force=True)
        assert ok, f"{script} does not parse"


def test_entry_module_registry_sane():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries = mod.queries()
    oracles = mod.oracle_sql()
    assert len(queries) >= 50, "graded window needs >= 50 registry entries"
    assert set(oracles) <= set(queries), "oracle keys must be registry keys"
    for name, fn in queries.items():
        assert callable(fn), name


def test_all_modules_importable():
    """Import every module in the package (not just those queries.py pulls
    in) so an orphaned-but-broken module still fails the gate."""
    pkg_dir = REPO / "polardbx_cdc_spark"
    failures = []
    for py in sorted(pkg_dir.rglob("*.py")):
        rel = py.relative_to(REPO).with_suffix("")
        modname = ".".join(rel.parts)
        try:
            __import__(modname)
        except Exception as exc:  # noqa: BLE001 - report every breakage
            failures.append(f"{modname}: {exc!r}")
    assert not failures, "\n".join(failures)


if __name__ == "__main__":
    sys.exit(0)
