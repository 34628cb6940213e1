"""The driver imports __spark_entry__ and calls exactly three
functions; this guards that file's shape so a refactor can't silently
break the contract between rounds."""

import importlib.util
from pathlib import Path


def _load_entry():
    path = Path(__file__).resolve().parent.parent / "__spark_entry__.py"
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_module_shape():
    mod = _load_entry()
    assert callable(mod.entry)
    assert callable(mod.queries)
    assert callable(mod.oracle_sql)


def test_entry_runs_and_queries_align(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    assert df.count() >= 0 and len(df.schema.fields) > 0
    q, o = mod.queries(), mod.oracle_sql()
    assert len(q) >= 100
    # every oracle belongs to a registered query; all are non-empty SQL
    assert set(o) <= set(q)
    assert all(isinstance(s, str) and s.strip() for s in o.values())
    # every query callable takes (spark, sf_dir)
    import inspect

    for fn in list(q.values())[:3]:
        assert len(inspect.signature(fn).parameters) == 2
