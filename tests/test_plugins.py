"""Plugin framework: discovery, the double enable gate, and dispatch
against the Engine facade (ref functions/plugins.py:1-124 contract)."""

import textwrap

import pytest

from howard_spark.engine import Engine
from howard_spark.plugins import discover_plugins, loadable_plugins, run_plugin


@pytest.fixture()
def plugin_dir(tmp_path):
    root = tmp_path / "plugins"
    root.mkdir()
    (root / "__init__.py").write_text(
        '__all__ = ["tagger", "disabled_by_root"]\n')

    tagger = root / "tagger"
    tagger.mkdir()
    (tagger / "__init__.py").write_text(textwrap.dedent('''
        __description__ = "Tag every variant with a constant"
        __version__ = "1.2.3"
        __enabled__ = True
        __main_file__ = "__main__"
        __main_function__ = "main"
    '''))
    (tagger / "__main__.py").write_text(textwrap.dedent('''
        from pyspark.sql import functions as F

        def main(engine, tag="x"):
            engine.df = engine.df.withColumn("TAG", F.lit(tag))
            return engine
    '''))

    # enabled in root __all__ but __enabled__ = False -> must not load
    dbr = root / "disabled_by_root"
    dbr.mkdir()
    (dbr / "__init__.py").write_text('__enabled__ = False\n')

    # __enabled__ True but absent from root __all__ -> must not load
    dbs = root / "not_in_all"
    dbs.mkdir()
    (dbs / "__init__.py").write_text('__enabled__ = True\n')
    return str(root)


def test_discovery_reads_metadata_and_gates(plugin_dir):
    info = discover_plugins(plugin_dir)
    assert set(info) == {"tagger", "disabled_by_root", "not_in_all"}
    t = info["tagger"]
    assert t["__description__"].startswith("Tag every")
    assert t["__version__"] == "1.2.3" and t["enabled"]
    # BOTH flags required (the reference's plugins_to_load semantics)
    assert not info["disabled_by_root"]["enabled"]
    assert not info["not_in_all"]["enabled"]
    assert set(loadable_plugins(plugin_dir)) == {"tagger"}


def test_run_plugin_dispatches_against_engine(spark, plugin_dir):
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    eng = run_plugin(plugin_dir, "tagger", Engine(spark, df=df), tag="hi")
    out = eng.df.collect()
    assert out[0]["TAG"] == "hi" and out[0]["v"] == "a"


def test_run_disabled_plugin_raises(spark, plugin_dir):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="disabled"):
        run_plugin(plugin_dir, "not_in_all", Engine(spark, df=df))
    with pytest.raises(ValueError, match="unknown plugin"):
        run_plugin(plugin_dir, "nope", Engine(spark, df=df))
