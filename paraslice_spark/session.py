"""SparkSession factory + session hygiene.

Two situations (SURVEY §0.2): our own tests/bench build the session here;
the *driver* hands us an already-built session. ``ensure_session_confs``
therefore applies every conf we rely on that is runtime-settable (verified:
``spark.sql.legacy.parquet.nanosAsLong`` and the session timezone both take
effect after ``getOrCreate`` on PySpark 4.1.2), so engine code works under
any session.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

#: confs that are safe (and required) to set at runtime on any session.
RUNTIME_CONFS = {
    # events.parquet stores timestamp[ns]; without this Spark 4.x raises
    # [PARQUET_TYPE_ILLEGAL] (SURVEY §1.2, verified). ts arrives as long.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # cross-engine determinism vs the DuckDB oracle (SURVEY §5.3)
    "spark.sql.session.timeZone": "UTC",
    # Arrow for pandas interchange / pandas UDFs
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # NOTE: we deliberately do NOT touch spark.sql.adaptive.enabled here —
    # AQE is the right default at cluster scale (skew splits, runtime join
    # demotion) and the driver's own session keeps its default (on). For
    # LOCAL benches get_session turns it off: measured on this container,
    # AQE's stage-by-stage materialization adds ~8s to the first run of
    # every multi-shuffle plan at sf<=0.1 (KB-sized shuffles) for zero
    # replanning benefit. Flip PARASLICE_AQE=true for cluster deployments.
}


_shipped_to: set[str] = set()


def ship_package(spark: SparkSession) -> None:
    """Make ``paraslice_spark`` importable on executor Python workers.

    Functions shipped to workers (pandas UDFs, mapInPandas) are pickled by
    reference to this package; if the driver process wasn't launched from
    the repo root (the grading driver isn't), workers raise
    ModuleNotFoundError. Zipping the package once per process and
    ``addPyFile``-ing it fixes any session at runtime — the cluster-correct
    mechanism (same path ships the code to real executors).
    """
    import hashlib

    sc = spark.sparkContext
    if sc.applicationId in _shipped_to:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    sources = []
    for dirpath, _, files in os.walk(pkg_dir):
        for f in sorted(files):
            if f.endswith(".py"):
                sources.append(os.path.join(dirpath, f))
    # name the zip by content hash: a pid- or time-keyed name can resurrect
    # a STALE zip from a previous process and ship outdated code to workers
    digest = hashlib.sha256()
    for full in sorted(sources):
        digest.update(full.encode())
        with open(full, "rb") as fh:
            digest.update(fh.read())
    zpath = os.path.join(
        tempfile.gettempdir(), f"paraslice_spark_pkg_{digest.hexdigest()[:16]}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for full in sorted(sources):
                z.write(full, os.path.relpath(full, root))
    sc.addPyFile(zpath)
    _shipped_to.add(sc.applicationId)


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs this engine depends on. Idempotent."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # conf not settable on this build — engine degrades gracefully
            pass
    try:
        # a LOCAL session still at the 200-partition default wastes ~10ms of
        # scheduling per tiny shuffle task; right-size it. Never touched on
        # cluster masters or when the owner set an explicit value.
        if (
            spark.sparkContext.master.startswith("local")
            and spark.conf.get("spark.sql.shuffle.partitions") == "200"
        ):
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    except Exception:
        pass
    try:
        ship_package(spark)
    except Exception as exc:  # pragma: no cover - environment-dependent
        # Best effort (package may already be importable via PYTHONPATH), but
        # leave a trail: a silent failure here surfaces later as an opaque
        # ModuleNotFoundError on executors at query time (ADVICE r01).
        import sys

        print(
            f"paraslice_spark: ship_package failed ({exc!r}); executors must "
            "already have the package importable",
            file=sys.stderr,
        )
    return spark


def vocab_broadcast(df):
    """Optional broadcast hint for CORPUS-GROWING side tables.

    The engine broadcasts two very different kinds of side table.  1-row /
    fixed-cardinality aggregates (corpus totals, decile bounds) are always
    safe and stay unconditionally ``F.broadcast``-hinted at their call
    sites.  Vocabulary- and catalog-sized tables (per-term document
    frequency, unigram counts, per-part item counts) GROW with the corpus:
    at 100 TB a term dictionary is tens of GB, and a forced ``F.broadcast``
    overrides Spark's size check so AQE can never demote it — executor OOM
    (VERDICT r9).  Those sites route through this gate instead: default is
    a plain equi-join (AQE still picks broadcast-hash at runtime whenever
    the built side is under ``spark.sql.autoBroadcastJoinThreshold``, so
    fixture-scale plans lose nothing); set ``PARASLICE_BROADCAST_VOCAB=1``
    to force the hint on deployments whose vocabulary provably fits.
    Hash-invariance of every gated query under both settings is proven by
    tests/test_cluster_conf_invariance.py::test_vocab_broadcast_invariant.
    """
    if os.environ.get("PARASLICE_BROADCAST_VOCAB", "").lower() in ("1", "true"):
        from pyspark.sql import functions as F

        return F.broadcast(df)
    return df


def get_session(
    app_name: str = "paraslice_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a local session sized for this container.

    100 TB design note (SURVEY §7.3): on a real cluster the same engine code
    runs under a cluster-managed session; nothing below hard-codes local mode
    except this factory, and shuffle partitioning is sized by conf, not code.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or int(
        os.environ.get("PARASLICE_SHUFFLE_PARTITIONS", str(min(cpus, 32)))
    )
    aqe = os.environ.get("PARASLICE_AQE", "false")  # see RUNTIME_CONFS note
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.driver.memory", os.environ.get("PARASLICE_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
    )
    spark = builder.getOrCreate()
    return ensure_session_confs(spark)
