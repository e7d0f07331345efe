"""Iceberg catalog adapter for the index tables (north_rule: "over Iceberg
tables ... metrics persisted to an Iceberg metrics table").

This sandbox ships no Iceberg runtime jar, so the engine's tables live in
an :class:`~search_spark.sources.index_store.IndexStore` parquet layout
whose manifest/snapshot/lineage semantics mirror Iceberg's (see that
module's docstring).  This module is the 1:1 mapping onto a real catalog:

- :func:`iceberg_available` — probe whether the session can create Iceberg
  tables (extension + catalog jar present).
- :func:`session_builder_conf` — the exact ``SparkSession.builder`` config
  a cluster deployment adds (spark-submit ``--packages
  org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:...`` + these confs).
- :class:`IcebergIndexCatalog` — writes/reads the same logical tables
  (docs, postings, dictionary, metrics, checkpoints) via ``writeTo(...)``
  so partition pruning on (unit, term_bucket) becomes Iceberg partition
  transforms, and IndexStore snapshots become real Iceberg snapshots.

Everything degrades to the parquet IndexStore when the catalog is absent
(tests cover the probe + fallback path), so one code path serves sandbox
and cluster.

Round-5 execution attempt (recorded so the remaining gap is precise):

- JVM runtime jar: ``find / -iname '*iceberg*'`` over the whole sandbox
  filesystem returns nothing — no vendorable
  ``iceberg-spark-runtime-4.0_2.13-<ver>.jar`` exists anywhere, and the
  sandbox has no network/pip, so ``--packages`` resolution cannot run.
- Pure-Python fallback: ``import pyiceberg`` raises ModuleNotFoundError
  (probe kept executable below as :func:`pyiceberg_available`), and
  installing it is likewise blocked.

Exact unblocking artifact, either of: (a) the runtime jar above on the
driver classpath (``SPARK_GRAFT_ICEBERG_JAR=/path/to/jar`` makes
``tests/test_deploy.py::test_iceberg_writeTo_roundtrip`` run the real
create → overwritePartitions → append → snapshot path with zero code
changes), or (b) ``pyiceberg>=0.7`` importable.  Until then the adapter
is exercised down to the capability probes and the config surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: catalog name used in all table identifiers below
CATALOG = "idx"

TABLES = {
    "docs": f"{CATALOG}.search.docs",
    "postings": f"{CATALOG}.search.postings",
    "dictionary": f"{CATALOG}.search.dictionary",
    "metrics": f"{CATALOG}.search.build_metrics",
    "checkpoints": f"{CATALOG}.search.checkpoints",
}

#: partition transforms per table (Iceberg DDL `PARTITIONED BY`)
PARTITIONING = {
    "docs": ("unit",),
    "postings": ("unit", "term_bucket"),
    "dictionary": (),
    "metrics": (),
    "checkpoints": (),
}


def session_builder_conf(warehouse: str) -> dict[str, str]:
    """Config to add to SparkSession.builder for a local Hadoop catalog
    (cluster deployments swap type=hadoop for a REST/Glue catalog)."""
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{CATALOG}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{CATALOG}.type": "hadoop",
        f"spark.sql.catalog.{CATALOG}.warehouse": warehouse,
    }


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the session can resolve the Iceberg catalog implementation."""
    try:
        jvm = spark._jvm  # noqa: SLF001 - capability probe needs the JVM
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return spark.conf.get(f"spark.sql.catalog.{CATALOG}", None) is not None
    except Exception:
        return False


def pyiceberg_available() -> bool:
    """True iff the pure-Python ``pyiceberg`` fallback could drive the
    metrics/checkpoint tables without the JVM runtime jar.  False in this
    sandbox (module absent, installs blocked — see module docstring); a
    host with ``pyiceberg>=0.7`` flips this without code changes."""
    try:
        import pyiceberg  # noqa: F401

        return True
    except ImportError:
        return False


class IcebergIndexCatalog:
    """Same logical surface as IndexStore's table writes, on a real catalog.

    Use only when :func:`iceberg_available` — callers fall back to the
    parquet IndexStore otherwise (the sandbox path)."""

    def __init__(self, spark: SparkSession):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg catalog not configured; use the parquet IndexStore "
                "(see session_builder_conf for the required spark-submit confs)"
            )
        self.spark = spark

    def write(self, name: str, df: DataFrame, overwrite_partitions: bool = True) -> None:
        table = TABLES[name]
        writer = df.writeTo(table)
        parts = PARTITIONING[name]
        if not self.spark.catalog.tableExists(table):
            if parts:
                from pyspark.sql.functions import col

                writer = writer.partitionedBy(*[col(p) for p in parts])
            writer.create()
        elif overwrite_partitions and parts:
            writer.overwritePartitions()
        else:
            writer.append()

    def read(self, name: str) -> DataFrame:
        return self.spark.read.table(TABLES[name])

    def snapshots(self, name: str) -> DataFrame:
        """Iceberg snapshot/lineage metadata — replaces the IndexStore
        manifest's snapshot list on a real catalog."""
        return self.spark.sql(f"SELECT * FROM {TABLES[name]}.snapshots")
