package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured table-resolution errors. The reference's seeded failure class is
  * a malformed double-dot reference `selfhealing..table`
  * (reference `scripts/transform_script:13`) which its healing loop repairs
  * with a regex patch (`utils/auto_healer.py:97-101`); our resolver raises a
  * typed error the self-healing runner can classify and fix.
  */
sealed abstract class CatalogError(msg: String) extends RuntimeException(msg)
final case class BadTableRef(ref: String)
    extends CatalogError(s"Malformed table reference: '$ref' (empty component)")
final case class TableNotFound(namespace: String, table: String)
    extends CatalogError(s"Table not found: $namespace.$table")

/** Lightweight namespace catalog: (namespace, table) -> parquet path.
  * Mirrors the reference's BigQuery datasets (`selfhealing`, `output`,
  * `financial_monitoring` — reference `setup.sh:100-101`,
  * `monitoring/setup.sh:20`) as directories of parquet tables.
  *
  * Retention: the reference declares `partition_expiration_days` per table
  * (`monitoring/setup_bigquery.sql:24,41,57,74`); we apply the equivalent
  * predicate at scan time via [[Retention]]. At 100 TB the physical layout is
  * one directory per table partitioned by the event-date column
  * (`.write.partitionBy(dateCol)`), so the retention predicate and every
  * detector's date filter prune partitions instead of scanning history.
  */
final class Catalog(val spark: SparkSession, root: String) {

  /** Parse a `namespace.table` reference; raise [[BadTableRef]] on the
    * reference's seeded double-dot class. */
  def parseRef(ref: String): (String, String) = {
    val parts = ref.split("\\.", -1)
    if (parts.length != 2 || parts.exists(_.isEmpty)) throw BadTableRef(ref)
    (parts(0), parts(1))
  }

  def path(namespace: String, table: String): String =
    s"$root/$namespace/$table"

  def exists(namespace: String, table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(namespace, table))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def load(namespace: String, table: String): DataFrame = {
    if (!exists(namespace, table)) throw TableNotFound(namespace, table)
    spark.read.parquet(path(namespace, table))
  }

  def load(ref: String): DataFrame = {
    val (ns, t) = parseRef(ref)
    load(ns, t)
  }

  def exists(ref: String): Boolean = {
    val (ns, t) = parseRef(ref)
    exists(ns, t)
  }

  /** Overwrite write with schema evolution, mirroring the reference's
    * `allowFieldAddition`/`allowFieldRelaxation` + CREATE_IF_NEEDED
    * (`scripts/transform_script:17-24`). `mergeSchema` makes readers union
    * schemas across files; overwrite-with-new-schema covers relaxation.
    */
  def save(df: DataFrame, ref: String, partitionBy: Seq[String] = Nil): Unit = {
    val (ns, t) = parseRef(ref)
    val w = df.write.mode("overwrite").option("mergeSchema", "true")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path(ns, t))
  }

  /** Append-only ingest (streaming `foreachBatch` / incremental batch
    * loads). Parquet append is atomic per task file, so a failed batch
    * retry never corrupts committed data; partition by the event-date
    * column at scale so downstream date filters prune. */
  def append(df: DataFrame, ref: String, partitionBy: Seq[String] = Nil): Unit = {
    val (ns, t) = parseRef(ref)
    val w = df.write.mode("append")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path(ns, t))
  }

  /** Bucketed save via the session catalog (`bucketBy` requires
    * `saveAsTable`). Two tables bucketed the same way on the join key
    * co-locate: the join reads matching buckets directly and the plan has
    * NO shuffle on either side — the 100 TB answer for repeated large-to-
    * large equi-joins (e.g. fact-to-fact reconciliation), where neither
    * side broadcasts and a per-query sort-merge shuffle would dominate.
    * Table name is `ns_table` in the session catalog. */
  def saveBucketed(df: DataFrame, ref: String, bucketCol: String, buckets: Int): String = {
    val (ns, t) = parseRef(ref)
    val tableName = s"${ns}_$t"
    // overwrite must be idempotent across sessions: a previous session's
    // managed-table location can survive after its catalog entry is gone
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), tableName)
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(warehouse)) fs.delete(warehouse, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(tableName)
    tableName
  }
}
