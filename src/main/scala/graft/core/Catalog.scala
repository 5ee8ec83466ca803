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
    // mergeSchema unions schemas across appended files, so a column ADDED
    // by a later append (allowFieldAddition) is visible instead of the
    // reader picking one file's schema at random. Type conflicts across
    // files are a merge error by design — [[appendRelaxed]] migrates the
    // stored files before they can arise. Scale note: merging reads every
    // file footer; a 100 TB deployment caps that by compacting or by
    // declaring the schema explicitly, not by dropping the correctness.
    spark.read.option("mergeSchema", "true").parquet(path(namespace, table))
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

  /** [[append]] with TYPE relaxation, completing the reference's
    * `allowFieldRelaxation` semantics (`scripts/transform_script:20-23`)
    * for the append path: an incoming column NARROWER than the stored type
    * silently casts up (int → stored long); an incoming column WIDER
    * migrates the stored files ONCE to the widened type (write-aside +
    * directory swap — overwriting a path that is also the lazy read input
    * would drop the data), then appends; nullability relaxes to the union.
    * Added columns pass through (the mergeSchema read unions them);
    * columns that cannot widen (string vs int) fail loudly. At 100 TB the
    * widening migration is a real one-off table rewrite — exactly what a
    * BigQuery relaxation does under the hood — so production schemas
    * should widen once, not per-batch; narrower-incoming appends (the
    * common case) touch only the new data. */
  def appendRelaxed(df: DataFrame, ref: String, partitionBy: Seq[String] = Nil): Unit = {
    val (ns, t) = parseRef(ref)
    if (!exists(ns, t)) { append(df, ref, partitionBy); return }
    val existing = load(ns, t)
    val target = Catalog.relaxedSchema(existing.schema, df.schema)
    if (Catalog.needsCast(existing.schema, target)) {
      val p = new org.apache.hadoop.fs.Path(path(ns, t))
      val tmp = new org.apache.hadoop.fs.Path(path(ns, t) + "__relaxing")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val w = Catalog.castTo(existing, target).write.mode("overwrite")
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
        .parquet(tmp.toString)
      fs.delete(p, true)
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(s"schema-relaxation swap failed for $ref")
    }
    append(Catalog.castTo(df, target), ref, partitionBy)
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

object Catalog {
  import org.apache.spark.sql.types._

  /** Numeric widening lattice for relaxation: within the integer and
    * floating families the wider type wins; across families the merged
    * type is double (the BigQuery INT64 → FLOAT64 relaxation). */
  private def widen(a: DataType, b: DataType): Option[DataType] = {
    def intRank(t: DataType): Int = t match {
      case ByteType => 1; case ShortType => 2; case IntegerType => 3
      case LongType => 4; case _ => 0
    }
    def floatRank(t: DataType): Int = t match {
      case FloatType => 1; case DoubleType => 2; case _ => 0
    }
    if (a == b) Some(a)
    else if (intRank(a) > 0 && intRank(b) > 0) Some(if (intRank(a) >= intRank(b)) a else b)
    else if (floatRank(a) > 0 && floatRank(b) > 0) Some(if (floatRank(a) >= floatRank(b)) a else b)
    else if ((intRank(a) > 0 && floatRank(b) > 0) || (floatRank(a) > 0 && intRank(b) > 0))
      Some(DoubleType)
    else None
  }

  /** The union schema after relaxation: common fields widen (nullable =
    * either side), existing-only then incoming-only fields follow as-is.
    * Unwidenable common fields throw — silently corrupting one side is
    * the one wrong answer. */
  private[core] def relaxedSchema(existing: StructType, incoming: StructType): StructType = {
    val incByName = incoming.fields.map(f => f.name -> f).toMap
    val merged = existing.fields.map { ef =>
      incByName.get(ef.name) match {
        case None => ef
        case Some(inf) =>
          val t = widen(ef.dataType, inf.dataType).getOrElse(
            throw new IllegalArgumentException(
              s"cannot relax column '${ef.name}': ${ef.dataType.simpleString} vs " +
                s"${inf.dataType.simpleString} (only numeric widening is supported)"))
          StructField(ef.name, t, ef.nullable || inf.nullable)
      }
    }
    val existingNames = existing.fieldNames.toSet
    StructType(merged ++ incoming.fields.filterNot(f => existingNames.contains(f.name)))
  }

  /** Whether any of `schema`'s fields differ in TYPE from `target` (i.e. a
    * rewrite is needed; nullability alone is metadata and costs nothing). */
  private[core] def needsCast(schema: StructType, target: StructType): Boolean = {
    val tByName = target.fields.map(f => f.name -> f.dataType).toMap
    schema.fields.exists(f => tByName.get(f.name).exists(_ != f.dataType))
  }

  /** Cast `df`'s columns up to the target types, keeping its column order
    * (parquet resolves by name on read). */
  private[core] def castTo(df: DataFrame, target: StructType): DataFrame = {
    val tByName = target.fields.map(f => f.name -> f.dataType).toMap
    df.select(df.schema.fields.map { f =>
      tByName.get(f.name) match {
        case Some(t) if t != f.dataType =>
          org.apache.spark.sql.functions.col(f.name).cast(t).as(f.name)
        case _ => org.apache.spark.sql.functions.col(f.name)
      }
    }.toSeq: _*)
  }
}
