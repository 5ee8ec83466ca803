package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.TimeFilters

/** Source/sink parity beyond parquet (SURVEY §2.1): S4 NDJSON load with an
  * explicit schema (the reference's `bq load
  * --source_format=NEWLINE_DELIMITED_JSON`, `setup.sh:217-220`) and the S5
  * retention-predicate scan.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("S4: NDJSON load with explicit schema (bq load parity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ndjson")
    val f = dir.resolve("employee_data.json")
    // the reference's three seeded sample rows (setup.sh:212-214 shape)
    java.nio.file.Files.writeString(f,
      """{"id": 1, "name": "Alice", "department": "Engineering", "salary": 95000.0}
        |{"id": 2, "name": "Bob", "department": "Marketing", "salary": 65000.0}
        |{"id": 3, "name": "Charlie", "department": "Engineering", "salary": 85000.0}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("department", StringType), StructField("salary", DoubleType)))
    val df = spark.read.schema(schema).json(dir.toString)
    assert(df.schema == schema)
    assert(df.count() == 3)
    val eng = df.filter($"department" === "Engineering")
      .agg(sum($"salary")).head().getDouble(0)
    assert(eng == 180000.0)
    // malformed rows become nulls under the default PERMISSIVE mode
    java.nio.file.Files.writeString(f, "{\"id\": broken\n", java.nio.file.StandardOpenOption.APPEND)
    val re = spark.read.schema(schema).json(dir.toString)
    assert(re.count() == 4 && re.filter($"id".isNull).count() == 1)
  }

  test("S5: retention predicate drops expired partitions' rows at scan time") {
    val now = java.time.Instant.parse("2024-01-31T00:00:00Z")
    val rows = (0 until 200).map { d =>
      (d.toLong, java.sql.Timestamp.from(now.minusSeconds(d.toLong * 86400)))
    }
    val df = rows.toDF("id", "ts")
    val kept = df.filter(TimeFilters.retention(col("ts"), now, retainDays = 90))
    assert(kept.count() == 91) // inclusive boundary: offsets 0..90
    assert(!kept.agg(min($"ts")).head().getTimestamp(0).toInstant
      .isBefore(now.minusSeconds(90L * 86400)))
  }
}
