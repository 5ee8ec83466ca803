package graft.tools

import org.apache.spark.sql.functions._

/** Measures the sub-second fixed-overhead floor (r20, VERDICT item 6):
  * how much of a trivial query's ~0.25 s is DataFrame construction
  * (file listing + parquet footer schema inference) vs execution, and
  * what an explicit schema would save. Measurement-only.
  * Usage: runMain graft.tools.FloorProbe [sfDir] [reps]
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.local(cpus)

    def bench(label: String)(f: => Unit): Unit = {
      f // warm once
      val ss = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"[floor] $label%-46s min ${ss.min}%7.1f ms  med ${ss.sorted.apply(reps / 2)}%7.1f ms")
    }

    val path = s"$sfDir/orders.parquet"
    bench("read.parquet (infer schema)") {
      spark.read.parquet(path).schema
    }
    val schema = spark.read.parquet(path).schema
    bench("read.schema(...).parquet (no inference)") {
      spark.read.schema(schema).parquet(path).schema
    }
    bench("Q.t(orders)") {
      graft.queries.Q.t(spark, sfDir, "orders").schema
    }
    bench("q03 full (construct + noop)") {
      graft.SparkEntry.all("q03_null_profile").spark(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    bench("q03 execute only (prebuilt df)") {
      val df = graft.SparkEntry.all("q03_null_profile").spark(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val _ = t0
    }
    bench("count-only job (scheduling floor)") {
      spark.range(1).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
