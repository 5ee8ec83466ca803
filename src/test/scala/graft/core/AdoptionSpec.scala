package graft.core

import org.apache.hadoop.fs.Path

/** The adoption sidecar protocol: a directory-layout table entering
  * manifest mode must never lose its pre-manifest content — not to a
  * crash between the marker landing and the first publish, not to an
  * empty first batch, not to a concurrent first commit. The sidecar
  * (captured atomically before anything stages) is the durable record of
  * what the directory held; these cases pin every transition state. */
class AdoptionSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshCatalog(): (Catalog, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft-adopt").toString
    (new Catalog(spark, root), root)
  }

  private def fsRoot(catalog: Catalog, ref: String): (org.apache.hadoop.fs.FileSystem, Path) = {
    val (ns, t) = catalog.parseRef(ref)
    val p = new Path(catalog.path(ns, t))
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  test("sidecar primitives: exclusive transition, immutable after marker, stale refresh") {
    val (fs, table) = {
      val root = new Path(
        java.nio.file.Files.createTempDirectory("graft-sidecar").toString, "tbl")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(root)
      (fs, root)
    }
    assert(Manifest.readAdoption(fs, table).isEmpty)
    val won = Manifest.adoptionTransition(fs, table, Seq("a.parquet", "b.parquet"))
    assert(won == Seq("a.parquet", "b.parquet"))
    assert(fs.exists(Manifest.dir(table))) // transition creates the marker
    // marker present: a later transition reads the sidecar, NEVER re-lists
    val second = Manifest.adoptionTransition(fs, table,
      sys.error("post-marker transition must not re-list"))
    assert(second == Seq("a.parquet", "b.parquet"))
    assert(Manifest.readAdoption(fs, table).contains(Seq("a.parquet", "b.parquet")))
    // crash-between-sidecar-and-marker state: the capture is STALE (a
    // directory append could land after it) — the next transition must
    // refresh from the live listing, not trust it
    fs.delete(Manifest.dir(table), true)
    val refreshed = Manifest.adoptionTransition(fs, table,
      Seq("a.parquet", "b.parquet", "c.parquet"))
    assert(refreshed == Seq("a.parquet", "b.parquet", "c.parquet"))
    assert(Manifest.readAdoption(fs, table).contains(refreshed))
    // corruption is loud, not a silent empty adoption
    val out = fs.create(Manifest.adoptionPath(table), true)
    out.write("graft-adoption-v1\nchecksum=0\nc.parquet".getBytes("UTF-8"))
    out.close()
    assertThrows[IllegalArgumentException](Manifest.readAdoption(fs, table))
    Manifest.dropAdoption(fs, table)
    assert(Manifest.readAdoption(fs, table).isEmpty)
  }

  test("crashed first commit: directory content stays readable through the sidecar") {
    val (catalog, _) = freshCatalog()
    val ref = "adopt.crashed"
    catalog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), ref)
    val (fs, tableRoot) = fsRoot(catalog, ref)
    // reproduce the exact crash state a first commitAppend leaves when it
    // dies after capturing the sidecar and creating the marker but before
    // publishing: sidecar + marker + a staged-but-unpublished dropping
    Manifest.adoptionTransition(fs, tableRoot, {
      val files = fs.listStatus(tableRoot).map(_.getPath.getName)
        .filter(n => n.endsWith(".parquet") && !n.startsWith(".")).toSeq
      files
    })
    Seq((99L, "orphan")).toDF("id", "v").write
      .parquet(new Path(tableRoot, ".stage-fake").toString)
    val dropping = fs.listStatus(new Path(tableRoot, ".stage-fake"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(dropping, new Path(tableRoot, "part-crashed-orphan.parquet"))
    // the table is still present and reads EXACTLY the pre-manifest rows —
    // the crashed commit's dropping is an orphan, not content
    assert(catalog.exists(ref))
    assert(catalog.load(ref).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // the NEXT commit adopts the sidecar list (not a re-listing that would
    // swallow the orphan), folds it into v1, and retires the sidecar
    catalog.commitAppend(Seq((3L, "c")).toDF("id", "v"), ref)
    assert(catalog.snapshotVersions(ref) == Seq(1L))
    assert(catalog.load(ref).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
    assert(Manifest.readAdoption(fs, tableRoot).isEmpty)
  }

  test("empty first append adopts: the transition cannot strand a directory table") {
    val (catalog, _) = freshCatalog()
    val ref = "adopt.emptyfirst"
    catalog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), ref)
    // an EMPTY first commitAppend used to create the marker, publish
    // nothing, and leave the table invisible; it must publish the
    // adoption snapshot instead
    catalog.commitAppend(Seq.empty[(Long, String)].toDF("id", "v"), ref)
    assert(catalog.snapshotVersions(ref) == Seq(1L))
    assert(catalog.exists(ref))
    assert(catalog.load(ref).count() == 2L)
    val (fs, tableRoot) = fsRoot(catalog, ref)
    assert(Manifest.readAdoption(fs, tableRoot).isEmpty) // retired after publish
  }

  test("concurrent first commits on a directory table: adoption survives the race") {
    // the historical loss mode: writer B starts between A's marker and
    // A's publish, skips adoption, publishes v1 with only its own files;
    // A's retry then drops the adopted list because prior is now Some.
    // With the sidecar, every first committer reads the SAME durable
    // list, so whichever interleaving wins, the union of pre-manifest
    // rows and every batch must land.
    val (catalog, _) = freshCatalog()
    val ref = "adopt.race"
    catalog.append(Seq((1L, "pre"), (2L, "pre")).toDF("id", "v"), ref)
    val writers = 6
    val barrier = new java.util.concurrent.CyclicBarrier(writers)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      val results = pool.invokeAll(
        java.util.Arrays.asList(
          (0 until writers).map { i =>
            new java.util.concurrent.Callable[Either[Throwable, Boolean]] {
              def call() = {
                barrier.await(60, java.util.concurrent.TimeUnit.SECONDS)
                try Right(catalog.commitAppend(
                  Seq((100L + i, s"w$i")).toDF("id", "v"), ref))
                catch { case t: Throwable => Left(t) }
              }
            }
          }: _*))
      val outcomes = (0 until writers).map(results.get(_).get())
      // commitAppend retries CAS losses itself — every writer lands
      assert(outcomes.forall(_.isRight), outcomes.collect { case Left(t) => t }.mkString)
    } finally pool.shutdownNow()
    val ids = catalog.load(ref).select("id").as[Long].collect().sorted.toSeq
    assert(ids == (Seq(1L, 2L) ++ (0 until writers).map(100L + _)),
      s"lost rows: $ids")
    val (fs, tableRoot) = fsRoot(catalog, ref)
    assert(Manifest.readAdoption(fs, tableRoot).isEmpty) // retired after adoption
  }

  test("vacuum on a directory-layout table is a no-op, not TableNotFound") {
    val (catalog, _) = freshCatalog()
    val ref = "adopt.dirvac"
    catalog.append(Seq((1L, "a")).toDF("id", "v"), ref)
    assert(catalog.vacuum(ref) == 0L)
    assert(catalog.load(ref).count() == 1L)
    // a table that truly does not exist still raises
    assertThrows[TableNotFound](catalog.vacuum("adopt.nope"))
  }

  test("a partitioned table keeps its layout through the adoption window") {
    // marker-no-snapshot with a day=X/ directory layout: the recovery
    // commit must discover the Hive layout (partitionColumnsOf falls
    // through to directory discovery), stage partitioned, and publish
    // partitions=day — NOT flatten the table into a mixed-depth snapshot
    val (catalog, _) = freshCatalog()
    val ref = "adopt.partwin"
    catalog.append(Seq((1L, "x", "2024-01-01")).toDF("id", "v", "day"),
      ref, partitionBy = Seq("day"))
    val (fs, tableRoot) = fsRoot(catalog, ref)
    Manifest.adoptionTransition(fs, tableRoot, Seq("day=2024-01-01")
      .flatMap(d => fs.listStatus(new Path(tableRoot, d))
        .map(s => s"$d/${s.getPath.getName}")
        .filter(_.endsWith(".parquet"))))
    val (ns, t) = catalog.parseRef(ref)
    assert(catalog.partitionColumnsOf(ns, t) == Seq("day"))
    catalog.commitAppend(Seq((2L, "y", "2024-01-02")).toDF("id", "v", "day"), ref)
    assert(catalog.snapshotVersions(ref) == Seq(1L))
    val snapFiles = Manifest.latest(fs, tableRoot).get
    assert(snapFiles.partitions == Seq("day"))
    assert(snapFiles.files.forall(_.startsWith("day=")), snapFiles.files.mkString(","))
    assert(catalog.load(ref).select("day").distinct().count() == 2L)
  }

  test("adoption state machine: random ops + injected crash states read back exact contents") {
    // seeded fuzz over the directory→manifest transition: every trial
    // starts from a plain directory table, interleaves appends / commits /
    // overwrites / maintenance with INJECTED first-commit crash states
    // (sidecar alone; sidecar + marker + a staged orphan dropping), and
    // checks the reader after every step — the invariant IS the adoption
    // durability contract
    val rnd = new scala.util.Random(1234)
    for (trial <- 0 until 3) {
      val (catalog, _) = freshCatalog()
      val ref = s"adopt.fuzz$trial"
      def df(ids: Seq[Long]) = ids.map(i => (i, s"r$i")).toDF("id", "v")
      var nextId = 0L
      def take(n: Int): Seq[Long] = {
        val r = (0 until n).map(i => nextId + i); nextId += n; r
      }
      var expected = take(2).toVector
      catalog.append(df(expected), ref)
      val (fs, tableRoot) = fsRoot(catalog, ref)
      def readIds() =
        catalog.load(ref).collect().map(_.getLong(0)).toVector.sorted
      // once a staged orphan exists the marker can never vanish (staging
      // strictly follows marker creation and nothing deletes the marker),
      // so the rollback injection below is gated on this flag — an
      // orphan-without-marker state is unreachable in the real protocol
      var orphaned = false
      for (step <- 0 until 20) {
        rnd.nextInt(8) match {
          case 0 | 1 => // append (routes through commitAppend once manifest)
            val rows = take(1 + rnd.nextInt(2))
            catalog.append(df(rows), ref)
            expected ++= rows
          case 2 | 3 => // explicit atomic append commit
            val rows = take(1 + rnd.nextInt(2))
            catalog.commitAppend(df(rows), ref)
            expected ++= rows
          case 4 => // atomic overwrite (directory overwrite pre-manifest)
            val rows = take(2)
            catalog.save(df(rows), ref)
            expected = rows.toVector
          case 5 if catalog.snapshotVersions(ref).isEmpty =>
            // inject a first-commit crash: run the real transition, then
            // either roll back the marker (the sidecar-without-marker
            // stale-capture state — later directory appends MUST outdate
            // it) or leave the marker and drop a staged orphan beside the
            // data (the post-staging crash state)
            Manifest.adoptionTransition(fs, tableRoot, {
              val out = Seq.newBuilder[String]
              def walk(d: Path, rel: String): Unit =
                fs.listStatus(d).foreach { s =>
                  val n = s.getPath.getName
                  if (n.startsWith("_") || n.startsWith(".")) ()
                  else if (s.isDirectory) walk(s.getPath, s"$rel$n/")
                  else if (n.endsWith(".parquet")) out += s"$rel$n"
                }
              walk(tableRoot, "")
              out.result()
            })
            if (!orphaned && rnd.nextBoolean())
              fs.delete(Manifest.dir(tableRoot), true)
            else if (rnd.nextBoolean()) {
              df(Seq(888888L)).write
                .parquet(new Path(tableRoot, ".stage-crash").toString)
              fs.listStatus(new Path(tableRoot, ".stage-crash"))
                .map(_.getPath).filter(_.getName.endsWith(".parquet"))
                .take(1).foreach(p =>
                  fs.rename(p, new Path(tableRoot, s"part-orphan-$step.parquet")))
              fs.delete(new Path(tableRoot, ".stage-crash"), true)
              orphaned = true
            }
          case 6 if catalog.isManifest("adopt", s"fuzz$trial") &&
              catalog.snapshotVersions(ref).nonEmpty =>
            catalog.compact(ref)
          case 7 => // maintenance is safe in BOTH modes now
            catalog.vacuum(ref)
          case _ => ()
        }
        assert(readIds() == expected.sorted,
          s"divergence in trial $trial after step $step: " +
            s"got ${readIds().mkString(",")} want ${expected.sorted.mkString(",")}")
      }
      // finish the transition and confirm the folded table
      catalog.commitAppend(df(take(1)), ref)
      expected ++= Seq(nextId - 1)
      assert(readIds() == expected.sorted)
      assert(catalog.snapshotVersions(ref).nonEmpty)
    }
  }

  test("directory append inherits the Hive layout; a contradiction fails loudly") {
    val (catalog, _) = freshCatalog()
    val ref = "adopt.layout"
    catalog.append(Seq((1L, "x", "2024-01-01")).toDF("id", "v", "day"),
      ref, partitionBy = Seq("day"))
    // omitting partitionBy inherits day= partitioning instead of writing
    // flat files into the partitioned root
    catalog.append(Seq((2L, "y", "2024-01-02")).toDF("id", "v", "day"), ref)
    val (fs, tableRoot) = fsRoot(catalog, ref)
    val dayDirs = fs.listStatus(tableRoot).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("day=")).sorted.toSeq
    assert(dayDirs == Seq("day=2024-01-01", "day=2024-01-02"))
    assert(catalog.load(ref).count() == 2L)
    // an explicit contradicting layout is refused
    assertThrows[IllegalArgumentException](
      catalog.append(Seq((3L, "z", "2024-01-03")).toDF("id", "v", "day"),
        ref, partitionBy = Seq("v")))
  }
}
