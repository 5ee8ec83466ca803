package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-splitting and per-group sampling operators for LLM training-data
  * curation: deterministic train/val/test assignment, per-group quality
  * strata, and per-group contribution caps (the "no domain dominates the
  * corpus" rule).
  *
  * Scale notes. [[hashSplit]] is a pure map-side expression — zero shuffle,
  * stable under reruns, backfills, repartitioning and cluster resizes,
  * which is the property `rand()`-based splits lack (a backfilled document
  * must land in the same split it was assigned on first ingest, or the
  * eval set leaks into training). [[strata]] and [[capPerGroup]] shuffle
  * once on the group key (hash-partitioned window, never a global sort);
  * their per-group sort is the cost, so the group key must be something
  * with enough cardinality to spread (source/domain/shard), not a
  * near-constant.
  */
object Sampling {

  /** Deterministic split assignment (`train`/`val`/`test`) by content hash.
    *
    * The first four hex digits of `md5(key)` place the row in a 65536-cell
    * space; the split boundaries are fixed hex thresholds, so assignment
    * depends ONLY on the key — embarrassingly parallel, reproducible
    * everywhere (any engine with md5 agrees, which is what makes the
    * DuckDB oracle for q55 possible), and documents added later never
    * move rows across splits.
    *
    * Key choice is the caller's contract: a stable id (or the content
    * digest itself) — NOT a row number or anything assignment-dependent.
    * A null key fails loudly (same contract as [[mixtureSample]]'s
    * `mixtureBucket`): md5(null) is null, both threshold comparisons
    * would be null, and every null-key row would silently fall through to
    * the `test` split — polluting exactly the split that must stay clean. */
  def hashSplit(key: Column, trainPct: Double = 0.90, valPct: Double = 0.05): Column = {
    val (trainHex, valHex) = splitThresholds(trainPct, valPct)
    val bucket = substring(md5(key.cast("string").cast("binary")), 1, 4)
    when(key.isNull,
      raise_error(lit("hashSplit key is null — supply a non-null stable key")))
      .when(bucket < lit(trainHex), "train")
      .when(bucket < lit(valHex), "val")
      .otherwise("test")
  }

  /** The two 4-hex-digit bucket boundaries for [[hashSplit]] — exposed so
    * oracle SQL (and any other engine) can use literally the same
    * thresholds. A boundary at exactly 1.0 is the sentinel `"g"`, which
    * sorts after every hex string (comparisons are lexicographic; the
    * 5-char `"10000"` would sort BEFORE `"2???"` and break the split). */
  def splitThresholds(trainPct: Double, valPct: Double): (String, String) = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 1.0,
      s"invalid split percentages: train=$trainPct val=$valPct")
    def hex(pct: Double) = {
      val v = (65536 * pct).toInt
      if (v >= 65536) "g" else f"$v%04x"
    }
    (hex(trainPct), hex(trainPct + valPct))
  }

  /** Per-group quantile strata: `n` buckets of ascending `score` within
    * each `group` partition (NTILE semantics — earlier buckets take the
    * remainder row). `tieBreak` must complete a TOTAL order (a unique id)
    * or bucket membership is nondeterministic at equal scores.
    *
    * The window is partitioned, so the plan hash-partitions on `group` and
    * sorts within partitions — no single-partition global sort. Quality
    * stratification over quartiles is the usual shape for curriculum
    * schedules and quality-mix reporting. Exactness costs one sort PER
    * GROUP on a single task, so parallelism is capped at the group count:
    * for a handful of huge groups (languages over 100 TB), take
    * [[strataApprox]] — sketch thresholds + broadcast join, no cap. */
  def strata(group: Column, score: Column, tieBreak: Column, n: Int = 4): Column =
    // asc_nulls_last, not Spark's default NULLS FIRST: DuckDB's ASC
    // default is NULLS LAST, so a null score (an empty doc under the
    // guarded quality ratios) would otherwise land in quartile 1 on one
    // engine and quartile n on the other, shifting every sibling's
    // bucket — the q16 desc_nulls_last lesson on the ascending side
    ntile(n).over(Window.partitionBy(group)
      .orderBy(score.asc_nulls_last, tieBreak)).cast("long")

  /** The scale path for [[strata]]: per-group APPROXIMATE quantile buckets
    * from `approx_percentile` thresholds — one aggregation plus a broadcast
    * join of a groups×(n-1) threshold table, fully parallel, NO per-group
    * sort. [[strata]]'s windowed NTILE is exact but sorts each group on a
    * single task, so a low-cardinality group column (a handful of
    * languages over 100 TB) caps its parallelism at the group count; this
    * form has no such cap. Buckets are 1-based like NTILE; sizes are
    * balanced within the sketch's rank error rather than exactly, and ties
    * at a threshold all land in the lower bucket. `accuracy` is the
    * `approx_percentile` knob (higher = tighter, more memory).
    *
    * Null groups AND null scores follow [[strata]]'s conventions — a
    * window's partitionBy treats null as its own partition, so the
    * threshold join here is NULL-SAFE (`<=>`): swapping exact for approx
    * at scale buckets the null-group rows instead of silently dropping
    * them. And a null score ALWAYS lands in bucket `n` — a deliberate
    * convention, not an exact-ntile equivalence: it coincides with
    * [[strata]]'s `asc_nulls_last` only while a group's nulls fit in one
    * bucket (null fraction ≤ 1/n); past that, exact NTILE spreads the
    * null tail across the top buckets while this form pins every null to
    * bucket `n` (divergence pinned in ExtSpec). The branch itself is
    * load-bearing either way — without it every `score > t` comparison
    * is null, the filter keeps nothing, and a null-score row (an empty
    * doc under the guarded quality ratios, the case [[strata]]'s own
    * ordering comment calls out) would silently flip from the last
    * bucket to the FIRST when a deployment swaps exact for approx.
    *
    * Returns `df` plus a `bucket` column. */
  def strataApprox(df: DataFrame, group: Column, score: Column, n: Int = 4,
      accuracy: Int = 10000): DataFrame = {
    require(n >= 2, s"need at least 2 buckets, got $n")
    val probs = array((1 until n).map(i => lit(i.toDouble / n)): _*)
    val th = df.groupBy(group.as("__g"))
      .agg(percentile_approx(score, probs, lit(accuracy)).as("__th"))
    df.join(broadcast(th), group <=> col("__g"))
      .withColumn("bucket",
        when(score.isNull, lit(n.toLong))
          .otherwise((size(filter(col("__th"), t => score > t)) + 1).cast("long")))
      .drop("__g", "__th")
  }

  /** Token-budget shard assignment — the deterministic first step of
    * sequence packing: walk each group in `order` (a stable unique key),
    * accumulate `tokens`, and open a new shard every time the running
    * total crosses `budget`. `shard = floor(exclusive_cumsum / budget)`,
    * so a document lands in the shard that was open when it arrived and
    * every shard holds ~`budget` tokens (the last document may overhang —
    * greedy packing's usual tolerance).
    *
    * Deterministic (same inputs → same shards on any cluster layout, the
    * property a training run needs to resume or re-materialize batches)
    * and partitioned: the cumulative sum is a window over `group`, one
    * hash exchange + per-group sort, never a global single-partition
    * scan. Group by something with spread (lang/source/date-bucket); the
    * division stays IEEE-exact while group token totals are < 2^53. */
  def tokenShards(group: Column, tokens: Column, order: Column,
      budget: Long): Column = {
    require(budget > 0, s"budget must be positive, got $budget")
    val before = coalesce(
      sum(tokens).over(Window.partitionBy(group).orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    floor(before / lit(budget.toDouble)).cast("long")
  }

  /** Cap each group's contribution to its `k` best rows by `score`
    * (descending, ties broken by `tieBreak` ascending): the per-domain /
    * per-source cap every pretraining mix applies so one crawl domain
    * cannot dominate the corpus. Adds nothing but the rows — callers
    * aggregate or write the result as-is.
    *
    * One hash exchange on `group`; the per-group top-k is a partitioned
    * window sort. For extreme single-group skew route through
    * [[graft.ops.Skew]]-style pre-aggregation instead — row_number cannot
    * salt (rank is global per group by definition). */
  def capPerGroup(df: DataFrame, group: Column, score: Column, tieBreak: Column,
      k: Int): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(group).orderBy(score.desc, tieBreak)))
      .filter(col("__rn") <= k)
      .drop("__rn")

  /** Deterministic uniform sample of `k` rows per group: rank rows inside
    * each group by the md5 of their `key` and keep the first `k` — a
    * hash-ordered [[capPerGroup]]. Uniform because the hash is
    * uncorrelated with any data attribute; deterministic for the same
    * reason [[hashSplit]] is (same keys → same sample, on any engine or
    * layout — the balanced per-source eval set stays fixed across reruns,
    * where `TABLESAMPLE`/`rand()` would redraw it). Same single hash
    * exchange + per-group sort shape as [[capPerGroup]]. */
  def samplePerGroup(df: DataFrame, group: Column, key: Column, k: Int): DataFrame =
    capPerGroup(df, group, md5(key.cast("string").cast("binary")), key, k)

  /** The 8-hex-digit bucket boundary for a sampling `rate` in [0, 1] —
    * [[splitThresholds]]' idea at mixture precision (2^32 cells, so a rate
    * is honored to ±2^-32). Exposed so oracle SQL can use literally the
    * same threshold; 1.0 is the same `"g"` sentinel (sorts after every
    * hex string). */
  def rateThreshold(rate: Double): String = {
    require(rate >= 0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    val v = (4294967296L * rate).toLong
    if (v >= 4294967296L) "g" else f"$v%08x"
  }

  /** Per-group mixture downsampling: keep a row iff the salted content
    * hash of its `key` falls under its group's rate threshold — the
    * "sample web at 35%, wiki at 100%" training-mixture rule. Rates are
    * in [0, 1] ([[mixtureWeight]] handles upsampling); groups absent from
    * `rates` use `defaultRate`.
    *
    * Pure map-side filter — zero shuffle, no state — and deterministic:
    * the decision depends only on (salt, key), so reruns, backfills and
    * re-mixes with the SAME rates keep exactly the same rows, and raising
    * a group's rate strictly grows its kept set (thresholds are nested) —
    * the property that lets a mixture be re-weighted incrementally
    * instead of re-drawn. The salt namespaces this decision away from
    * [[hashSplit]]'s (both hash the same key; unsalted they would
    * correlate: every `test`-split row would sample in or out together). */
  def mixtureSample(df: DataFrame, group: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val th = rates.toSeq.sortBy(_._1).foldLeft(lit(rateThreshold(defaultRate))) {
      case (acc, (g, r)) => when(group === lit(g), lit(rateThreshold(r))).otherwise(acc)
    }
    df.filter(mixtureBucket(key) < th)
  }

  /** Generalized mixture weights: each row yields `floor(rate)` copies
    * plus one more iff its hash falls under the fractional remainder —
    * so a group at rate 2.5 is upsampled to exactly ~2.5× (epoch
    * weighting for small high-quality sources), a group at 0.35 is
    * [[mixtureSample]]d, and rate 0 drops the group. Adds a 1-based
    * `copy` index column (downstream shuffling/packing must treat copies
    * as distinct rows or they collapse to dedup fodder).
    *
    * Map-side like [[mixtureSample]] (`explode` multiplies rows inside
    * the scan task, no shuffle); deterministic per (salt, key), and the
    * fractional decision uses the SAME salted hash as [[mixtureSample]],
    * so `rates.mapValues(min(_, 1.0))` through either path keeps
    * identical rows. */
  def mixtureWeight(df: DataFrame, group: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    (rates.values ++ Seq(defaultRate)).foreach(r =>
      require(r >= 0, s"mixture rates must be non-negative, got $r"))
    def chain(f: Double => Column) =
      rates.toSeq.sortBy(_._1).foldLeft(f(defaultRate)) {
        case (acc, (g, r)) => when(group === lit(g), f(r)).otherwise(acc)
      }
    val whole = chain(r => lit(math.floor(r).toLong))
    val fracTh = chain(r => lit(rateThreshold(r - math.floor(r))))
    val copies = whole + when(mixtureBucket(key) < fracTh, 1L).otherwise(0L)
    df.withColumn("__copies", copies)
      .filter(col("__copies") >= 1L)
      .withColumn("copy", explode(sequence(lit(1L), col("__copies"))))
      .drop("__copies")
  }

  /** The keep-predicate of [[mixtureSample]] for a single rate — the unit
    * the SQL surface exposes as `graft_mixture_keep(key, rate)`. Same
    * salted bucket, same nested-threshold determinism contract. */
  def mixtureKeep(key: Column, rate: Double): Column =
    mixtureBucket(key) < lit(rateThreshold(rate))

  /** The salted 8-hex-digit sampling bucket shared by [[mixtureSample]]
    * and [[mixtureWeight]]'s fractional part. A null key has no
    * well-defined deterministic draw — it would otherwise hash to null
    * and silently drop (even at rate 1.0) in the sample form while
    * keeping floor(rate) copies in the weight form — so it fails loudly
    * instead: sampling keys are the caller's contract, like
    * [[hashSplit]]'s. */
  private def mixtureBucket(key: Column): Column =
    when(key.isNull,
      raise_error(lit("mixture sampling key is null — supply a non-null stable key")))
      .otherwise(
        substring(md5(concat(lit("mix:"), key.cast("string")).cast("binary")), 1, 8))

  /** Packed-sequence assembly — the materialization step after
    * [[tokenShards]]: concatenate each (group, shard)'s documents in
    * `order` with `sep` between them, producing one training sequence of
    * ~budget tokens per shard. Output columns: the group/shard keys,
    * `sequence` (the packed text), `n_docs`, `sum_tokens`.
    *
    * One hash exchange on (group, shard); per-shard state is bounded by
    * the token budget [[tokenShards]] enforced, NOT by group size — the
    * property that makes a collect_list-per-shard safe at 100 TB where a
    * collect-per-group would not be. Deterministic: the in-sequence order
    * is `array_sort` over (order, text) structs, so any layout assembles
    * byte-identical sequences (and DuckDB's `string_agg(... ORDER BY)`
    * can oracle them exactly).
    *
    * `group`/`shard` keep their own column names in the output — pass
    * named columns (alias computed expressions before calling). */
  def packSequences(df: DataFrame, group: Column, shard: Column, order: Column,
      text: Column, tokens: Column, sep: String = "\n\n"): DataFrame =
    df.groupBy(group, shard)
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(order.as("o"), text.as("t")))),
            s => s.getField("t")),
          sep).as("sequence"),
        count(lit(1)).as("n_docs"),
        sum(tokens).as("sum_tokens"))

  /** Deterministic corpus shuffle for training order: a seed-salted
    * content-hash sort key plus a fixed hash-bucket `shard` in
    * `[0, shards)`. The materialization idiom is
    * `df.repartition(shards, col("shard")).sortWithinPartitions("shard", "shuffle_key")`
    * written `partitionBy("shard")` — global training order is
    * (shard asc, shuffle_key asc) with NO single-partition global sort,
    * and unlike `repartitionByRange` (whose boundaries come from a
    * nondeterministic sample) or `orderBy(rand())`, the order is a pure
    * function of (seed, key): any engine, layout or rerun reproduces it,
    * which is what lets a crashed training run re-materialize the exact
    * batch stream. A new `seed` is a fresh epoch-order. Returns `df` plus
    * `shard` and `shuffle_key`. */
  def shuffleOrder(df: DataFrame, key: Column, seed: Long, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val sk = md5(concat(lit(s"shuffle:$seed:"), key.cast("string")).cast("binary"))
    df.withColumn("shuffle_key", sk)
      .withColumn("shard",
        pmod(conv(substring(col("shuffle_key"), 1, 8), 16, 10).cast("long"),
          lit(shards.toLong)))
  }
}
