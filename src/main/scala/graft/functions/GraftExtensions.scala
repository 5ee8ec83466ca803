package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer exposing the engine's native expressions
  * to SQL (`spark.sql.extensions=graft.functions.GraftExtensions`), plus a
  * programmatic registrar for sessions created without the conf.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
    ext.injectFunction(GraftExtensions.simhashFunction)
    ext.injectFunction(GraftExtensions.langIdFunction)
    ext.injectFunction(GraftExtensions.hyperplaneLshFunction)
    ext.injectFunction(GraftExtensions.shingleHashesFunction)
    ext.injectFunction(GraftExtensions.minhashFunction)
    ext.injectFunction(GraftExtensions.docFingerprintFunction)
    ext.injectFunction(GraftExtensions.textMetricsFunction)
    ext.injectFunction(GraftExtensions.repetitionMetricsFunction)
    ext.injectFunction(GraftExtensions.wordNgramsFunction)
    ext.injectFunction(GraftExtensions.hashSplitFunction)
    ext.injectFunction(GraftExtensions.mixtureKeepFunction)
    ext.injectFunction(GraftExtensions.mediaHeaderFunction)
  }
}

object GraftExtensions {
  private def dotBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => DotProduct(a, b)
    case _ => throw new IllegalArgumentException("graft_dot expects exactly 2 arguments")
  }

  private def simhashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a) => SimHash64(a)
    case _ => throw new IllegalArgumentException("graft_simhash64 expects exactly 1 argument")
  }

  private def langIdBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a) => LangId(a)
    case _ => throw new IllegalArgumentException("graft_lang_id expects exactly 1 argument")
  }

  /** graft_shingle_hashes(text, n) → array<long> of distinct n-gram hashes. */
  private def shingleBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(t, n) => ShingleHashes(t, intLit(n, "graft_shingle_hashes"))
    case _ => throw new IllegalArgumentException(
      "graft_shingle_hashes expects (text, n)")
  }

  /** graft_minhash(shingle_hashes, k) → array<long> signature of length k. */
  private def minhashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(h, k) => MinHashK(h, intLit(k, "graft_minhash"))
    case _ => throw new IllegalArgumentException(
      "graft_minhash expects (shingle_hashes, k)")
  }

  private def docFingerprintBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a) => DocFingerprint(a)
    case _ => throw new IllegalArgumentException("graft_doc_fingerprint expects exactly 1 argument")
  }

  /** graft_text_metrics(text) → struct<n_tokens, stops, punct, n_chars>
    * (the default English stopword set — the library call takes custom
    * sets). */
  private def textMetricsBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a) => TextMetrics(a, graft.ext.TextStats.EnglishStopwords)
    case _ => throw new IllegalArgumentException("graft_text_metrics expects exactly 1 argument")
  }

  /** graft_media_header(payload) → struct<format, width, height,
    * bit_depth, sample_rate, channels, error> (see [[MediaHeader]]). */
  private def mediaHeaderBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a) => MediaHeader(a)
    case _ => throw new IllegalArgumentException(
      "graft_media_header expects exactly 1 argument")
  }

  private def repetitionMetricsBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a) => RepetitionMetrics(a)
    case _ => throw new IllegalArgumentException(
      "graft_repetition_metrics expects exactly 1 argument")
  }

  /** graft_word_ngrams(text, n) → array<string> of space-joined word n-grams. */
  private def wordNgramsBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(t, n) => WordNgrams(t, intLit(n, "graft_word_ngrams"))
    case _ => throw new IllegalArgumentException("graft_word_ngrams expects (text, n)")
  }

  private def intLit(e: Expression, fn: String): Int =
    if (e.foldable) e.eval() match {
      case n: Number => n.intValue()
      // a foldable NULL (e.g. CAST(NULL AS INT)) must get the clear
      // message, not a bare NPE out of the analyzer
      case other => throw new IllegalArgumentException(
        s"$fn: parameter must be a literal integer, got $other")
    }
    else throw new IllegalArgumentException(s"$fn: parameter must be a literal integer")

  private def doubleLit(e: Expression, fn: String): Double =
    if (e.foldable) e.eval() match {
      // SQL fraction literals fold to Catalyst Decimal, not j.l.Number
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"$fn: parameter must be a literal number, got $other")
    }
    else throw new IllegalArgumentException(s"$fn: parameter must be a literal number")

  /** graft_hash_split(key[, trainPct, valPct]) → 'train'|'val'|'test' —
    * the SQL surface of [[graft.ext.Sampling.hashSplit]] (composite
    * expression, same fixed hex thresholds, defaults 0.90/0.05). */
  private def hashSplitBuilder(args: Seq[Expression]): Expression = {
    import org.apache.spark.sql.GraftColumnBridge
    args match {
      case Seq(k) => GraftColumnBridge.tree(
        graft.ext.Sampling.hashSplit(GraftColumnBridge.column(k)))
      case Seq(k, tr, va) => GraftColumnBridge.tree(
        graft.ext.Sampling.hashSplit(GraftColumnBridge.column(k),
          doubleLit(tr, "graft_hash_split"), doubleLit(va, "graft_hash_split")))
      case _ => throw new IllegalArgumentException(
        "graft_hash_split expects (key[, trainPct, valPct])")
    }
  }

  /** graft_mixture_keep(key, rate) → boolean — the SQL surface of
    * [[graft.ext.Sampling.mixtureKeep]] (salted deterministic sampling
    * predicate; nested thresholds, null keys raise). */
  private def mixtureKeepBuilder(args: Seq[Expression]): Expression = {
    import org.apache.spark.sql.GraftColumnBridge
    args match {
      case Seq(k, r) => GraftColumnBridge.tree(
        graft.ext.Sampling.mixtureKeep(GraftColumnBridge.column(k),
          doubleLit(r, "graft_mixture_keep")))
      case _ => throw new IllegalArgumentException(
        "graft_mixture_keep expects (key, rate)")
    }
  }

  /** graft_image_dhash(payload) → struct<dhash, error> ([[ImageDHash]]). */
  private def imageDHashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a) => ImageDHash(a)
    case _ => throw new IllegalArgumentException(
      "graft_image_dhash expects exactly 1 argument")
  }

  /** graft_image_grid(payload[, gridW, gridH]) → struct<feature, error>
    * ([[ImageGridFeature]] — the crop-tolerant grid descriptor). */
  private def imageGridBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a) => ImageGridFeature(a, 8, 8)
    case Seq(a, w, h) => ImageGridFeature(a,
      intLit(w, "graft_image_grid"), intLit(h, "graft_image_grid"))
    case _ => throw new IllegalArgumentException(
      "graft_image_grid expects (payload[, gridW, gridH])")
  }

  /** graft_image_spectral(payload[, maxFreq]) → struct<feature, error>
    * ([[ImageSpectralFeature]] — the translation-invariant tier). */
  private def imageSpectralBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a) => ImageSpectralFeature(a, 3)
    case Seq(a, f) => ImageSpectralFeature(a, intLit(f, "graft_image_spectral"))
    case _ => throw new IllegalArgumentException(
      "graft_image_spectral expects (payload[, maxFreq])")
  }

  /** graft_audio_envelope(payload[, frames]) → struct<feature, error>
    * ([[AudioEnvelopeFeature]] — the aligned-bin audio descriptor). */
  private def audioEnvelopeBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a) => AudioEnvelopeFeature(a, 64)
    case Seq(a, f) => AudioEnvelopeFeature(a, intLit(f, "graft_audio_envelope"))
    case _ => throw new IllegalArgumentException(
      "graft_audio_envelope expects (payload[, frames])")
  }

  /** graft_audio_spectral(payload[, maxFreq]) → struct<feature, error>
    * ([[AudioSpectralFeature]] — the time-shift-tolerant tier). */
  private def audioSpectralBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a) => AudioSpectralFeature(a, 24)
    case Seq(a, f) => AudioSpectralFeature(a, intLit(f, "graft_audio_spectral"))
    case _ => throw new IllegalArgumentException(
      "graft_audio_spectral expects (payload[, maxFreq])")
  }

  /** graft_hyperplane_lsh(vec, nPlanes[, nTables[, planeOffset]]) →
    * array<long> of sign-bit buckets (see [[HyperplaneLsh]]). */
  private def lshBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(v, p) => HyperplaneLsh(v, intLit(p, "graft_hyperplane_lsh"), 1, 0)
    case Seq(v, p, t) =>
      HyperplaneLsh(v, intLit(p, "graft_hyperplane_lsh"), intLit(t, "graft_hyperplane_lsh"), 0)
    case Seq(v, p, t, o) =>
      HyperplaneLsh(v, intLit(p, "graft_hyperplane_lsh"),
        intLit(t, "graft_hyperplane_lsh"), intLit(o, "graft_hyperplane_lsh"))
    case _ => throw new IllegalArgumentException(
      "graft_hyperplane_lsh expects (vec, nPlanes[, nTables[, planeOffset]])")
  }

  val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    dotBuilder _)

  val simhashFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
    simhashBuilder _)

  val langIdFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_lang_id"),
    new ExpressionInfo(classOf[LangId].getName, "graft_lang_id"),
    langIdBuilder _)

  val hyperplaneLshFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hyperplane_lsh"),
    new ExpressionInfo(classOf[HyperplaneLsh].getName, "graft_hyperplane_lsh"),
    lshBuilder _)

  val shingleHashesFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_shingle_hashes"),
    new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
    shingleBuilder _)

  val minhashFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashK].getName, "graft_minhash"),
    minhashBuilder _)

  val mediaHeaderFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_media_header"),
    new ExpressionInfo(classOf[MediaHeader].getName, "graft_media_header"),
    mediaHeaderBuilder _)

  val docFingerprintFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_doc_fingerprint"),
    new ExpressionInfo(classOf[DocFingerprint].getName, "graft_doc_fingerprint"),
    docFingerprintBuilder _)

  val textMetricsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_text_metrics"),
    new ExpressionInfo(classOf[TextMetrics].getName, "graft_text_metrics"),
    textMetricsBuilder _)

  val repetitionMetricsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_repetition_metrics"),
    new ExpressionInfo(classOf[RepetitionMetrics].getName, "graft_repetition_metrics"),
    repetitionMetricsBuilder _)

  val wordNgramsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_word_ngrams"),
    new ExpressionInfo(classOf[WordNgrams].getName, "graft_word_ngrams"),
    wordNgramsBuilder _)

  val hashSplitFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hash_split"),
    new ExpressionInfo(graft.ext.Sampling.getClass.getName, "graft_hash_split"),
    hashSplitBuilder _)

  val mixtureKeepFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_mixture_keep"),
    new ExpressionInfo(graft.ext.Sampling.getClass.getName, "graft_mixture_keep"),
    mixtureKeepBuilder _)

  /** Idempotent per-session registration for SQL-string use. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot", dotBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_simhash64", simhashBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_lang_id", langIdBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_hyperplane_lsh", lshBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_shingle_hashes", shingleBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_minhash", minhashBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_doc_fingerprint", docFingerprintBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_text_metrics", textMetricsBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_repetition_metrics", repetitionMetricsBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_word_ngrams", wordNgramsBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_hash_split", hashSplitBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_mixture_keep", mixtureKeepBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_media_header", mediaHeaderBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_image_dhash", imageDHashBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_image_grid", imageGridBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_image_spectral", imageSpectralBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_audio_envelope", audioEnvelopeBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_audio_spectral", audioSpectralBuilder, "built-in")
  }
}
