package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic block-mean image descriptor —
  * `struct<feature: array<float>, error: string>` — the CROP-TOLERANT tier
  * of the image dedup family that [[ImageDHash]] cannot provide.
  *
  * Motivation is the engine's own measurement (SCALE.md r15, "The
  * geometric boundary"): radius-3 dHash detection collapses 0.186 → 0.000
  * at a 1-4 pixel crop shift, because the 9×8 box grid misaligns and every
  * gradient sign can flip — while detection of pure pixel churn stays
  * 0.985+ to 10%. dHash answers "same pixels, slightly perturbed"; this
  * descriptor answers "same CONTENT, slightly re-framed": a `gridW`×`gridH`
  * box-mean luminance grid (the same integer binning as dHash's 9×8,
  * generalized), mean-centered so a uniform brightness shift cancels, cast
  * to float — an embedding over the decoded image that feeds the EXISTING
  * embedding-LSH survivor family ([[graft.ext.Similarity.nearDupAssign]])
  * verbatim: cosine of two shifted crops of the same smooth content stays
  * high because each cell mean moves by only the few pixel rows/columns
  * that slid across its boundary, where every dHash gradient sign can flip.
  *
  * NO model weights, NO external libs — the decode is the same constrained
  * [[PngGray]] codec dHash uses, and the descriptor arithmetic is exact
  * integer cell sums followed by fixed-order IEEE divisions, so the value
  * is bit-reproducible on any host and partitioning. The cell sums/counts
  * are pure relational arithmetic over the decoded pixels, which is what
  * makes the descriptor ORACLE-ABLE: q85 persists the [[ImageLuma]] pixel
  * table and both engines replay the binning from the same parquet
  * (integer-exact); ExtSpec pins this expression's floats bit-identical to
  * the relational twin's cells re-centered driver-side.
  *
  * Brightness invariance: a uniform +c shift moves every cell mean by
  * exactly c when cell counts are powers of two (the 32×32/8×8 default —
  * all divisions exact), and by ≤ 1 ulp otherwise; mean-centering cancels
  * it. Scale invariance is NOT provided (nor wanted: global contrast is
  * content).
  *
  * Scale: one pass over payload bytes per row, scan-stage; gridW·gridH
  * floats per image leave the scan (256 bytes at the 8×8 default).
  */
case class ImageGridFeature(child: Expression, gridW: Int, gridH: Int)
    extends UnaryExpression with CodegenFallback {
  require(gridW >= 1 && gridH >= 1 && gridW * gridH <= 4096,
    s"grid must be 1x1..4096 cells, got ${gridW}x$gridH")

  override def dataType: DataType = ImageGridFeature.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"image_grid_feature requires binary, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    ImageGridFeature.featureRow(input.asInstanceOf[Array[Byte]], gridW, gridH)

  override protected def withNewChildInternal(newChild: Expression): ImageGridFeature =
    copy(child = newChild)
}

object ImageGridFeature {
  val Schema: StructType = StructType(Seq(
    StructField("feature", ArrayType(FloatType), nullable = true),
    StructField("error", StringType, nullable = true)))

  private def err(e: String): InternalRow =
    InternalRow(null, UTF8String.fromString(e))

  private[functions] def featureRow(payload: Array[Byte], gw: Int, gh: Int): InternalRow =
    ImageCodecs.decode(payload) match {
      case Left(e) => err(e)
      // below the grid the integer binning leaves empty cells (cnt = 0) —
      // the same degenerate-tiny-image refusal as ImageDHash
      case Right(img) if img.width < gw || img.height < gh =>
        err("image_too_small")
      case Right(img) =>
        InternalRow(new GenericArrayData(feature(img, gw, gh)), null)
    }

  /** Integer cell sums + counts under the SAME binning rule as
    * [[ImageDHash.dHash64]]: source pixel (x, y) lands in cell
    * (x·gw / w, y·gh / h) — every pixel in exactly one cell. Exposed for
    * the ExtSpec relational twin and [[feature]]. */
  private[graft] def cellSums(img: PngGray.Gray, gw: Int, gh: Int): (Array[Long], Array[Long]) = {
    val w = img.width; val h = img.height
    val sum = new Array[Long](gw * gh)
    val cnt = new Array[Long](gw * gh)
    var y = 0
    while (y < h) {
      val r = (y.toLong * gh / h).toInt
      var x = 0
      while (x < w) {
        val c = (x.toLong * gw / w).toInt
        sum(r * gw + c) += img.pix(y * w + x) & 0xff
        cnt(r * gw + c) += 1
        x += 1
      }
      y += 1
    }
    (sum, cnt)
  }

  /** The descriptor from a decoded image: cell means (double sum/cnt),
    * mean-centered by the grand mean of cell means accumulated in cell
    * index order (fixed fold order ⇒ bit-reproducible), cast to float. */
  private[graft] def feature(img: PngGray.Gray, gw: Int, gh: Int): Array[Float] = {
    val (sum, cnt) = cellSums(img, gw, gh)
    val n = gw * gh
    val means = new Array[Double](n)
    var grand = 0.0
    var i = 0
    while (i < n) {
      means(i) = sum(i).toDouble / cnt(i)
      grand += means(i)
      i += 1
    }
    grand /= n
    val f = new Array[Float](n)
    i = 0
    while (i < n) { f(i) = (means(i) - grand).toFloat; i += 1 }
    f
  }

  def apply(payload: Column, gridW: Int = 8, gridH: Int = 8): Column =
    GraftColumnBridge.column(
      ImageGridFeature(GraftColumnBridge.expression(payload), gridW, gridH))
}

/** Deterministic low-band DFT-MAGNITUDE descriptor —
  * `struct<feature: array<float>, error: string>` — the TRANSLATION-
  * INVARIANT tier of the image dedup family.
  *
  * Why it exists beside [[ImageGridFeature]]: the r16 crop sweep measured
  * the block-mean grid recovering only the 1 px band (detection 0.81
  * where dHash reads 0.186) and collapsing by 2-4 px on content whose
  * spatial period approaches the shift — ANY aligned-cell descriptor
  * decorrelates with the content. The classic deterministic fix
  * (Fourier-Mellin's first step, public knowledge) is the magnitude
  * spectrum: a spatial shift changes only the PHASE of each Fourier
  * coefficient, so |F(u, v)| over a low-frequency band is invariant to
  * cyclic shifts, approximately invariant to window (crop) shifts on
  * locally stationary content, and EXACTLY blind to uniform brightness
  * (the DC term is excluded; every other coefficient of a constant is a
  * zero-sum of roots of unity).
  *
  * The feature is |F(u, v)| for the non-redundant half-plane of the
  * `maxFreq`-band (u = 0, 1 ≤ v ≤ maxFreq; 1 ≤ u ≤ maxFreq,
  * −maxFreq ≤ v ≤ maxFreq — conjugate symmetry of real signals makes the
  * other half duplicate magnitudes), in fixed (u, v) order:
  * maxFreq·(2·maxFreq + 2) − maxFreq... = maxFreq + maxFreq·(2·maxFreq+1)
  * values (24 floats at the default 3). Computed separably (row DFT at
  * the u frequencies, then column DFT at the v frequencies) —
  * O(maxFreq·w·h) multiply-adds per image, cheaper than the zlib inflate
  * that precedes it. `StrictMath` trig + fixed summation order ⇒
  * bit-reproducible on any host and partitioning.
  *
  * NO model weights, NO external libs. Like the simhash/dHash signatures
  * the VALUES are engine-only; the family's proof is the q86
  * persisted-stage soundness oracle (eliminations recomputed as exact
  * cosines from the persisted features, cross-engine) plus the measured
  * crop-sweep recovery cell (SCALE.md r16). */
case class ImageSpectralFeature(child: Expression, maxFreq: Int)
    extends UnaryExpression with CodegenFallback {
  require(maxFreq >= 1 && maxFreq <= 8,
    s"maxFreq must be in [1, 8] (low band; 8 -> 152 floats), got $maxFreq")

  override def dataType: DataType = ImageGridFeature.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"image_spectral_feature requires binary, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    ImageSpectralFeature.featureRow(input.asInstanceOf[Array[Byte]], maxFreq)

  override protected def withNewChildInternal(newChild: Expression): ImageSpectralFeature =
    copy(child = newChild)
}

object ImageSpectralFeature {

  private def err(e: String): InternalRow =
    InternalRow(null, UTF8String.fromString(e))

  private[functions] def featureRow(payload: Array[Byte], maxFreq: Int): InternalRow =
    ImageCodecs.decode(payload) match {
      case Left(e) => err(e)
      // below ~2 samples per probed cycle the band aliases — refuse like
      // the other degenerate-tiny-image hashes
      case Right(img) if img.width < 2 * maxFreq + 2 || img.height < 2 * maxFreq + 2 =>
        err("image_too_small")
      case Right(img) =>
        InternalRow(new GenericArrayData(feature(img, maxFreq)), null)
    }

  /** |F(u, v)| over the half-plane band, fixed order: (0, 1..maxFreq)
    * then (u, v) for u = 1..maxFreq, v = -maxFreq..maxFreq. Exposed for
    * the ExtSpec reference re-implementation to diff against. */
  private[graft] def feature(img: PngGray.Gray, maxFreq: Int): Array[Float] = {
    val w = img.width; val h = img.height
    // row-direction DFT at u = 0..maxFreq: per row y, the complex
    // G_u(y) = sum_x p(x,y) · e^(-2πi·u·x/w), via per-u trig tables
    val nu = maxFreq + 1
    val cosX = Array.ofDim[Double](nu, w)
    val sinX = Array.ofDim[Double](nu, w)
    var u = 0
    while (u < nu) {
      var x = 0
      while (x < w) {
        val a = -2.0 * StrictMath.PI * u * x / w
        cosX(u)(x) = StrictMath.cos(a); sinX(u)(x) = StrictMath.sin(a)
        x += 1
      }
      u += 1
    }
    val re = Array.ofDim[Double](nu, h)
    val im = Array.ofDim[Double](nu, h)
    var y = 0
    while (y < h) {
      u = 0
      while (u < nu) {
        var sr = 0.0; var si = 0.0
        var x = 0
        while (x < w) {
          val p = (img.pix(y * w + x) & 0xff).toDouble
          sr += p * cosX(u)(x); si += p * sinX(u)(x)
          x += 1
        }
        re(u)(y) = sr; im(u)(y) = si
        u += 1
      }
      y += 1
    }
    // column-direction DFT at each band (u, v); complex multiply then
    // magnitude. v < 0 uses cos(-a) = cos(a), sin(-a) = -sin(a).
    def mag(u: Int, v: Int): Double = {
      var fr = 0.0; var fi = 0.0
      var yy = 0
      while (yy < h) {
        val a = -2.0 * StrictMath.PI * v * yy / h
        val c = StrictMath.cos(a); val s = StrictMath.sin(a)
        val gr = re(u)(yy); val gi = im(u)(yy)
        fr += gr * c - gi * s
        fi += gr * s + gi * c
        yy += 1
      }
      StrictMath.sqrt(fr * fr + fi * fi)
    }
    val out = new Array[Float](maxFreq + maxFreq * (2 * maxFreq + 1))
    var i = 0
    var v = 1
    while (v <= maxFreq) { out(i) = mag(0, v).toFloat; i += 1; v += 1 }
    u = 1
    while (u <= maxFreq) {
      v = -maxFreq
      while (v <= maxFreq) { out(i) = mag(u, v).toFloat; i += 1; v += 1 }
      u += 1
    }
    out
  }

  def apply(payload: Column, maxFreq: Int = 3): Column =
    GraftColumnBridge.column(
      ImageSpectralFeature(GraftColumnBridge.expression(payload), maxFreq))
}

/** Decoded-luminance dump — `struct<width: int, height: int,
  * pix: array<int>, error: string>` — the PERSISTABLE form of the
  * [[PngGray]] decode behind [[ImageDHash]] and [[ImageGridFeature]].
  *
  * Exists for exactly one reason: the decode VALUES are engine-only (no
  * DuckDB PNG codec), but everything DOWNSTREAM of the pixels is pure
  * relational arithmetic — so q85 persists this table once and both
  * engines replay the descriptor's integer cell binning from the SAME
  * parquet (the q71/q72/q80 persisted-stage proof shape applied to the
  * decode itself). `array<int>` rather than binary so the oracle unnests
  * with list arithmetic instead of per-byte hex slicing.
  *
  * Scale: this is a PROOF artifact, not the production path — production
  * ships only the 8-byte dHash or the gridW·gridH-float descriptor out of
  * the scan; pixels never normally leave it. */
case class ImageLuma(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ImageLuma.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"image_luma requires binary, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    ImageCodecs.decode(input.asInstanceOf[Array[Byte]]) match {
      case Left(e) => InternalRow(null, null, null, UTF8String.fromString(e))
      case Right(img) =>
        val px = new Array[Int](img.pix.length)
        var i = 0
        while (i < px.length) { px(i) = img.pix(i) & 0xff; i += 1 }
        InternalRow(img.width, img.height, new GenericArrayData(px), null)
    }

  override protected def withNewChildInternal(newChild: Expression): ImageLuma =
    copy(child = newChild)
}

object ImageLuma {
  val Schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("pix", ArrayType(IntegerType), nullable = true),
    StructField("error", StringType, nullable = true)))

  def apply(payload: Column): Column =
    GraftColumnBridge.column(ImageLuma(GraftColumnBridge.expression(payload)))
}
