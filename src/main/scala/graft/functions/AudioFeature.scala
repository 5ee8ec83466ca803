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

/** Deterministic frame-envelope audio descriptor —
  * `struct<feature: array<float>, error: string>` — the audio analogue of
  * [[ImageGridFeature]]: `frames` equal time bins over the mono-mixed
  * samples ([[AudioCodecs]] decode — WAV or FLAC), each bin's MEAN ABSOLUTE amplitude,
  * mean-centered — the aligned-cell tier of the audio dedup family.
  *
  * Sample i of n lands in frame i·F/n — the SAME integer binning rule as
  * the image grid's cells, every sample in exactly one frame — so the
  * descriptor is ORACLE-ABLE end to end: q88 persists the [[AudioSamples]]
  * decode and both engines replay the integer |sample| frame sums from the
  * same parquet; ExtSpec pins this expression's floats bit-identical to
  * the relational twin re-centered driver-side.
  *
  * Gain invariance (the audio analogue of the grid's brightness
  * invariance, but multiplicative): |g·x| = g·|x| for g > 0, and
  * mean-centering commutes with the scale, so a re-levelled copy's
  * centered envelope is exactly g times the original's — COSINE over the
  * descriptor is gain-invariant up to the per-sample integer rounding of
  * the re-encode. Time alignment is NOT provided: a shifted window slides
  * samples across frame boundaries exactly like a crop slides pixels
  * across grid cells, and the r16 shift sweep (SCALE.md) measures where
  * detection collapses — past it, [[AudioSpectralFeature]] is the tier.
  *
  * Scale: one pass over payload bytes per row, scan-stage; `frames`
  * floats per clip leave the scan (256 bytes at the default 64) — the
  * blob-to-descriptor reduction that makes 100 TB of audio joinable. */
case class AudioEnvelopeFeature(child: Expression, frames: Int)
    extends UnaryExpression with CodegenFallback {
  require(frames >= 1 && frames <= 4096,
    s"frames must be 1..4096, got $frames")

  override def dataType: DataType = ImageGridFeature.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"audio_envelope_feature requires binary, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    AudioEnvelopeFeature.featureRow(input.asInstanceOf[Array[Byte]], frames)

  override protected def withNewChildInternal(newChild: Expression): AudioEnvelopeFeature =
    copy(child = newChild)
}

object AudioEnvelopeFeature {

  private def err(e: String): InternalRow =
    InternalRow(null, UTF8String.fromString(e))

  private[functions] def featureRow(payload: Array[Byte], frames: Int): InternalRow =
    AudioCodecs.decode(payload) match {
      case Left(e) => err(e)
      // below one sample per frame the integer binning leaves empty
      // frames (cnt = 0) — the degenerate-tiny refusal every descriptor
      // in this family shares
      case Right(pcm) if pcm.samples.length < frames =>
        err("audio_too_short")
      case Right(pcm) =>
        InternalRow(new GenericArrayData(feature(pcm.samples, frames)), null)
    }

  /** Integer |sample| frame sums + counts under the grid binning rule:
    * sample i lands in frame i·F/n. Exposed for the ExtSpec relational
    * twin and [[feature]]. */
  private[graft] def frameSums(samples: Array[Int], frames: Int): (Array[Long], Array[Long]) = {
    val n = samples.length
    val sum = new Array[Long](frames)
    val cnt = new Array[Long](frames)
    var i = 0
    while (i < n) {
      val f = (i.toLong * frames / n).toInt
      sum(f) += math.abs(samples(i).toLong)
      cnt(f) += 1
      i += 1
    }
    (sum, cnt)
  }

  /** The descriptor: frame means (double sum/cnt), mean-centered by the
    * grand mean accumulated in frame order (fixed fold order ⇒
    * bit-reproducible), cast to float — [[ImageGridFeature.feature]]'s
    * arithmetic over time bins. */
  private[graft] def feature(samples: Array[Int], frames: Int): Array[Float] = {
    val (sum, cnt) = frameSums(samples, frames)
    val means = new Array[Double](frames)
    var grand = 0.0
    var i = 0
    while (i < frames) {
      means(i) = sum(i).toDouble / cnt(i)
      grand += means(i)
      i += 1
    }
    grand /= frames
    val f = new Array[Float](frames)
    i = 0
    while (i < frames) { f(i) = (means(i) - grand).toFloat; i += 1 }
    f
  }

  def apply(payload: Column, frames: Int = 64): Column =
    GraftColumnBridge.column(
      AudioEnvelopeFeature(GraftColumnBridge.expression(payload), frames))
}

/** Deterministic low-band DFT-MAGNITUDE audio descriptor —
  * `struct<feature: array<float>, error: string>` — the TIME-SHIFT-
  * tolerant tier, [[ImageSpectralFeature]]'s construction in one
  * dimension: |F(k)| for k = 1..maxFreq over the mono samples. A time
  * shift changes only the PHASE of each Fourier coefficient, so the
  * magnitudes are invariant to cyclic shifts and approximately invariant
  * to window (re-trim) shifts on locally stationary content — the regime
  * the r16 shift sweep measures the envelope tier OUT of. DC (k = 0) is
  * excluded, so a constant offset is exactly invisible; gain scales every
  * magnitude uniformly, which cosine similarity cancels.
  *
  * O(maxFreq·n) multiply-adds per clip, `StrictMath` trig + fixed
  * summation order ⇒ bit-reproducible on any host and partitioning. Like
  * the image spectral tier the VALUES are engine-only; the family's proof
  * is the q89 persisted-stage soundness oracle (eliminations recomputed
  * as exact cosines from the persisted features, cross-engine) plus the
  * measured shift-sweep cell (SCALE.md r16). */
case class AudioSpectralFeature(child: Expression, maxFreq: Int)
    extends UnaryExpression with CodegenFallback {
  require(maxFreq >= 1 && maxFreq <= 128,
    s"maxFreq must be in [1, 128] (low band), got $maxFreq")

  override def dataType: DataType = ImageGridFeature.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"audio_spectral_feature requires binary, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    AudioSpectralFeature.featureRow(input.asInstanceOf[Array[Byte]], maxFreq)

  override protected def withNewChildInternal(newChild: Expression): AudioSpectralFeature =
    copy(child = newChild)
}

object AudioSpectralFeature {

  private def err(e: String): InternalRow =
    InternalRow(null, UTF8String.fromString(e))

  private[functions] def featureRow(payload: Array[Byte], maxFreq: Int): InternalRow =
    AudioCodecs.decode(payload) match {
      case Left(e) => err(e)
      // below ~2 samples per probed cycle the band aliases — the
      // ImageSpectralFeature refusal bound in one dimension
      case Right(pcm) if pcm.samples.length < 2 * maxFreq + 2 =>
        err("audio_too_short")
      case Right(pcm) =>
        InternalRow(new GenericArrayData(feature(pcm.samples, maxFreq)), null)
    }

  /** |F(k)| for k = 1..maxFreq in fixed order, via the GOERTZEL
    * recurrence (public algorithm): s_i = x_i + 2cos(w)·s_{i-1} − s_{i-2},
    * |F|² = s_{n-1}² + s_{n-2}² − 2cos(w)·s_{n-1}·s_{n-2} — ONE
    * multiply-add per sample per band instead of a cos+sin pair, ~100×
    * cheaper per op than the naive DFT sum (2·maxFreq·n StrictMath trig
    * calls was the honest bench cost of the first cut: ~75 CPU-seconds
    * per 5k-clip corpus). Still bit-reproducible: two trig calls per
    * BAND, then a fixed-order FMA-free recurrence — identical fp ops in
    * identical order on every host and partitioning. The recurrence's
    * rounding differs from the naive sum's by ~n·ulp (≈1e-13 relative at
    * 2048 samples) — the ExtSpec twin diffs against an independent naive
    * DFT within 1e-7, which pins both the algebra and the error bound.
    * Exposed for that twin. */
  private[graft] def feature(samples: Array[Int], maxFreq: Int): Array[Float] = {
    val n = samples.length
    val out = new Array[Float](maxFreq)
    var k = 1
    while (k <= maxFreq) {
      val w = 2.0 * StrictMath.PI * k / n
      val coeff = 2.0 * StrictMath.cos(w)
      var s1 = 0.0; var s2 = 0.0
      var i = 0
      while (i < n) {
        val s0 = samples(i) + coeff * s1 - s2
        s2 = s1; s1 = s0
        i += 1
      }
      // clamp before the sqrt: |F|² is mathematically ≥ 0 but the
      // subtraction cancels catastrophically when the true value is ~0
      // against state ~1e15 (a constant/DC clip — every band exactly
      // zero), and the rounding residue can land slightly NEGATIVE —
      // sqrt would then emit NaN floats silently poisoning every cosine
      // downstream instead of the honest 0.0
      out(k - 1) = StrictMath.sqrt(
        math.max(0.0, s1 * s1 + s2 * s2 - coeff * s1 * s2)).toFloat
      k += 1
    }
    out
  }

  def apply(payload: Column, maxFreq: Int = 24): Column =
    GraftColumnBridge.column(
      AudioSpectralFeature(GraftColumnBridge.expression(payload), maxFreq))
}

/** Decoded-sample dump — `struct<sample_rate: int, channels: int,
  * bits: int, samples: array<int>, error: string>` — the PERSISTABLE form
  * of the [[AudioCodecs]] decode behind [[AudioEnvelopeFeature]] /
  * [[AudioSpectralFeature]], exactly [[ImageLuma]]'s role for the image
  * family: the decode VALUES are engine-only (no DuckDB WAV codec), but
  * everything downstream of the samples is pure relational arithmetic, so
  * q88 persists this table once and both engines replay the envelope's
  * integer frame binning from the SAME parquet. A PROOF artifact:
  * production ships only the descriptor floats out of the scan. */
case class AudioSamples(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = AudioSamples.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"audio_samples requires binary, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    AudioCodecs.decode(input.asInstanceOf[Array[Byte]]) match {
      case Left(e) => InternalRow(null, null, null, null, UTF8String.fromString(e))
      case Right(pcm) =>
        InternalRow(pcm.sampleRate, pcm.channels, pcm.bitsPerSample,
          new GenericArrayData(pcm.samples), null)
    }

  override protected def withNewChildInternal(newChild: Expression): AudioSamples =
    copy(child = newChild)
}

object AudioSamples {
  val Schema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("bits", IntegerType, nullable = true),
    StructField("samples", ArrayType(IntegerType), nullable = true),
    StructField("error", StringType, nullable = true)))

  def apply(payload: Column): Column =
    GraftColumnBridge.column(AudioSamples(GraftColumnBridge.expression(payload)))
}

/** Per-SEGMENT envelope descriptors in ONE decode —
  * `struct<features: array<array<float>>, error: string>` — the scan
  * stage of the audio TRIM tier (r19, the r18 verdict's #2 item): a
  * head-trimmed re-encode (the podcast/ad cut) is invisible to the
  * whole-clip envelope (shift-collapse at one frame, SCALE.md r16) and
  * beyond the spectral tier past 512 samples, but windows of FIXED
  * absolute length re-align once the cut consumes whole windows — the
  * audio analogue of the video frame: `segments` consecutive windows of
  * `segmentSamples` mono samples each, each window's [[
  * AudioEnvelopeFeature]] descriptor (`frames` bins, mean-centered), so
  * a clip trimmed by t·segmentSamples shares `segments − t` IDENTICAL
  * windows with its original and any-segment matching recovers it (the
  * r19 trim sweep measures the law, including the envelope variant's
  * honest off-grid collapse — window boundaries are absolute, so a
  * half-window cut misaligns every window). `spectral = true` swaps the
  * per-window descriptor for the |DFT| magnitudes ([[
  * AudioSpectralFeature]]'s Goertzel math over the window; `frames` is
  * then maxFreq): magnitudes are blind to the phase an intra-window
  * shift changes, so an OFF-GRID cut within the r16-measured 512-sample
  * shift band still matches — the off-grid recovery the envelope
  * variant honestly lacks (the r19 off-grid sweep measures it).
  *
  * One [[AudioCodecs]] decode per clip (NOT per segment — the samples
  * array is sliced in memory); windows running past the clip's end are
  * null entries (fewer-segments clips match on what they have — the
  * null-fingerprint convention). `segments · frames` floats per clip
  * leave the scan. */
case class AudioSegmentFeatures(child: Expression, segmentSamples: Int,
    segments: Int, frames: Int, spectral: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  require(segments >= 1 && segments <= 64,
    s"segments must be 1..64 (the fid packing bound), got $segments")
  require(frames >= 1 && frames <= 4096, s"frames must be 1..4096, got $frames")
  require(segmentSamples >= frames,
    s"segmentSamples ($segmentSamples) must be >= frames ($frames): below " +
      "one sample per bin the integer binning leaves empty frames")
  // spectral windows: `frames` is then maxFreq and the window must hold
  // ~2 samples per probed cycle (the AudioSpectralFeature alias bound)
  require(!spectral || (frames <= 128 && segmentSamples >= 2 * frames + 2),
    s"spectral windows need frames (maxFreq) <= 128 and segmentSamples >= " +
      s"2*maxFreq+2, got ($segmentSamples, $frames)")

  override def dataType: DataType = AudioSegmentFeatures.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"audio_segment_features requires binary, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    AudioCodecs.decode(input.asInstanceOf[Array[Byte]]) match {
      case Left(e) => InternalRow(null, UTF8String.fromString(e))
      case Right(pcm) if pcm.samples.length < segmentSamples =>
        // not even one full window — the descriptor family's
        // degenerate-tiny refusal (a partial window would make the
        // trim re-alignment guarantee a lie at the clip tail)
        InternalRow(null, UTF8String.fromString("audio_too_short"))
      case Right(pcm) =>
        val out = new Array[Any](segments)
        var k = 0
        while (k < segments) {
          val from = k * segmentSamples
          val until = from + segmentSamples
          out(k) =
            if (until > pcm.samples.length) null
            else {
              val w = java.util.Arrays.copyOfRange(pcm.samples, from, until)
              new GenericArrayData(
                if (spectral) AudioSpectralFeature.feature(w, frames)
                else AudioEnvelopeFeature.feature(w, frames))
            }
          k += 1
        }
        InternalRow(new GenericArrayData(out), null)
    }

  override protected def withNewChildInternal(newChild: Expression): AudioSegmentFeatures =
    copy(child = newChild)
}

object AudioSegmentFeatures {
  val Schema: StructType = StructType(Seq(
    StructField("features",
      ArrayType(ArrayType(FloatType, containsNull = false), containsNull = true),
      nullable = true),
    StructField("error", StringType, nullable = true)))

  def apply(payload: Column, segmentSamples: Int, segments: Int,
      frames: Int, spectral: Boolean): Column =
    GraftColumnBridge.column(AudioSegmentFeatures(
      GraftColumnBridge.expression(payload), segmentSamples, segments, frames,
      spectral))
}
