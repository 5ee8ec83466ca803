package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** MJPEG-in-AVI container plumbing — the video CONTENT tier's missing
  * rung (r17 verdict item #2): AVI is RIFF (the same chunk grammar
  * [[WavPcm]] walks, public MS/IBM spec), and an MJPEG stream's frames
  * are plain baseline JPEGs, which [[JpegGray]] already decodes. This
  * object extracts frame 0's bytes from the `movi` list; [[ImageCodecs]]
  * routes `RIFF....AVI ` payloads through it and then the ordinary JPEG
  * decode — so dHash, the grid/spectral descriptors, and the luma proof
  * artifact all apply to MJPEG videos as FIRST-FRAME features with zero
  * new feature machinery, replacing the planner's former
  * `expectedDetection 0.0` content refusal with a measured law.
  *
  * Frame 0 is the honest scan-stage reduction at 100 TB: one frame's
  * decode per clip (the image tier's measured cost), not a full-stream
  * decode — re-encoded copies of the SAME video share frame-0 content
  * exactly as re-encoded images share pixels. TRIM-tolerant matching
  * samples several frames through [[AviFrameBytes]] +
  * [[graft.ext.Multimodal.videoFrameFingerprints]] (any-frame pairing;
  * the r18 trim sweep measures the law); the container walk below
  * exposes any frame by index.
  *
  * Extraction rules (strict, bounded, throw-free like every codec here):
  * `RIFF....AVI ` else `not_avi`; chunk walk with the RIFF odd-size pad
  * rule; a declared size running past the payload `avi_chunk_truncated`;
  * the first `LIST movi`'s first `..dc`/`..db` stream chunk is the frame
  * (one `LIST rec ` nesting level is walked — the grouping AVI muxers
  * emit for interleaving); no movi list `avi_no_movi`; an empty one
  * `avi_no_frames`.
  *
  * Reference behavior: the reference pipeline treats storage objects as
  * opaque blobs fetched whole (`/root/reference/utils/auto_healer.py:
  * 59-72`, `dag/self_healing_pipeline.py:86-98`); content decode is this
  * engine's extension surface, same as every codec here.
  */
/** Native frame-bytes extraction — `avi_frame_bytes(payload, index)` →
  * the index-th stream frame's raw bytes (a baseline JPEG for MJPEG), or
  * NULL when the payload is not a decodable AVI or carries no such frame
  * (the undecodable-survives convention every fingerprint shares; the
  * specific refusal is [[MediaHeader]]'s business). The scan-stage
  * building block of the MULTI-FRAME video tier: compose with
  * [[ImageDHash]] to fingerprint frame k, explode k = 0..K−1 to
  * fingerprint a sample of frames in ONE pass over the media table —
  * the trim-tolerant any-frame matching [[graft.ext.Multimodal
  * .videoFrameFingerprints]] builds. O(payload) per evaluation (a
  * bounded container walk + one copy of the frame bytes). */
case class AviFrameBytes(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types._

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"avi_frame_bytes requires (binary, int), got ($l, $r)")
    }

  override protected def nullSafeEval(payload: Any, index: Any): Any = {
    val idx = index.asInstanceOf[Int]
    if (idx < 0) null
    else MjpegAvi.frameBytes(payload.asInstanceOf[Array[Byte]], idx)
      .getOrElse(null)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AviFrameBytes = copy(left = newLeft, right = newRight)
}

object AviFrameBytes {
  def apply(payload: org.apache.spark.sql.Column,
      index: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(AviFrameBytes(
      org.apache.spark.sql.GraftColumnBridge.expression(payload),
      org.apache.spark.sql.GraftColumnBridge.expression(index)))
}

private[graft] object MjpegAvi {

  private def ascii(b: Array[Byte], off: Int, s: String): Boolean = {
    if (off + s.length > b.length) return false
    var i = 0
    while (i < s.length) {
      if (b(off + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  def isAvi(b: Array[Byte]): Boolean =
    b.length >= 12 && ascii(b, 0, "RIFF") && ascii(b, 8, "AVI ")

  /** Frame `index`'s bytes from the first `LIST movi` (default frame 0). */
  def frameBytes(b: Array[Byte], index: Int = 0): Either[String, Array[Byte]] = {
    val n = b.length
    if (!isAvi(b)) return Left("not_avi")
    var off = 12
    while (off + 8 <= n) {
      val size = le32(b, off + 4)
      if (size > Int.MaxValue - 8 || off + 8 + size > n)
        return Left("avi_chunk_truncated")
      if (ascii(b, off, "LIST") && size >= 4 && ascii(b, off + 8, "movi"))
        return frameInMovi(b, off + 12, off + 8 + size.toInt, index,
          allowRec = true)
      off += 8 + size.toInt + (size.toInt & 1) // RIFF pad rule
    }
    Left("avi_no_movi")
  }

  /** Walk stream chunks in [p, end); `..dc`/`..db` are frames; one
    * `LIST rec ` nesting level is entered. Returns the `index`-th frame
    * counted across the walk. */
  private def frameInMovi(b: Array[Byte], start: Int, end: Int, index: Int,
      allowRec: Boolean): Either[String, Array[Byte]] = {
    var p = start
    var seen = 0
    while (p + 8 <= end) {
      val csize = le32(b, p + 4)
      if (csize > Int.MaxValue - 8 || p + 8 + csize > end)
        return Left("avi_chunk_truncated")
      if (b(p + 2) == 'd' && (b(p + 3) == 'c' || b(p + 3) == 'b')) {
        if (seen == index)
          return Right(java.util.Arrays.copyOfRange(b, p + 8, p + 8 + csize.toInt))
        seen += 1
      } else if (allowRec && ascii(b, p, "LIST") && csize >= 4 &&
        ascii(b, p + 8, "rec ")) {
        frameInMovi(b, p + 12, p + 8 + csize.toInt, index - seen,
          allowRec = false) match {
          case r @ Right(_) => return r
          case Left("avi_no_frames") => () // count frames inside and move on
          case l @ Left(_) => return l
        }
        // count the rec-list's frames toward the index
        seen += countFrames(b, p + 12, p + 8 + csize.toInt)
      }
      p += 8 + csize.toInt + (csize.toInt & 1)
    }
    Left("avi_no_frames")
  }

  private def countFrames(b: Array[Byte], start: Int, end: Int): Int = {
    var p = start
    var seen = 0
    while (p + 8 <= end) {
      val csize = le32(b, p + 4)
      if (csize > Int.MaxValue - 8 || p + 8 + csize > end) return seen
      if (b(p + 2) == 'd' && (b(p + 3) == 'c' || b(p + 3) == 'b')) seen += 1
      p += 8 + csize.toInt + (csize.toInt & 1)
    }
    seen
  }

  // ───── Fixture/corpus encoder (canonical layout, fixed offsets) ─────

  private def wLe16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }

  private def wLe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  private def wAsc(out: java.io.ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"))

  /** A canonical single-stream MJPEG AVI around pre-encoded JPEG frames
    * (the caller encodes frames with [[JpegGray.encodeGray]] etc. — this
    * is container plumbing only). Layout is FIXED-OFFSET: `avih` body at
    * byte 32 (width/height at 64/68), so a DuckDB hex replay can read
    * the same fields the [[MediaHeader]] avi branch surfaces. */
  def encode(width: Int, height: Int, frames: Seq[Array[Byte]],
      fps: Int = 25): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    require(fps > 0, s"bad fps $fps")
    val maxFrame = frames.map(_.length).max
    val framesBytes = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + framesBytes
    val total = 12 + (8 + hdrlSize) + (8 + moviSize)
    val out = new java.io.ByteArrayOutputStream(total)
    wAsc(out, "RIFF"); wLe32(out, total - 8); wAsc(out, "AVI ")
    // ── LIST hdrl ──
    wAsc(out, "LIST"); wLe32(out, hdrlSize); wAsc(out, "hdrl")
    wAsc(out, "avih"); wLe32(out, 56)
    wLe32(out, 1000000 / fps) // dwMicroSecPerFrame (byte 32)
    wLe32(out, 0); wLe32(out, 0); wLe32(out, 0) // maxbps, padding, flags
    wLe32(out, frames.length) // dwTotalFrames (byte 48)
    wLe32(out, 0); wLe32(out, 1) // initial frames, streams
    wLe32(out, maxFrame) // suggested buffer
    wLe32(out, width); wLe32(out, height) // bytes 64 / 68
    wLe32(out, 0); wLe32(out, 0); wLe32(out, 0); wLe32(out, 0) // reserved
    // ── LIST strl ──
    wAsc(out, "LIST"); wLe32(out, strlSize); wAsc(out, "strl")
    wAsc(out, "strh"); wLe32(out, 56)
    wAsc(out, "vids"); wAsc(out, "MJPG")
    wLe32(out, 0) // flags
    wLe16(out, 0); wLe16(out, 0) // priority, language
    wLe32(out, 0) // initial frames
    wLe32(out, 1); wLe32(out, fps) // scale, rate
    wLe32(out, 0); wLe32(out, frames.length) // start, length
    wLe32(out, maxFrame); wLe32(out, 0); wLe32(out, 0) // bufsize, quality, samplesize
    wLe16(out, 0); wLe16(out, 0); wLe16(out, width); wLe16(out, height) // rcFrame
    wAsc(out, "strf"); wLe32(out, 40) // BITMAPINFOHEADER
    wLe32(out, 40); wLe32(out, width); wLe32(out, height)
    wLe16(out, 1); wLe16(out, 24) // planes, bit count
    wAsc(out, "MJPG") // biCompression
    wLe32(out, width * height * 3)
    wLe32(out, 0); wLe32(out, 0); wLe32(out, 0); wLe32(out, 0)
    // ── LIST movi ──
    wAsc(out, "LIST"); wLe32(out, moviSize); wAsc(out, "movi")
    frames.foreach { f =>
      wAsc(out, "00dc"); wLe32(out, f.length)
      out.write(f, 0, f.length)
      if ((f.length & 1) == 1) out.write(0) // RIFF pad
    }
    out.toByteArray
  }
}
