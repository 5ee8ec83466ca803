package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Perceptual difference-hash (dHash) of a PNG / JPEG (baseline or
  * progressive) / GIF / BMP payload —
  * `struct<dhash: bigint, error: string>` — the image analogue of the
  * text SimHash: a 64-bit fingerprint whose hamming distance tracks
  * VISUAL similarity, so the Manku-blocked pairing machinery
  * ([[graft.ext.Dedup.simhashPairsFromSigs]]) mines image near-dups with
  * the same zero-false-negative pigeonhole guarantee and the same
  * exhaustive `bit_count(xor)` DuckDB oracle over persisted fingerprints.
  *
  * The decode is REAL, not a stub: a constrained decoder for the PNG
  * subset the synthetic fixture corpus emits and a real pipeline's
  * thumbnail tier commonly uses — color types 0 (grayscale), 2 (truecolor
  * RGB), and 3 (palette, the most common thumbnail encoding) at 8-bit
  * depth, 16-bit for gray/RGB (high byte of each big-endian sample, the
  * standard reduction), non-interlaced AND Adam7-interlaced — implemented
  * from the public spec (RFC 2083): chunk walk, zlib-inflate of the
  * concatenated IDAT stream (`java.util.zip.Inflater` — in the JDK, no
  * external libs), and the five scanline filters
  * (None/Sub/Up/Average/Paeth) reversed per row, per interlace pass.
  * RGB converts to luminance by the integer BT.601 weights
  * ((77·R + 150·G + 29·B) >> 8); palette indices go through the same
  * weights applied to their PLTE triple. JPEG payloads decode through
  * [[JpegGray]] (Huffman + dequant + IDCT, luma plane only), GIFs
  * through [[GifGray]] (LZW, first frame), BMPs through [[BmpGray]] —
  * all via the [[ImageCodecs]] magic-byte dispatch. Anything outside the subset
  * (alpha, sub-byte depths, arithmetic-coded JPEG, or a non-image payload)
  * lands in `error` with a null hash — one odd blob poisons its row,
  * never the job, the [[MediaHeader]] contract.
  *
  * dHash (public algorithm, widely documented): box-average the
  * luminance grid down to 9×8, then bit (r·8+c) = 1 iff cell(r, c+1) >
  * cell(r, c) — 64 horizontal gradient signs. Uniform brightness shifts
  * preserve every comparison (the hash is EXACTLY invariant, test-pinned)
  * and small crops/jitter flip few bits, which is what makes hamming
  * radius a perceptual near-dup knob.
  *
  * Scale: one pass over payload bytes per row, scan-stage, nothing but
  * the 8-byte hash leaves the scan. Inflate cost is O(payload) — unlike
  * [[MediaHeader]]'s O(markers) header peek this expression DOES touch
  * every byte, the honest floor for any content fingerprint.
  */
case class ImageDHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ImageDHash.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"image_dhash requires binary, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    ImageDHash.hashRow(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): ImageDHash =
    copy(child = newChild)
}

object ImageDHash {
  val Schema: StructType = StructType(Seq(
    StructField("dhash", LongType, nullable = true),
    StructField("error", StringType, nullable = true)))

  private def err(e: String): InternalRow =
    InternalRow(null, UTF8String.fromString(e))

  private[functions] def hashRow(payload: Array[Byte]): InternalRow =
    ImageCodecs.decode(payload) match {
      case Left(e) => err(e)
      // below the 9×8 sampling grid dHash is degenerate: integer-scaled
      // cell assignment leaves trailing cells empty (cnt = 0), so their
      // gradient bits are constant 0 and DISTINCT tiny images hash
      // near-identically — an 8×8 icon corpus would near-dup-collapse
      // silently. The decode itself stays valid (the codec has no grid);
      // the HASH refuses, per-row, like every other unusable payload.
      case Right(img) if img.width < 9 || img.height < 8 =>
        err("image_too_small")
      case Right(img) => InternalRow(dHash64(img), null)
    }

  /** 9×8 box-average then horizontal gradient signs — deterministic
    * integer arithmetic throughout (sum·countOther comparisons avoid even
    * a division rounding choice). Exposed for the ExtSpec reference
    * re-implementation to diff against. */
  private[graft] def dHash64(img: PngGray.Gray): Long = {
    val cols = 9; val rows = 8
    val w = img.width; val h = img.height
    // box sums (not means): cell boundaries by integer scaling, every
    // source pixel in exactly one cell
    val sum = Array.ofDim[Long](rows, cols)
    val cnt = Array.ofDim[Long](rows, cols)
    var y = 0
    while (y < h) {
      val r = (y.toLong * rows / h).toInt
      var x = 0
      while (x < w) {
        val c = (x.toLong * cols / w).toInt
        sum(r)(c) += img.pix(y * w + x) & 0xff
        cnt(r)(c) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols - 1) {
        // mean(r,c+1) > mean(r,c) without division: cross-multiply counts
        if (sum(r)(c + 1) * cnt(r)(c) > sum(r)(c) * cnt(r)(c + 1))
          bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  def apply(payload: Column): Column =
    GraftColumnBridge.column(ImageDHash(GraftColumnBridge.expression(payload)))
}

/** Constrained PNG codec — the decode behind [[ImageDHash]] plus the
  * fixture-grade encoder the synthetic corpus and tests share. Public
  * byte format throughout (RFC 2083); zlib via `java.util.zip`. */
private[graft] object PngGray {

  /** Decoded luminance grid, row-major bytes. */
  final case class Gray(width: Int, height: Int, pix: Array[Byte])

  private val Sig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** Decode a grayscale (color type 0), RGB (2), or palette (3) PNG to a
    * luminance grid — 8-bit throughout, plus 16-bit for gray/RGB (high
    * byte of each big-endian sample, the standard reduction), both
    * non-interlaced and Adam7-interlaced (the two most common encodings
    * the r15 subset still rejected). Every failure is a Left — the
    * expression contract is throw-free. */
  def decode(payload: Array[Byte]): Either[String, Gray] = {
    val n = payload.length
    var i = 0
    while (i < 8) {
      if (i >= n || payload(i) != Sig(i)) return Left("not_png")
      i += 1
    }
    if (n < 33) return Left("png_truncated")
    if (be32(payload, 8) != 13L || payload(12) != 'I' || payload(13) != 'H' ||
      payload(14) != 'D' || payload(15) != 'R') return Left("png_no_ihdr")
    val w = be32(payload, 16); val h = be32(payload, 20)
    // a hostile header can claim huge dims; cap the decode allocation at
    // 64 MPix so one bad row cannot OOM an executor. Each dimension is
    // capped FIRST: two u32 dims can overflow their Long product (w = h =
    // 0xFFFFFFFF multiplies negative) and slip past a product-only check
    // into a negative allocation or a 4-billion-row unfilter loop.
    val maxPix = 64L * 1024 * 1024
    if (w <= 0 || h <= 0 || w > maxPix || h > maxPix || w * h > maxPix)
      return Left("png_bad_dims")
    val bitDepth = u8(payload, 24); val colorType = u8(payload, 25)
    val interlace = u8(payload, 28)
    // 8- and 16-bit depths (16-bit projects the high byte of each
    // big-endian sample — the standard 8-bit reduction); sub-byte depths
    // stay out of the subset. The spec caps palette depth at 8, so a
    // 16-bit color-type-3 header is invalid, not merely unsupported.
    // Alpha types 4 (gray+alpha) and 6 (RGBA — the dominant web PNG
    // class, r17) decode ALPHA-BLIND: luma comes from the color
    // channels, the alpha sample is carried through the filter
    // arithmetic (it is part of bpp, the left-neighbor distance) and
    // then ignored — the fingerprint-pipeline convention, since a
    // compositing choice would make the luma depend on an arbitrary
    // background color.
    // sub-byte depths (1/2/4 — line art, legacy thumbnails, small
    // palettes) are legal for gray and palette only (r17); color/alpha
    // types require 8 or 16 per the spec
    val subByteOk = (bitDepth == 1 || bitDepth == 2 || bitDepth == 4) &&
      (colorType == 0 || colorType == 3)
    if (bitDepth != 8 && bitDepth != 16 && !subByteOk)
      return Left("png_unsupported_depth")
    if (colorType != 0 && colorType != 2 && colorType != 3 &&
      colorType != 4 && colorType != 6)
      return Left("png_unsupported_color")
    if (colorType == 3 && bitDepth == 16) return Left("png_unsupported_depth")
    // RFC 2083 defines exactly one compression (0 = deflate) and one
    // filter method (0 = adaptive 5-type); a payload declaring anything
    // else would otherwise unfilter as method 0 and yield a
    // wrong-but-plausible fingerprint instead of an error Left — the only
    // unsupported-subset case the original decode silently mis-read
    if (u8(payload, 26) != 0) return Left("png_unsupported_compression")
    if (u8(payload, 27) != 0) return Left("png_unsupported_filter_method")
    // interlace method 1 = Adam7, decoded below; anything else is invalid
    if (interlace > 1) return Left("png_bad_interlace")
    val bytesPerSample = bitDepth / 8 // 0 for sub-byte depths
    val channels = colorType match {
      case 2 => 3; case 4 => 2; case 6 => 4; case _ => 1
    }
    val bitsPerPixel = channels * bitDepth
    // filter distance in BYTES: floor(bits/8) clamped to >= 1 — RFC 2083
    // §6.2 (sub-byte rows filter byte-against-byte at distance 1)
    val bpp = math.max(1, bitsPerPixel / 8)
    // chunk walk: concatenate IDAT payloads, capture PLTE for color type 3
    val idat = new java.io.ByteArrayOutputStream()
    var plte: Array[Byte] = null
    i = 33 // skip IHDR's CRC (8 sig + 4 len + 4 type + 13 data + 4 crc)
    var sawEnd = false
    while (!sawEnd) {
      if (i + 8 > n) return Left("png_truncated")
      val len = be32(payload, i)
      if (len < 0 || len > Int.MaxValue - 12 || i + 12 + len > n)
        return Left("png_truncated")
      val t = new String(payload, i + 4, 4, "US-ASCII")
      if (t == "IDAT") idat.write(payload, i + 8, len.toInt)
      else if (t == "PLTE") {
        // RFC 2083 §4.1.2: exactly one PLTE, 1-256 RGB triples
        if (plte != null) return Left("png_bad_plte")
        plte = java.util.Arrays.copyOfRange(payload, i + 8, i + 8 + len.toInt)
      }
      else if (t == "IEND") sawEnd = true
      i += 12 + len.toInt
    }
    if (colorType == 3) {
      if (plte == null) return Left("png_no_plte")
      if (plte.length == 0 || plte.length % 3 != 0 || plte.length > 768)
        return Left("png_bad_plte")
    }
    val compressed = idat.toByteArray
    if (compressed.isEmpty) return Left("png_no_idat")
    val wI = w.toInt; val hI = h.toInt
    // Adam7 pass geometry (RFC 2083 §2.6): seven sub-images at the
    // standard (x0, y0, dx, dy) offsets/strides, each independently
    // filtered with its own scanlines. Non-interlaced decodes as ONE pass
    // at stride 1 through the SAME loop — no special case to drift.
    val passes: Seq[(Int, Int, Int, Int)] =
      if (interlace == 0) Seq((0, 0, 1, 1))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val dims = passes.map { case (x0, y0, dx, dy) =>
      (math.max(0, (wI - x0 + dx - 1) / dx), math.max(0, (hI - y0 + dy - 1) / dy))
    }
    val rawLen = passes.indices.map { pi =>
      val (wp, hp) = dims(pi)
      if (wp == 0 || hp == 0) 0L
      else hp.toLong * (1L + (wp.toLong * bitsPerPixel + 7) / 8)
    }.sum
    // 64 MPix at the widest bpp (16-bit RGBA = 8) is ~537 MB — inside Int
    // range but still guarded: a future subset widening must not overflow
    if (rawLen > Int.MaxValue - 64) return Left("png_bad_dims")
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(compressed)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val k = inf.inflate(raw, off, raw.length - off)
        // zero progress in ANY state bails: truncated stream
        // (needsInput), preset-dictionary stream (needsDictionary — a
        // hostile FDICT zlib header would otherwise return 0 forever
        // without needing input, an infinite loop inside the
        // expression), or any other stall. The throw-free per-row
        // contract demands an error Left, never a hang.
        if (k == 0) return Left("png_bad_idat")
        off += k
      }
      if (off < raw.length) return Left("png_bad_idat")
    } catch {
      case _: java.util.zip.DataFormatException => return Left("png_bad_idat")
    } finally inf.end()
    // palette LUT (color type 3): indices → BT.601 luminance, built once
    // per image (the same integer weights as the RGB path; 77+150+29 =
    // 256, so an identity-gray palette reproduces its indices exactly)
    val nEntries = if (plte == null) 0 else plte.length / 3
    val lut = new Array[Byte](nEntries)
    var k = 0
    while (k < nEntries) {
      lut(k) = ((77 * u8(plte, 3 * k) + 150 * u8(plte, 3 * k + 1) +
        29 * u8(plte, 3 * k + 2)) >> 8).toByte
      k += 1
    }
    // per pass: unfilter scanlines in place (RFC 2083 §6.2-6.6; the
    // left-neighbor distance is bpp BYTES, which is what makes the same
    // loop correct for 16-bit samples), then project each pixel's
    // luminance straight into its (x0 + i·dx, y0 + j·dy) position
    val pix = new Array[Byte](wI * hI)
    var base = 0
    var pi = 0
    while (pi < passes.length) {
      val (x0, y0, dx, dy) = passes(pi)
      val (wp, hp) = dims(pi)
      if (wp > 0 && hp > 0) {
        val rowBytes = ((wp.toLong * bitsPerPixel + 7) / 8).toInt
        val stride = 1 + rowBytes
        val wB = rowBytes
        var j = 0
        while (j < hp) {
          val rowOff = base + j * stride + 1
          val prevOff = rowOff - stride
          val ft = u8(raw, rowOff - 1)
          if (ft > 4) return Left("png_bad_filter")
          var x = 0
          while (x < wB) {
            val a = if (x >= bpp) u8(raw, rowOff + x - bpp) else 0
            val b = if (j > 0) u8(raw, prevOff + x) else 0
            val c = if (j > 0 && x >= bpp) u8(raw, prevOff + x - bpp) else 0
            val add = ft match {
              case 0 => 0
              case 1 => a
              case 2 => b
              case 3 => (a + b) / 2
              case 4 => // Paeth predictor
                val p = a + b - c
                val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
                if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            }
            raw(rowOff + x) = ((u8(raw, rowOff + x) + add) & 0xff).toByte
            x += 1
          }
          var i = 0
          while (i < wp) {
            val lum: Byte =
              if (bitDepth < 8) {
                // MSB-first bit extraction (RFC 2083 §2.3), then either
                // the palette LUT or the standard max-value scaling
                // (v·255/(2^d−1): 1-bit → 0/255, 2-bit → ×85, 4-bit → ×17)
                val bitPos = i * bitDepth
                val v = (u8(raw, rowOff + (bitPos >> 3)) >>
                  (8 - bitDepth - (bitPos & 7))) & ((1 << bitDepth) - 1)
                if (colorType == 3) {
                  if (v >= nEntries) return Left("png_bad_palette_index")
                  lut(v)
                } else ((v * 255) / ((1 << bitDepth) - 1)).toByte
              } else {
                val sOff = rowOff + i * bpp
                if (colorType == 3) {
                  val idx = u8(raw, sOff)
                  // an index past the palette is an encoding error per
                  // the spec — loud per-row Left, never silent color
                  if (idx >= nEntries) return Left("png_bad_palette_index")
                  lut(idx)
                } else if (colorType == 0 || colorType == 4)
                  raw(sOff) // gray (alpha, if any, ignored); 16-bit: high byte
                else // RGB / RGBA: BT.601 of the three color samples
                  ((77 * u8(raw, sOff) + 150 * u8(raw, sOff + bytesPerSample) +
                    29 * u8(raw, sOff + 2 * bytesPerSample)) >> 8).toByte
              }
            pix((y0 + j * dy) * wI + (x0 + i * dx)) = lum
            i += 1
          }
          j += 1
        }
        base += hp * stride
      }
      pi += 1
    }
    Right(Gray(wI, hI, pix))
  }

  /** Fixture-grade encoder: a valid 8-bit grayscale non-interlaced PNG
    * (filter 0 scanlines, one IDAT, real CRCs) — what the synthetic image
    * corpus and the mutation tests emit. Deterministic for fixed input on
    * a given JVM (Deflater level pinned). */
  def encodeGray(width: Int, height: Int, pix: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && pix.length == width * height,
      s"bad gray buffer: ${width}x$height vs ${pix.length}")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = 0; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk(out, "IHDR", ihdr)
    val raw = new Array[Byte](height * (1 + width))
    var y = 0
    while (y < height) {
      raw(y * (1 + width)) = 0 // filter type None
      System.arraycopy(pix, y * width, raw, y * (1 + width) + 1, width)
      y += 1
    }
    val deflater = new java.util.zip.Deflater(6)
    // zlib's worst case (incompressible input → stored blocks) is
    // input + 5 bytes per 16383-byte block + 6 bytes header/adler; a
    // flat +64 margin tripped on large noise images
    val buf = new Array[Byte](raw.length + 5 * (raw.length / 16383 + 1) + 64)
    deflater.setInput(raw); deflater.finish()
    val m = deflater.deflate(buf)
    require(deflater.finished(), "fixture deflate buffer undersized")
    deflater.end()
    writeChunk(out, "IDAT", java.util.Arrays.copyOf(buf, m))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Fixture-grade palette (color type 3) encoder: PLTE of RGB triples,
    * one index byte per pixel, filter-0 scanlines, real CRCs — the most
    * common thumbnail encoding the decoder subset now covers. With the
    * identity-gray palette (`identityGrayPalette`) the decode reproduces
    * `indices` bit-exact (77+150+29 = 256), which is how the synthetic
    * corpus exercises this path without changing any planted dHash. */
  def encodePalette(width: Int, height: Int, palette: Array[Byte],
      indices: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && indices.length == width * height,
      s"bad index buffer: ${width}x$height vs ${indices.length}")
    require(palette.length >= 3 && palette.length % 3 == 0 && palette.length <= 768,
      s"palette must be 1-256 RGB triples, got ${palette.length} bytes")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = 3; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "PLTE", palette)
    val raw = new Array[Byte](height * (1 + width))
    var y = 0
    while (y < height) {
      raw(y * (1 + width)) = 0 // filter type None
      System.arraycopy(indices, y * width, raw, y * (1 + width) + 1, width)
      y += 1
    }
    val deflater = new java.util.zip.Deflater(6)
    val buf = new Array[Byte](raw.length + 5 * (raw.length / 16383 + 1) + 64)
    deflater.setInput(raw); deflater.finish()
    val m = deflater.deflate(buf)
    require(deflater.finished(), "fixture deflate buffer undersized")
    deflater.end()
    writeChunk(out, "IDAT", java.util.Arrays.copyOf(buf, m))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Fixture-grade SUB-BYTE grayscale encoder (depth 1/2/4, color type
    * 0, filter-0 scanlines, MSB-first packing): `samples` carry values
    * in [0, 2^depth). Decode scales them to 8-bit by the standard
    * max-value rule (×255/(2^d−1)) — the ExtSpec pin. */
  def encodeGraySub(width: Int, height: Int, depth: Int,
      samples: Array[Int]): Array[Byte] = {
    require(depth == 1 || depth == 2 || depth == 4, s"depth 1|2|4, got $depth")
    require(width > 0 && height > 0 && samples.length == width * height,
      s"bad buffer: ${width}x$height vs ${samples.length}")
    require(samples.forall(v => v >= 0 && v < (1 << depth)), "sample range")
    encodeSubByte(width, height, depth, colorType = 0, plte = null, samples)
  }

  /** Fixture-grade SUB-BYTE palette encoder (depth 1/2/4, color type 3):
    * `indices` in [0, 2^depth) select from `palette` RGB triples. */
  def encodePaletteSub(width: Int, height: Int, depth: Int,
      palette: Array[Byte], indices: Array[Int]): Array[Byte] = {
    require(depth == 1 || depth == 2 || depth == 4, s"depth 1|2|4, got $depth")
    require(palette.length >= 3 && palette.length % 3 == 0 && palette.length <= 768,
      s"palette must be 1-256 RGB triples, got ${palette.length} bytes")
    require(indices.forall(v => v >= 0 && v < (1 << depth)), "index range")
    encodeSubByte(width, height, depth, colorType = 3, plte = palette, indices)
  }

  private def encodeSubByte(width: Int, height: Int, depth: Int,
      colorType: Int, plte: Array[Byte], samples: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = depth.toByte; ihdr(9) = colorType.toByte
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk(out, "IHDR", ihdr)
    if (plte != null) writeChunk(out, "PLTE", plte)
    val rowBytes = (width * depth + 7) / 8
    val raw = new Array[Byte](height * (1 + rowBytes))
    var y = 0
    while (y < height) {
      val rowOff = y * (1 + rowBytes)
      raw(rowOff) = 0 // filter type None
      var x = 0
      while (x < width) {
        val bitPos = x * depth
        val sh = 8 - depth - (bitPos & 7)
        raw(rowOff + 1 + (bitPos >> 3)) =
          (raw(rowOff + 1 + (bitPos >> 3)) | (samples(y * width + x) << sh)).toByte
        x += 1
      }
      y += 1
    }
    writeChunk(out, "IDAT", deflateRaw(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Fixture-grade RGBA (color type 6) encoder: 4 bytes/pixel, filter-0
    * scanlines, real CRCs — the dominant web PNG class. The decoder is
    * alpha-blind, so `decode(encodeRgba(w, h, rgba)).pix` equals the
    * BT.601 luminance of the RGB samples whatever the alpha plane
    * carries (the ExtSpec pin). */
  def encodeRgba(width: Int, height: Int, rgba: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && rgba.length == width * height * 4,
      s"bad rgba buffer: ${width}x$height vs ${rgba.length}")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = 6; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk(out, "IHDR", ihdr)
    val stride = 1 + width * 4
    val raw = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      raw(y * stride) = 0 // filter type None
      System.arraycopy(rgba, y * width * 4, raw, y * stride + 1, width * 4)
      y += 1
    }
    writeChunk(out, "IDAT", deflateRaw(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Fixture-grade GRAY+ALPHA (color type 4) encoder: 2 bytes/pixel
    * (gray, alpha), filter-0 scanlines — decode returns the gray plane
    * exactly, alpha-blind. */
  def encodeGrayAlpha(width: Int, height: Int, gray: Array[Byte],
      alpha: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height &&
      alpha.length == width * height,
      s"bad gray+alpha buffers: ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = 4; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk(out, "IHDR", ihdr)
    val stride = 1 + width * 2
    val raw = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      raw(y * stride) = 0
      var x = 0
      while (x < width) {
        raw(y * stride + 1 + x * 2) = gray(y * width + x)
        raw(y * stride + 2 + x * 2) = alpha(y * width + x)
        x += 1
      }
      y += 1
    }
    writeChunk(out, "IDAT", deflateRaw(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Fixture-grade 16-BIT grayscale encoder (depth 16, color type 0,
    * filter-0 scanlines, big-endian sample pairs, real CRCs). `samples`
    * are 0..65535; the decoder's standard high-byte reduction makes
    * `decode(encodeGray16(w, h, s)).pix(i) == (s(i) >>> 8).toByte` —
    * the ExtSpec/ImageIO-parity contract for the depth-16 path. */
  def encodeGray16(width: Int, height: Int, samples: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && samples.length == width * height,
      s"bad 16-bit buffer: ${width}x$height vs ${samples.length}")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 16; ihdr(9) = 0; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk(out, "IHDR", ihdr)
    val stride = 1 + width * 2
    val raw = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      raw(y * stride) = 0 // filter type None
      var x = 0
      while (x < width) {
        val s = samples(y * width + x)
        raw(y * stride + 1 + x * 2) = (s >>> 8).toByte
        raw(y * stride + 2 + x * 2) = s.toByte
        x += 1
      }
      y += 1
    }
    writeChunk(out, "IDAT", deflateRaw(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Fixture-grade Adam7-INTERLACED 8-bit grayscale encoder: the same
    * pixel grid as [[encodeGray]], written as the seven standard passes
    * (each its own filter-0 scanline set) — so
    * `decode(encodeGrayInterlaced(w, h, p)) == decode(encodeGray(w, h, p))`
    * pixel-exact, the ExtSpec deinterlace contract. */
  def encodeGrayInterlaced(width: Int, height: Int, pix: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && pix.length == width * height,
      s"bad gray buffer: ${width}x$height vs ${pix.length}")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = 0; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 1
    writeChunk(out, "IHDR", ihdr)
    val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val body = new java.io.ByteArrayOutputStream()
    passes.foreach { case (x0, y0, dx, dy) =>
      val wp = math.max(0, (width - x0 + dx - 1) / dx)
      val hp = math.max(0, (height - y0 + dy - 1) / dy)
      if (wp > 0 && hp > 0) {
        var j = 0
        while (j < hp) {
          body.write(0) // filter type None
          var i = 0
          while (i < wp) {
            body.write(pix((y0 + j * dy) * width + (x0 + i * dx)) & 0xff)
            i += 1
          }
          j += 1
        }
      }
    }
    writeChunk(out, "IDAT", deflateRaw(body.toByteArray))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** One-shot zlib deflate with the worst-case-sized buffer (stored
    * blocks: input + 5 bytes per 16383-byte block + header/adler) — the
    * sizing every fixture encoder shares. */
  private def deflateRaw(raw: Array[Byte]): Array[Byte] = {
    val deflater = new java.util.zip.Deflater(6)
    val buf = new Array[Byte](raw.length + 5 * (raw.length / 16383 + 1) + 64)
    deflater.setInput(raw); deflater.finish()
    val m = deflater.deflate(buf)
    require(deflater.finished(), "fixture deflate buffer undersized")
    deflater.end()
    java.util.Arrays.copyOf(buf, m)
  }

  /** The 256-entry r=g=b palette whose BT.601 luminance is the identity
    * map — palette decode of gray `indices` returns them unchanged. */
  def identityGrayPalette: Array[Byte] = {
    val p = new Array[Byte](768)
    var k = 0
    while (k < 256) { p(3 * k) = k.toByte; p(3 * k + 1) = k.toByte; p(3 * k + 2) = k.toByte; k += 1 }
    p
  }

  private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); putBe32(len, 0, data.length)
    out.write(len)
    val typB = typ.getBytes("US-ASCII")
    out.write(typB)
    out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(typB); crc.update(data)
    val c = new Array[Byte](4); putBe32(c, 0, crc.getValue.toInt)
    out.write(c)
  }
}
