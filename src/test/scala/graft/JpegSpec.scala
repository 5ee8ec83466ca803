package graft

import org.apache.spark.sql.functions._

import graft.functions.{ImageCodecs, JpegGray, PngGray}

/** The baseline-JPEG codec's contract (r17 verdict item #1): ±1 ImageIO
  * parity on own AND foreign encodes, bit-exact chroma entropy-skip sync,
  * restart handling, loud error classes, never-throws hostile fuzz, and
  * the [[ImageCodecs]] dispatch that feeds every image tier. */
class JpegSpec extends SparkSpec {
  import spark.implicits._

  private def imageioDecode(bytes: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  private def imageioEncode(bi: java.awt.image.BufferedImage, quality: Float,
      progressive: Boolean = false): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), p)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  private def grayBI(w: Int, h: Int, pix: Array[Byte]): java.awt.image.BufferedImage = {
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, pix(y * w + x) & 0xff)
    bi
  }

  private def rgbBI(w: Int, h: Int, pix: Array[Byte]): java.awt.image.BufferedImage = {
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = pix(y * w + x) & 0xff
      bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    bi
  }

  test("JpegGray: ImageIO parity +-1 on own and foreign encodes (gray, 4:2:0, restarts)") {
    // T.81 mandates IDCT ACCURACY (IEEE 1180), not bit-parity — so the
    // pin is ±1 per sample, and the PngGray-style bit-exact pins live in
    // the sync/restart test below where OUR decoder is both sides
    for (seed <- 1 to 25) {
      val r = new scala.util.Random(seed)
      val w = 1 + r.nextInt(48); val h = 1 + r.nextInt(48)
      // alternate smooth content (typical) and full noise (stresses the
      // AC run-length/ZRL paths with dense high-frequency coefficients)
      val pix =
        if (seed % 2 == 0) graft.ext.Multimodal.patternPixels(seed.toLong, w, h)
        else Array.fill[Byte](w * h)(r.nextInt(256).toByte)
      val q = 50 + r.nextInt(51)
      val own = JpegGray.encodeGray(w, h, pix, q,
        restartInterval = if (seed % 3 == 0) 1 + r.nextInt(4) else 0)
      val ours = JpegGray.decode(own)
      assert(ours.isRight, s"seed $seed ${w}x$h q=$q: $ours")
      val ref = imageioDecode(own)
      assert(ref != null && ref.getWidth == w && ref.getHeight == h, s"seed $seed")
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs((ours.toOption.get.pix(y * w + x) & 0xff) -
          ref.getRaster.getSample(x, y, 0))
        assert(d <= 1, s"gray seed $seed ($x,$y): delta $d")
      }
      // our 4:2:0 with NEUTRAL chroma: ImageIO's YCbCr→RGB is exactly
      // R=G=B=Y there, so the R channel is the same ±1 pin
      val ownC = JpegGray.encodeColor420(w, h, pix, quality = q)
      val oursC = JpegGray.decode(ownC)
      assert(oursC.isRight, s"seed $seed color: $oursC")
      val refC = imageioDecode(ownC)
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs((oursC.toOption.get.pix(y * w + x) & 0xff) -
          ((refC.getRGB(x, y) >> 16) & 0xff))
        assert(d <= 1, s"color seed $seed ($x,$y): delta $d")
      }
      // FOREIGN encodes — ImageIO's own writer (its tables, its FDCT, its
      // 4:2:0 for RGB): our decode vs ImageIO's decode of the same bytes.
      // The RGB case adds the YCbCr→RGB→BT.601 round trip on the
      // reference side, still within ±1 on gray content (Cb=Cr≈128).
      val fGray = imageioEncode(grayBI(w, h, pix), 0.5f + r.nextInt(5) / 10.0f)
      JpegGray.decode(fGray) match {
        case Right(g) =>
          val ref2 = imageioDecode(fGray)
          for (y <- 0 until h; x <- 0 until w)
            assert(math.abs((g.pix(y * w + x) & 0xff) -
              ref2.getRaster.getSample(x, y, 0)) <= 1,
              s"foreign gray seed $seed ($x,$y)")
        case Left(e) => fail(s"foreign gray seed $seed: $e")
      }
      val fColor = imageioEncode(rgbBI(w, h, pix), 0.5f + r.nextInt(5) / 10.0f)
      JpegGray.decode(fColor) match {
        case Right(g) =>
          val ref3 = imageioDecode(fColor)
          for (y <- 0 until h; x <- 0 until w) {
            val rgb = ref3.getRGB(x, y)
            val lum = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
              29 * (rgb & 0xff)) >> 8
            assert(math.abs((g.pix(y * w + x) & 0xff) - lum) <= 1,
              s"foreign color seed $seed ($x,$y)")
          }
        case Left(e) => fail(s"foreign color seed $seed: $e")
      }
    }
  }

  test("JpegGray: chroma entropy-skip sync, restart equivalence, error classes") {
    // NOISY chroma planes: a single lost bit in the chroma Huffman walk
    // would desync every later luma block — equality with the gray
    // encode's plane (same FDCT/quant) is the bit-exact sync proof
    for (seed <- 1 to 10) {
      val r = new scala.util.Random(seed + 50)
      val w = 1 + r.nextInt(40); val h = 1 + r.nextInt(40)
      val pix = Array.fill[Byte](w * h)(r.nextInt(256).toByte)
      val cw = (w + 1) / 2; val ch = (h + 1) / 2
      val cb = Array.fill[Byte](cw * ch)(r.nextInt(256).toByte)
      val cr = Array.fill[Byte](cw * ch)(r.nextInt(256).toByte)
      val q = 40 + r.nextInt(61)
      val gray = JpegGray.decode(JpegGray.encodeGray(w, h, pix, q)).toOption.get
      val color = JpegGray.decode(
        JpegGray.encodeColor420(w, h, pix, cb, cr, q)).toOption.get
      assert(java.util.Arrays.equals(gray.pix, color.pix),
        s"seed $seed: chroma walk desynced the luma plane")
      // restart markers re-code DC predictors losslessly: identical plane
      val rst = JpegGray.decode(
        JpegGray.encodeGray(w, h, pix, q, restartInterval = 1 + seed % 5))
      assert(java.util.Arrays.equals(gray.pix, rst.toOption.get.pix),
        s"seed $seed: restart plane diverged")
      // color restarts too (the RST path through multi-block MCUs)
      val rstC = JpegGray.decode(
        JpegGray.encodeColor420(w, h, pix, cb, cr, q, restartInterval = 2))
      assert(java.util.Arrays.equals(gray.pix, rstC.toOption.get.pix),
        s"seed $seed: color restart plane diverged")
    }

    // ── loud error classes, each built by a targeted byte patch ──
    val pix = graft.ext.Multimodal.patternPixels(7L, 24, 16)
    val good = JpegGray.encodeGray(24, 16, pix, 85)
    assert(JpegGray.decode(good).isRight)
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    // progressive streams are REAL decodes now (r17) — the negative pin
    // moved to the dedicated progressive test below
    // find our SOF0 marker and patch classes onto it
    def findMarker(m: Int): Int = {
      var i = 2
      while (i + 1 < good.length) {
        if ((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == m) return i
        i += 1
      }
      fail(s"marker $m not found")
    }
    val sof = findMarker(0xc0)
    assert(JpegGray.decode(patched(_(sof + 1) = 0xc3.toByte)) ==
      Left("jpeg_unsupported_frame"))
    assert(JpegGray.decode(patched(_(sof + 1) = 0xc9.toByte)) ==
      Left("jpeg_unsupported_frame"))
    assert(JpegGray.decode(patched(_(sof + 4) = 12)) == // precision byte
      Left("jpeg_unsupported_precision"))
    assert(JpegGray.decode(patched(_(sof + 9) = 2)) == // Nf=2
      Left("jpeg_unsupported_components"))
    assert(JpegGray.decode(patched(_(sof + 11) = 0x51)) == // h=5
      Left("jpeg_unsupported_sampling"))
    val dqt = findMarker(0xdb)
    assert(JpegGray.decode(patched(_(dqt + 5) = 0)) == // zero quant entry
      Left("jpeg_bad_dqt"))
    assert(JpegGray.decode(patched(_(dqt + 4) = 0x25.toByte)) == // tq=5
      Left("jpeg_bad_dqt"))
    val dht = findMarker(0xc4)
    // over-subscribe the code space: 255 codes of length 1
    assert(JpegGray.decode(patched(_(dht + 5) = 0xff.toByte)) ==
      Left("jpeg_bad_dht"))
    assert(JpegGray.decode(Array[Byte](0xff.toByte, 0xd8.toByte)) ==
      Left("jpeg_truncated"))
    assert(JpegGray.decode("GIF89a not a jpeg".getBytes) == Left("not_jpeg"))
    // wrong restart marker index: RST0 patched to RST3
    val withRst = JpegGray.encodeGray(24, 16, pix, 85, restartInterval = 1)
    var ri = 0
    var found = false
    val patchedRst = withRst.clone()
    while (ri + 1 < patchedRst.length && !found) {
      if ((patchedRst(ri) & 0xff) == 0xff && (patchedRst(ri + 1) & 0xff) == 0xd0) {
        patchedRst(ri + 1) = 0xd3.toByte; found = true
      }
      ri += 1
    }
    assert(found && JpegGray.decode(patchedRst) == Left("jpeg_bad_restart"))

    // T.81 A.2.2: a single-component scan is non-interleaved — declared
    // sampling factors do NOT change its block geometry (MCU = one data
    // unit over the full-resolution raster). A grayscale stream whose
    // SOF claims 2x2 factors must decode IDENTICALLY to the 1x1 claim,
    // and ImageIO (the independent parser) must agree.
    def findSof(b: Array[Byte]): Int = {
      var i = 2
      while (i + 1 < b.length) {
        if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc0) return i
        i += 1
      }
      fail("no SOF0")
    }
    val claimed22 = good.clone()
    claimed22(findSof(claimed22) + 11) = 0x22 // comp 0 hv byte
    val base = JpegGray.decode(good).toOption.get
    val with22 = JpegGray.decode(claimed22)
    assert(with22.isRight, s"2x2-claim decode failed: $with22")
    assert(java.util.Arrays.equals(with22.toOption.get.pix, base.pix),
      "single-component scan geometry changed with declared factors")
    val io22 = imageioDecode(claimed22)
    assert(io22 != null && io22.getWidth == 24 && io22.getHeight == 16)
    for (y <- 0 until 16; x <- 0 until 24)
      assert(math.abs((with22.toOption.get.pix(y * 24 + x) & 0xff) -
        io22.getRaster.getSample(x, y, 0)) <= 1, s"io parity ($x,$y)")

    // T.81 B.2.3: scan components shall follow frame-header order. The
    // baseline decoder pairs scan tables with comps BY POSITION, so a
    // permuted SOS must refuse loudly (jpeg_bad_scan), never decode with
    // swapped tables/geometry (r17 advice).
    val cw2 = 12; val ch2 = 8
    val colorGood = JpegGray.encodeColor420(24, 16, pix,
      graft.ext.Multimodal.patternPixels(11L, cw2, ch2),
      graft.ext.Multimodal.patternPixels(13L, cw2, ch2), 85)
    assert(JpegGray.decode(colorGood).isRight)
    var sos = 2
    while (!((colorGood(sos) & 0xff) == 0xff &&
        (colorGood(sos + 1) & 0xff) == 0xda)) sos += 1
    assert((colorGood(sos + 4) & 0xff) == 3) // ns = 3
    val permuted = colorGood.clone()
    // swap scan entries 0 and 1: (cs, td/ta) pairs at sos+5.. and sos+7..
    permuted(sos + 5) = colorGood(sos + 7); permuted(sos + 6) = colorGood(sos + 8)
    permuted(sos + 7) = colorGood(sos + 5); permuted(sos + 8) = colorGood(sos + 6)
    assert(JpegGray.decode(permuted) == Left("jpeg_bad_scan"))
  }

  test("JpegGray: hostile-bytes and truncation-prefix fuzz never throws") {
    val pix = graft.ext.Multimodal.patternPixels(11L, 33, 21)
    val cw = 17; val ch = 11
    val rnd = new scala.util.Random(1718)
    val cb = Array.fill[Byte](cw * ch)(rnd.nextInt(256).toByte)
    val cr = Array.fill[Byte](cw * ch)(rnd.nextInt(256).toByte)
    val valids = Seq(
      JpegGray.encodeGray(33, 21, pix, 80, restartInterval = 2),
      JpegGray.encodeColor420(33, 21, pix, cb, cr, 75))
    // every truncation prefix: plausible structure cut mid-field
    valids.foreach { v =>
      (0 until v.length).foreach { cut =>
        JpegGray.decode(v.take(cut)) // must not throw
      }
    }
    // random tails behind a real SOI, and random single-byte corruptions
    (1 to 300).foreach { _ =>
      val junk = Array[Byte](0xff.toByte, 0xd8.toByte) ++
        Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      JpegGray.decode(junk) // must not throw
    }
    (1 to 300).foreach { _ =>
      val v = valids(rnd.nextInt(valids.length)).clone()
      v(rnd.nextInt(v.length)) = rnd.nextInt(256).toByte
      JpegGray.decode(v) // must not throw (Left or lossy Right, both fine)
    }
  }

  test("JpegGray progressive (SOF2): ImageIO parity +-1, partial-file coarse decode, fuzz") {
    // spectral-selection + successive-approximation scans, luma kept,
    // chroma scans skipped structurally (self-delimited) or sync-walked
    // (interleaved DC) — parity against ImageIO's own progressive output
    for (seed <- 1 to 15) {
      val r = new scala.util.Random(seed + 900)
      val w = 1 + r.nextInt(64); val h = 1 + r.nextInt(64)
      val pix =
        if (seed % 2 == 0) graft.ext.Multimodal.patternPixels(seed.toLong, w, h)
        else Array.fill[Byte](w * h)(r.nextInt(256).toByte)
      val q = 0.4f + r.nextInt(6) / 10.0f
      for (gray <- Seq(true, false)) {
        val bi = if (gray) grayBI(w, h, pix) else rgbBI(w, h, pix)
        val bytes = imageioEncode(bi, q, progressive = true)
        JpegGray.decode(bytes) match {
          case Left(e) => fail(s"seed $seed gray=$gray ${w}x$h: $e")
          case Right(g) =>
            val ref = imageioDecode(bytes)
            for (y <- 0 until h; x <- 0 until w) {
              val expect =
                if (gray) ref.getRaster.getSample(x, y, 0)
                else {
                  val rgb = ref.getRGB(x, y)
                  (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
                    29 * (rgb & 0xff)) >> 8
                }
              assert(math.abs((g.pix(y * w + x) & 0xff) - expect) <= 1,
                s"seed $seed gray=$gray ($x,$y)")
            }
        }
      }
    }
    // the format's own contract: a file cut AFTER a complete scan but
    // before the refinements decodes to the coarse approximation (EOI
    // appended), still structurally valid — and every raw truncation
    // prefix / corruption never throws
    val pix = graft.ext.Multimodal.patternPixels(31L, 40, 28)
    val full = imageioEncode(grayBI(40, 28, pix), 0.8f, progressive = true)
    assert(JpegGray.decode(full).isRight)
    (0 until full.length).foreach { cut =>
      JpegGray.decode(full.take(cut)) // must not throw
    }
    val rnd = new scala.util.Random(2024)
    (1 to 300).foreach { _ =>
      val v = full.clone()
      v(rnd.nextInt(v.length)) = rnd.nextInt(256).toByte
      JpegGray.decode(v) // must not throw (Left or lossy Right)
    }
    // cut after the first scan's data (find the second SOS, cut before
    // it, append EOI): coarse but valid — pixel plane close to the full
    // decode's (DC + first AC band carry most of the smooth content)
    var sosCount = 0; var secondSos = -1
    var i = 2
    while (i + 1 < full.length && secondSos < 0) {
      if ((full(i) & 0xff) == 0xff && (full(i + 1) & 0xff) == 0xda) {
        sosCount += 1
        if (sosCount == 2) secondSos = i
      }
      i += 1
    }
    assert(secondSos > 0, "ImageIO progressive stream had a single scan")
    val partial = full.take(secondSos) ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
    JpegGray.decode(partial) match {
      case Left(e) => fail(s"partial progressive decode failed: $e")
      case Right(g) =>
        val fullG = JpegGray.decode(full).toOption.get
        var sumAbs = 0L
        for (k <- g.pix.indices)
          sumAbs += math.abs((g.pix(k) & 0xff) - (fullG.pix(k) & 0xff))
        val mean = sumAbs.toDouble / g.pix.length
        assert(mean < 32.0, s"coarse decode too far from full: mean |d| $mean")
    }
  }

  test("JpegGray progressive fixture encoder: bit-exact vs baseline; ImageIO parity") {
    // the PngGray interlaced-encoder contract applied to JPEG: the
    // progressive scan script carries the SAME fdctQuant coefficients,
    // so both encodings dequantize to identical ints through the same
    // IDCT — decode equality is BIT-exact, not +-1
    for (seed <- 1 to 12) {
      val r = new scala.util.Random(seed + 700)
      val w = 1 + r.nextInt(48); val h = 1 + r.nextInt(48)
      val pix =
        if (seed % 2 == 0) graft.ext.Multimodal.patternPixels(seed.toLong, w, h)
        else Array.fill[Byte](w * h)(r.nextInt(256).toByte)
      val q = 40 + r.nextInt(61)
      val base = JpegGray.decode(JpegGray.encodeGray(w, h, pix, q)).toOption.get
      val prog = JpegGray.decode(JpegGray.encodeGrayProgressive(w, h, pix, q))
      assert(prog.isRight, s"seed $seed: $prog")
      assert(java.util.Arrays.equals(prog.toOption.get.pix, base.pix),
        s"seed $seed: progressive encoding decoded differently")
      // restart intervals through BOTH progressive scan types (DC pred
      // reset + AC EOB-state reset) — still bit-exact
      val progR = JpegGray.decode(
        JpegGray.encodeGrayProgressive(w, h, pix, q, restartInterval = 1 + seed % 4))
      assert(java.util.Arrays.equals(progR.toOption.get.pix, base.pix),
        s"seed $seed: progressive restart decode diverged")
      // the independent parser agrees the file is valid and +-1-close
      val ref = imageioDecode(JpegGray.encodeGrayProgressive(w, h, pix, q))
      assert(ref != null && ref.getWidth == w && ref.getHeight == h, s"seed $seed")
      for (y <- 0 until h; x <- 0 until w)
        assert(math.abs((base.pix(y * w + x) & 0xff) -
          ref.getRaster.getSample(x, y, 0)) <= 1,
          s"seed $seed ($x,$y): imageio parity on our progressive file")
    }
  }

  test("GifGray: exact round-trips, foreign LZW parity, error classes, fuzz") {
    import graft.functions.GifGray
    for (seed <- 1 to 12) {
      val r = new scala.util.Random(seed + 1100)
      val w = 1 + r.nextInt(40); val h = 1 + r.nextInt(40)
      val pix =
        if (seed % 2 == 0) graft.ext.Multimodal.patternPixels(seed.toLong, w, h)
        else Array.fill[Byte](w * h)(r.nextInt(256).toByte)
      // our encoder: identity-gray palette ⇒ EXACT round trip, both row
      // orders (the interlace pass machinery is the decode's riskiest bit)
      for (il <- Seq(false, true)) {
        val g = GifGray.decode(GifGray.encodeGray(w, h, pix, interlaced = il))
        assert(g.isRight, s"seed $seed il=$il: $g")
        assert(java.util.Arrays.equals(g.toOption.get.pix, pix),
          s"seed $seed il=$il round trip")
      }
      // FOREIGN encoder: ImageIO writes real variable-width LZW with
      // dictionary growth — decode must agree with ImageIO's own read
      // exactly (GIF is lossless through the palette)
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        bi.getRaster.setSample(x, y, 0, pix(y * w + x) & 0xff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "gif", bos)
      val foreign = bos.toByteArray
      val ours = GifGray.decode(foreign)
      assert(ours.isRight, s"seed $seed foreign: $ours")
      val ref = imageioDecode(foreign)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = ref.getRGB(x, y)
        val lum = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
          29 * (rgb & 0xff)) >> 8
        assert((ours.toOption.get.pix(y * w + x) & 0xff) == lum,
          s"seed $seed foreign ($x,$y)")
      }
    }
    // error classes and the never-throws fuzz
    assert(GifGray.decode("GIF90a??".getBytes("US-ASCII")) == Left("not_gif"))
    assert(GifGray.decode("GIF89a".getBytes("US-ASCII")) == Left("gif_truncated"))
    val pix = graft.ext.Multimodal.patternPixels(13L, 24, 16)
    val good = GifGray.encodeGray(24, 16, pix)
    // trailer immediately after the header: no frame
    val headerOnly = good.take(13 + 768) ++ Array[Byte](0x3b)
    assert(GifGray.decode(headerOnly) == Left("gif_no_image"))
    val rnd = new scala.util.Random(1113)
    (0 until good.length).foreach(cut => GifGray.decode(good.take(cut)))
    (1 to 300).foreach { _ =>
      val v = good.clone(); v(rnd.nextInt(v.length)) = rnd.nextInt(256).toByte
      GifGray.decode(v) // must not throw
    }
    // the dispatch: GIF payloads flow through the image expressions
    val viaHash = graft.functions.ImageDHash.dHash64(
      graft.functions.ImageCodecs.decode(
        GifGray.encodeGray(32, 32, graft.ext.Multimodal.patternPixels(5L, 32, 32)))
        .toOption.get)
    val viaPng = graft.functions.ImageDHash.dHash64(
      graft.functions.PngGray.decode(graft.functions.PngGray.encodeGray(
        32, 32, graft.ext.Multimodal.patternPixels(5L, 32, 32))).toOption.get)
    assert(viaHash == viaPng, "GIF and PNG of the same pixels hash differently")
  }

  test("BmpGray: exact round-trips, row orders, foreign 24-bit parity, fuzz") {
    import graft.functions.BmpGray
    for (seed <- 1 to 12) {
      val r = new scala.util.Random(seed + 1300)
      val w = 1 + r.nextInt(40); val h = 1 + r.nextInt(40)
      val pix = Array.fill[Byte](w * h)(r.nextInt(256).toByte)
      // our 8-bit identity-gray encoder: exact, both row orders (the
      // bottom-up/top-down flip is the format's classic trap)
      for (td <- Seq(false, true)) {
        val g = BmpGray.decode(BmpGray.encodeGray(w, h, pix, topDown = td))
        assert(g.isRight, s"seed $seed td=$td: $g")
        assert(java.util.Arrays.equals(g.toOption.get.pix, pix),
          s"seed $seed td=$td round trip")
      }
      // FOREIGN: ImageIO writes 24-bit bottom-up BGR — exact through the
      // BT.601 weights (BMP is lossless)
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = pix(y * w + x) & 0xff
        bi.setRGB(x, y, (v << 16) | ((255 - v) << 8) | (v ^ 0x55))
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "bmp", bos)
      val foreign = bos.toByteArray
      val ours = BmpGray.decode(foreign)
      assert(ours.isRight, s"seed $seed foreign: $ours")
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = bi.getRGB(x, y)
        val lum = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
          29 * (rgb & 0xff)) >> 8
        assert((ours.toOption.get.pix(y * w + x) & 0xff) == lum,
          s"seed $seed foreign ($x,$y)")
      }
    }
    // error classes + fuzz
    assert(BmpGray.decode("XX".getBytes) == Left("not_bmp"))
    assert(BmpGray.decode("BM123".getBytes) == Left("bmp_truncated"))
    val pix = graft.ext.Multimodal.patternPixels(17L, 24, 16)
    val good = BmpGray.encodeGray(24, 16, pix)
    val rle = good.clone(); rle(30) = 1 // BI_RLE8
    assert(BmpGray.decode(rle) == Left("bmp_unsupported_compression"))
    val d16 = good.clone(); d16(28) = 16
    assert(BmpGray.decode(d16) == Left("bmp_unsupported_depth"))
    val rnd = new scala.util.Random(1311)
    (0 until good.length).foreach(cut => BmpGray.decode(good.take(cut)))
    (1 to 300).foreach { _ =>
      val v = good.clone(); v(rnd.nextInt(v.length)) = rnd.nextInt(256).toByte
      BmpGray.decode(v) // must not throw
    }
    // dispatch + cross-codec hash identity
    assert(graft.functions.ImageCodecs.decode(good).isRight)
    val viaBmp = graft.functions.ImageDHash.dHash64(
      graft.functions.ImageCodecs.decode(
        BmpGray.encodeGray(32, 32, graft.ext.Multimodal.patternPixels(5L, 32, 32)))
        .toOption.get)
    val viaPng = graft.functions.ImageDHash.dHash64(
      graft.functions.PngGray.decode(graft.functions.PngGray.encodeGray(
        32, 32, graft.ext.Multimodal.patternPixels(5L, 32, 32))).toOption.get)
    assert(viaBmp == viaPng)
  }

  test("ImageCodecs dispatch: JPEG flows through dHash/grid/spectral/luma; not_image") {
    import graft.ext.Multimodal
    val pix = Multimodal.patternPixels(23L, 32, 32)
    val png = PngGray.encodeGray(32, 32, pix)
    val jpg = JpegGray.encodeGray(32, 32, pix, 92)
    val media = Seq(
      (1L, png), (2L, jpg),
      (3L, "utterly not an image".getBytes("UTF-8"))).toDF("media_id", "payload")

    val fps = Multimodal.imageFingerprints(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!fps(1L).isNullAt(1) && !fps(2L).isNullAt(1))
    assert(fps(3L).isNullAt(1) && fps(3L).getString(2) == "not_image")
    // at q92 on the smooth field the JPEG round trip preserves most
    // gradient signs: the PNG and JPEG of the SAME pixels sit within the
    // default perceptual radius (content identity, cross-codec)
    val hamming = java.lang.Long.bitCount(
      fps(1L).getLong(1) ^ fps(2L).getLong(1))
    assert(hamming <= 3, s"cross-codec hamming $hamming")

    val luma = Multimodal.imageLuma(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(luma(2L).getInt(1) == 32 && luma(2L).getInt(2) == 32)
    assert(luma(3L).getString(4) == "not_image")
    // the luma artifact IS the decode: q85's oracle replays binning from
    // it, so the JPEG rows carry real pixels, not placeholders
    val jpegPix = luma(2L).getSeq[Int](3)
    val direct = JpegGray.decode(jpg).toOption.get
    assert(jpegPix == direct.pix.map(_ & 0xff).toSeq)

    val grid = Multimodal.imageGridFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!grid(2L).isNullAt(1) && grid(3L).getString(2) == "not_image")
    val spec = Multimodal.imageSpectralFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!spec(2L).isNullAt(1) && spec(3L).getString(2) == "not_image")

    // dispatch fidelity: PNG magic still routes to the PNG decoder's own
    // error taxonomy; JPEG magic to the JPEG one; empty payload refuses
    assert(ImageCodecs.decode("PNGbroken".getBytes("ISO-8859-1"))
      == Left("not_png")) // 0x89 magic routes to PngGray's own taxonomy
    assert(ImageCodecs.decode(Array[Byte](0xff.toByte, 0xd8.toByte, 0, 0))
      .left.toOption.get.startsWith("jpeg_"))
    assert(ImageCodecs.decode(Array.emptyByteArray) == Left("not_image"))
  }

  test("MjpegAvi: container walk, frame-0 dispatch, error classes, fuzz") {
    import graft.ext.Multimodal
    import graft.functions.MjpegAvi
    val pix0 = Multimodal.patternPixels(31L, 32, 32)
    val pix1 = Multimodal.patternPixels(32L, 32, 32)
    val pix2 = Multimodal.patternPixels(33L, 32, 32)
    val frames = Seq(pix0, pix1, pix2).map(JpegGray.encodeGray(32, 32, _, 92))
    val avi = MjpegAvi.encode(32, 32, frames, fps = 25)
    // the walk recovers EVERY frame's exact bytes, in order
    frames.indices.foreach { k =>
      assert(MjpegAvi.frameBytes(avi, k).exists(
        java.util.Arrays.equals(_, frames(k))), s"frame $k bytes")
    }
    assert(MjpegAvi.frameBytes(avi, 3) == Left("avi_no_frames"))
    // ImageCodecs routes AVI through frame 0's JPEG decode: identical
    // luma plane to decoding the bare frame
    val direct = JpegGray.decode(frames.head).toOption.get
    val viaAvi = ImageCodecs.decode(avi).toOption.get
    assert(java.util.Arrays.equals(direct.pix, viaAvi.pix))
    // a LIST rec -wrapped movi (the interleaved-muxer grouping): wrap the
    // frame chunks in one rec list by hand and re-walk
    locally {
      val inner = frames.flatMap { f =>
        "00dc".getBytes("US-ASCII") ++
          Array[Byte]((f.length & 0xff).toByte, ((f.length >> 8) & 0xff).toByte,
            ((f.length >> 16) & 0xff).toByte, ((f.length >> 24) & 0xff).toByte) ++
          f ++ (if ((f.length & 1) == 1) Array[Byte](0) else Array.emptyByteArray)
      }.toArray
      val rec = "LIST".getBytes("US-ASCII") ++
        Array[Byte](((inner.length + 4) & 0xff).toByte,
          (((inner.length + 4) >> 8) & 0xff).toByte,
          (((inner.length + 4) >> 16) & 0xff).toByte, 0) ++
        "rec ".getBytes("US-ASCII") ++ inner
      val movi = "LIST".getBytes("US-ASCII") ++
        Array[Byte](((rec.length + 4) & 0xff).toByte,
          (((rec.length + 4) >> 8) & 0xff).toByte,
          (((rec.length + 4) >> 16) & 0xff).toByte, 0) ++
        "movi".getBytes("US-ASCII") ++ rec
      val wrapped = "RIFF".getBytes("US-ASCII") ++
        Array[Byte](((movi.length + 4) & 0xff).toByte,
          (((movi.length + 4) >> 8) & 0xff).toByte,
          (((movi.length + 4) >> 16) & 0xff).toByte, 0) ++
        "AVI ".getBytes("US-ASCII") ++ movi
      frames.indices.foreach { k =>
        assert(MjpegAvi.frameBytes(wrapped, k).exists(
          java.util.Arrays.equals(_, frames(k))), s"rec-wrapped frame $k")
      }
    }
    // error classes
    assert(MjpegAvi.frameBytes("not an avi at all".getBytes) == Left("not_avi"))
    assert(MjpegAvi.frameBytes(
      "RIFF".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "WAVE".getBytes) ==
      Left("not_avi"))
    assert(MjpegAvi.frameBytes(
      "RIFF".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "AVI ".getBytes) ==
      Left("avi_no_movi"))
    // a declared chunk size past the payload
    val cut = java.util.Arrays.copyOf(avi, avi.length / 2)
    assert(MjpegAvi.frameBytes(cut).left.toOption.get.startsWith("avi_"))
    // MediaHeader's avi branch reads the canonical avih offsets
    val hdr = graft.functions.MediaHeader.parse(avi)
    assert(hdr.getUTF8String(0).toString == "avi")
    assert(hdr.getLong(1) == 32 && hdr.getLong(2) == 32)
    assert(hdr.getLong(4) == 25000) // fps × 1000 from dwMicroSecPerFrame
    assert(hdr.isNullAt(6))
    val hdrCut = graft.functions.MediaHeader.parse(
      "RIFF".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "AVI ".getBytes)
    assert(hdrCut.getUTF8String(0).toString == "avi" &&
      hdrCut.getUTF8String(6).toString == "avi_truncated")
    // fuzz: hostile bytes behind the magic never throw
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val junk = new Array[Byte](12 + rnd.nextInt(300))
      rnd.nextBytes(junk)
      System.arraycopy("RIFF".getBytes, 0, junk, 0, 4)
      System.arraycopy("AVI ".getBytes, 0, junk, 8, 4)
      MjpegAvi.frameBytes(junk) // must not throw
      ImageCodecs.decode(junk) // must not throw
      graft.functions.MediaHeader.parse(junk) // must not throw
    }
    (0 until avi.length by 11).foreach { k =>
      MjpegAvi.frameBytes(java.util.Arrays.copyOf(avi, k))
      ImageCodecs.decode(java.util.Arrays.copyOf(avi, k))
    }
  }
}
