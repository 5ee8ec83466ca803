package graft.functions

/** Constrained GIF decoder — the third real image codec behind
  * [[ImageCodecs]], completing the web trio (PNG, JPEG, GIF): GIF87a and
  * GIF89a from the public spec (CompuServe GIF89a specification, 1990),
  * LZW-decompressed first frame composited onto the logical screen.
  *
  * Subset:
  *  - global and local color tables (any size), background fill for the
  *    screen area the first frame does not cover;
  *  - the FIRST image descriptor decodes; later frames (animation) and
  *    everything after them are ignored — the still-image convention of
  *    every thumbnailer, and the only deterministic choice without
  *    animation timing semantics;
  *  - interlaced frames (the standard 8/8/4/2 four-pass row order);
  *  - extensions (GCE/comment/application) are skipped structurally via
  *    their sub-block chain. Transparency is IGNORED (the transparent
  *    index renders its palette color) — the alpha-blind luma convention
  *    of the PNG types-4/6 path: compositing against an arbitrary
  *    background would make the fingerprint depend on that choice.
  *  - variable-width LZW to 12 bits with CLEAR/END semantics, deferred
  *    clear tolerated (a full dictionary keeps serving until CLEAR, the
  *    GIF89a erratum every real encoder exploits).
  *
  * Every failure is a Left; hostile bytes and truncation prefixes can
  * neither throw nor hang (the PNG/JPEG cap: 64 MPix, bounded LZW output,
  * every loop advances). Luma: palette RGB through the same integer
  * BT.601 weights as [[PngGray]]'s palette path.
  */
private[graft] object GifGray {
  import PngGray.Gray

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  /** BT.601 luma LUT of a color table (3 bytes/entry at `off`). */
  private def lumaLut(b: Array[Byte], off: Int, entries: Int): Array[Byte] = {
    val lut = new Array[Byte](entries)
    var k = 0
    while (k < entries) {
      lut(k) = ((77 * u8(b, off + 3 * k) + 150 * u8(b, off + 3 * k + 1) +
        29 * u8(b, off + 3 * k + 2)) >> 8).toByte
      k += 1
    }
    lut
  }

  def decode(payload: Array[Byte]): Either[String, Gray] = {
    val b = payload
    val n = b.length
    if (n < 6 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8' ||
      (b(4) != '7' && b(4) != '9') || b(5) != 'a') return Left("not_gif")
    if (n < 13) return Left("gif_truncated")
    val sw = le16(b, 6); val sh = le16(b, 8)
    val maxPix = 64L * 1024 * 1024
    if (sw <= 0 || sh <= 0 || sw.toLong * sh > maxPix)
      return Left("gif_bad_dims")
    val flags = u8(b, 10)
    val bgIndex = u8(b, 11)
    var i = 13
    var gctOff = -1; var gctSize = 0
    if ((flags & 0x80) != 0) {
      gctSize = 2 << (flags & 7)
      gctOff = i
      i += 3 * gctSize
      if (i > n) return Left("gif_truncated")
    }
    // block walk to the first image descriptor
    while (true) {
      if (i >= n) return Left("gif_truncated")
      u8(b, i) match {
        case 0x3b => return Left("gif_no_image") // trailer before a frame
        case 0x21 => // extension: label byte + sub-block chain
          i += 2
          if (i > n) return Left("gif_truncated")
          var len = if (i < n) u8(b, i) else return Left("gif_truncated")
          while (len != 0) {
            i += 1 + len
            if (i >= n) return Left("gif_truncated")
            len = u8(b, i)
          }
          i += 1 // the 0 terminator
        case 0x2c => // image descriptor
          if (i + 10 > n) return Left("gif_truncated")
          val fx = le16(b, i + 1); val fy = le16(b, i + 3)
          val fw = le16(b, i + 5); val fh = le16(b, i + 7)
          val fFlags = u8(b, i + 9)
          i += 10
          if (fw <= 0 || fh <= 0 || fx.toLong + fw > sw || fy.toLong + fh > sh)
            return Left("gif_bad_frame")
          var lctOff = -1; var lctSize = 0
          if ((fFlags & 0x80) != 0) {
            lctSize = 2 << (fFlags & 7)
            lctOff = i
            i += 3 * lctSize
            if (i > n) return Left("gif_truncated")
          }
          val interlaced = (fFlags & 0x40) != 0
          val tblOff = if (lctOff >= 0) lctOff else gctOff
          val tblSize = if (lctOff >= 0) lctSize else gctSize
          if (tblOff < 0) return Left("gif_no_color_table")
          val lut = lumaLut(b, tblOff, tblSize)
          // LZW setup
          if (i >= n) return Left("gif_truncated")
          val minCode = u8(b, i); i += 1
          if (minCode < 2 || minCode > 11) return Left("gif_bad_lzw")
          val indices = new Array[Byte](fw * fh)
          lzwDecode(b, i, n, minCode, indices) match {
            case Left(e) => return Left(e)
            case Right(_) => ()
          }
          // composite: background-filled screen, frame at its offset
          val pix = new Array[Byte](sw * sh)
          val bgLuma: Byte =
            if (gctOff >= 0 && bgIndex < gctSize)
              lumaLut(b, gctOff, gctSize)(bgIndex)
            else 0
          java.util.Arrays.fill(pix, bgLuma)
          // interlace: the standard four passes (rows 0+8k, 4+8k, 2+4k,
          // 1+2k); non-interlaced walks the same machinery as one pass
          val passes =
            if (interlaced) Seq((0, 8), (4, 8), (2, 4), (1, 2))
            else Seq((0, 1))
          var src = 0
          passes.foreach { case (start, stride) =>
            var y = start
            while (y < fh) {
              var x = 0
              while (x < fw) {
                val idx = indices(src) & 0xff
                if (idx >= tblSize) return Left("gif_bad_index")
                pix((fy + y) * sw + (fx + x)) = lut(idx)
                src += 1
                x += 1
              }
              y += stride
            }
          }
          return Right(Gray(sw, sh, pix))
        case _ => return Left("gif_bad_block")
      }
    }
    Left("gif_no_image") // unreachable
  }

  /** GIF variable-width LZW over the data sub-block chain starting at
    * `start`; fills exactly `out.length` indices. */
  private def lzwDecode(b: Array[Byte], start: Int, end: Int, minCode: Int,
      out: Array[Byte]): Either[String, Unit] = {
    val clear = 1 << minCode
    val endCode = clear + 1
    // dictionary as prefix links: suffix byte + prefix code per entry
    val prefix = new Array[Short](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var dictSize = endCode + 1
    var codeWidth = minCode + 1
    var prev = -1
    var outPos = 0
    // bit reader over the sub-block chain
    var pos = start
    var blockLeft = 0 // bytes remaining in the current sub-block
    var acc = 0; var accBits = 0
    def nextCode(): Int = {
      while (accBits < codeWidth) {
        if (blockLeft == 0) {
          if (pos >= end) return -1
          blockLeft = b(pos) & 0xff; pos += 1
          if (blockLeft == 0) return -2 // chain terminator mid-stream
        }
        if (pos >= end) return -1
        acc |= (b(pos) & 0xff) << accBits
        accBits += 8
        pos += 1
        blockLeft -= 1
      }
      val c = acc & ((1 << codeWidth) - 1)
      acc >>>= codeWidth
      accBits -= codeWidth
      c
    }
    while (outPos < out.length) {
      val code = nextCode()
      if (code < 0 || code > dictSize)
        return Left("gif_bad_lzw") // truncated chain or forward reference
      if (code == clear) {
        dictSize = endCode + 1
        codeWidth = minCode + 1
        prev = -1
      } else if (code == endCode) {
        return Left("gif_bad_lzw") // END before the frame filled
      } else {
        // expand via the prefix chain (bounded: entries only ever point
        // at lower codes, so depth < 4096)
        var sp = 0
        var cur = code
        if (code == dictSize) {
          // the KwKwK case: code not yet defined — valid only right
          // after a defined prev; expands as prev + first(prev)
          if (prev < 0) return Left("gif_bad_lzw")
          stack(sp) = firstByte(prefix, suffix, prev, clear); sp += 1
          cur = prev
        }
        while (cur >= clear + 2) {
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
        }
        stack(sp) = cur.toByte; sp += 1 // a literal (< clear)
        // pop to output
        while (sp > 0 && outPos < out.length) {
          sp -= 1
          out(outPos) = stack(sp); outPos += 1
        }
        if (sp > 0) return Left("gif_bad_lzw") // frame overrun
        if (prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev.toShort
          suffix(dictSize) = firstByte(prefix, suffix, code, clear)
          dictSize += 1
          // width bump when the NEXT code would not fit (deferred-clear
          // rule: at 4096 the width stays 12 until a CLEAR arrives)
          if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        prev = code
      }
    }
    Right(())
  }

  /** First byte of a code's expansion (walk the prefix chain down). */
  private def firstByte(prefix: Array[Short], suffix: Array[Byte],
      code: Int, clear: Int): Byte = {
    var cur = code
    while (cur >= clear + 2) cur = prefix(cur)
    cur.toByte
  }

  // ───── Fixture-grade encoder ─────

  /** Fixture-grade GIF89a encoder: one frame covering the screen, a
    * 256-entry gray color table (identity luma — decode reproduces the
    * pixels exactly), and the classic CLEAR-before-every-literal LZW
    * stream (valid, bloated — fixtures trade size for simplicity).
    * `interlaced` writes the four-pass row order. */
  def encodeGray(width: Int, height: Int, pix: Array[Byte],
      interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && pix.length == width * height,
      s"bad gray buffer: ${width}x$height vs ${pix.length}")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16w(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    le16w(width); le16w(height)
    out.write(0x80 | 7) // GCT present, 256 entries
    out.write(0) // background index
    out.write(0) // aspect
    var k = 0
    while (k < 256) { out.write(k); out.write(k); out.write(k); k += 1 }
    out.write(0x2c) // image descriptor
    le16w(0); le16w(0); le16w(width); le16w(height)
    out.write(if (interlaced) 0x40 else 0x00)
    val minCode = 8
    out.write(minCode)
    // bit writer into 255-byte sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    def putCode(c: Int, w: Int): Unit = {
      acc |= c.toLong << accBits; accBits += w
      while (accBits >= 8) { data.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8 }
    }
    val clear = 1 << minCode
    val w0 = minCode + 1
    val rows =
      if (interlaced)
        Seq((0, 8), (4, 8), (2, 4), (1, 2)).flatMap { case (s, st) =>
          s until height by st
        }
      else 0 until height
    rows.foreach { y =>
      var x = 0
      while (x < width) {
        putCode(clear, w0) // reset before every literal: width stays w0
        putCode(pix(y * width + x) & 0xff, w0)
        x += 1
      }
    }
    putCode(clear, w0)
    putCode(clear + 1, w0) // END
    if (accBits > 0) data.write((acc & 0xff).toInt)
    val bytes = data.toByteArray
    var off = 0
    while (off < bytes.length) {
      val len = math.min(255, bytes.length - off)
      out.write(len)
      out.write(bytes, off, len)
      off += len
    }
    out.write(0) // sub-block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }
}

/** Constrained BMP decoder — the fourth image codec behind
  * [[ImageCodecs]]: uncompressed Windows bitmaps (the scan/legacy-dataset
  * format), from the public BITMAPINFOHEADER layout. Subset: BI_RGB
  * (compression 0) at 8-bit (palette), 24-bit (BGR), and 32-bit (BGRX);
  * bottom-up and top-down (negative height) row orders; 4-byte row
  * padding; BITMAPINFOHEADER or larger DIB headers (V4/V5 — the extra
  * fields are skipped, the pixel offset field locates the data). RLE and
  * bitfield compressions land in per-row error Lefts. Luma through the
  * shared BT.601 weights; the same 64 MPix cap as every codec here. */
private[graft] object BmpGray {
  import PngGray.Gray

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong) | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  def decode(payload: Array[Byte]): Either[String, Gray] = {
    val b = payload
    val n = b.length
    if (n < 2 || b(0) != 'B' || b(1) != 'M') return Left("not_bmp")
    if (n < 54) return Left("bmp_truncated")
    val dataOff = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize < 40) return Left("bmp_unsupported_header") // core headers out
    val w = le32(b, 18).toInt // i32 LE
    val hRaw = le32(b, 22).toInt
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val maxPix = 64L * 1024 * 1024
    if (w <= 0 || h <= 0 || w.toLong * h > maxPix) return Left("bmp_bad_dims")
    if (le16(b, 26) != 1) return Left("bmp_bad_planes")
    val bits = le16(b, 28)
    if (bits != 8 && bits != 24 && bits != 32)
      return Left("bmp_unsupported_depth")
    if (le32(b, 30) != 0L) return Left("bmp_unsupported_compression") // BI_RGB only
    // palette (8-bit): BGRA quads right after the DIB header; clrUsed 0
    // means the full 256
    var lut: Array[Byte] = null
    if (bits == 8) {
      val clrUsed0 = le32(b, 46)
      val entries = if (clrUsed0 == 0L) 256 else clrUsed0.toInt
      if (entries < 1 || entries > 256) return Left("bmp_bad_palette")
      val palOff = 14 + dibSize
      if (palOff + 4L * entries > n) return Left("bmp_truncated")
      lut = new Array[Byte](entries)
      var k = 0
      while (k < entries) {
        val o = (palOff + 4 * k).toInt // B, G, R, reserved
        lut(k) = ((77 * u8(b, o + 2) + 150 * u8(b, o + 1) +
          29 * u8(b, o)) >> 8).toByte
        k += 1
      }
    }
    val bytesPerPx = bits / 8
    val rowBytes = ((w.toLong * bits + 31) / 32 * 4)
    if (dataOff < 54 || dataOff + rowBytes * h > n) return Left("bmp_truncated")
    val pix = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val ro = (dataOff + srcRow * rowBytes).toInt
      var x = 0
      while (x < w) {
        val o = ro + x * bytesPerPx
        pix(y * w + x) =
          if (bits == 8) {
            val idx = u8(b, o)
            if (idx >= lut.length) return Left("bmp_bad_palette_index")
            lut(idx)
          } else // BGR / BGRX
            ((77 * u8(b, o + 2) + 150 * u8(b, o + 1) + 29 * u8(b, o)) >> 8).toByte
        x += 1
      }
      y += 1
    }
    Right(Gray(w, h, pix))
  }

  /** Fixture-grade 8-bit palette BMP encoder (identity-gray palette —
    * decode reproduces the pixels exactly), bottom-up rows unless
    * `topDown`. */
  def encodeGray(width: Int, height: Int, pix: Array[Byte],
      topDown: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && pix.length == width * height,
      s"bad gray buffer: ${width}x$height vs ${pix.length}")
    val rowBytes = (width + 3) / 4 * 4
    val dataOff = 14 + 40 + 4 * 256
    val out = new java.io.ByteArrayOutputStream(dataOff + rowBytes * height)
    def le16w(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def le32w(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    out.write('B'); out.write('M')
    le32w(dataOff + rowBytes * height); le16w(0); le16w(0); le32w(dataOff)
    le32w(40); le32w(width); le32w(if (topDown) -height else height)
    le16w(1); le16w(8); le32w(0) // planes, bits, BI_RGB
    le32w(rowBytes * height); le32w(2835); le32w(2835); le32w(256); le32w(0)
    var k = 0
    while (k < 256) { out.write(k); out.write(k); out.write(k); out.write(0); k += 1 }
    val rows = if (topDown) 0 until height else (height - 1) to 0 by -1
    rows.foreach { y =>
      var x = 0
      while (x < width) { out.write(pix(y * width + x) & 0xff); x += 1 }
      var p = width
      while (p < rowBytes) { out.write(0); p += 1 }
    }
    out.toByteArray
  }
}
