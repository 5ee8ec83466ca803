package graft.functions

/** Constrained baseline-JPEG codec — the second real image decode behind
  * [[ImageDHash]] / [[ImageGridFeature]] / [[ImageSpectralFeature]] /
  * [[ImageLuma]] (via [[ImageCodecs]]), closing the r16 verdict's #1
  * real-user gap: web-scale image corpora are mostly JPEG, and the image
  * dedup family previously decoded PNG only (JPEG payloads got a
  * [[MediaHeader]] header parse and then an error row in every content
  * tier).
  *
  * Subset, all from the public spec (ITU-T T.81 / ISO 10918-1, JFIF):
  * baseline sequential DCT (SOF0; SOF1's 8-bit case decodes identically
  * and is accepted) AND progressive DCT (SOF2, r17: spectral selection +
  * successive approximation, DC/AC first and refinement scans with EOB
  * runs — the dominant remaining web-JPEG class), Huffman entropy
  * coding, 8-bit precision, 1 component (grayscale) or 3 components
  * (JFIF YCbCr) with any sampling factors 1..4 where the luma component
  * carries the frame maxima (every JFIF encoder in practice — 4:4:4,
  * 4:2:2, 4:2:0, 4:4:0), restart markers, multi-table DQT/DHT segments,
  * 16-bit DQT precision, APPn/COM skip. Arithmetic coding, hierarchical,
  * lossless, and 12-bit frames land in per-row `error` — one odd blob
  * poisons its row, never the job, the [[MediaHeader]] contract. Every
  * failure is a Left; the decode is throw-free and every loop advances
  * (hostile bytes can neither hang nor OOM it: a 64 MPix dimension cap
  * like [[PngGray]]'s, tightened to 32 MPix for progressive frames whose
  * cross-scan luma coefficient buffer costs 4 bytes/sample).
  *
  * The output is the LUMINANCE plane only — exactly what every consumer
  * of [[ImageCodecs.decode]] wants. JFIF's Y channel IS luma, so the
  * decoder runs dequant + IDCT on luma blocks alone and entropy-SKIPS
  * chroma blocks (their bits must still be Huffman-walked to keep the
  * stream in sync, but no coefficient math runs) — for 4:2:0 that is 4×
  * less IDCT than a full decode, and nothing is lost: the Cb/Cr planes
  * would be discarded by the BT.601 projection anyway. This also
  * sidesteps chroma upsampling entirely (the one stage of a JPEG decode
  * the spec leaves implementation-defined beyond IDCT accuracy).
  *
  * Determinism: the IDCT is double-precision separable with
  * `StrictMath`-built cosine tables and fixed summation order —
  * bit-reproducible on any host and partitioning. Bit-parity with other
  * decoders is NOT a spec property (T.81 only bounds IDCT accuracy via
  * IEEE 1180), so the ExtSpec fuzz pins parity with `javax.imageio` to
  * ±1 per sample, and pins OUR decode self-consistent bit-exact across
  * gray/color encodings of the same luma plane (which proves the chroma
  * entropy-skip keeps bitstream sync).
  *
  * Scale: one pass over payload bytes per row, scan-stage — the honest
  * O(payload) floor of any content fingerprint, like [[PngGray]]'s
  * inflate. Reference behavior replicated: the reference pipeline treats
  * storage blobs as opaque objects fetched whole (utils/auto_healer.py:
  * 59-72, dag/self_healing_pipeline.py:86-98); content decode is this
  * repo's extension mandate.
  */
private[graft] object JpegGray {
  import PngGray.Gray

  // zigzag index -> natural (row-major) index, T.81 Figure A.6
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ct(k)(t) = (C(k)/2)·cos((2t+1)kπ/16), C(0)=1/√2 — the separable
  // 1-D basis both the IDCT and the fixture FDCT share (StrictMath ⇒
  // bit-reproducible tables on any JVM/host)
  private val Ct: Array[Array[Double]] = {
    val t = Array.ofDim[Double](8, 8)
    var k = 0
    while (k < 8) {
      val c = if (k == 0) StrictMath.sqrt(0.125) else 0.5 // C(0)/2 = 1/(2√2)
      var x = 0
      while (x < 8) {
        t(k)(x) = c * StrictMath.cos((2 * x + 1) * k * StrictMath.PI / 16.0)
        x += 1
      }
      k += 1
    }
    t
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  // ───── Huffman table (decode side): T.81 F.2.2.3 mincode/maxcode ─────

  private final class Huff(val minCode: Array[Int], val maxCode: Array[Int],
    val valPtr: Array[Int], val vals: Array[Int])

  /** Build decode arrays from the DHT BITS/HUFFVAL lists; None = invalid
    * table (over-subscribed code space). */
  private def buildHuff(bits: Array[Int], vals: Array[Int]): Option[Huff] = {
    val minCode = new Array[Int](17); val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    var code = 0; var k = 0
    var l = 1
    while (l <= 16) {
      valPtr(l) = k
      minCode(l) = code
      if (bits(l - 1) > 0) {
        // the last code of length l must fit in l bits
        if (code.toLong + bits(l - 1) - 1 >= (1L << l)) return None
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = code - 1
      } else maxCode(l) = -1
      code <<= 1
      l += 1
    }
    Some(new Huff(minCode, maxCode, valPtr, vals))
  }

  // ───── Entropy-coded segment reader (byte unstuffing, markers) ─────

  private final class Bits(b: Array[Byte], var pos: Int, end: Int) {
    private var buf = 0
    private var cnt = 0
    /** Marker code (0xD0..0xD9 etc.) the reader ran into, or -1. */
    var marker: Int = -1

    /** Next bit, or -1 when the segment ended (marker/EOF). */
    def nextBit(): Int = {
      if (cnt == 0) {
        if (marker >= 0 || pos >= end) return -1
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= end) return -1
          val m = b(pos) & 0xff; pos += 1
          if (m != 0) { marker = m; return -1 } // entropy segment over
          v = 0xff // stuffed 0xFF00 ⇒ data byte 0xFF
        }
        buf = v; cnt = 8
      }
      cnt -= 1
      (buf >>> cnt) & 1
    }

    /** RECEIVE (F.17): n raw bits; Int.MinValue = segment ended. */
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val bit = nextBit()
        if (bit < 0) return Int.MinValue
        v = (v << 1) | bit
        i += 1
      }
      v
    }

    /** DECODE (F.16): one Huffman symbol; -1 = bad code / segment end. */
    def huffDecode(h: Huff): Int = {
      var code = nextBit()
      if (code < 0) return -1
      var l = 1
      while (code > h.maxCode(l)) {
        val bit = nextBit()
        if (bit < 0) return -1
        code = (code << 1) | bit
        l += 1
        if (l > 16) return -1
      }
      val idx = h.valPtr(l) + code - h.minCode(l)
      if (idx < 0 || idx >= h.vals.length) return -1
      h.vals(idx)
    }

    /** Byte-align and consume the expected restart marker (fill 0xFFs
      * tolerated per the spec). */
    def expectRestart(m: Int): Boolean = {
      cnt = 0
      if (marker < 0) {
        // scan forward: optional fill bytes then the marker pair
        if (pos >= end || (b(pos) & 0xff) != 0xff) return false
        while (pos < end && (b(pos) & 0xff) == 0xff) pos += 1
        if (pos >= end) return false
        marker = b(pos) & 0xff; pos += 1
      }
      val ok = marker == m
      marker = -1
      ok
    }
  }

  /** EXTEND (F.12): map the t-bit magnitude to its signed value. */
  @inline private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int)

  /** Decode the luminance plane of a baseline JPEG. */
  def decode(payload: Array[Byte]): Either[String, Gray] = {
    val n = payload.length
    if (n < 2 || u8(payload, 0) != 0xff || u8(payload, 1) != 0xd8)
      return Left("not_jpeg")
    // tables & frame state gathered during the marker walk
    val qt = Array.ofDim[Int](4, 64) // zigzag order, as transmitted
    val qtSeen = new Array[Boolean](4)
    val dcTabs = new Array[Huff](4); val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var width = 0; var height = 0
    var ri = 0 // restart interval in MCUs
    var progressive = false
    var prog: ProgState = null // luma coefficient accumulator (SOF2 path)
    var i = 2
    while (true) {
      // marker scan: 0xFF fill bytes tolerated
      if (i + 2 > n) return Left("jpeg_truncated")
      if (u8(payload, i) != 0xff) return Left("jpeg_bad_marker")
      while (i < n && u8(payload, i) == 0xff) i += 1
      if (i >= n) return Left("jpeg_truncated")
      val marker = u8(payload, i); i += 1
      marker match {
        case 0xd9 => // EOI: progressive decodes accumulate until here
          return if (prog != null && prog.sawLuma)
            finishProgressive(prog, qt, qtSeen, comps, width, height)
          else if (prog != null) Left("jpeg_bad_data") // scans, none luma
          else Left("jpeg_no_sos") // EOI before any scan
        case 0xd8 => return Left("jpeg_bad_marker") // duplicate SOI
        case 0x01 => () // TEM, standalone
        case m if m >= 0xd0 && m <= 0xd7 => () // stray RST, standalone
        case 0xc0 | 0xc1 | 0xc2 => // SOF0/SOF1 (identical at 8-bit) / SOF2
          progressive = marker == 0xc2
          if (comps != null) return Left("jpeg_bad_marker")
          if (i + 2 > n) return Left("jpeg_truncated")
          val len = be16(payload, i)
          if (len < 8 || i + len > n) return Left("jpeg_truncated")
          if (u8(payload, i + 2) != 8) return Left("jpeg_unsupported_precision")
          height = be16(payload, i + 3); width = be16(payload, i + 5)
          val nf = u8(payload, i + 7)
          if (nf != 1 && nf != 3) return Left("jpeg_unsupported_components")
          if (len != 8 + 3 * nf) return Left("jpeg_truncated")
          // DNL (height 0, late height) stays out of the subset
          val maxPix = 64L * 1024 * 1024
          if (width <= 0 || height <= 0 || width.toLong * height > maxPix)
            return Left("jpeg_bad_dims")
          comps = Array.tabulate(nf) { c =>
            val off = i + 8 + 3 * c
            val hv = u8(payload, off + 1)
            Comp(u8(payload, off), hv >> 4, hv & 15, u8(payload, off + 2))
          }
          if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 ||
            c.tq > 3)) return Left("jpeg_unsupported_sampling")
          // single-component frames normalize to 1x1 factors here, ONCE,
          // so the baseline and progressive paths share the T.81 A.2.2
          // non-interleaved geometry (decodeScan's internal
          // normalization is then a no-op)
          if (nf == 1) comps = Array(comps(0).copy(h = 1, v = 1))
          // the progressive path holds a full-image luma COEFFICIENT
          // buffer across scans (4 bytes/sample) — a tighter cap than
          // the baseline's streaming 64 MPix keeps the worst case at
          // ~128 MB of scratch
          if (progressive && width.toLong * height > 32L * 1024 * 1024)
            return Left("jpeg_bad_dims")
          i += len
        case 0xc4 => // DHT, possibly several tables in one segment
          if (i + 2 > n) return Left("jpeg_truncated")
          val len = be16(payload, i)
          if (len < 2 || i + len > n) return Left("jpeg_truncated")
          var p = i + 2; val segEnd = i + len
          while (p < segEnd) {
            if (p + 17 > segEnd) return Left("jpeg_bad_dht")
            val tcth = u8(payload, p)
            val tc = tcth >> 4; val th = tcth & 15
            if (tc > 1 || th > 3) return Left("jpeg_bad_dht")
            val bits = Array.tabulate(16)(k => u8(payload, p + 1 + k))
            val total = bits.sum
            if (total > 256 || p + 17 + total > segEnd)
              return Left("jpeg_bad_dht")
            val vals = Array.tabulate(total)(k => u8(payload, p + 17 + k))
            buildHuff(bits, vals) match {
              case Some(h) => if (tc == 0) dcTabs(th) = h else acTabs(th) = h
              case None => return Left("jpeg_bad_dht")
            }
            p += 17 + total
          }
          i += len
        case m if (m >= 0xc3 && m <= 0xcb) || (m >= 0xcd && m <= 0xcf) =>
          return Left("jpeg_unsupported_frame") // other SOFs (0xc4 DHT handled above)
        case 0xcc => return Left("jpeg_unsupported_arithmetic")
        case 0xdb => // DQT, possibly several tables in one segment
          if (i + 2 > n) return Left("jpeg_truncated")
          val len = be16(payload, i)
          if (len < 2 || i + len > n) return Left("jpeg_truncated")
          var p = i + 2; val segEnd = i + len
          while (p < segEnd) {
            val pqtq = u8(payload, p)
            val pq = pqtq >> 4; val tq = pqtq & 15
            if (pq > 1 || tq > 3) return Left("jpeg_bad_dqt")
            val entryBytes = if (pq == 0) 1 else 2
            if (p + 1 + 64 * entryBytes > segEnd) return Left("jpeg_bad_dqt")
            var k = 0
            while (k < 64) {
              qt(tq)(k) =
                if (pq == 0) u8(payload, p + 1 + k)
                else be16(payload, p + 1 + 2 * k)
              if (qt(tq)(k) == 0) return Left("jpeg_bad_dqt")
              k += 1
            }
            qtSeen(tq) = true
            p += 1 + 64 * entryBytes
          }
          i += len
        case 0xdd => // DRI
          if (i + 4 > n || be16(payload, i) != 4) return Left("jpeg_truncated")
          ri = be16(payload, i + 2)
          i += 4
        case 0xda => // SOS — parse header, then the entropy decode below
          if (comps == null) return Left("jpeg_no_sof")
          if (i + 2 > n) return Left("jpeg_truncated")
          val len = be16(payload, i)
          if (len < 6 || i + len > n) return Left("jpeg_truncated")
          val ns = u8(payload, i + 2)
          if (!progressive && ns != comps.length)
            return Left("jpeg_unsupported_scan")
          if (ns < 1 || ns > comps.length) return Left("jpeg_bad_scan")
          if (len != 6 + 2 * ns) return Left("jpeg_truncated")
          // scan components must reference frame components; collect
          // their entropy table ids in scan order
          val scan = Array.tabulate(ns) { c =>
            val cs = u8(payload, i + 3 + 2 * c)
            val tdta = u8(payload, i + 4 + 2 * c)
            val fIdx = comps.indexWhere(_.id == cs)
            (fIdx, tdta >> 4, tdta & 15)
          }
          // a truncated/misaligned stream can alias arbitrary bytes into
          // this header: entropy-table ids must be validated, not indexed
          if (scan.exists(t => t._1 < 0 || t._2 > 3 || t._3 > 3))
            return Left("jpeg_bad_scan")
          val ss = u8(payload, i + 3 + 2 * ns)
          val se = u8(payload, i + 4 + 2 * ns)
          val ahal = u8(payload, i + 5 + 2 * ns)
          if (!progressive) {
            if (ss != 0 || se != 63 || ahal != 0) return Left("jpeg_bad_scan")
            // T.81 B.2.3: scan components shall follow frame-header order.
            // decodeScan pairs scan entropy tables with comps(c) by
            // POSITION (and keys luma off c == 0), so a permuted SOS must
            // refuse loudly here rather than decode with swapped tables.
            var sc = 0
            while (sc < ns) {
              if (scan(sc)._1 != sc) return Left("jpeg_bad_scan")
              sc += 1
            }
            return decodeScan(payload, i + len, n, comps, scan, qt, qtSeen,
              dcTabs, acTabs, width, height, ri)
          }
          // progressive: one of many scans — validate the spectral band
          // and successive-approximation fields, decode, keep walking
          val ah = ahal >> 4; val al = ahal & 15
          if (ss > 63 || se > 63 || se < ss) return Left("jpeg_bad_scan")
          if (ss == 0 && se != 0) return Left("jpeg_bad_scan") // DC alone
          if (ss > 0 && ns != 1) return Left("jpeg_bad_scan") // AC: 1 comp
          if (al > 13 || !(ah == 0 || ah == al + 1))
            return Left("jpeg_bad_scan")
          if (prog == null) prog = new ProgState(comps, width, height)
          decodeProgressiveScan(payload, i + len, n, comps, scan,
            ss, se, ah, al, ri, prog, dcTabs, acTabs, width, height) match {
            case Left(e) => return Left(e)
            case Right(next) => i = next
          }
        case _ => // APPn, COM, anything else with a length: skip
          if (i + 2 > n) return Left("jpeg_truncated")
          val len = be16(payload, i)
          if (len < 2 || i + len > n) return Left("jpeg_truncated")
          i += len
      }
    }
    Left("jpeg_no_sos") // unreachable; the loop exits via return
  }

  /** The MCU loop: luma blocks get dequant + IDCT into the plane; chroma
    * blocks are entropy-walked only (see object scaladoc). */
  private def decodeScan(b: Array[Byte], start: Int, end: Int,
      comps0: Array[Comp], scan: Array[(Int, Int, Int)],
      qt: Array[Array[Int]], qtSeen: Array[Boolean],
      dcTabs: Array[Huff], acTabs: Array[Huff],
      width: Int, height: Int, ri: Int): Either[String, Gray] = {
    // T.81 A.2.2: a single-component scan is NON-INTERLEAVED — its MCU is
    // ONE data unit and blocks traverse the component's full-resolution
    // raster, REGARDLESS of declared sampling factors (compW = ceil(W·h/
    // hmax) = W when Nf = 1). Walking the declared h×v sub-block geometry
    // here would silently mis-tile any grayscale JPEG whose SOF carries
    // factors > 1 (rare but legal); normalizing to 1×1 reproduces the
    // spec geometry exactly (spec-pinned vs the declared-2x2 fixture).
    val comps =
      if (comps0.length == 1) Array(comps0(0).copy(h = 1, v = 1)) else comps0
    val hmax = comps.map(_.h).max; val vmax = comps.map(_.v).max
    // the luma component must carry the frame maxima so its plane IS the
    // image grid (true of every JFIF encoder; anything else is exotic
    // enough to refuse loudly rather than resample)
    if (comps(0).h != hmax || comps(0).v != vmax)
      return Left("jpeg_unsupported_sampling")
    // T.81 B.2.3: ≤10 data units per MCU in an interleaved scan
    if (comps.length > 1 && comps.map(c => c.h * c.v).sum > 10)
      return Left("jpeg_unsupported_sampling")
    // every referenced table must exist
    var c = 0
    while (c < comps.length) {
      if (!qtSeen(comps(c).tq)) return Left("jpeg_no_dqt")
      if (dcTabs(scan(c)._2) == null || acTabs(scan(c)._3) == null)
        return Left("jpeg_no_dht")
      c += 1
    }
    val lumaQ = qt(comps(0).tq)
    val pix = new Array[Byte](width * height)
    val mcuW = 8 * hmax; val mcuH = 8 * vmax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    val bits = new Bits(b, start, end)
    val pred = new Array[Int](comps.length)
    // reusable per-block scratch
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    var rstIdx = 0
    var mcu = 0
    val totalMcus = mcusY.toLong * mcusX
    while (mcu < totalMcus) {
      if (ri > 0 && mcu > 0 && mcu % ri == 0) {
        if (!bits.expectRestart(0xd0 + (rstIdx & 7)))
          return Left("jpeg_bad_restart")
        rstIdx += 1
        java.util.Arrays.fill(pred, 0)
      }
      val mx = (mcu % mcusX).toInt; val my = (mcu / mcusX).toInt
      c = 0
      while (c < comps.length) {
        val comp = comps(c)
        val dcT = dcTabs(scan(c)._2); val acT = acTabs(scan(c)._3)
        val isLuma = c == 0
        var by = 0
        while (by < comp.v) {
          var bx = 0
          while (bx < comp.h) {
            // ── one data unit: DC diff + AC run-lengths ──
            if (isLuma) java.util.Arrays.fill(coef, 0)
            val t = bits.huffDecode(dcT)
            if (t < 0 || t > 15) return Left("jpeg_bad_data")
            val diffBits = if (t == 0) 0 else bits.receive(t)
            if (diffBits == Int.MinValue) return Left("jpeg_bad_data")
            pred(c) += extend(diffBits, t)
            if (isLuma) coef(0) = pred(c) * lumaQ(0)
            var k = 1
            var eob = false
            while (!eob && k <= 63) {
              val rs = bits.huffDecode(acT)
              if (rs < 0) return Left("jpeg_bad_data")
              val r = rs >> 4; val s = rs & 15
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else eob = true
              } else {
                k += r
                if (k > 63) return Left("jpeg_bad_data")
                val vBits = bits.receive(s)
                if (vBits == Int.MinValue) return Left("jpeg_bad_data")
                if (isLuma)
                  coef(Zigzag(k)) = extend(vBits, s) * lumaQ(k)
                k += 1
              }
            }
            if (isLuma)
              idctBlock(coef, tmp, pix, width, height,
                (mx * comp.h + bx) * 8, (my * comp.v + by) * 8)
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }
    Right(Gray(width, height, pix))
  }

  /** Luma coefficient accumulator for the progressive (SOF2) path: one
    * Int per sample over the MCU-PADDED block grid (interleaved DC scans
    * cover padding blocks; non-interleaved scans cover the unpadded
    * raster), filled across scans and dequantized+IDCT'd once at EOI.
    * Coefficients are stored at their NATURAL in-block positions, scaled
    * by the successive-approximation point transform as decoded. */
  private final class ProgState(comps: Array[Comp], width: Int, height: Int) {
    private val hmax = comps.map(_.h).max
    private val vmax = comps.map(_.v).max
    val mcusX: Int = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY: Int = (height + 8 * vmax - 1) / (8 * vmax)
    val wBlocksPad: Int = mcusX * comps(0).h
    val hBlocksPad: Int = mcusY * comps(0).v
    val wBlocks: Int = (width + 7) / 8 // luma is full-res (maxima enforced)
    val hBlocks: Int = (height + 7) / 8
    val coef: Array[Int] = new Array[Int](wBlocksPad * hBlocksPad * 64)
    var sawLuma: Boolean = false
  }

  /** Position of the next REAL marker at or after `from`: steps over
    * entropy bytes, stuffed 0xFF00 pairs, fill 0xFFs, and restart
    * markers. Returns the index of the marker's 0xFF (the outer loop's
    * expected shape), or `end` when the stream runs out. */
  private def skipToMarker(b: Array[Byte], from: Int, end: Int): Int = {
    var p = math.max(from, 0)
    while (p + 1 < end) {
      if ((b(p) & 0xff) == 0xff) {
        val m = b(p + 1) & 0xff
        if (m == 0) p += 2 // stuffed data byte
        else if (m == 0xff) p += 1 // fill
        else if (m >= 0xd0 && m <= 0xd7) p += 2 // restart, keep walking
        else return p
      } else p += 1
    }
    end
  }

  /** One progressive scan (T.81 G.2): DC first/refinement (interleaved
    * or single-component) and AC first/refinement with EOB runs — LUMA
    * coefficients land in `st.coef`; chroma-only scans are skipped
    * structurally (self-delimited by the next marker) and chroma blocks
    * inside interleaved DC scans are entropy-walked for bit sync, the
    * baseline chroma discipline. Returns the position of the next
    * marker's 0xFF. */
  private def decodeProgressiveScan(b: Array[Byte], start: Int, end: Int,
      comps: Array[Comp], scan: Array[(Int, Int, Int)], ss: Int, se: Int,
      ah: Int, al: Int, ri: Int, st: ProgState,
      dcTabs: Array[Huff], acTabs: Array[Huff],
      width: Int, height: Int): Either[String, Int] = {
    val hmax = comps.map(_.h).max; val vmax = comps.map(_.v).max
    if (comps(0).h != hmax || comps(0).v != vmax)
      return Left("jpeg_unsupported_sampling")
    // a scan with no luma carries nothing this decoder keeps: its
    // entropy data is self-delimited, so skip to the next marker without
    // paying the Huffman walk at all
    if (!scan.exists(_._1 == 0)) return Right(skipToMarker(b, start, end))
    // table availability: DC-first needs the DC table, AC needs the AC
    // table; REFINEMENT DC scans read raw bits only
    if (ss == 0 && ah == 0) {
      var c = 0
      while (c < scan.length) {
        if (dcTabs(scan(c)._2) == null) return Left("jpeg_no_dht")
        c += 1
      }
    }
    if (ss > 0 && acTabs(scan(0)._3) == null) return Left("jpeg_no_dht")

    val bits = new Bits(b, start, end)
    val pred = new Array[Int](scan.length)
    var eobrun = 0
    var rstIdx = 0
    st.sawLuma = true

    /** Correction bits over nonzero-history coefficients k..se of one
      * block (AC refinement, G.1.2.3); -1 = bitstream ended. */
    def corrections(base: Int, fromK: Int): Int = {
      val p1 = 1 << al
      var k = fromK
      while (k <= se) {
        val idx = base + Zigzag(k)
        if (st.coef(idx) != 0) {
          val bit = bits.nextBit()
          if (bit < 0) return -1
          if (bit == 1 && (st.coef(idx) & p1) == 0)
            st.coef(idx) += (if (st.coef(idx) >= 0) p1 else -p1)
        }
        k += 1
      }
      0
    }

    /** One luma AC block (first or refinement). Returns false on error. */
    def acBlock(base: Int): Boolean = {
      if (ah == 0) {
        // first scan for this band
        if (eobrun > 0) { eobrun -= 1; return true }
        var k = ss
        var done = false
        while (!done && k <= se) {
          val rs = bits.huffDecode(acTabs(scan(0)._3))
          if (rs < 0) return false
          val r = rs >> 4; val sBits = rs & 15
          if (sBits == 0) {
            if (r == 15) k += 16 // ZRL
            else {
              eobrun = (1 << r) - 1
              if (r > 0) {
                val extra = bits.receive(r)
                if (extra == Int.MinValue) return false
                eobrun += extra
              }
              done = true
            }
          } else {
            k += r
            if (k > se) return false
            val v = bits.receive(sBits)
            if (v == Int.MinValue) return false
            st.coef(base + Zigzag(k)) = extend(v, sBits) << al
            k += 1
          }
        }
        true
      } else {
        // refinement (G.1.2.3)
        val p1 = 1 << al
        if (eobrun > 0) {
          if (corrections(base, ss) < 0) return false
          eobrun -= 1
          return true
        }
        var k = ss
        var done = false
        while (!done && k <= se) {
          val rs = bits.huffDecode(acTabs(scan(0)._3))
          if (rs < 0) return false
          var r = rs >> 4; val sBits = rs & 15
          var newVal = 0
          if (sBits == 0) {
            if (r < 15) {
              eobrun = (1 << r) - 1
              if (r > 0) {
                val extra = bits.receive(r)
                if (extra == Int.MinValue) return false
                eobrun += extra
              }
              // the CURRENT block's tail gets correction bits; the run
              // count covers the blocks AFTER it (no decrement here)
              if (corrections(base, k) < 0) return false
              done = true
            }
            // r == 15 (ZRL): pass 16 zero-history coefficients below
          } else {
            if (sBits != 1) return false
            val bit = bits.nextBit()
            if (bit < 0) return false
            newVal = if (bit == 1) p1 else -p1
          }
          if (!done) {
            var placed = false
            while (!placed && k <= se) {
              val idx = base + Zigzag(k)
              if (st.coef(idx) != 0) {
                val bit = bits.nextBit()
                if (bit < 0) return false
                if (bit == 1 && (st.coef(idx) & p1) == 0)
                  st.coef(idx) += (if (st.coef(idx) >= 0) p1 else -p1)
              } else {
                if (r == 0) {
                  if (newVal != 0) st.coef(idx) = newVal
                  placed = true
                } else r -= 1
              }
              k += 1
            }
            if (!placed && newVal != 0) return false // band overrun
          }
        }
        true
      }
    }

    /** One DC data unit for scan component c; stores into luma when
      * `base >= 0`. Returns false on error. */
    def dcUnit(c: Int, base: Int): Boolean = {
      if (ah == 0) {
        val t = bits.huffDecode(dcTabs(scan(c)._2))
        if (t < 0 || t > 15) return false
        val diffBits = if (t == 0) 0 else bits.receive(t)
        if (diffBits == Int.MinValue) return false
        pred(c) += extend(diffBits, t)
        if (base >= 0) st.coef(base) = pred(c) << al
        true
      } else {
        val bit = bits.nextBit()
        if (bit < 0) return false
        if (base >= 0 && bit == 1) st.coef(base) |= (1 << al)
        true
      }
    }

    if (ss == 0 && scan.length > 1) {
      // interleaved DC scan: the baseline MCU geometry, all components
      // entropy-decoded, luma stored (padding blocks included — the
      // buffer is MCU-padded for exactly this)
      val totalMcus = st.mcusY.toLong * st.mcusX
      var mcu = 0
      while (mcu < totalMcus) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) {
          if (!bits.expectRestart(0xd0 + (rstIdx & 7)))
            return Left("jpeg_bad_restart")
          rstIdx += 1
          java.util.Arrays.fill(pred, 0)
          eobrun = 0
        }
        val mx = mcu % st.mcusX; val my = mcu / st.mcusX
        var c = 0
        while (c < scan.length) {
          val comp = comps(scan(c)._1)
          val isLuma = scan(c)._1 == 0
          var by = 0
          while (by < comp.v) {
            var bx = 0
            while (bx < comp.h) {
              val base =
                if (isLuma)
                  ((my * comp.v + by) * st.wBlocksPad + (mx * comp.h + bx)) * 64
                else -1
              if (!dcUnit(c, base)) return Left("jpeg_bad_data")
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        mcu += 1
      }
    } else {
      // non-interleaved LUMA scan (DC or AC band): one data unit per
      // MCU over the component's unpadded full-resolution raster
      val total = st.hBlocks.toLong * st.wBlocks
      var blk = 0
      while (blk < total) {
        if (ri > 0 && blk > 0 && blk % ri == 0) {
          if (!bits.expectRestart(0xd0 + (rstIdx & 7)))
            return Left("jpeg_bad_restart")
          rstIdx += 1
          java.util.Arrays.fill(pred, 0)
          eobrun = 0
        }
        val bx = (blk % st.wBlocks).toInt; val by = (blk / st.wBlocks).toInt
        val base = (by * st.wBlocksPad + bx) * 64
        val ok = if (ss == 0) dcUnit(0, base) else acBlock(base)
        if (!ok) return Left("jpeg_bad_data")
        blk += 1
      }
    }
    Right(
      if (bits.marker >= 0) bits.pos - 2
      else skipToMarker(b, bits.pos, end))
  }

  /** EOI for the progressive path: dequantize the accumulated luma
    * coefficients with the CURRENT luma table and IDCT every unpadded
    * block into the plane. Partial files (refinement scans missing)
    * decode to their coarse approximation — the format's own contract. */
  private def finishProgressive(st: ProgState, qt: Array[Array[Int]],
      qtSeen: Array[Boolean], comps: Array[Comp], width: Int,
      height: Int): Either[String, Gray] = {
    if (!qtSeen(comps(0).tq)) return Left("jpeg_no_dqt")
    val q = qt(comps(0).tq)
    val pix = new Array[Byte](width * height)
    val dq = new Array[Int](64)
    val tmp = new Array[Double](64)
    var by = 0
    while (by < st.hBlocks) {
      var bx = 0
      while (bx < st.wBlocks) {
        val base = (by * st.wBlocksPad + bx) * 64
        var k = 0
        while (k < 64) {
          val nat = Zigzag(k)
          dq(nat) = st.coef(base + nat) * q(k)
          k += 1
        }
        idctBlock(dq, tmp, pix, width, height, bx * 8, by * 8)
        bx += 1
      }
      by += 1
    }
    Right(Gray(width, height, pix))
  }

  /** Separable double IDCT of one dequantized block (natural order),
    * fixed summation order, +128 level shift, clamp — written into the
    * plane at (px0, py0) with edge clipping. Shared by the baseline MCU
    * loop and the progressive finish pass. */
  private def idctBlock(coef: Array[Int], tmp: Array[Double],
      pix: Array[Byte], width: Int, height: Int, px0: Int, py0: Int): Unit = {
    // rows: tmp(i)(x) = Σ_j ct(j)(x)·coef(i, j)
    var ii = 0
    while (ii < 8) {
      var x = 0
      while (x < 8) {
        var s2 = 0.0
        var j = 0
        while (j < 8) {
          val cv = coef(ii * 8 + j)
          if (cv != 0) s2 += Ct(j)(x) * cv
          j += 1
        }
        tmp(ii * 8 + x) = s2
        x += 1
      }
      ii += 1
    }
    var y = 0
    while (y < 8) {
      val py = py0 + y
      if (py < height) {
        var x = 0
        while (x < 8) {
          val px = px0 + x
          if (px < width) {
            var s2 = 0.0
            var iU = 0
            while (iU < 8) {
              s2 += Ct(iU)(y) * tmp(iU * 8 + x)
              iU += 1
            }
            val v = StrictMath.rint(s2) + 128.0
            val clamped =
              if (v <= 0.0) 0 else if (v >= 255.0) 255 else v.toInt
            pix(py * width + px) = clamped.toByte
          }
          x += 1
        }
      }
      y += 1
    }
  }

  // ─────────────── Fixture-grade encoders (tests + corpus) ───────────────

  // Annex-K-style table data (public spec). Correctness does NOT depend
  // on these exact values — the decoder reads whatever DQT/DHT the file
  // carries — they just make the fixtures look like real-world JPEGs.
  private val LumQBase: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private val ChrQBase: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).toArray
  private val DcChrBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).toArray
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcLumVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChrBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
  private val AcChrVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** libjpeg-convention quality scaling of a base table (public
    * knowledge): q<50 ⇒ 5000/q, else 200−2q percent, clamped to [1,255]. */
  private def scaledQ(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map { v =>
      val s = (v * scale + 50) / 100
      math.max(1, math.min(255, s))
    }
  }

  /** Encoder-side canonical codes from BITS/HUFFVAL (T.81 C.2):
    * symbol -> (code, length). */
  private def encCodes(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0; var k = 0
    var l = 1
    while (l <= 16) {
      var c = 0
      while (c < bits(l - 1)) {
        table(vals(k)) = (code, l)
        code += 1; k += 1; c += 1
      }
      code <<= 1
      l += 1
    }
    table
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >>> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf & 0xff)
          if ((buf & 0xff) == 0xff) out.write(0) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = {
      if (cnt > 0) {
        buf = (buf << (8 - cnt)) | ((1 << (8 - cnt)) - 1)
        out.write(buf & 0xff)
        if ((buf & 0xff) == 0xff) out.write(0)
        buf = 0; cnt = 0
      }
    }
  }

  private def writeMarker(out: java.io.ByteArrayOutputStream, m: Int): Unit = {
    out.write(0xff); out.write(m)
  }
  private def writeSeg(out: java.io.ByteArrayOutputStream, m: Int,
      data: Array[Int]): Unit = {
    writeMarker(out, m)
    val len = data.length + 2
    out.write(len >> 8); out.write(len & 0xff)
    data.foreach(v => out.write(v & 0xff))
  }

  /** FDCT + quantize one 8×8 block (source edge-replicated), returning
    * 64 quantized coefficients in ZIGZAG order. */
  private def fdctQuant(pix: Array[Byte], w: Int, h: Int, x0: Int, y0: Int,
      q: Array[Int]): Array[Int] = {
    val block = new Array[Double](64)
    var y = 0
    while (y < 8) {
      val sy = math.min(h - 1, y0 + y)
      var x = 0
      while (x < 8) {
        val sx = math.min(w - 1, x0 + x)
        block(y * 8 + x) = (pix(sy * w + sx) & 0xff) - 128.0
        x += 1
      }
      y += 1
    }
    // rows then columns with the shared Ct basis (see decoder IDCT)
    val tmp = new Array[Double](64)
    var iV = 0
    while (iV < 8) {
      var j = 0
      while (j < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += Ct(j)(x) * block(iV * 8 + x); x += 1 }
        tmp(iV * 8 + j) = s
        j += 1
      }
      iV += 1
    }
    val out = new Array[Int](64)
    var k = 0
    while (k < 64) {
      val nat = Zigzag(k)
      val fi = nat / 8; val fj = nat % 8
      var s = 0.0
      var y2 = 0
      while (y2 < 8) { s += Ct(fi)(y2) * tmp(y2 * 8 + fj); y2 += 1 }
      out(k) = StrictMath.rint(s / q(k)).toInt
      k += 1
    }
    out
  }

  /** Magnitude category (SSSS) of a coefficient value. */
  @inline private def ssss(v: Int): Int = {
    var a = math.abs(v); var t = 0
    while (a != 0) { a >>= 1; t += 1 }
    t
  }

  private def putCoef(bw: BitWriter, v: Int, t: Int): Unit =
    if (t > 0) bw.put(if (v < 0) v + (1 << t) - 1 else v, t)

  /** Encode one block's coefficients (zigzag order, already quantized). */
  private def encodeBlock(bw: BitWriter, zz: Array[Int], pred: Int,
      dc: Array[(Int, Int)], ac: Array[(Int, Int)]): Int = {
    val diff = zz(0) - pred
    val t = ssss(diff)
    val (dcode, dlen) = dc(t)
    bw.put(dcode, dlen)
    putCoef(bw, diff, t)
    var run = 0
    var k = 1
    while (k < 64) {
      if (zz(k) == 0) run += 1
      else {
        while (run >= 16) { val (c, l) = ac(0xf0); bw.put(c, l); run -= 16 }
        val s = ssss(zz(k))
        val (c, l) = ac((run << 4) | s)
        bw.put(c, l)
        putCoef(bw, zz(k), s)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (c, l) = ac(0x00); bw.put(c, l) } // EOB
    zz(0)
  }

  private def jfifApp0: Array[Int] =
    Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)

  private def dqtSeg(tq: Int, q: Array[Int]): Array[Int] =
    Array(tq) ++ q
  private def dhtSeg(tc: Int, th: Int, bits: Array[Int],
      vals: Array[Int]): Array[Int] =
    Array((tc << 4) | th) ++ bits ++ vals

  /** Fixture-grade baseline GRAYSCALE JPEG encoder (SOF0, Nf=1, standard-
    * style tables at `quality`, optional restart interval in MCUs).
    * Deterministic for fixed input on any host (StrictMath FDCT). */
  def encodeGray(width: Int, height: Int, pix: Array[Byte],
      quality: Int = 90, restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && pix.length == width * height,
      s"bad gray buffer: ${width}x$height vs ${pix.length}")
    val q = scaledQ(LumQBase, quality)
    val out = new java.io.ByteArrayOutputStream()
    writeMarker(out, 0xd8)
    writeSeg(out, 0xe0, jfifApp0)
    writeSeg(out, 0xdb, dqtSeg(0, q))
    writeSeg(out, 0xc0, Array(8, height >> 8, height & 0xff,
      width >> 8, width & 0xff, 1, 1, 0x11, 0))
    writeSeg(out, 0xc4, dhtSeg(0, 0, DcLumBits, DcLumVals))
    writeSeg(out, 0xc4, dhtSeg(1, 0, AcLumBits, AcLumVals))
    if (restartInterval > 0)
      writeSeg(out, 0xdd, Array(restartInterval >> 8, restartInterval & 0xff))
    writeSeg(out, 0xda, Array(1, 1, 0x00, 0, 63, 0))
    val dc = encCodes(DcLumBits, DcLumVals)
    val ac = encCodes(AcLumBits, AcLumVals)
    val bw = new BitWriter(out)
    val mcusX = (width + 7) / 8; val mcusY = (height + 7) / 8
    var pred = 0
    var rstIdx = 0
    var mcu = 0
    val total = mcusX * mcusY
    while (mcu < total) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        writeMarker(out, 0xd0 + (rstIdx & 7))
        rstIdx += 1
        pred = 0
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      val zz = fdctQuant(pix, width, height, mx * 8, my * 8, q)
      pred = encodeBlock(bw, zz, pred, dc, ac)
      mcu += 1
    }
    bw.flush()
    writeMarker(out, 0xd9)
    out.toByteArray
  }

  /** Fixture-grade PROGRESSIVE (SOF2) grayscale encoder: the simplest
    * legal scan script — one full-precision DC scan, then one AC scan of
    * the whole 1..63 band (spectral selection only, no successive
    * approximation; per-block EOBs, no cross-block runs). Coefficients
    * come from the SAME [[fdctQuant]] as [[encodeGray]], so
    * `decode(encodeGrayProgressive(...)) == decode(encodeGray(...))`
    * BIT-exact (both paths dequantize the same ints through the same
    * IDCT) — the ExtSpec/JpegSpec cross-encoding pin, PngGray's
    * interlaced-encoder contract applied to JPEG. `restartInterval`
    * applies per scan (DC predictors / EOB state reset). */
  def encodeGrayProgressive(width: Int, height: Int, pix: Array[Byte],
      quality: Int = 90, restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && pix.length == width * height,
      s"bad gray buffer: ${width}x$height vs ${pix.length}")
    val q = scaledQ(LumQBase, quality)
    val out = new java.io.ByteArrayOutputStream()
    writeMarker(out, 0xd8)
    writeSeg(out, 0xe0, jfifApp0)
    writeSeg(out, 0xdb, dqtSeg(0, q))
    writeSeg(out, 0xc2, Array(8, height >> 8, height & 0xff,
      width >> 8, width & 0xff, 1, 1, 0x11, 0))
    writeSeg(out, 0xc4, dhtSeg(0, 0, DcLumBits, DcLumVals))
    writeSeg(out, 0xc4, dhtSeg(1, 0, AcLumBits, AcLumVals))
    if (restartInterval > 0)
      writeSeg(out, 0xdd, Array(restartInterval >> 8, restartInterval & 0xff))
    val dc = encCodes(DcLumBits, DcLumVals)
    val ac = encCodes(AcLumBits, AcLumVals)
    val mcusX = (width + 7) / 8; val mcusY = (height + 7) / 8
    val total = mcusX * mcusY
    // ── scan 1: DC only (Ss = Se = 0, full precision) ──
    writeSeg(out, 0xda, Array(1, 1, 0x00, 0, 0, 0))
    var bw = new BitWriter(out)
    var pred = 0
    var rstIdx = 0
    var mcu = 0
    while (mcu < total) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        writeMarker(out, 0xd0 + (rstIdx & 7))
        rstIdx += 1
        pred = 0
      }
      val zz = fdctQuant(pix, width, height,
        (mcu % mcusX) * 8, (mcu / mcusX) * 8, q)
      val diff = zz(0) - pred
      pred = zz(0)
      val t = ssss(diff)
      val (c, l) = dc(t)
      bw.put(c, l)
      putCoef(bw, diff, t)
      mcu += 1
    }
    bw.flush()
    // ── scan 2: the whole AC band (Ss = 1, Se = 63) ──
    writeSeg(out, 0xda, Array(1, 1, 0x00, 1, 63, 0))
    bw = new BitWriter(out)
    rstIdx = 0
    mcu = 0
    while (mcu < total) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        writeMarker(out, 0xd0 + (rstIdx & 7))
        rstIdx += 1
      }
      val zz = fdctQuant(pix, width, height,
        (mcu % mcusX) * 8, (mcu / mcusX) * 8, q)
      var run = 0
      var k = 1
      while (k < 64) {
        if (zz(k) == 0) run += 1
        else {
          while (run >= 16) { val (c, l) = ac(0xf0); bw.put(c, l); run -= 16 }
          val sB = ssss(zz(k))
          val (c, l) = ac((run << 4) | sB)
          bw.put(c, l)
          putCoef(bw, zz(k), sB)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (c, l) = ac(0x00); bw.put(c, l) } // EOB (run of 1)
      mcu += 1
    }
    bw.flush()
    writeMarker(out, 0xd9)
    out.toByteArray
  }

  /** Fixture-grade baseline COLOR (YCbCr 4:2:0) JPEG encoder: `pix` is
    * the luma plane; `cb`/`cr` are the quarter-res chroma planes
    * (⌈w/2⌉×⌈h/2⌉ bytes, default neutral 128). The luma blocks run the
    * SAME FDCT/quant as [[encodeGray]] at the same quality — so
    * `decode(encodeColor420(...)).pix == decode(encodeGray(...)).pix`
    * bit-exact, which is the ExtSpec proof that the decoder's chroma
    * entropy-skip keeps bitstream sync (with NON-neutral chroma planes,
    * a sync bug cannot hide). */
  def encodeColor420(width: Int, height: Int, pix: Array[Byte],
      cb: Array[Byte] = null, cr: Array[Byte] = null,
      quality: Int = 90, restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && pix.length == width * height,
      s"bad luma buffer: ${width}x$height vs ${pix.length}")
    val cw = (width + 1) / 2; val ch = (height + 1) / 2
    val cbP = if (cb != null) cb else Array.fill[Byte](cw * ch)(128.toByte)
    val crP = if (cr != null) cr else Array.fill[Byte](cw * ch)(128.toByte)
    require(cbP.length == cw * ch && crP.length == cw * ch,
      s"chroma planes must be ${cw}x$ch")
    val qL = scaledQ(LumQBase, quality)
    val qC = scaledQ(ChrQBase, quality)
    val out = new java.io.ByteArrayOutputStream()
    writeMarker(out, 0xd8)
    writeSeg(out, 0xe0, jfifApp0)
    writeSeg(out, 0xdb, dqtSeg(0, qL) ++ dqtSeg(1, qC)) // two tables, one DQT
    writeSeg(out, 0xc0, Array(8, height >> 8, height & 0xff,
      width >> 8, width & 0xff, 3,
      1, 0x22, 0, // Y: 2x2 sampling, luma table
      2, 0x11, 1, // Cb
      3, 0x11, 1)) // Cr
    writeSeg(out, 0xc4,
      dhtSeg(0, 0, DcLumBits, DcLumVals) ++ dhtSeg(1, 0, AcLumBits, AcLumVals) ++
        dhtSeg(0, 1, DcChrBits, DcChrVals) ++ dhtSeg(1, 1, AcChrBits, AcChrVals))
    if (restartInterval > 0)
      writeSeg(out, 0xdd, Array(restartInterval >> 8, restartInterval & 0xff))
    writeSeg(out, 0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val dcL = encCodes(DcLumBits, DcLumVals); val acL = encCodes(AcLumBits, AcLumVals)
    val dcC = encCodes(DcChrBits, DcChrVals); val acC = encCodes(AcChrBits, AcChrVals)
    val bw = new BitWriter(out)
    val mcusX = (width + 15) / 16; val mcusY = (height + 15) / 16
    var predY = 0; var predCb = 0; var predCr = 0
    var rstIdx = 0
    var mcu = 0
    val total = mcusX * mcusY
    while (mcu < total) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        writeMarker(out, 0xd0 + (rstIdx & 7))
        rstIdx += 1
        predY = 0; predCb = 0; predCr = 0
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var by = 0
      while (by < 2) {
        var bx = 0
        while (bx < 2) {
          val zz = fdctQuant(pix, width, height,
            (mx * 2 + bx) * 8, (my * 2 + by) * 8, qL)
          predY = encodeBlock(bw, zz, predY, dcL, acL)
          bx += 1
        }
        by += 1
      }
      val zzCb = fdctQuant(cbP, cw, ch, mx * 8, my * 8, qC)
      predCb = encodeBlock(bw, zzCb, predCb, dcC, acC)
      val zzCr = fdctQuant(crP, cw, ch, mx * 8, my * 8, qC)
      predCr = encodeBlock(bw, zzCr, predCr, dcC, acC)
      mcu += 1
    }
    bw.flush()
    writeMarker(out, 0xd9)
    out.toByteArray
  }
}

/** Magic-byte dispatch over the constrained image codecs — THE decode
  * every image expression calls. PNG signature → [[PngGray]]; JPEG SOI →
  * [[JpegGray]]; `GIF8` → [[GifGray]] (r17); anything else is
  * `not_image` (one odd blob poisons its row, never the job). Adding a
  * codec here upgrades dHash, the grid and spectral descriptors, and the
  * luma proof artifact simultaneously — they are all consumers of the
  * same luminance plane. */
private[graft] object ImageCodecs {
  def decode(payload: Array[Byte]): Either[String, PngGray.Gray] = {
    if (payload.length >= 2 && (payload(0) & 0xff) == 0xff &&
      (payload(1) & 0xff) == 0xd8) JpegGray.decode(payload)
    else if (payload.length >= 1 && (payload(0) & 0xff) == 0x89)
      PngGray.decode(payload)
    else if (payload.length >= 4 && payload(0) == 'G' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == '8') GifGray.decode(payload)
    else if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M')
      BmpGray.decode(payload)
    else if (MjpegAvi.isAvi(payload))
      // r18 video content tier: an MJPEG AVI's frame 0 IS a baseline
      // JPEG — extract and decode it, and every consumer of this
      // dispatch (dHash, grid, spectral, luma) becomes a FIRST-FRAME
      // feature over video with zero new machinery
      MjpegAvi.frameBytes(payload).flatMap(JpegGray.decode)
    else if (Mp4Jpeg.isMp4(payload))
      // r19: the same rung for the second container — a jpeg-codec mp4's
      // frame 0 resolves through the stsc/stsz/stco sample tables to a
      // baseline JPEG; opaque codecs (avc1 …) refuse inside the walk and
      // the row survives like any undecodable payload
      Mp4Jpeg.frameBytes(payload).flatMap(JpegGray.decode)
    else Left("not_image")
  }
}
