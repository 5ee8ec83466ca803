package graft.functions

/** Constrained WAV/RIFF PCM decoder — the audio analogue of [[PngGray]]:
  * a REAL decoder for the canonical WAV subset a training-data pipeline's
  * audio tier commonly carries (integer PCM, the format every recorder and
  * transcoder can emit), implemented from the public RIFF/WAVE spec
  * (Microsoft/IBM Multimedia Programming Interface, 1991; the same layout
  * [[MediaHeader]] header-parses) — chunk walk with the RIFF odd-size pad
  * rule, `fmt ` validation, and sample decode for integer PCM at 8
  * (unsigned) / 16 / 24 / 32 bits (signed LE; 24/32 reduce to the shared
  * 16-bit scale by the high-16 convention), IEEE float32 PCM (format
  * tag 3: clamp to [−1, 1], scale by 32767, rint; non-finite samples map
  * to 0), G.711 companded telephony audio (r18 — tags 7 µ-law / 6 A-law,
  * the 256-entry logarithmic tables from the public ITU-T G.711 spec,
  * 8-bit codes decoding EXACTLY to their defined 16-bit-scale values),
  * and WAVE_FORMAT_EXTENSIBLE wrappers (tag 0xFFFE: the real tag
  * from the SubFormat GUID — the layout every >2-channel or 24-bit
  * encoder emits; the ALAW/MULAW subtype GUIDs share the tag-in-GUID
  * layout so companded extensible WAVs route too), mono or multi-channel
  * (channels mix to mono by
  * integer floor-average, the deterministic reduction every downstream
  * feature shares). Anything outside the subset (compressed formats,
  * float64) lands in a per-row error `Left` — one odd blob poisons its
  * row, never the job, the [[MediaHeader]] contract.
  *
  * Reference behavior: the reference pipeline treats storage objects as
  * opaque blobs it downloads/uploads whole (`/root/reference/utils/
  * auto_healer.py:59-72`, `dag/self_healing_pipeline.py:86-98`);
  * decoding is this engine's extension surface, same as the PNG tier.
  *
  * Decode rules (strict, each violation its own error string):
  *  - `RIFF....WAVE` container, else `wav_not_riff`; truncated header
  *    `wav_truncated`.
  *  - Chunks walk as [id(4) | size(4, LE) | body | pad byte if size odd]
  *    (the RIFF word-align rule — a decoder that skips the pad misreads
  *    every chunk after an odd-sized one). A chunk body running past the
  *    payload: `wav_chunk_truncated`.
  *  - Exactly the FIRST `fmt ` chunk binds (≥ 16 bytes else
  *    `wav_bad_fmt`); it must precede `data` (`wav_no_fmt` otherwise —
  *    the canonical ordering [[MediaHeader]] also requires). Validated:
  *    format tag 1 = integer PCM else `wav_not_pcm`; 1-8 channels else
  *    `wav_bad_channels`; positive sample rate else `wav_bad_rate`; bits
  *    8 or 16 else `wav_bad_bits`; block align == channels·bits/8 else
  *    `wav_bad_block_align` (a lying block align desyncs frame math
  *    silently — refuse loudly instead, the IHDR-method-byte rule).
  *  - The FIRST `data` chunk binds; absent: `wav_no_data`; its size not
  *    a multiple of block align: `wav_bad_data_size`.
  *
  * Sample semantics: 16-bit samples are signed LE as stored; 8-bit
  * samples are unsigned midpoint-128 and normalize to the 16-bit scale as
  * `(b - 128) << 8` so one feature pipeline serves both depths (the
  * high-byte convention mirroring PngGray's 16-bit reduction, inverted).
  * Multi-channel frames mix to mono as `floorDiv(sum, channels)` —
  * integer-exact and therefore byte-replayable cross-engine (q88's
  * oracle); equal-channel stereo reproduces the mono samples EXACTLY
  * (floorDiv(c·s, c) = s), which is how the synthetic corpus exercises
  * the multi-channel path with zero feature movement.
  */
object WavPcm {

  /** A decoded clip: `samples` are mono-mixed, 16-bit-scaled ints
    * (whatever the stored depth or float encoding). */
  final case class Pcm(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Int])

  // ───── G.711 companding (r18): format tags 7 (µ-law) / 6 (A-law) ─────
  // The telephony codecs real audio corpora carry when they are not raw
  // PCM — both are pure 256-entry table lookups from the public ITU-T
  // G.711 spec (tables as published in CCITT's reference code): 8-bit
  // logarithmic code → 16-bit-scale linear sample. µ-law: complement,
  // then ((quant << 3) + 132) << segment, bias-corrected, sign from bit
  // 7. A-law: XOR 0x55, then the per-segment linearization (segments 0/1
  // are linear, higher ones double). Decode is EXACT by construction
  // (the spec defines the byte→linear mapping); encode is the lossy
  // direction, used only by fixtures/corpus.

  /** µ-law byte → linear sample (G.711 table; max magnitude 32124). */
  private[graft] val UlawToLinear: Array[Int] = Array.tabulate(256) { u =>
    val uv = ~u & 0xff
    val t = (((uv & 0x0f) << 3) + 0x84) << ((uv & 0x70) >> 4)
    if ((uv & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** A-law byte → linear sample (G.711 table; max magnitude 32256). */
  private[graft] val AlawToLinear: Array[Int] = Array.tabulate(256) { a =>
    val av = a ^ 0x55
    val seg = (av & 0x70) >> 4
    var t = (av & 0x0f) << 4
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else { t += 0x108; t <<= seg - 1 }
    if ((av & 0x80) != 0) t else -t
  }

  /** Linear 16-bit sample → µ-law byte (G.711 encode: bias, clip at
    * 8159 on the 14-bit scale, segment search, complement). */
  private[graft] def linearToUlaw(pcm: Int): Int = {
    var v = math.max(-32768, math.min(32767, pcm)) >> 2
    val mask = if (v < 0) { v = -v; 0x7f } else 0xff
    if (v > 8159) v = 8159
    v += 0x84 >> 2 // bias on the 14-bit scale (33)
    var seg = 0
    while (seg < 8 && v > ((0x3f << seg) | ((1 << seg) - 1))) seg += 1
    if (seg >= 8) 0x7f ^ mask
    else (((seg << 4) | ((v >> (seg + 1)) & 0x0f)) ^ mask) & 0xff
  }

  /** Linear 16-bit sample → A-law byte (G.711 encode: 13-bit scale,
    * segment search, XOR 0x55 transmission toggle). */
  private[graft] def linearToAlaw(pcm: Int): Int = {
    var v = math.max(-32768, math.min(32767, pcm)) >> 3
    val mask = if (v >= 0) 0xd5 else { v = -v - 1; 0x55 }
    var seg = 0
    while (seg < 8 && v > ((0x1f << seg) | ((1 << seg) - 1))) seg += 1
    if (seg >= 8) 0x7f ^ mask
    else {
      val quant = if (seg < 2) (v >> 1) & 0x0f else (v >> seg) & 0x0f
      (((seg << 4) | quant) ^ mask) & 0xff
    }
  }

  private def ascii(b: Array[Byte], off: Int, s: String): Boolean = {
    if (off + s.length > b.length) return false
    var i = 0
    while (i < s.length) {
      if (b(off + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  def decode(payload: Array[Byte]): Either[String, Pcm] = {
    val b = payload
    if (b.length < 12) return Left("wav_truncated")
    if (!ascii(b, 0, "RIFF") || !ascii(b, 8, "WAVE")) return Left("wav_not_riff")
    // fmt fields captured when the chunk binds
    var haveFmt = false
    var channels = 0; var rate = 0; var bits = 0; var blockAlign = 0
    var floatPcm = false
    var compand: Array[Int] = null // G.711 table when tag is 6/7
    var off = 12
    while (off + 8 <= b.length) {
      val size = le32(b, off + 4)
      if (size > Int.MaxValue - 8) return Left("wav_chunk_truncated")
      val body = off + 8
      if (body + size > b.length) return Left("wav_chunk_truncated")
      if (ascii(b, off, "fmt ") && !haveFmt) {
        if (size < 16) return Left("wav_bad_fmt")
        var fmtTag = le16(b, body)
        // WAVE_FORMAT_EXTENSIBLE (0xFFFE, r17): the real tag is the
        // first two bytes of the SubFormat GUID at body+24 — the layout
        // every >2-channel or 24-bit encoder emits in practice
        if (fmtTag == 0xfffe) {
          if (size < 40) return Left("wav_bad_fmt")
          fmtTag = le16(b, body + 24)
        }
        if (fmtTag != 1 && fmtTag != 3 && fmtTag != 6 && fmtTag != 7)
          return Left("wav_not_pcm")
        floatPcm = fmtTag == 3
        // G.711 companded telephony WAVs (r18): tag 6 = A-law, 7 = µ-law
        compand =
          if (fmtTag == 6) AlawToLinear
          else if (fmtTag == 7) UlawToLinear
          else null
        channels = le16(b, body + 2)
        if (channels < 1 || channels > 8) return Left("wav_bad_channels")
        val r = le32(b, body + 4)
        if (r <= 0 || r > Int.MaxValue) return Left("wav_bad_rate")
        rate = r.toInt
        blockAlign = le16(b, body + 12)
        bits = le16(b, body + 14)
        // integer PCM: 8 (unsigned) / 16 / 24 / 32 (signed LE);
        // float PCM: 32-bit IEEE only (float64 WAVs are vanishingly
        // rare and stay out of the subset); G.711 codes are 8-bit by
        // definition
        if (floatPcm) { if (bits != 32) return Left("wav_bad_bits") }
        else if (compand != null) { if (bits != 8) return Left("wav_bad_bits") }
        else if (bits != 8 && bits != 16 && bits != 24 && bits != 32)
          return Left("wav_bad_bits")
        if (blockAlign != channels * (bits / 8)) return Left("wav_bad_block_align")
        haveFmt = true
      } else if (ascii(b, off, "data")) {
        if (!haveFmt) return Left("wav_no_fmt")
        val n = size.toInt
        if (n % blockAlign != 0) return Left("wav_bad_data_size")
        val frames = n / blockAlign
        val mono = new Array[Int](frames)
        val bytesPer = bits / 8
        var f = 0
        while (f < frames) {
          val base = body + f * blockAlign
          var sum = 0L
          var c = 0
          while (c < channels) {
            val o = base + c * bytesPer
            val s =
              if (compand != null) compand(b(o) & 0xff) // G.711 table
              else if (floatPcm) {
                // IEEE float32 → the shared 16-bit scale: clamp to
                // [-1, 1], round half-even (rint — deterministic);
                // non-finite samples map to 0 (a NaN blob poisoning a
                // whole clip would be louder than the data warrants:
                // every other sample is still real audio)
                val fv = java.lang.Float.intBitsToFloat(le32(b, o).toInt)
                if (java.lang.Float.isNaN(fv) || java.lang.Float.isInfinite(fv)) 0
                else StrictMath.rint(
                  math.max(-1.0, math.min(1.0, fv.toDouble)) * 32767.0).toInt
              }
              else if (bits == 32) le32(b, o).toInt >> 16 // high-16 reduction
              else if (bits == 24) // signed 24-bit LE, high-16 reduction
                (((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
                  ((b(o + 2) & 0xff) << 16)) << 8) >> 16
              else if (bits == 16) le16(b, o).toShort.toInt
              else ((b(o) & 0xff) - 128) << 8
            sum += s
            c += 1
          }
          mono(f) = java.lang.Math.floorDiv(sum, channels.toLong).toInt
          f += 1
        }
        return Right(Pcm(rate, channels, bits, mono))
      }
      off = body + size.toInt + (size.toInt & 1) // RIFF pad rule
    }
    if (!haveFmt) Left("wav_no_fmt") else Left("wav_no_data")
  }

  // ───── Fixture/corpus encoders (canonical chunk layout) ─────

  private def wLe16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }

  private def wLe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  private def header(out: java.io.ByteArrayOutputStream, dataBytes: Int,
      rate: Int, channels: Int, bits: Int): Unit = {
    val blockAlign = channels * (bits / 8)
    out.write("RIFF".getBytes("US-ASCII")); wLe32(out, 36 + dataBytes)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); wLe32(out, 16)
    wLe16(out, 1); wLe16(out, channels); wLe32(out, rate)
    wLe32(out, rate * blockAlign); wLe16(out, blockAlign); wLe16(out, bits)
    out.write("data".getBytes("US-ASCII")); wLe32(out, dataBytes)
  }

  /** 16-bit signed PCM; every channel carries the same mono samples
    * (values clamp to the 16-bit range). */
  def encodePcm16(rate: Int, channels: Int, mono: Array[Int]): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"channels 1-8, got $channels")
    val out = new java.io.ByteArrayOutputStream(44 + mono.length * channels * 2)
    header(out, mono.length * channels * 2, rate, channels, 16)
    var i = 0
    while (i < mono.length) {
      val v = math.max(-32768, math.min(32767, mono(i)))
      var c = 0
      while (c < channels) { wLe16(out, v & 0xffff); c += 1 }
      i += 1
    }
    out.toByteArray
  }

  /** 24-bit signed PCM: stores `v << 8` per channel (the inverse of the
    * decode-side high-16 reduction, so a round-trip is value-EXACT on
    * the whole 16-bit scale — unlike 8-bit's lossy quantization). */
  def encodePcm24(rate: Int, channels: Int, mono: Array[Int]): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"channels 1-8, got $channels")
    val out = new java.io.ByteArrayOutputStream(44 + mono.length * channels * 3)
    header(out, mono.length * channels * 3, rate, channels, 24)
    var i = 0
    while (i < mono.length) {
      val v = math.max(-32768, math.min(32767, mono(i))) << 8
      var c = 0
      while (c < channels) {
        out.write(v & 0xff); out.write((v >>> 8) & 0xff)
        out.write((v >>> 16) & 0xff)
        c += 1
      }
      i += 1
    }
    out.toByteArray
  }

  /** IEEE float32 PCM (format tag 3): stores `v / 32767f` per channel —
    * the decode-side clamp+rint recovers `v` exactly (float32 carries
    * ~7 significant digits; the scaled error is ≪ 0.5). */
  def encodeFloat32(rate: Int, channels: Int, mono: Array[Int]): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"channels 1-8, got $channels")
    val out = new java.io.ByteArrayOutputStream(44 + mono.length * channels * 4)
    val blockAlign = channels * 4
    out.write("RIFF".getBytes("US-ASCII"))
    wLe32(out, 36 + mono.length * blockAlign)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); wLe32(out, 16)
    wLe16(out, 3); wLe16(out, channels); wLe32(out, rate)
    wLe32(out, rate * blockAlign); wLe16(out, blockAlign); wLe16(out, 32)
    out.write("data".getBytes("US-ASCII"))
    wLe32(out, mono.length * blockAlign)
    var i = 0
    while (i < mono.length) {
      val v = math.max(-32768, math.min(32767, mono(i)))
      val fBits = java.lang.Float.floatToIntBits(v / 32767.0f)
      var c = 0
      while (c < channels) { wLe32(out, fBits); c += 1 }
      i += 1
    }
    out.toByteArray
  }

  /** 24-bit PCM behind a WAVE_FORMAT_EXTENSIBLE wrapper (tag 0xFFFE,
    * 40-byte fmt, KSDATAFORMAT_SUBTYPE_PCM GUID) — the layout every
    * >2-channel or 24-bit encoder emits in practice. */
  def encodePcm24Extensible(rate: Int, channels: Int,
      mono: Array[Int]): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"channels 1-8, got $channels")
    val blockAlign = channels * 3
    val out = new java.io.ByteArrayOutputStream(68 + mono.length * blockAlign)
    out.write("RIFF".getBytes("US-ASCII"))
    wLe32(out, 60 + mono.length * blockAlign)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); wLe32(out, 40)
    wLe16(out, 0xfffe); wLe16(out, channels); wLe32(out, rate)
    wLe32(out, rate * blockAlign); wLe16(out, blockAlign); wLe16(out, 24)
    wLe16(out, 22)        // cbSize
    wLe16(out, 24)        // valid bits per sample
    wLe32(out, 0)         // channel mask (unspecified)
    // KSDATAFORMAT_SUBTYPE_PCM: 00000001-0000-0010-8000-00AA00389B71
    wLe32(out, 1); wLe16(out, 0); wLe16(out, 0x10)
    out.write(Array[Byte](0x80.toByte, 0x00, 0x00, 0xAA.toByte,
      0x00, 0x38, 0x9B.toByte, 0x71))
    out.write("data".getBytes("US-ASCII"))
    wLe32(out, mono.length * blockAlign)
    var i = 0
    while (i < mono.length) {
      val v = math.max(-32768, math.min(32767, mono(i))) << 8
      var c = 0
      while (c < channels) {
        out.write(v & 0xff); out.write((v >>> 8) & 0xff)
        out.write((v >>> 16) & 0xff)
        c += 1
      }
      i += 1
    }
    out.toByteArray
  }

  /** G.711 µ-law WAV (format tag 7, 8 bits/code): lossy logarithmic
    * companding — `decode(encodeUlaw(x))` returns `UlawToLinear(
    * linearToUlaw(x))`, the spec's quantization of x (≤ 3.1% relative
    * error above the deepest segment). Pre-quantize with
    * [[quantizeUlaw]] when a fixture needs a value-exact round-trip. */
  def encodeUlaw(rate: Int, channels: Int, mono: Array[Int]): Array[Byte] =
    encodeG711(rate, channels, mono, tag = 7, linearToUlaw)

  /** G.711 A-law WAV (format tag 6, 8 bits/code); see [[encodeUlaw]]. */
  def encodeAlaw(rate: Int, channels: Int, mono: Array[Int]): Array[Byte] =
    encodeG711(rate, channels, mono, tag = 6, linearToAlaw)

  /** The µ-law codebook value nearest x under the spec's encoder — what
    * a µ-law round-trip returns (corpus slices pre-quantize with this so
    * planted invariants are measured against the stored waveform). */
  def quantizeUlaw(x: Int): Int = UlawToLinear(linearToUlaw(x))

  /** A-law twin of [[quantizeUlaw]]. */
  def quantizeAlaw(x: Int): Int = AlawToLinear(linearToAlaw(x))

  private def encodeG711(rate: Int, channels: Int, mono: Array[Int],
      tag: Int, enc: Int => Int): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"channels 1-8, got $channels")
    val out = new java.io.ByteArrayOutputStream(44 + mono.length * channels)
    val blockAlign = channels
    out.write("RIFF".getBytes("US-ASCII"))
    wLe32(out, 36 + mono.length * blockAlign)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); wLe32(out, 16)
    wLe16(out, tag); wLe16(out, channels); wLe32(out, rate)
    wLe32(out, rate * blockAlign); wLe16(out, blockAlign); wLe16(out, 8)
    out.write("data".getBytes("US-ASCII"))
    wLe32(out, mono.length * blockAlign)
    var i = 0
    while (i < mono.length) {
      val code = enc(mono(i))
      var c = 0
      while (c < channels) { out.write(code); c += 1 }
      i += 1
    }
    out.toByteArray
  }

  /** 8-bit unsigned PCM: stores the high byte + 128 (the inverse of the
    * decode-side `(b - 128) << 8` normalization, so a round-trip is
    * value-exact on samples that are multiples of 256). */
  def encodePcm8(rate: Int, channels: Int, mono: Array[Int]): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"channels 1-8, got $channels")
    val out = new java.io.ByteArrayOutputStream(44 + mono.length * channels)
    header(out, mono.length * channels, rate, channels, 8)
    var i = 0
    while (i < mono.length) {
      val v = math.max(-32768, math.min(32767, mono(i)))
      val q = ((v >> 8) + 128) & 0xff
      var c = 0
      while (c < channels) { out.write(q); c += 1 }
      i += 1
    }
    out.toByteArray
  }
}
