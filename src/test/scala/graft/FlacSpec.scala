package graft

import graft.functions.{FlacPcm, WavPcm}

/** FLAC codec witnesses. No JDK FLAC parser exists (unlike ImageIO /
  * javax.sound for every other codec here), so the posture is the
  * documented GIF/BMP playbook minus the foreign fuzz: fixture encoders
  * spanning the subframe/stereo/partition matrix, exact round-trips,
  * spec-derived hand vectors (Rice, zigzag, fixed predictors, mid/side
  * reconstruction), WAV-equality through the shared AudioCodecs scale,
  * and hostile-bytes fuzz. */
class FlacSpec extends SparkSpec {

  private def wave(n: Int, seed: Long): Array[Int] =
    graft.ext.Multimodal.waveformSamples(seed, n, 0)

  test("FlacPcm: exact round-trips across the subframe/stereo/partition matrix") {
    val mono = wave(4000, 7L)
    // every strategy decodes the identical samples back
    for (strategy <- Seq("auto", "verbatim", "fixed0", "fixed1", "fixed2",
        "fixed3", "fixed4", "lpc")) {
      val enc = FlacPcm.encode(44100, 1, mono, strategy = strategy,
        blockSize = 1024)
      val d = FlacPcm.decode(enc).getOrElse(fail(s"$strategy decode failed"))
      assert(d.sampleRate == 44100 && d.channels == 1 && d.bitsPerSample == 16)
      assert(d.samples.toSeq == mono.toSeq, s"$strategy round-trip")
    }
    // constant subframes (a DC clip)
    val dc = Array.fill(600)(-12345)
    assert(FlacPcm.decode(FlacPcm.encode(8000, 1, dc, blockSize = 600))
      .exists(_.samples.toSeq == dc.toSeq))
    // Rice partition orders: 1, 2, 4 partitions per frame
    for (po <- Seq(1, 2, 4)) {
      val enc = FlacPcm.encode(16000, 1, mono.take(2048),
        strategy = "fixed2", blockSize = 512, partitionOrder = po)
      assert(FlacPcm.decode(enc).exists(_.samples.toSeq == mono.take(2048).toSeq),
        s"partition order $po")
    }
    // stereo decorrelation modes: equal channels mix back exactly
    for (mode <- Seq("independent", "mid_side", "left_side", "right_side")) {
      val enc = FlacPcm.encode(22050, 2, mono.take(1024),
        stereoMode = mode, blockSize = 256)
      val d = FlacPcm.decode(enc).getOrElse(fail(s"$mode decode failed"))
      assert(d.channels == 2 && d.samples.toSeq == mono.take(1024).toSeq,
        s"stereo $mode")
    }
    // independent multi-channel (through quad)
    for (ch <- Seq(4, 8)) {
      val enc = FlacPcm.encode(8000, ch, mono.take(512), blockSize = 256)
      assert(FlacPcm.decode(enc).exists(_.samples.toSeq == mono.take(512).toSeq),
        s"$ch-channel")
    }
    // a non-multiple tail: last frame shorter than blockSize
    val odd = mono.take(1000)
    assert(FlacPcm.decode(FlacPcm.encode(8000, 1, odd, blockSize = 256))
      .exists(_.samples.toSeq == odd.toSeq))
    // full-range extremes survive (16-bit min/max, alternating)
    val extremes = Array.tabulate(300)(i => if (i % 2 == 0) -32768 else 32767)
    for (strategy <- Seq("verbatim", "fixed2", "lpc"))
      assert(FlacPcm.decode(FlacPcm.encode(8000, 1, extremes,
        strategy = strategy, blockSize = 300))
        .exists(_.samples.toSeq == extremes.toSeq), s"extremes $strategy")
    // regression (r18): a lone outlier NEAR THE FRAME END whose Rice
    // quotient run is longer than every bit after it — the first decoder
    // carried a `q > remaining` unary runaway guard that false-bailed
    // this legal stream as flac_truncated (the 97/200k probe failures)
    val spike = wave(2048, 77L)
    spike(2040) += 1000
    assert(FlacPcm.decode(FlacPcm.encode(16000, 1, spike,
      strategy = "fixed2", blockSize = 2048))
      .exists(_.samples.toSeq == spike.toSeq), "late-spike unary run")
  }

  test("FlacPcm: FLAC and WAV encodings of one waveform decode identically through AudioCodecs") {
    import graft.functions.AudioCodecs
    val mono = wave(2048, 42L)
    val viaWav = AudioCodecs.decode(WavPcm.encodePcm16(16000, 1, mono))
      .getOrElse(fail("wav decode failed"))
    val viaFlac = AudioCodecs.decode(FlacPcm.encode(16000, 1, mono))
      .getOrElse(fail("flac decode failed"))
    assert(viaWav.samples.toSeq == viaFlac.samples.toSeq)
    assert(viaWav.sampleRate == viaFlac.sampleRate)
    // stereo mid/side FLAC == stereo WAV (both mix equal channels back)
    val stWav = AudioCodecs.decode(WavPcm.encodePcm16(16000, 2, mono))
    val stFlac = AudioCodecs.decode(
      FlacPcm.encode(16000, 2, mono, stereoMode = "mid_side"))
    assert(stWav.toOption.get.samples.toSeq == stFlac.toOption.get.samples.toSeq)
    // neither magic → the dispatch refusal
    assert(AudioCodecs.decode("neither container".getBytes) == Left("not_audio"))
  }

  test("FlacPcm: spec-derived vectors (zigzag Rice, fixed predictors, mid/side)") {
    // order-2 fixed prediction: s[k] = res[k] + 2s[k-1] - s[k-2]; a pure
    // linear ramp has zero residual everywhere — the encoded frame's
    // residual partition must Rice-code all-zeros, and any corruption of
    // the warmup shows up as a slope change. Decode proves the algebra.
    val ramp = Array.tabulate(64)(i => 100 + 7 * i)
    val enc = FlacPcm.encode(8000, 1, ramp, strategy = "fixed2", blockSize = 64)
    assert(FlacPcm.decode(enc).exists(_.samples.toSeq == ramp.toSeq))
    // zigzag: residuals alternating +1/-1 around the order-1 prediction
    val saw = Array.tabulate(64)(i => 1000 + (if (i % 2 == 0) 0 else 1))
    assert(FlacPcm.decode(FlacPcm.encode(8000, 1, saw,
      strategy = "fixed1", blockSize = 64)).exists(_.samples.toSeq == saw.toSeq))
    // mid/side with UNEQUAL channels is exercised by construction inside
    // the decoder (the encoder here only emits side ≡ 0), so pin the
    // reconstruction algebra directly: for any (L, R), mid = (L+R)>>1
    // stored with side's low bit restores both exactly
    for ((l, r) <- Seq((5, 2), (-7, 3), (32767, -32768), (0, -1), (-1, 0))) {
      val side = l - r
      val mid = (l + r) >> 1
      val mid2 = (mid << 1) | (side & 1)
      assert(((mid2 + side) >> 1) == l && ((mid2 - side) >> 1) == r,
        s"mid/side algebra for ($l, $r)")
    }
  }

  test("FlacPcm: error taxonomy and hostile-bytes fuzz never throw") {
    val mono = wave(512, 3L)
    val good = FlacPcm.encode(8000, 1, mono, blockSize = 256)
    assert(FlacPcm.decode(good).isRight)
    assert(FlacPcm.decode("not a flac stream".getBytes) == Left("flac_not_flac"))
    assert(FlacPcm.decode("fLa".getBytes) == Left("flac_not_flac"))
    // magic alone: truncated metadata
    assert(FlacPcm.decode("fLaC".getBytes) == Left("flac_truncated"))
    // first block is not STREAMINFO
    val noInfo = good.clone(); noInfo(4) = 0x04 // type 4 (VORBIS_COMMENT)
    assert(FlacPcm.decode(noInfo) == Left("flac_no_streaminfo"))
    // the documented 33-bit corner: a 32-bps stream whose frame uses
    // left/side stereo puts 33 bits on the side channel — spec-legal but
    // beyond the Int sample lanes, so the taxonomy carries a DISTINCT
    // loud refusal (r18 advice; the fixture encoder is 16-bit-only, so
    // this stream is hand-assembled: STREAMINFO at 2ch/32bps, then one
    // frame header (blockSize 192, left/side, 32 bps, valid CRC-8), a
    // CONSTANT left subframe, and the side subframe header that trips
    // the width check)
    locally {
      def crc8(bs: Array[Byte]): Byte = {
        var c = 0
        bs.foreach { x =>
          c = c ^ (x & 0xff)
          (0 until 8).foreach { _ =>
            c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff
          }
        }
        c.toByte
      }
      val info = new Array[Byte](34)
      info(10) = 0x01; info(11) = 0xf4.toByte // rate 8000 (20 bits)
      info(12) = 0x03 // rate low nibble 0 | channels-1=1 | bps-1 top bit
      info(13) = 0xf0.toByte // bps-1 low nibble = 0xF (bps 32) | total=0
      val header = Array[Byte](0xff.toByte, 0xf8.toByte, 0x10, 0x8e.toByte, 0x00)
      val stream = "fLaC".getBytes ++
        Array[Byte](0x80.toByte, 0, 0, 34) ++ info ++
        header ++ Array[Byte](crc8(header)) ++
        Array[Byte](0, 0, 0, 0, 0, // CONSTANT left subframe, value 0
          0) // side subframe header: CONSTANT, no wasted bits → 33 bps
      assert(FlacPcm.decode(stream) == Left("flac_unsupported_33bps_side"))
    }
    // corrupt the frame header CRC-8 byte region: flipping the block-size
    // field breaks the stored CRC
    val sync = {
      var i = 42 // past fLaC + header + STREAMINFO
      while (!((good(i) & 0xff) == 0xff && ((good(i + 1) & 0xff) >> 2) == 0x3e)) i += 1
      i
    }
    val badCrc = good.clone(); badCrc(sync + 2) = (badCrc(sync + 2) ^ 0x10).toByte
    assert(FlacPcm.decode(badCrc) == Left("flac_bad_crc"))
    // truncation sweep: every prefix refuses cleanly (never throws, never
    // returns success for a cut stream with a sample-count claim)
    (0 until good.length by 7).foreach { k =>
      FlacPcm.decode(java.util.Arrays.copyOf(good, k)) match {
        case Left(_) => ()
        case Right(_) => fail(s"prefix $k decoded")
      }
    }
    // hostile random bytes behind the magic
    val rnd = new scala.util.Random(99)
    (1 to 300).foreach { _ =>
      val junk = new Array[Byte](4 + rnd.nextInt(400))
      rnd.nextBytes(junk)
      junk(0) = 'f'; junk(1) = 'L'; junk(2) = 'a'; junk(3) = 'C'
      FlacPcm.decode(junk) // must not throw
    }
    // bit-flip fuzz over a real stream
    (1 to 300).foreach { _ =>
      val mut = good.clone()
      val p = rnd.nextInt(mut.length)
      mut(p) = (mut(p) ^ (1 << rnd.nextInt(8))).toByte
      FlacPcm.decode(mut) // must not throw (CRC catches most flips)
    }
  }

  test("FlacPcm: MediaHeader flac branch and the audio descriptors decode FLAC") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val mono = wave(2048, 11L)
    val rows = Seq(
      (1L, FlacPcm.encode(22050, 1, mono)),
      (2L, WavPcm.encodePcm16(22050, 1, mono)),
      (3L, "fLaC".getBytes ++ Array.fill[Byte](10)(0x7f))) // truncated
      .toDF("media_id", "payload")
    val headers = rows.select($"media_id",
      graft.functions.MediaHeader($"payload").as("h"))
      .select($"media_id", $"h.format", $"h.sample_rate", $"h.channels",
        $"h.bit_depth", $"h.error")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(headers(1L).getString(1) == "flac")
    assert(headers(1L).getLong(2) == 22050 && headers(1L).getLong(3) == 1 &&
      headers(1L).getLong(4) == 16 && headers(1L).isNullAt(5))
    assert(headers(2L).getString(1) == "wav")
    assert(headers(3L).getString(1) == "flac" &&
      headers(3L).getString(5) == "flac_truncated")
    // the envelope descriptor is codec-blind: FLAC and WAV rows of the
    // same waveform carry IDENTICAL features
    val feats = graft.ext.Multimodal.audioEnvelopeFeatures(
      rows.filter($"media_id" < 3L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L) == feats(2L), "flac/wav feature divergence")
  }
}
