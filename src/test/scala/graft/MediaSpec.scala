package graft

import graft.multimodal.Media
import graft.multimodal.Media.{Decoded, MediaRow}

class MediaSpec extends SparkSpec {
  import spark.implicits._

  def rows = Seq(
    MediaRow(1L, "image/png", Media.pngBytes(640, 480, colorType = 6)),
    MediaRow(2L, "image/jpeg", Media.jpegBytes(1920, 1080, ncomp = 3)),
    MediaRow(3L, "image/gif", Media.gifBytes(320, 200)),
    MediaRow(4L, "application/octet-stream", "payload-one".getBytes("UTF-8")),
    MediaRow(5L, "video/fake", Array.fill[Byte](640)(7)))

  test("decode parses real PNG/JPEG/GIF headers from magic bytes") {
    assert(Media.decode(Media.pngBytes(640, 480, colorType = 6)) ===
      Some(Decoded("png", 640, 480, 4)))
    assert(Media.decode(Media.pngBytes(7, 9, colorType = 0)) ===
      Some(Decoded("png", 7, 9, 1))) // grayscale → 1 channel
    assert(Media.decode(Media.pngBytes(7, 9, colorType = 2)) ===
      Some(Decoded("png", 7, 9, 3))) // truecolor → 3 channels
    // JPEG: the marker walk must skip the APP0 segment to reach SOF0
    assert(Media.decode(Media.jpegBytes(1920, 1080, ncomp = 3)) ===
      Some(Decoded("jpeg", 1920, 1080, 3)))
    assert(Media.decode(Media.jpegBytes(64, 64, ncomp = 1)) ===
      Some(Decoded("jpeg", 64, 64, 1))) // grayscale JPEG
    assert(Media.decode(Media.gifBytes(320, 200)) ===
      Some(Decoded("gif", 320, 200, 3)))
    // non-containers and truncated/corrupt headers → None, never throw
    assert(Media.decode("not an image".getBytes("UTF-8")).isEmpty)
    assert(Media.decode(Array[Byte]()).isEmpty)
    assert(Media.decode(Media.pngBytes(640, 480).take(20)).isEmpty)
    assert(Media.decode(Media.jpegBytes(640, 480).take(3)).isEmpty)
    val badSig = Media.pngBytes(640, 480); badSig(0) = 0x42
    assert(Media.decode(badSig).isEmpty)
  }

  test("JPEG marker walk survives 0xFF fill bytes and standalone TEM") {
    // JPEG spec B.1.1.2: a marker may be preceded by any number of 0xFF
    // fill bytes. Splice fill bytes + a TEM (0x01, standalone, no length)
    // between SOI and the rest of a valid stream — the walk must still
    // find SOF0, not read the second 0xFF as a marker id.
    val base = Media.jpegBytes(800, 600, ncomp = 3)
    val fill = Array.fill[Byte](4)(0xff.toByte)
    val tem = Array(0xff.toByte, 0x01.toByte)
    val padded = base.take(2) ++ fill ++ base.drop(2)
    assert(Media.decode(padded) === Some(Decoded("jpeg", 800, 600, 3)))
    val withTem = base.take(2) ++ tem ++ base.drop(2)
    assert(Media.decode(withTem) === Some(Decoded("jpeg", 800, 600, 3)))
    // both at once, fill bytes immediately before the TEM id too
    val both = base.take(2) ++ fill ++ tem ++ fill ++ base.drop(2)
    assert(Media.decode(both) === Some(Decoded("jpeg", 800, 600, 3)))
    // a run of trailing 0xFF with no marker id must not loop or throw
    assert(Media.decode(base.take(2) ++ Array.fill[Byte](6)(0xff.toByte)).isEmpty)
  }

  test("PNG pixel decode: inflate + unfilter recovers exact channel means") {
    // varying pixels across ≥5 rows exercise every spec §9 filter type
    // (the encoder assigns filter y % 5 per scanline)
    val w = 13; val h = 7
    def px(x: Int, y: Int, c: Int): Int = (x * 31 + y * 17 + c * 7) % 256
    val blob = Media.pngPixelBytes(w, h, colorType = 6)(px)
    // stored-zlib container size is arithmetically predictable
    assert(blob.length === 68 + h * (1 + w * 4))
    assert(Media.decode(blob) === Some(Decoded("png", w, h, 4)))
    val expected = {
      val vs = for (y <- 0 until h; x <- 0 until w; c <- 0 until 4)
        yield px(x, y, c).toDouble
      math.rint(vs.sum / vs.length * 10000) / 10000
    }
    assert(Media.decodePngPixelMean(blob) === Some(expected))
    // grayscale layout (1 channel)
    val g = Media.pngPixelBytes(5, 6, colorType = 0)((x, y, _) => x + y)
    val gExp = {
      val vs = for (y <- 0 until 6; x <- 0 until 5) yield (x + y).toDouble
      math.rint(vs.sum / vs.length * 10000) / 10000
    }
    assert(Media.decodePngPixelMean(g) === Some(gExp))
    // header-only PNG (no IDAT) → None; caller keeps its labeled fallback
    assert(Media.decodePngPixelMean(Media.pngBytes(9, 9)).isEmpty)
    // truncated IDAT → None, never throws
    assert(Media.decodePngPixelMean(blob.take(blob.length - 20)).isEmpty)
    // pixel means flow through extractFeatures for full PNGs
    val feats = Media.extractFeatures(
      Seq(MediaRow(9L, "image/png", Media.pngPixelBytes(4, 4)((_, _, _) => 200))).toDS())
      .collect()
    assert(feats.head.channel_mean === 200.0)
  }

  test("hostile chunk lengths near Int.MaxValue reject cleanly (no Int overflow)") {
    // a declared chunk len of ~2^31 makes `i + 12 + len` wrap negative in
    // Int arithmetic, sneaking past the bounds guard into an uncaught
    // IndexOutOfBounds — the walk must do the check in Long and return None
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = {
      val b = java.nio.ByteBuffer.allocate(25)
      b.putInt(13).put("IHDR".getBytes("US-ASCII"))
      b.putInt(4).putInt(4).put(8.toByte).put(0.toByte)
      b.put(0.toByte).put(0.toByte).put(0.toByte).putInt(0) // crc unchecked
      b.array()
    }
    val evil = java.nio.ByteBuffer.allocate(8)
      .putInt(0x7ffffff0).put("IDAT".getBytes("US-ASCII")).array()
    val png = sig ++ ihdr ++ evil ++ Array.fill[Byte](16)(0)
    assert(Media.decodePngPixelMean(png).isEmpty)
    assert(Media.decodePngGray(png).isEmpty)
    // WAV: same wrap via a hostile le32 'fmt ' size
    val wav = {
      val b = java.nio.ByteBuffer.allocate(60)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(52)
        .put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(0x7ffffff0)
      b.array()
    }
    assert(Media.decodeWav(wav).isEmpty)
    assert(Media.decodeWavStats(wav).isEmpty)
  }

  test("PNG decoder agrees with hand-filtered scanlines (independent of the encoder)") {
    // 2x2 grayscale, pixels [[10,20],[30,40]]; row 0 Sub-filtered, row 1
    // Up-filtered BY HAND per spec §9 — so a matching encode/decode bug
    // cannot cancel out. raw scanlines = [1,10,10, 2,20,20].
    val raw = Array[Byte](1, 10, 10, 2, 20, 20)
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val zb = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](256)
    while (!d.finished()) zb.write(tmp, 0, d.deflate(tmp))
    d.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(2).putInt(2)
      .put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val blob = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", zb.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
    assert(Media.decodePngPixelMean(blob) === Some(25.0)) // (10+20+30+40)/4
  }

  test("PNG Adam7 interlaced decode: per-pass unfilter sums to the image mean") {
    // gradient pixels so every pass carries distinct values; 13x7 leaves
    // some passes partial and (via the per-pass y % 5 filters) exercises
    // filter restarts at pass boundaries
    def px(x: Int, y: Int, c: Int): Int = (x * 31 + y * 17 + c * 7) % 256
    for ((w, h) <- Seq((13, 7), (5, 3), (1, 1), (8, 8), (2, 9))) {
      val seq = Media.pngPixelBytes(w, h, colorType = 6)(px)
      val adam = Media.pngInterlacedBytes(w, h, colorType = 6)(px)
      assert(Media.decode(adam) === Some(Decoded("png", w, h, 4)))
      val expected = Media.decodePngPixelMean(seq)
      assert(expected.isDefined)
      assert(Media.decodePngPixelMean(adam) === expected, s"${w}x$h")
    }
    // truncated interlaced stream → None, never throws
    val t = Media.pngInterlacedBytes(13, 7)(px)
    assert(Media.decodePngPixelMean(t.take(t.length - 20)).isEmpty)
  }

  test("PNG Adam7 decode agrees with the JDK ImageIO writer (independent encoder)") {
    val w = 21; val h = 11
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 37 + y * 11) % 256) << 16 |
        ((x * 13 + y * 29) % 256) << 8 | ((x * 7 + y * 3) % 256))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT) // Adam7
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val blob = bos.toByteArray
    assert((blob(28) & 0xff) === 1, "writer must emit interlace=1")
    val expected = {
      val vs = for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) yield {
        val rgb = img.getRGB(x, y)
        ((rgb >> (16 - 8 * c)) & 0xff).toDouble
      }
      math.rint(vs.sum / vs.length * 10000) / 10000
    }
    assert(Media.decodePngPixelMean(blob) === Some(expected))
  }

  test("PNG sub-8-bit and 16-bit depths decode with spec scaling") {
    // hand-build containers (deflate + chunk) so no encoder bug can
    // cancel a decoder bug
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt).array()
    }
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val zb = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](512)
      while (!d.finished()) zb.write(tmp, 0, d.deflate(tmp))
      d.end(); zb.toByteArray
    }
    def png(w: Int, h: Int, depth: Int, colorType: Int,
        plte: Array[Byte], raw: Array[Byte]): Array[Byte] = {
      val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
        .put(depth.toByte).put(colorType.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array()
      sig ++ chunk("IHDR", ihdr) ++
        (if (plte != null) chunk("PLTE", plte) else Array.emptyByteArray) ++
        chunk("IDAT", deflate(raw)) ++ chunk("IEND", Array.emptyByteArray)
    }
    def pack(samples: Seq[Int], depth: Int): Array[Byte] = {
      val out = new Array[Byte]((samples.length * depth + 7) / 8)
      samples.zipWithIndex.foreach { case (v, s) =>
        val bit = s * depth
        out(bit >> 3) = (out(bit >> 3) |
          ((v & ((1 << depth) - 1)) << (8 - depth - (bit & 7)))).toByte
      }
      out
    }
    // 2-bit gray 5x3, samples (x+y)%4, rows filter-0; scale = 85
    val g2samples = for (y <- 0 until 3) yield (0 until 5).map(x => (x + y) % 4)
    val g2raw = g2samples.flatMap(r => 0.toByte +: pack(r, 2).toSeq).toArray
    val g2exp = {
      val vs = g2samples.flatten.map(_ * 85.0)
      math.rint(vs.sum / vs.length * 10000) / 10000
    }
    assert(Media.decodePngPixelMean(png(5, 3, 2, 0, null, g2raw)) === Some(g2exp))
    // 4-bit indexed 5x2 with a 4-color palette
    val pal4 = Array(10, 20, 30, 200, 100, 0, 0, 0, 0, 255, 255, 255).map(_.toByte)
    val i4samples = for (y <- 0 until 2) yield (0 until 5).map(x => (x * 3 + y) % 4)
    val i4raw = i4samples.flatMap(r => 0.toByte +: pack(r, 4).toSeq).toArray
    val i4exp = {
      val vs = i4samples.flatten.map { ci =>
        ((pal4(ci * 3) & 0xff) + (pal4(ci * 3 + 1) & 0xff) +
          (pal4(ci * 3 + 2) & 0xff)) / 3.0
      }
      math.rint(vs.sum / vs.length * 10000) / 10000
    }
    assert(Media.decodePngPixelMean(png(5, 2, 4, 3, pal4, i4raw)) === Some(i4exp))
    // 16-bit gray 3x2 big-endian, scale 1/257
    val g16 = Seq(Seq(0, 257, 65535), Seq(514, 32896, 1028))
    val g16raw = g16.flatMap { r =>
      0.toByte +: r.flatMap(v => Seq(((v >> 8) & 0xff).toByte, (v & 0xff).toByte))
    }.toArray
    val g16exp = {
      val vs = g16.flatten.map(_ / 257.0)
      math.rint(vs.sum / vs.length * 10000) / 10000
    }
    assert(Media.decodePngPixelMean(png(3, 2, 16, 0, null, g16raw)) === Some(g16exp))
    // illegal depth×type (2-bit truecolor) still rejects
    assert(Media.decodePngPixelMean(png(3, 2, 2, 2, null, g2raw)).isEmpty)
  }

  test("PNG 16-bit and 1-bit decode agree with JDK ImageIO writers") {
    def write(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    // 16-bit grayscale gradient
    val g16 = new java.awt.image.BufferedImage(9, 5,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 5; x <- 0 until 9)
      g16.getRaster.setSample(x, y, 0, (x * 7919 + y * 104729) % 65536)
    val g16exp = {
      val vs = for (y <- 0 until 5; x <- 0 until 9)
        yield g16.getRaster.getSample(x, y, 0) / 257.0
      math.rint(vs.sum / vs.length * 10000) / 10000
    }
    assert(Media.decodePngPixelMean(write(g16)) === Some(g16exp))
    // 1-bit black/white checkerboard
    val bw = new java.awt.image.BufferedImage(10, 6,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until 6; x <- 0 until 10)
      bw.getRaster.setSample(x, y, 0, (x + y) % 2)
    val blob = write(bw)
    assert((blob(24) & 0xff) === 1, "writer must emit bit depth 1")
    assert(Media.decodePngPixelMean(blob) === Some(127.5)) // half white
  }

  test("PNG indexed color: samples map through PLTE to exact means") {
    val pal = Seq((10, 20, 30), (200, 100, 0), (0, 0, 0), (255, 255, 255))
    val w = 9; val h = 6
    def idx(x: Int, y: Int): Int = (x + y) % 4
    val blob = Media.pngIndexedBytes(w, h, pal)(idx)
    assert(Media.decode(blob) === Some(Decoded("png", w, h, 1)))
    val expected = {
      val vs = for (y <- 0 until h; x <- 0 until w) yield {
        val (r, g, b) = pal(idx(x, y)); (r + g + b).toDouble
      }
      math.rint(vs.sum / (vs.length * 3) * 10000) / 10000
    }
    assert(Media.decodePngPixelMean(blob) === Some(expected))
    // indexed features flow through extractFeatures with channels=1
    val feats = Media.extractFeatures(
      Seq(MediaRow(10L, "image/png",
        Media.pngIndexedBytes(4, 4, Seq((60, 60, 60)))((_, _) => 0))).toDS())
      .collect()
    assert(feats.head.channels === 1 && feats.head.channel_mean === 60.0)
  }

  test("GIF pixel decode: LZW indices map through the palette to exact means") {
    val pal = Seq((10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120))
    def px(x: Int, y: Int): Int = (x + y) % 4
    val blob = Media.gifPixelBytes(9, 7, pal)(px)
    assert(Media.decode(blob) === Some(Decoded("gif", 9, 7, 3)))
    val expected = {
      val vs = for (y <- 0 until 7; x <- 0 until 9; c <- 0 until 3)
        yield Seq(pal(px(x, y))._1, pal(px(x, y))._2, pal(px(x, y))._3)(c).toDouble
      math.rint(vs.sum / vs.length * 10000) / 10000
    }
    assert(Media.decodeGifPixelMean(blob) === Some(expected))
    // wider palette → larger LZW code width
    val pal16 = (0 until 16).map(c => (c * 16, c * 8, c * 4))
    val blob16 = Media.gifPixelBytes(5, 4, pal16)((x, y) => (x * y) % 16)
    val exp16 = {
      val vs = for (y <- 0 until 4; x <- 0 until 5; v = (x * y) % 16;
        c <- Seq(v * 16, v * 8, v * 4)) yield c.toDouble
      math.rint(vs.sum / vs.length * 10000) / 10000
    }
    assert(Media.decodeGifPixelMean(blob16) === Some(exp16))
    // header-only GIF (no image data) → None, caller keeps its fallback
    assert(Media.decodeGifPixelMean(Media.gifBytes(9, 9)).isEmpty)
    // truncated data → None, never throws
    assert(Media.decodeGifPixelMean(blob.take(blob.length - 4)).isEmpty)
    // pixel means flow through extractFeatures for full GIFs
    val feats = Media.extractFeatures(
      Seq(MediaRow(7L, "image/gif",
        Media.gifPixelBytes(3, 3, Seq((200, 200, 200)))((_, _) => 0))).toDS())
      .collect()
    assert(feats.head.channel_mean === 200.0)
  }

  test("GIF LZW decoder agrees with a hand-packed stream (KwKwK case)") {
    // 2x2 image, all pixels index 1, minCode 2: codes CLEAR(4), 1, 6, 1
    // at 3 bits LSB-first — code 6 arrives while EQUAL to the next free
    // slot (the KwKwK corner). Packed by hand: 4+1·8+6·64+1·512+5·4096 =
    // 21388 = 0x538C → bytes 8C 53.
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte](2, 0, 2, 0)) // 2x2
    out.write(0x81); out.write(0); out.write(0) // GCT, 4 entries
    val pal = Array[Byte](0, 0, 0, 10, 20, 30, 0, 0, 0, 0, 0, 0)
    out.write(pal)
    out.write(0x2c); out.write(Array[Byte](0, 0, 0, 0, 2, 0, 2, 0, 0))
    out.write(2) // LZW min code size
    out.write(2); out.write(0x8c); out.write(0x53); out.write(0) // data
    out.write(0x3b)
    assert(Media.decodeGifPixelMean(out.toByteArray) === Some(20.0)) // (10+20+30)/3
  }

  test("JPEG pixel decode: solid gray is exact through huffman + IDCT") {
    // all-ones quant table + constant blocks → the only nonzero
    // coefficient is the integer DC, so decode is EXACT
    for (v <- Seq(0, 1, 50, 127, 128, 200, 255); (w, h) <- Seq((8, 8), (13, 7), (56, 28))) {
      val blob = Media.jpegSolidGrayBytes(w, h, v)
      assert(Media.decode(blob) === Some(Decoded("jpeg", w, h, 1)))
      assert(Media.decodeJpegPixelMean(blob) === Some(v.toDouble),
        s"solid v=$v ${w}x$h")
    }
    // the encoder emits REAL JPEG: the JDK's own independent decoder
    // must read identical pixels
    val blob = Media.jpegSolidGrayBytes(21, 10, 77)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    assert(img !== null)
    assert(img.getWidth === 21 && img.getHeight === 10)
    val vs = for (y <- 0 until 10; x <- 0 until 21)
      yield img.getRaster.getSample(x, y, 0)
    assert(vs.forall(_ == 77))
    // header-only JPEG (no scan) → None; caller keeps its labeled fallback
    assert(Media.decodeJpegPixelMean(Media.jpegBytes(9, 9)).isEmpty)
    // truncated entropy segment → None, never throws
    assert(Media.decodeJpegPixelMean(blob.take(blob.length - 6)).isEmpty)
  }

  test("JPEG restart markers: predictor resets and byte-aligned resync") {
    // DRI every 3 MCUs on a 5x2-block image: the decoder must consume
    // each RSTn, realign, and reset the DC predictor
    val blob = Media.jpegSolidGrayBytes(40, 16, 90, restartEvery = 3)
    assert(Media.decodeJpegPixelMean(blob) === Some(90.0))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    assert(img.getRaster.getSample(39, 15, 0) === 90)
    // a missing restart marker is a malformed stream → None, no throw
    val noDri = Media.jpegSolidGrayBytes(40, 16, 90)
    val spliced = {
      // claim DRI=3 but provide no RST markers
      val dri = Array(0xff.toByte, 0xdd.toByte, 0.toByte, 4.toByte, 0.toByte, 3.toByte)
      noDri.take(2) ++ dri ++ noDri.drop(2)
    }
    assert(Media.decodeJpegPixelMean(spliced).isEmpty)
  }

  test("JPEG decoder agrees with the JDK encoder (color 4:2:0 and grayscale)") {
    // ImageIO WRITES the JPEG (independent encoder, standard Annex K
    // tables, subsampled chroma); our decoder must agree with ImageIO's
    // own read of the same bytes. Lossy coding + different chroma
    // upsampling → compare means within a small tolerance.
    def meanOfRgb(img: java.awt.image.BufferedImage): Double = {
      var s = 0.0
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = img.getRGB(x, y)
        s += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
      }
      s / (img.getWidth * img.getHeight * 3)
    }
    val w = 37; val h = 23 // non-multiples of 16: partial-MCU edges
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) { // smooth gradient
      val r = 40 + (x * 4) % 200; val g = 30 + (y * 6) % 200
      val b = (x * 3 + y * 5) % 255
      src.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "jpg", bos))
    val blob = bos.toByteArray
    val jdk = meanOfRgb(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob)))
    val ours = Media.decodeJpegPixelMean(blob)
    assert(ours.isDefined, "decoder must handle the JDK writer's stream")
    assert(math.abs(ours.get - jdk) < 1.5, s"ours=${ours.get} jdk=$jdk")
    // grayscale: single-component scan
    val gray = new java.awt.image.BufferedImage(19, 11,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 11; x <- 0 until 19)
      gray.getRaster.setSample(x, y, 0, (x * 13 + y * 7) % 256)
    val gbos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gray, "jpg", gbos))
    val gblob = gbos.toByteArray
    val gjdk = {
      val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gblob))
      var s = 0.0
      for (y <- 0 until 11; x <- 0 until 19) s += im.getRaster.getSample(x, y, 0)
      s / (19 * 11)
    }
    val gours = Media.decodeJpegPixelMean(gblob)
    assert(gours.isDefined)
    assert(math.abs(gours.get - gjdk) < 1.0, s"ours=${gours.get} jdk=$gjdk")
    // pixel means flow through extractFeatures for full JPEGs
    val feats = Media.extractFeatures(
      Seq(MediaRow(11L, "image/jpeg", Media.jpegSolidGrayBytes(12, 9, 140))).toDS())
      .collect()
    assert(feats.head.channel_mean === 140.0)
    assert(feats.head.format === "jpeg" && feats.head.channels === 1)
  }

  test("progressive JPEG decodes through multi-scan coefficient accumulation") {
    // ImageIO writes a PROGRESSIVE stream (SOF2, its own scan script
    // with spectral selection + successive approximation); our decoder
    // must agree with ImageIO's own read of the same bytes.
    def writeProgressive(src: java.awt.image.BufferedImage): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(src, null, null), param)
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    def hasSof2(b: Array[Byte]): Boolean =
      b.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2)
    // color gradient, non-multiple-of-16 dims → partial MCUs + subsampling
    val w = 37; val h = 23
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 40 + (x * 4) % 200; val g = 30 + (y * 6) % 200
      val b = (x * 3 + y * 5) % 255
      src.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val blob = writeProgressive(src)
    assert(hasSof2(blob), "writer must emit a progressive frame")
    val jdk = {
      val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      var s = 0.0
      for (y <- 0 until h; x <- 0 until w) {
        val p = im.getRGB(x, y)
        s += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
      }
      s / (w * h * 3)
    }
    val ours = Media.decodeJpegPixelMean(blob)
    assert(ours.isDefined, "decoder must handle the progressive stream")
    assert(math.abs(ours.get - jdk) < 1.5, s"ours=${ours.get} jdk=$jdk")
    // grayscale progressive: single-component DC + AC scans
    val gray = new java.awt.image.BufferedImage(19, 11,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 11; x <- 0 until 19)
      gray.getRaster.setSample(x, y, 0, (x * 13 + y * 7) % 256)
    val gblob = writeProgressive(gray)
    assert(hasSof2(gblob))
    val gjdk = {
      val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gblob))
      var s = 0.0
      for (y <- 0 until 11; x <- 0 until 19) s += im.getRaster.getSample(x, y, 0)
      s / (19 * 11)
    }
    val gours = Media.decodeJpegPixelMean(gblob)
    assert(gours.isDefined)
    assert(math.abs(gours.get - gjdk) < 1.0, s"ours=${gours.get} jdk=$gjdk")
    // truncated progressive stream → None, never throws
    assert(Media.decodeJpegPixelMean(blob.take(blob.length / 2)).isEmpty)
    // own progressive encoder: solid gray is EXACT (all-ones quant), and
    // the JDK accepts the same container (independent reader)
    for ((pw, ph, v) <- Seq((12, 9, 140), (17, 1, 3), (8, 8, 255))) {
      val p = Media.jpegSolidGrayBytes(pw, ph, v, progressive = true)
      assert(hasSof2(p))
      assert(Media.decodeJpegPixelMean(p) === Some(v.toDouble), s"${pw}x$ph v=$v")
      val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      assert(im != null && im.getWidth === pw && im.getHeight === ph)
      assert(im.getRaster.getSample(pw / 2, ph / 2, 0) === v)
    }
    // progressive with restart markers: resync + predictor reset per scan
    val pr = Media.jpegSolidGrayBytes(40, 16, 77, restartEvery = 3,
      progressive = true)
    assert(Media.decodeJpegPixelMean(pr) === Some(77.0))
  }

  test("MP4 decode: box-tree walk recovers movie and track metadata") {
    val blob = Media.mp4Bytes(1000, 5500,
      Seq(("vide", 640, 360), ("soun", 0, 0)))
    assert(blob.length === 148 + 173 * 2) // the documented layout size
    val info = Media.decodeMp4(blob)
    assert(info === Some(Media.Mp4Info("isom", 2, 1000, 5500, 640, 360,
      has_audio = true)))
    // video-only, different timescale: duration_ms floors
    val v = Media.decodeMp4(Media.mp4Bytes(90000, 90000 * 3 + 45000,
      Seq(("vide", 1920, 1080))))
    assert(v === Some(Media.Mp4Info("isom", 1, 90000, 3500, 1920, 1080,
      has_audio = false)))
    // a large junk-filled mdat BETWEEN ftyp and moov is skipped by its
    // size field — box contents are never interpreted
    val ftyp = blob.slice(0, 24)
    val moovAndMdat = blob.drop(24)
    val junk = Array.fill[Byte](1000)(0x6d) // looks like box types inside
    val mdatJunk = java.nio.ByteBuffer.allocate(8 + junk.length)
      .putInt(8 + junk.length).put("mdat".getBytes("US-ASCII")).put(junk).array()
    assert(Media.decodeMp4(ftyp ++ mdatJunk ++ moovAndMdat) === info)
    // malformed payloads reject cleanly
    assert(Media.decodeMp4("not a video".getBytes("UTF-8")).isEmpty)
    assert(Media.decodeMp4(blob.take(40)).isEmpty) // truncated moov
    // batch extraction: features only, blob dropped
    val feats = Media.extractVideoFeatures(Seq(
      MediaRow(1L, "video/mp4", blob),
      MediaRow(2L, "video/mp4", Array[Byte](1, 2, 3))).toDS()).collect()
      .sortBy(_.media_id)
    assert(feats(0).duration_ms === 5500L && feats(0).n_tracks === 2)
    assert(feats(1).brand === "" && feats(1).byte_len === 3)
  }

  test("WAV decode: RIFF/PCM parse recovers exact amplitude statistics") {
    // square wave ±A: every |sample| = A, so peak and mean_abs are exact
    val blob = Media.wavBytes(8000, 1, 200)((f, _) => if (f % 2 == 0) 1234 else -1234)
    assert(blob.length === 44 + 200 * 2)
    val w = Media.decodeWav(blob).get
    assert(w.sample_rate === 8000 && w.channels === 1 && w.bits === 16)
    assert(w.n_frames === 200 && w.duration_ms === 25L)
    assert(w.peak === 1234 && w.mean_abs === 1234.0)
    // stereo with distinct per-channel amplitudes interleaves correctly
    val st = Media.decodeWav(
      Media.wavBytes(16000, 2, 100)((f, c) =>
        (if (f % 2 == 0) 1 else -1) * (if (c == 0) 1000 else 3000))).get
    assert(st.channels === 2 && st.n_frames === 100)
    assert(st.peak === 3000 && st.mean_abs === 2000.0)
    // the JDK's own audio stack accepts the container (independent parser)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(blob))
    assert(ais.getFormat.getSampleRate === 8000.0f)
    assert(ais.getFormat.getChannels === 1)
    assert(ais.getFrameLength === 200L)
    // unknown chunks (LIST) before data are skipped per the RIFF rules
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 1, 2, 3, 4)
    val withList = blob.take(12) ++ list ++ blob.drop(12)
    // fix the RIFF size field
    val bb = java.nio.ByteBuffer.wrap(withList).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, withList.length - 8)
    assert(Media.decodeWav(withList).map(_.peak) === Some(1234))
    // 8-bit unsigned PCM (excess-128): hand-built data chunk
    val eight = {
      val out = java.nio.ByteBuffer.allocate(44 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + 4)
      out.put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      out.putShort(1).putShort(1).putInt(8000).putInt(8000)
      out.putShort(1).putShort(8)
      out.put("data".getBytes("US-ASCII")).putInt(4)
      out.put(128.toByte).put(148.toByte).put(108.toByte).put(128.toByte)
      out.array()
    }
    val e = Media.decodeWav(eight).get
    assert(e.bits === 8 && e.peak === 20 && e.mean_abs === 10.0)
    // float/compressed formats and truncated containers → None, no throw
    val nonPcm = blob.clone(); nonPcm(20) = 3 // IEEE float format tag
    assert(Media.decodeWav(nonPcm).isEmpty)
    assert(Media.decodeWav(blob.take(50)).isEmpty)
    assert(Media.decodeWav("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    // batch extraction drops blobs, keeps byte_len for unparseable rows
    val feats = Media.extractAudioFeatures(Seq(
      MediaRow(1L, "audio/wav", blob),
      MediaRow(2L, "audio/wav", Array[Byte](1, 2, 3))).toDS())
      .collect().sortBy(_.media_id)
    assert(feats(0).mean_abs === 1234.0 && feats(0).duration_ms === 25L)
    assert(feats(1).sample_rate === 0 && feats(1).byte_len === 3)
  }

  test("extractFeatures parses real containers, stub-falls-back for unknown") {
    val out = Media.extractFeatures(rows.toDS()).collect().sortBy(_.media_id)
    assert(out.map(f => (f.format, f.width, f.height, f.channels)).toSeq === Seq(
      ("png", 640, 480, 4),
      ("jpeg", 1920, 1080, 3),
      ("gif", 320, 200, 3),
      ("unknown", out(3).width, out(3).height, 0),
      ("unknown", out(4).width, out(4).height, 0)))
    assert(out.map(_.byte_len).toSeq ===
      rows.sortBy(_.media_id).map(_.blob.length))
    assert(!out.head.getClass.getDeclaredFields.exists(_.getName == "blob"))
    // deterministic: same input → same decode (incl. the stub fallback)
    val again = Media.extractFeatures(rows.toDS()).collect().sortBy(_.media_id)
    assert(out.toSeq === again.toSeq)
    out.foreach(f => assert(f.channel_mean >= 0))
  }

  test("resize bounds both dimensions while preserving ids") {
    val feats = Media.extractFeatures(rows.toDS())
    val resized = Media.resize(feats, maxDim = 32).collect()
    resized.foreach { f =>
      assert(f.width <= 32 && f.height <= 32 && f.width >= 1 && f.height >= 1)
    }
    assert(resized.map(_.media_id).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    // aspect ratio preserved for the real containers
    val png = resized.find(_.media_id == 1L).get
    assert(png.width === 32 && png.height === 24)
  }

  test("frame sampling falls back to the virtual grid for non-MP4 payloads") {
    val out = Media.sampleFrameOffsets(rows.filter(_.mime.startsWith("video")).toDS(), everyK = 3)
      .as[(Long, Int, Long, Long)].collect().sortBy(_._2)
    // 640 bytes → 10 virtual frames → sampled 0,3,6,9; byte_len = -1 marks
    // the labeled fallback (no sample table to read real sizes from)
    assert(out.map(_._2).toSeq === Seq(0, 3, 6, 9))
    assert(out.forall(r => r._3 == r._2 * 64L && r._4 == -1L))
  }

  test("MP4 sample-table walk returns real frame byte ranges across chunks") {
    // 10 samples with distinct sizes, laid out as chunks of 3+3+4 — the
    // 3,3 prefix compresses into one stsc run, the trailing 4 is a second
    // run, so the chunk replay exercises run boundaries
    val sizes = Seq(5, 9, 4, 7, 3, 8, 6, 2, 10, 1)
    val blob = Media.mp4BytesWithSamples(1000, 5000L, 64, 48, sizes,
      samplesPerChunk = Seq(3, 3, 4))((s, j) => (s * 16 + (j % 16)).toByte)
    val frames = Media.frameSampleRanges(blob, step = 3, maxFrames = 8).get
    assert(frames.map(_.idx) === Vector(0, 3, 6, 9))
    assert(frames.map(_.size) === Vector(5L, 7L, 6L, 1L))
    // each returned range must address exactly that sample's payload bytes
    frames.foreach { f =>
      (0 until f.size.toInt).foreach { j =>
        assert(blob(f.offset.toInt + j) === (f.idx * 16 + (j % 16)).toByte,
          s"sample ${f.idx} byte $j")
      }
    }
    // chunk-contiguous layout: within-chunk samples are adjacent
    val all = Media.frameSampleRanges(blob, step = 1, maxFrames = 16).get
    assert(all.map(_.idx) === (0 until 10).toVector)
    assert(all(1).offset === all(0).offset + all(0).size)
    // the metadata walk still reads the same file
    val info = Media.decodeMp4(blob).get
    assert(info.width === 64 && info.height === 48 && info.n_tracks === 1)
  }

  test("MP4 frame sampling: closed-form header length, co64, caps, malformed") {
    val sizes = Seq(4, 6, 5, 3, 7, 2)
    val one = Media.mp4BytesWithSamples(1000, 100L, 8, 8, sizes,
      samplesPerChunk = Seq(6))((s, j) => s.toByte)
    // single chunk, one stsc run: the first sample starts exactly at the
    // closed-form header length (what the SQL oracle predicts)
    val f0 = Media.frameSampleRanges(one, 1, 16).get.head
    assert(f0.offset === Media.mp4HeaderLen(6, 1).toLong)
    // co64 (64-bit chunk offsets) parses to the same ranges
    val big = Media.mp4BytesWithSamples(1000, 100L, 8, 8, sizes,
      samplesPerChunk = Seq(6), co64 = true)((s, j) => s.toByte)
    val a = Media.frameSampleRanges(one, 2, 16).get
    val b = Media.frameSampleRanges(big, 2, 16).get
    assert(a.map(_.idx) === b.map(_.idx))
    assert(a.map(_.size) === b.map(_.size))
    assert(b.head.offset === Media.mp4HeaderLen(6, 1, co64 = true).toLong)
    // step beyond the sample count → only frame 0; maxFrames caps the scan
    assert(Media.frameSampleRanges(one, 100, 16).get.map(_.idx) === Vector(0))
    assert(Media.frameSampleRanges(one, 1, 2).get.map(_.idx) === Vector(0, 1))
    // audio-only file (no video sample table) and truncated tables → None
    assert(Media.frameSampleRanges(
      Media.mp4Bytes(1000, 100L, Seq(("soun", 0, 0))), 1, 4).isEmpty)
    assert(Media.frameSampleRanges(one.take(120), 1, 4).isEmpty)
    // the Dataset surface uses the REAL table for MP4 rows
    val ds = Seq(Media.MediaRow(9L, "video/mp4", one)).toDS()
    val out = Media.sampleFrameOffsets(ds, everyK = 2)
      .as[(Long, Int, Long, Long)].collect().sortBy(_._2)
    assert(out.map(_._2).toSeq === Seq(0, 2, 4))
    assert(out.map(_._4).toSeq === Seq(4L, 5L, 7L))
  }

  test("PNG gray decode materializes real pixels across color types") {
    // truecolor with DISTINCT channels: luma = mean of r,g,b
    val tc = Media.pngPixelBytes(5, 3, colorType = 2)(
      (x, y, c) => (x * 10 + y * 20 + c * 3) % 256)
    val Some((w, h, plane)) = Media.decodePngGray(tc)
    assert(w === 5 && h === 3)
    assert(plane(0) === 3.0) // (0 + 3 + 6) / 3
    assert(plane(2 * 5 + 4) === (80 + 83 + 86) / 3.0) // x=4,y=2 → 83.0 exact
    // gray+alpha: luma = the gray channel only, alpha excluded
    val ga = Media.pngPixelBytes(4, 2, colorType = 4)(
      (x, y, c) => if (c == 0) x + 8 * y else 255)
    val Some((_, _, gp)) = Media.decodePngGray(ga)
    assert(gp.toSeq === Seq(0, 1, 2, 3, 8, 9, 10, 11).map(_.toDouble))
    // indexed: entries resolve through PLTE, luma = palette-rgb mean
    val pal = Seq((10, 20, 30), (90, 90, 90))
    val ix = Media.pngIndexedBytes(3, 1, pal)((x, _) => x % 2)
    val Some((_, _, ip)) = Media.decodePngGray(ix)
    assert(ip.toSeq === Seq(20.0, 90.0, 20.0))
    // Adam7-interlaced and 16-bit stay on the streaming-mean path → None
    assert(Media.decodePngGray(
      Media.pngInterlacedBytes(8, 8)((_, _, _) => 7)).isEmpty)
    assert(Media.decodePngGray("junk".getBytes("UTF-8")).isEmpty)
  }

  test("nearest-neighbor resize and the thumbnail batch surface") {
    // 4×2 plane, identity resize is a copy; 2×1 picks (0,0) and (2,0)
    val plane = Array[Double](0, 1, 2, 3, 10, 11, 12, 13)
    assert(Media.resizeNearest(plane, 4, 2, 4, 2).toSeq === plane.toSeq)
    assert(Media.resizeNearest(plane, 4, 2, 2, 1).toSeq === Seq(0.0, 2.0))
    // upscale repeats source pixels: src = (t*dim)//target
    assert(Media.resizeNearest(Array[Double](5, 9), 2, 1, 4, 1).toSeq ===
      Seq(5.0, 5.0, 9.0, 9.0))
    // batch surface: PNG rows get REAL resized pixels, others the
    // labeled stub fill
    val png = Media.pngPixelBytes(8, 8, colorType = 0)((x, y, _) => x + 8 * y)
    val ds = Seq(
      Media.MediaRow(1L, "image/png", png),
      Media.MediaRow(2L, "application/octet-stream", "abc".getBytes("UTF-8")))
      .toDS()
    val out = Media.thumbnails(ds, 2, 2).collect().sortBy(_.media_id)
    assert(out(0).real && out(0).thumb.toSeq ===
      Seq(0, 4, 32, 36).map(_.toByte))
    assert(!out(1).real && out(1).thumb.length === 4)
  }

  test("JPEG gray decode: exact block-gradient plane, ImageIO cross-check, thumbnails real") {
    // block-constant baseline JPEG decodes exactly (DC-only, quant 1):
    // every pixel of block (bx, by) is its block value
    val jb = Media.jpegBlockGrayBytes(20, 11)((bx, by) => 40 * bx + 25 * by)
    val Some((w, h, plane)) = Media.decodeJpegGray(jb)
    assert(w === 20 && h === 11)
    for (y <- 0 until h; x <- 0 until w)
      assert(plane(y * w + x) === (40 * (x / 8) + 25 * (y / 8)).toDouble,
        s"($x,$y)")
    // ImageIO-written COLOR jpeg (independent encoder, Annex K tables,
    // subsampled chroma): our gray plane must track ImageIO's own read
    // (lossy codec → per-pixel tolerance, mean must be tight)
    val src = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 24)
      src.setRGB(x, y, ((x * 10) << 16) | ((y * 14) << 8) | 120)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "jpg", bos))
    val blob = bos.toByteArray
    val Some((jw, jh, jp)) = Media.decodeJpegGray(blob)
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    assert(jw === 24 && jh === 16)
    var diffSum = 0.0
    for (y <- 0 until jh; x <- 0 until jw) {
      val rgb = im.getRGB(x, y)
      val ref = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
      val d = math.abs(jp(y * jw + x) - ref)
      assert(d <= 3.0, s"($x,$y): $d") // nearest vs smooth chroma upsample
      diffSum += d
    }
    assert(diffSum / (jw * jh) <= 2.0)
    // the thumbnail surface marks JPEG rows real and resizes actual pixels
    val out = Media.thumbnails(
      Seq(Media.MediaRow(9L, "image/jpeg", jb)).toDS(), 2, 1).collect()
    assert(out.head.real)
    // samples (0,0) and (10,0): blocks (0,0) → 0 and (1,0) → 40
    assert(out.head.thumb.toSeq === Seq(0.toByte, 40.toByte))
    // progressive block-gradient decodes identically
    val prog = Media.jpegBlockGrayBytes(20, 11, progressive = true)(
      (bx, by) => 40 * bx + 25 * by)
    val Some((_, _, pp)) = Media.decodeJpegGray(prog)
    assert(pp.toSeq === plane.toSeq)
    // arithmetic-coded frames stay on the labeled fallback: decode None,
    // thumbnails real = false — not a crash (VERDICT r9 stretch item)
    val arith = jb.clone()
    // rewrite the SOF0 marker (FFC0) to SOF9 (FFC9, arithmetic sequential)
    val sof = arith.indices.find(i => (arith(i) & 0xff) == 0xff &&
      i + 1 < arith.length && (arith(i + 1) & 0xff) == 0xc0).get
    arith(sof + 1) = 0xc9.toByte
    assert(Media.decodeJpegGray(arith).isEmpty)
    assert(Media.decodeJpegPixelMean(arith).isEmpty)
    val fb = Media.thumbnails(
      Seq(Media.MediaRow(10L, "image/jpeg", arith)).toDS(), 2, 1).collect()
    assert(!fb.head.real)
  }

  test("gray plane is capped at 2^26 pixels; over-cap frames fall back") {
    // 8200×8200 = 67.24M pixels, just over the 2^26 cap — a hostile frame
    // at this size would otherwise force a ~538 MB double plane (and far
    // worse near the 16M-MCU bound); the gray path must refuse, keeping
    // the caller on the labeled stub, while the fold-to-mean path (byte
    // planes only) still decodes
    val big = Media.jpegSolidGrayBytes(8200, 8200, 99)
    assert(Media.decodeJpegGray(big).isEmpty)
    assert(Media.decodeJpegPixelMean(big).contains(99.0))
  }

  test("GIF gray decode feeds the same resize path as PNG") {
    // palette with distinct lumas: (30,60,90) → 60, (10,10,10) → 10
    val pal = Seq((30, 60, 90), (10, 10, 10))
    val gif = Media.gifPixelBytes(4, 2, pal)((x, y) => (x + y) % 2)
    val Some((w, h, plane)) = Media.decodeGifGray(gif)
    assert(w === 4 && h === 2)
    assert(plane.toSeq === Seq(60.0, 10, 60, 10, 10, 60, 10, 60))
    // the thumbnail surface marks GIF rows real and resizes actual pixels
    val out = Media.thumbnails(
      Seq(Media.MediaRow(7L, "image/gif", gif)).toDS(), 2, 1).collect()
    assert(out.head.real)
    assert(out.head.thumb.toSeq === Seq(60.toByte, 60.toByte)) // (0,0),(2,0)
    // interlaced and junk still fall back
    assert(Media.decodeGifGray("GIF89a junk".getBytes("US-ASCII")).isEmpty)
  }
}
