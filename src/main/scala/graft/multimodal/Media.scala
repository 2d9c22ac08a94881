package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed in partition-batches.
  *
  * The container-header decode is REAL: [[decode]] parses PNG IHDR,
  * JPEG SOF (marker scan), and GIF logical-screen-descriptor headers
  * from the magic bytes — all public container formats. PNG and GIF
  * PIXEL decode are real too ([[decodePngPixelMean]]: IDAT inflate via
  * `java.util.zip.Inflater` + spec §9 unfiltering; [[decodeGifPixelMean]]:
  * full LZW with palette mapping — JDK only, no codec libs), and so is
  * baseline JPEG ([[decodeJpegPixelMean]]: huffman entropy decode +
  * dequant + IDCT + chroma upsample + YCbCr→RGB — both SEQUENTIAL and
  * PROGRESSIVE frames, the latter via multi-scan spectral-selection /
  * successive-approximation coefficient accumulation). PNG covers the
  * sequential AND Adam7-interlaced layouts plus indexed color (PLTE) at
  * every legal bit depth (1/2/4/8/16).
  * Only non-huffman (arithmetic/lossless/hierarchical) JPEG falls back
  * to byte-derived features, clearly labeled; unrecognized payloads fall back to
  * [[decodeStub]]'s deterministic fakes. The at-scale plumbing
  * is the load-bearing part and is tested: schema, per-partition batch
  * processing (`mapPartitions` over a typed Dataset — the Scala analog
  * of a batch-shaped Pandas UDF), and the rule that payload bytes never
  * travel through a shuffle (derive features first, shuffle the small
  * feature rows, never groupBy/join on a DataFrame still carrying
  * blobs).
  */
object Media {

  final case class MediaRow(
      media_id: Long,
      mime: String,
      blob: Array[Byte])

  /** Parsed container header. `channels` derives from the format's own
    * encoding of color layout (PNG color type, JPEG component count,
    * GIF palette = RGB).
    */
  final case class Decoded(format: String, width: Int, height: Int, channels: Int)

  final case class MediaFeatures(
      media_id: Long,
      mime: String,
      byte_len: Int,
      format: String, // "png" | "jpeg" | "gif" | "unknown"
      width: Int,
      height: Int,
      channels: Int, // 0 when format == "unknown"
      channel_mean: Double)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG channel count by IHDR color type (PNG spec §11.2.2):
    * 0 grayscale, 2 truecolor, 3 indexed, 4 gray+alpha, 6 truecolor+alpha.
    */
  private def pngChannels(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    case _ => 0
  }

  /** Parse a real container header from magic bytes. None when the
    * payload is not a recognized container (caller falls back to the
    * labeled stub). Never throws on truncated/corrupt input.
    */
  def decode(blob: Array[Byte]): Option[Decoded] = {
    // PNG: 8-byte signature, then the IHDR chunk (must be first,
    // PNG spec §5.6): 4 length + "IHDR" + width/height as uint32 BE +
    // bit depth + color type.
    def png: Option[Decoded] =
      if (blob.length >= 26 && blob.take(8).sameElements(PngSig) &&
          new String(blob.slice(12, 16), "US-ASCII") == "IHDR") {
        val w = be32(blob, 16); val h = be32(blob, 20)
        val ch = pngChannels(blob(25) & 0xff)
        if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue && ch > 0)
          Some(Decoded("png", w.toInt, h.toInt, ch))
        else None
      } else None
    // JPEG: SOI then a marker-segment walk; frame dimensions live in the
    // first SOFn segment (baseline C0, extended C1, progressive C2):
    // [len][precision][height u16 BE][width u16 BE][ncomponents].
    def jpeg: Option[Decoded] =
      if (blob.length >= 4 && (blob(0) & 0xff) == 0xff && (blob(1) & 0xff) == 0xd8) {
        var i = 2
        while (i + 3 < blob.length) {
          if ((blob(i) & 0xff) != 0xff) return None // desynced marker walk
          // JPEG spec B.1.1.2: any marker may be preceded by repeated 0xFF
          // fill bytes — advance to the LAST 0xFF before the marker id, or
          // the second fill byte would be misread as the id and the walk
          // would desync on a bogus length.
          while (i + 2 < blob.length && (blob(i + 1) & 0xff) == 0xff) i += 1
          if (i + 3 >= blob.length) return None
          val marker = blob(i + 1) & 0xff
          if (marker == 0xd8 || marker == 0x01 || // SOI / TEM: standalone
              (marker >= 0xd0 && marker <= 0xd7)) { // RSTn: standalone
            i += 2 // no length field
          } else if (marker == 0xd9 || marker == 0xda) {
            return None // EOI / start-of-scan before any SOF
          } else {
            val len = be16(blob, i + 2)
            if (len < 2 || i.toLong + 2 + len > blob.length) return None
            if ((marker >= 0xc0 && marker <= 0xc2) && len >= 8) {
              val h = be16(blob, i + 5); val w = be16(blob, i + 7)
              val ncomp = blob(i + 9) & 0xff
              return if (w > 0 && h > 0 && ncomp > 0)
                Some(Decoded("jpeg", w, h, ncomp)) else None
            }
            i += 2 + len
          }
        }
        None
      } else None
    // GIF: "GIF87a"/"GIF89a" then the logical screen descriptor with
    // width/height as uint16 LE; pixels index an RGB palette.
    def gif: Option[Decoded] =
      if (blob.length >= 10) {
        val hdr = new String(blob.take(6), "US-ASCII")
        if (hdr == "GIF87a" || hdr == "GIF89a") {
          val w = le16(blob, 6); val h = le16(blob, 8)
          if (w > 0 && h > 0) Some(Decoded("gif", w, h, 3)) else None
        } else None
      } else None
    png.orElse(jpeg).orElse(gif)
  }

  /** Adam7 pass geometry (PNG spec §8.2): (xStart, yStart, xStep, yStep).
    * Pass k's sub-image holds every pixel at (xStart + i·xStep,
    * yStart + j·yStep); the 7 passes partition the image exactly.
    */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  private def adam7Dims(w: Int, h: Int): Array[(Int, Int)] =
    Adam7.map { case (xs, ys, xStep, yStep) =>
      val pw = if (w > xs) (w - xs + xStep - 1) / xStep else 0
      val ph = if (h > ys) (h - ys + yStep - 1) / yStep else 0
      (pw, ph)
    }

  /** Real PNG pixel decode with the JDK alone: concatenate IDAT chunk
    * data, inflate (zlib via `java.util.zip.Inflater`), reverse the
    * per-scanline filters (PNG spec §9: None/Sub/Up/Average/Paeth), and
    * return the mean over ALL reconstructed samples on the 8-bit scale.
    * Handles both the null (sequential) and Adam7 interlaced layouts —
    * each Adam7 pass is an independently-filtered sub-image, and since
    * the passes PARTITION the pixels, the image mean is the
    * sample-weighted sum over passes with no de-interlace buffer
    * needed — indexed color (type 3, samples mapped through the PLTE
    * palette, mean over R,G,B), and EVERY legal bit depth: sub-8 packed
    * samples (1/2/4, MSB-first, gray scaled by 255/(2^d−1), spec §7.2)
    * and 16-bit big-endian (scaled by 1/257). None only for a malformed
    * stream — callers keep the labeled byte-mean fallback.
    */
  def decodePngPixelMean(blob: Array[Byte]): Option[Double] = {
    if (blob.length < 45 || !blob.take(8).sameElements(PngSig)) return None
    if (new String(blob.slice(12, 16), "US-ASCII") != "IHDR") return None
    val w = be32(blob, 16).toInt; val h = be32(blob, 20).toInt
    val bitDepth = blob(24) & 0xff; val colorType = blob(25) & 0xff
    val interlace = blob(28) & 0xff
    val indexed = colorType == 3
    val ch = if (indexed) 1 else pngChannels(colorType)
    // legal depth×type combinations per PNG spec §11.2.2
    val okDepth = bitDepth match {
      case 1 | 2 | 4 => colorType == 0 || colorType == 3
      case 8 => true
      case 16 => !indexed
      case _ => false
    }
    if (w <= 0 || h <= 0 || !okDepth || interlace > 1 || ch == 0)
      return None
    // walk chunks, concatenating IDAT payloads (+ PLTE when indexed)
    val idat = new java.io.ByteArrayOutputStream()
    var plte: Array[Byte] = null
    var i = 8
    var done = false
    while (!done && i + 8 <= blob.length) {
      val len = be32(blob, i).toInt
      if (len < 0 || i.toLong + 12 + len > blob.length) return None
      val typ = new String(blob.slice(i + 4, i + 8), "US-ASCII")
      if (typ == "IDAT") idat.write(blob, i + 8, len)
      if (typ == "PLTE") plte = blob.slice(i + 8, i + 8 + len)
      if (typ == "IEND") done = true
      i += 12 + len
    }
    if (idat.size() == 0) return None
    if (indexed && (plte == null || plte.length < 3 || plte.length % 3 != 0))
      return None
    // pass list: one full-image pass when sequential, the non-empty
    // Adam7 sub-images when interlaced
    val passes: Array[(Int, Int)] =
      if (interlace == 0) Array((w, h))
      else adam7Dims(w, h).filter { case (pw, ph) => pw > 0 && ph > 0 }
    val bppBits = ch * bitDepth
    def rowBytes(pw: Int): Int = (pw * bppBits + 7) / 8
    val rawLen = passes.map { case (pw, ph) => ph * (1 + rowBytes(pw)) }.sum
    val raw = new Array[Byte](rawLen)
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      inf.end()
      if (off != raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    // spec §9 unfiltering; a = left, b = up, c = up-left, per BYTE with
    // the filter unit = one pixel's ceil(bpp/8) bytes (1 for sub-byte)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val fu = math.max(1, bppBits / 8)
    val nColors = if (indexed) plte.length / 3 else 0
    // gray sub-8 samples scale to 8-bit as v·255/(2^d−1) (an exact
    // integer: 255, 85, 17); 16-bit scales as v/257
    val subScale = if (bitDepth < 8) 255 / ((1 << bitDepth) - 1) else 1
    var total = 0.0
    var count = 0L
    var base = 0
    passes.foreach { case (pw, ph) =>
      val rb = rowBytes(pw)
      val prev = new Array[Int](rb)
      val cur = new Array[Int](rb)
      var y = 0
      while (y < ph) {
        val ft = raw(base) & 0xff
        if (ft > 4) return None
        var x = 0
        while (x < rb) {
          val f = raw(base + 1 + x) & 0xff
          val a = if (x >= fu) cur(x - fu) else 0
          val b = prev(x)
          val c = if (x >= fu) prev(x - fu) else 0
          cur(x) = (ft match {
            case 0 => f
            case 1 => f + a
            case 2 => f + b
            case 3 => f + ((a + b) >> 1)
            case 4 => f + paeth(a, b, c)
          }) & 0xff
          x += 1
        }
        // extract the row's samples from the reconstructed bytes
        if (bitDepth == 8) {
          var s = 0
          val n = pw * ch
          while (s < n) {
            if (indexed) {
              val ci = math.min(cur(s), nColors - 1)
              total += (plte(ci * 3) & 0xff) + (plte(ci * 3 + 1) & 0xff) +
                (plte(ci * 3 + 2) & 0xff)
              count += 3
            } else {
              total += cur(s)
              count += 1
            }
            s += 1
          }
        } else if (bitDepth == 16) {
          var s = 0
          val n = pw * ch
          while (s < n) {
            total += ((cur(2 * s) << 8) | cur(2 * s + 1)) / 257.0
            count += 1
            s += 1
          }
        } else { // 1/2/4-bit packed MSB-first, one channel (gray or index)
          val mask = (1 << bitDepth) - 1
          var s = 0
          while (s < pw) {
            val bit = s * bitDepth
            val v = (cur(bit >> 3) >> (8 - bitDepth - (bit & 7))) & mask
            if (indexed) {
              val ci = math.min(v, nColors - 1)
              total += (plte(ci * 3) & 0xff) + (plte(ci * 3 + 1) & 0xff) +
                (plte(ci * 3 + 2) & 0xff)
              count += 3
            } else {
              total += v * subScale
              count += 1
            }
            s += 1
          }
        }
        System.arraycopy(cur, 0, prev, 0, rb)
        base += 1 + rb
        y += 1
      }
    }
    if (count == 0) None
    else Some(math.rint(total / count * 10000) / 10000)
  }

  /** Real per-pixel GRAY decode for sequential (non-interlaced) 8-bit
    * PNGs — gray(+alpha), truecolor(+alpha), and indexed; luma = mean of
    * the color channels (alpha excluded), palette entries resolved
    * through PLTE. Materializes the w·h plane (bounded by the image, not
    * the dataset) — the input resize needs. Interlaced / sub-8 / 16-bit
    * depths stay on the streaming-mean path; None for any malformed
    * stream.
    */
  def decodePngGray(blob: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (blob.length < 45 || !blob.take(8).sameElements(PngSig)) return None
    if (new String(blob.slice(12, 16), "US-ASCII") != "IHDR") return None
    val w = be32(blob, 16).toInt; val h = be32(blob, 20).toInt
    val bitDepth = blob(24) & 0xff; val colorType = blob(25) & 0xff
    val interlace = blob(28) & 0xff
    val indexed = colorType == 3
    val ch = if (indexed) 1 else pngChannels(colorType)
    if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0 || ch == 0)
      return None
    val idat = new java.io.ByteArrayOutputStream()
    var plte: Array[Byte] = null
    var i = 8
    var done = false
    while (!done && i + 8 <= blob.length) {
      val len = be32(blob, i).toInt
      if (len < 0 || i.toLong + 12 + len > blob.length) return None
      val typ = new String(blob.slice(i + 4, i + 8), "US-ASCII")
      if (typ == "IDAT") idat.write(blob, i + 8, len)
      if (typ == "PLTE") plte = blob.slice(i + 8, i + 8 + len)
      if (typ == "IEND") done = true
      i += 12 + len
    }
    if (idat.size() == 0) return None
    if (indexed && (plte == null || plte.length < 3 || plte.length % 3 != 0))
      return None
    val nColors = if (indexed) plte.length / 3 else 0
    val rb = w * ch
    val raw = new Array[Byte](h * (1 + rb))
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None
        off += n
      }
      inf.end()
      if (off != raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    // color channels contributing to luma (alpha excluded)
    val colorCh = colorType match {
      case 4 => 1
      case 6 => 3
      case _ => ch
    }
    val plane = new Array[Double](w * h)
    val prev = new Array[Int](rb)
    val cur = new Array[Int](rb)
    var base = 0
    var y = 0
    while (y < h) {
      val ft = raw(base) & 0xff
      if (ft > 4) return None
      var x = 0
      while (x < rb) {
        val f = raw(base + 1 + x) & 0xff
        val a = if (x >= ch) cur(x - ch) else 0
        val b = prev(x)
        val c = if (x >= ch) prev(x - ch) else 0
        cur(x) = (ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + ((a + b) >> 1)
          case 4 => f + paeth(a, b, c)
        }) & 0xff
        x += 1
      }
      var px = 0
      while (px < w) {
        val s0 = px * ch
        plane(y * w + px) =
          if (indexed) {
            val ci = math.min(cur(s0), nColors - 1)
            ((plte(ci * 3) & 0xff) + (plte(ci * 3 + 1) & 0xff) +
              (plte(ci * 3 + 2) & 0xff)) / 3.0
          } else {
            var sum = 0
            var cc = 0
            while (cc < colorCh) { sum += cur(s0 + cc); cc += 1 }
            sum.toDouble / colorCh
          }
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, rb)
      base += 1 + rb
      y += 1
    }
    Some((w, h, plane))
  }

  /** Nearest-neighbor resize of a gray plane:
    * out(y, x) = in((y·h)/th, (x·w)/tw) with integer floor — the exact
    * arithmetic a SQL oracle reproduces.
    */
  def resizeNearest(plane: Array[Double], w: Int, h: Int,
      tw: Int, th: Int): Array[Double] = {
    require(tw > 0 && th > 0 && plane.length == w * h)
    val out = new Array[Double](tw * th)
    var y = 0
    while (y < th) {
      val sy = y * h / th
      var x = 0
      while (x < tw) {
        out(y * tw + x) = plane(sy * w + x * w / tw)
        x += 1
      }
      y += 1
    }
    out
  }

  final case class Thumbnail(
      media_id: Long, width: Int, height: Int, real: Boolean,
      thumb: Array[Byte])

  /** Real thumbnails: sequential 8-bit PNGs ([[decodePngGray]]),
    * non-interlaced GIFs ([[decodeGifGray]]), and baseline/progressive
    * JPEGs ([[decodeJpegGray]]) decode to pixels and resize
    * nearest-neighbor; any other payload gets the labeled stub (constant
    * byte-mean fill, real = false) so the batch stays total. One decode
    * pass per partition; only the tw×th thumbnail crosses any shuffle
    * boundary, never the source blob.
    */
  def thumbnails(ds: Dataset[MediaRow], tw: Int, th: Int): Dataset[Thumbnail] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      decodePngGray(r.blob).orElse(decodeGifGray(r.blob))
        .orElse(decodeJpegGray(r.blob)) match {
        case Some((w, h, plane)) =>
          val t = resizeNearest(plane, w, h, tw, th)
          Thumbnail(r.media_id, tw, th, real = true,
            t.map(v => math.rint(v).toInt.toByte))
        case None =>
          val (_, _, m) = decodeStub(r.blob)
          Thumbnail(r.media_id, tw, th, real = false,
            Array.fill[Byte](tw * th)(math.rint(m).toInt.toByte))
      }
    })
  }

  /** Real GIF pixel decode with the JDK alone: walk the block structure
    * to the first image descriptor, LZW-decode the index stream (full
    * dictionary algorithm incl. clear-code resets, width growth, and the
    * KwKwK case), map indices through the active palette (local else
    * global), and return the mean over all RGB samples. None for
    * interlaced frames or any malformed stream — callers keep the
    * labeled byte-mean fallback.
    */
  def decodeGifPixelMean(blob: Array[Byte]): Option[Double] =
    gifIndices(blob).map { case (_, _, pal, idx) =>
      val nColors = pal.length / 3
      var total = 0.0
      var k = 0
      while (k < idx.length) {
        val ci = math.min(idx(k), nColors - 1)
        total += (pal(ci * 3) & 0xff) + (pal(ci * 3 + 1) & 0xff) +
          (pal(ci * 3 + 2) & 0xff)
        k += 1
      }
      math.rint(total / (idx.length * 3L) * 10000) / 10000
    }

  /** The first image frame's raw index stream: (w, h, active palette,
    * LZW-decoded indices) — the shared core under [[decodeGifPixelMean]]
    * and [[decodeGifGray]].
    */
  private def gifIndices(
      blob: Array[Byte]): Option[(Int, Int, Array[Byte], Array[Int])] = {
    if (blob.length < 14) return None
    val hdr = new String(blob.take(6), "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    try {
      val packed = blob(10) & 0xff
      var i = 13
      val gctLen = if ((packed & 0x80) != 0) 3 * (1 << ((packed & 7) + 1)) else 0
      val gct = blob.slice(i, i + gctLen)
      i += gctLen
      while (i < blob.length) {
        (blob(i) & 0xff) match {
          case 0x21 => // extension: label byte then length-prefixed sub-blocks
            i += 2
            while (i < blob.length && (blob(i) & 0xff) != 0) i += 1 + (blob(i) & 0xff)
            i += 1
          case 0x2c =>
            val w = le16(blob, i + 5); val h = le16(blob, i + 7)
            val ip = blob(i + 9) & 0xff
            if ((ip & 0x40) != 0) return None // interlaced: fallback
            i += 10
            val lctLen = if ((ip & 0x80) != 0) 3 * (1 << ((ip & 7) + 1)) else 0
            val pal = if (lctLen > 0) blob.slice(i, i + lctLen) else gct
            i += lctLen
            if (pal.isEmpty || w <= 0 || h <= 0) return None
            val minCode = blob(i) & 0xff; i += 1
            val data = new java.io.ByteArrayOutputStream()
            while (i < blob.length && (blob(i) & 0xff) != 0) {
              val n = blob(i) & 0xff
              if (i.toLong + 1 + n > blob.length) return None
              data.write(blob, i + 1, n)
              i += 1 + n
            }
            val idx = lzwDecode(data.toByteArray, minCode, w * h)
              .getOrElse(return None)
            return Some((w, h, pal, idx))
          case _ => return None // trailer or junk before any image data
        }
      }
      None
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  /** Per-pixel gray plane for (non-interlaced) GIFs: the LZW index stream
    * mapped through the active palette, luma = palette-RGB mean — the GIF
    * counterpart of [[decodePngGray]], feeding the same resize path.
    */
  def decodeGifGray(blob: Array[Byte]): Option[(Int, Int, Array[Double])] =
    gifIndices(blob).map { case (w, h, pal, idx) =>
      val nColors = pal.length / 3
      val plane = new Array[Double](idx.length)
      var k = 0
      while (k < idx.length) {
        val ci = math.min(idx(k), nColors - 1)
        plane(k) = ((pal(ci * 3) & 0xff) + (pal(ci * 3 + 1) & 0xff) +
          (pal(ci * 3 + 2) & 0xff)) / 3.0
        k += 1
      }
      (w, h, plane)
    }

  /** GIF LZW (spec appendix F): LSB-first variable-width codes, dictionary
    * reset on clear, width grows when the next free code would not fit,
    * code==next-free handled as KwKwK. Returns exactly `n` indices.
    */
  private def lzwDecode(data: Array[Byte], minCode: Int, n: Int): Option[Array[Int]] = {
    if (minCode < 2 || minCode > 8 || n <= 0) return None
    val clear = 1 << minCode
    val eoi = clear + 1
    val dict = new Array[Array[Int]](4096)
    var next = 0
    var width = 0
    def reset(): Unit = {
      java.util.Arrays.fill(dict.asInstanceOf[Array[AnyRef]], null)
      var c = 0
      while (c < clear) { dict(c) = Array(c); c += 1 }
      next = eoi + 1
      width = minCode + 1
    }
    reset()
    val out = new Array[Int](n)
    var outN = 0
    var bitPos = 0
    val totalBits = data.length * 8
    var prev: Array[Int] = null
    while (outN < n) {
      if (bitPos + width > totalBits) return None // truncated stream
      var code = 0
      var j = 0
      while (j < width) {
        code |= (((data((bitPos + j) >> 3) >> ((bitPos + j) & 7)) & 1) << j)
        j += 1
      }
      bitPos += width
      if (code == clear) { reset(); prev = null }
      else if (code == eoi) return None // EOI before all pixels decoded
      else {
        val entry =
          if (code < next && dict(code) != null) dict(code)
          else if (code == next && prev != null) prev :+ prev(0) // KwKwK
          else return None
        var k = 0
        while (k < entry.length && outN < n) { out(outN) = entry(k); outN += 1; k += 1 }
        if (prev != null && next < 4096) {
          dict(next) = prev :+ entry(0)
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = entry
      }
    }
    Some(out)
  }

  /** Real baseline JPEG entropy decode with the JDK alone (ITU T.81):
    * parse DQT/DHT/SOF0-1/DRI/SOS, huffman-decode the entropy-coded
    * segment (byte unstuffing + restart markers), dequantize, inverse
    * zigzag, 8×8 IDCT, reassemble the sampled component planes, and
    * return the mean over all output samples (YCbCr→RGB for 3-component
    * scans, raw luma for grayscale). PROGRESSIVE frames (SOF2) decode
    * too: every scan accumulates into per-component coefficient grids
    * (spectral selection + successive approximation, G.2) and the IDCT
    * runs once at EOI. None for arithmetic/lossless/hierarchical frames,
    * 4-component (CMYK) scans, or any malformed stream — callers keep
    * the labeled byte-mean fallback.
    */
  def decodeJpegPixelMean(blob: Array[Byte]): Option[Double] = {
    if (blob.length < 4 || (blob(0) & 0xff) != 0xff || (blob(1) & 0xff) != 0xd8)
      return None
    try decodeJpegToPlanes(blob).flatMap(jpegPlanesMean)
    catch {
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None // belt-and-braces
    }
  }

  /** Per-pixel gray plane for baseline AND progressive JPEGs — the same
    * entropy decode as [[decodeJpegPixelMean]], materialized as luma
    * instead of folded to a mean: raw Y for grayscale frames, mean of the
    * upsampled-RGB channels for color (the same luma convention as
    * [[decodePngGray]]/[[decodeGifGray]]), feeding the shared resize path.
    */
  /** The gray path materializes imgW×imgH DOUBLES (8 bytes/pixel, 8× the
    * byte-plane exposure) — cap it at 2^26 pixels (64 MP, a 512 MB plane)
    * so a hostile ~16M-MCU baseline frame can't force a ~8 GB allocation.
    * Enforced at the SOF header inside the decoder, so an over-cap frame
    * does no entropy work and allocates no planes at all before falling
    * back to the caller's labeled stub.
    */
  private val MaxGrayPixels = 1L << 26

  def decodeJpegGray(blob: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (blob.length < 4 || (blob(0) & 0xff) != 0xff || (blob(1) & 0xff) != 0xd8)
      return None
    try decodeJpegToPlanes(blob, maxPixels = MaxGrayPixels)
      .map(jpegPlanesGray)
    catch {
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None // belt-and-braces
    }
  }

  /** Decoded component planes at native sampling resolution, before any
    * reassembly — shared by the mean and gray-plane finishers.
    */
  private final case class JpegPlanes(
      planes: Array[Array[Byte]], strideC: Array[Int],
      sampling: Array[(Int, Int)], imgW: Int, imgH: Int,
      hMax: Int, vMax: Int)

  /** Canonical JPEG huffman table in the T.81 F.2.2.3 decode layout. */
  private final class JpegHuff(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def decode(br: JpegBits): Int = {
      var code = br.bit()
      var l = 1
      while (code > maxCode(l) || maxCode(l) < 0) {
        if (l == 16) throw new ArrayIndexOutOfBoundsException("bad huffman code")
        code = (code << 1) | br.bit()
        l += 1
      }
      vals(valPtr(l) + code - minCode(l)) & 0xff
    }
  }

  /** Entropy-segment bit reader: MSB-first, 0xFF00 unstuffing, RSTn
    * resynchronization (byte-aligned, resets nothing itself).
    */
  private final class JpegBits(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) throw new ArrayIndexOutOfBoundsException("eos")
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          val m = if (pos < b.length) b(pos) & 0xff else -1
          if (m == 0x00) pos += 1 // stuffed data byte
          else throw new ArrayIndexOutOfBoundsException("marker in scan")
          v = 0xff
        }
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. False on anything else. */
    def restart(): Boolean = {
      nbits = 0
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff) return false
      val m = b(pos + 1) & 0xff
      if (m >= 0xd0 && m <= 0xd7) { pos += 2; true } else false
    }
  }

  /** T.81 F.2.2.1 EXTEND: map a magnitude-category bit pattern to its
    * signed value.
    */
  private def jpegExtend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** A(u,x) = 0.5·c(u)·cos((2x+1)uπ/16) — the separable 8-point IDCT basis. */
  private val IdctA: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2) else 1.0
    0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16)
  }

  private final case class JComp(id: Int, hs: Int, vs: Int, tq: Int)

  /** `maxPixels` bounds imgW×imgH at the SOF header, BEFORE any entropy
    * decode or plane allocation — the gray path's cap must reject a
    * hostile frame without first materializing its byte planes.
    */
  private def decodeJpegToPlanes(blob: Array[Byte],
      maxPixels: Long = Long.MaxValue): Option[JpegPlanes] = {
    val qt = new Array[Array[Int]](4)
    val dcTab = new Array[JpegHuff](4)
    val acTab = new Array[JpegHuff](4)
    var comps: Array[JComp] = null
    var imgW = 0; var imgH = 0
    var restartInterval = 0
    var progressive = false
    // progressive coefficient grids: per component, padded-block-grid ×
    // 64 coefficients in NATURAL order, accumulated across scans
    var coefs: Array[Array[Short]] = null
    var sawScan = false
    var i = 2
    // the loop must still see a trailing EOI (the final 2 bytes) — a
    // progressive frame finalizes THERE, so the bound is i+1, not the
    // i+3 a length-carrying segment needs (checked where required)
    while (i + 1 < blob.length) {
      if ((blob(i) & 0xff) != 0xff) return None
      while (i + 2 < blob.length && (blob(i + 1) & 0xff) == 0xff) i += 1
      if (i + 1 >= blob.length) return None
      val marker = blob(i + 1) & 0xff
      if (marker == 0xd8 || marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2
      } else if (marker == 0xd9) {
        // EOI: a progressive frame finalizes here (all scans accumulated)
        return if (progressive && sawScan)
          jpegFinishProgressive(comps, qt, coefs, imgW, imgH)
        else None
      } else {
        if (i + 3 >= blob.length) return None
        val len = be16(blob, i + 2)
        if (len < 2 || i.toLong + 2 + len > blob.length) return None
        val seg = i + 4
        val segEnd = i + 2 + len
        marker match {
          case 0xdb => // DQT: one or more (PqTq, 64|128 entries) tables
            var p = seg
            while (p < segEnd) {
              val pq = (blob(p) >> 4) & 0xf; val tq = blob(p) & 0xf
              if (tq > 3 || pq > 1) return None
              val tab = new Array[Int](64)
              var k = 0
              while (k < 64) {
                tab(k) =
                  if (pq == 0) blob(p + 1 + k) & 0xff
                  else be16(blob, p + 1 + 2 * k)
                k += 1
              }
              qt(tq) = tab
              p += 1 + (if (pq == 0) 64 else 128)
            }
          case 0xc4 => // DHT: one or more (TcTh, 16 counts, symbols) tables
            var p = seg
            while (p < segEnd) {
              val tc = (blob(p) >> 4) & 0xf; val th = blob(p) & 0xf
              if (tc > 1 || th > 3) return None
              val bits = Array.tabulate(16)(k => blob(p + 1 + k) & 0xff)
              val n = bits.sum
              if (n == 0 || n > 256 || p + 17 + n > segEnd) return None
              val vals = blob.slice(p + 17, p + 17 + n)
              val tab = new JpegHuff(bits, vals)
              if (tc == 0) dcTab(th) = tab else acTab(th) = tab
              p += 17 + n
            }
          case 0xc0 | 0xc1 | 0xc2 => // sequential (C0/C1) or progressive (C2)
            progressive = marker == 0xc2
            imgH = be16(blob, seg + 1); imgW = be16(blob, seg + 3)
            val nc = blob(seg + 5) & 0xff
            if (imgW <= 0 || imgH <= 0 || (nc != 1 && nc != 3)) return None
            // caller's pixel budget, enforced at the header — no entropy
            // work or plane allocation happens for an over-budget frame
            if (imgW.toLong * imgH > maxPixels) return None
            comps = Array.tabulate(nc) { c =>
              val o = seg + 6 + 3 * c
              JComp(blob(o) & 0xff, (blob(o + 1) >> 4) & 0xf,
                blob(o + 1) & 0xf, blob(o + 2) & 0xff)
            }
            if (comps.exists(c => c.hs < 1 || c.hs > 4 || c.vs < 1 || c.vs > 4))
              return None
            if (progressive) {
              // whole-image coefficient storage is inherent to progressive
              // decode (every scan touches every block); bound it so a
              // hostile header cannot allocate GBs — 512K blocks = 64 MB
              val hMax = comps.map(_.hs).max; val vMax = comps.map(_.vs).max
              val mcusX = (imgW + 8 * hMax - 1) / (8 * hMax)
              val mcusY = (imgH + 8 * vMax - 1) / (8 * vMax)
              val blocks = comps.map(c => mcusX.toLong * c.hs * mcusY * c.vs).sum
              if (blocks > (1L << 19)) return None
              coefs = comps.map(c =>
                new Array[Short](mcusX * c.hs * mcusY * c.vs * 64))
            }
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
              0xcd | 0xce | 0xcf =>
            return None // lossless / arithmetic / hierarchical
          case 0xdd => // DRI
            restartInterval = be16(blob, seg)
          case 0xda => // SOS: scan header then the entropy-coded segment
            if (comps == null) return None
            val ns = blob(seg) & 0xff
            if (ns < 1 || ns > comps.length || seg + 1 + 2 * ns + 3 > segEnd)
              return None
            val ss = blob(seg + 1 + 2 * ns) & 0xff
            val se = blob(seg + 2 + 2 * ns) & 0xff
            val ahal = blob(seg + 3 + 2 * ns) & 0xff
            val ah = (ahal >> 4) & 0xf; val al = ahal & 0xf
            val scanIdx = new Array[Int](ns)
            val scanDc = new Array[JpegHuff](comps.length)
            val scanAc = new Array[JpegHuff](comps.length)
            // a DC refinement scan (Ss=0, Ah>0) is raw bits — no DC table
            // needed; an AC scan never reads the DC table
            val needDc = ss == 0 && ah == 0
            val needAc = !progressive || ss > 0
            var c = 0
            while (c < ns) {
              val cid = blob(seg + 1 + 2 * c) & 0xff
              val ci = comps.indexWhere(_.id == cid)
              if (ci < 0) return None
              scanIdx(c) = ci
              val td = (blob(seg + 2 + 2 * c) >> 4) & 0xf
              val ta = blob(seg + 2 + 2 * c) & 0xf
              if (td > 3 || ta > 3 || (needDc && dcTab(td) == null) ||
                  (needAc && acTab(ta) == null))
                return None
              scanDc(ci) = dcTab(td); scanAc(ci) = acTab(ta)
              c += 1
            }
            if (comps.exists(cc => qt(cc.tq) == null)) return None
            if (!progressive) {
              if (ns != comps.length) return None
              return jpegScanPlanes(blob, segEnd, comps.map(cc =>
                (cc.hs, cc.vs, qt(cc.tq))), scanDc, scanAc,
                imgW, imgH, restartInterval)
            }
            // progressive: decode this scan into the coefficient grids and
            // keep walking markers from wherever the entropy segment ends
            val next = jpegProgressiveScan(blob, segEnd, scanIdx, comps,
              scanDc, scanAc, coefs, imgW, imgH,
              ss, se, ah, al, restartInterval)
            if (next < 0) return None
            sawScan = true
            i = next
          case _ => // APPn / COM / other: skip
        }
        if (marker != 0xda) i = segEnd
      }
    }
    None
  }

  /** Decode the entropy-coded segment starting at `pos` into the
    * per-component sample planes.
    */
  private def jpegScanPlanes(
      blob: Array[Byte], pos: Int,
      comps: Array[(Int, Int, Array[Int])],
      dc: Array[JpegHuff], ac: Array[JpegHuff],
      imgW: Int, imgH: Int, restartInterval: Int): Option[JpegPlanes] = {
    val nc = comps.length
    val hMax = comps.map(_._1).max
    val vMax = comps.map(_._2).max
    val mcusX = (imgW + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (imgH + 8 * vMax - 1) / (8 * vMax)
    if (mcusX.toLong * mcusY > (1L << 24)) return None // bound work
    // per-component plane at its native sampling resolution; the MCU
    // bound alone does not keep stride×rows inside Int (65000² dims with
    // 2×2 sampling pass it but wrap the allocation size negative)
    val strideC = comps.map { case (hs, _, _) => mcusX * hs * 8 }
    val rowsC = comps.map { case (_, vs, _) => mcusY * vs * 8 }
    if ((0 until nc).exists(c => strideC(c).toLong * rowsC(c) > Int.MaxValue) ||
        imgW.toLong * imgH > Int.MaxValue)
      return None
    val planes = Array.tabulate(nc)(c => new Array[Byte](strideC(c) * rowsC(c)))
    val pred = new Array[Int](nc)
    val coef = new Array[Int](64)
    val tmp = Array.ofDim[Double](8, 8)
    val br = new JpegBits(blob, pos)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return None
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var c = 0
      while (c < nc) {
        val (hs, vs, q) = comps(c)
        var v = 0
        while (v < vs) {
          var h = 0
          while (h < hs) {
            // -- one 8×8 block: huffman + dequant + dezigzag --
            java.util.Arrays.fill(coef, 0)
            val t = dc(c).decode(br)
            if (t > 15) return None
            pred(c) += jpegExtend(br.receive(t), t)
            coef(0) = pred(c) * q(0)
            var k = 1
            while (k < 64) {
              val rs = ac(c).decode(br)
              val r = rs >> 4; val s = rs & 0xf
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += r
                if (k > 63) return None
                coef(ZigZag(k)) = jpegExtend(br.receive(s), s) * q(k)
                k += 1
              }
            }
            idctToPlane(coef, tmp, planes(c), strideC(c),
              (mx * hs + h) * 8, (my * vs + v) * 8)
            h += 1
          }
          v += 1
        }
        c += 1
      }
      mcu += 1
    }
    Some(JpegPlanes(planes, strideC,
      comps.map { case (hs, vs, _) => (hs, vs) }, imgW, imgH, hMax, vMax))
  }

  /** Separable 8×8 IDCT of one dequantized natural-order block into a
    * component plane at (px0, py0), with level shift + clamp. `tmp` is a
    * caller-owned 8×8 scratch (reused across blocks).
    */
  private def idctToPlane(coef: Array[Int], tmp: Array[Array[Double]],
      plane: Array[Byte], stride: Int, px0: Int, py0: Int): Unit = {
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var s2 = 0.0
        var vv = 0
        while (vv < 8) { s2 += IdctA(vv)(y) * coef(vv * 8 + u); vv += 1 }
        tmp(u)(y) = s2
        y += 1
      }
      u += 1
    }
    var y = 0
    while (y < 8) {
      val rowBase = (py0 + y) * stride + px0
      var x = 0
      while (x < 8) {
        var s3 = 0.0
        var uu = 0
        while (uu < 8) { s3 += IdctA(uu)(x) * tmp(uu)(y); uu += 1 }
        val sv = math.rint(s3 + 128).toInt
        plane(rowBase + x) =
          (if (sv < 0) 0 else if (sv > 255) 255 else sv).toByte
        x += 1
      }
      y += 1
    }
  }

  /** JFIF YCbCr→RGB of pixel (x, y) with nearest-neighbor chroma
    * upsample, as (r, g, b).
    */
  private def jpegRgbAt(p: JpegPlanes, x: Int, y: Int): (Int, Int, Int) = {
    val (h0, v0) = p.sampling(0); val (h1, v1) = p.sampling(1)
    val (h2, v2) = p.sampling(2)
    val yy = p.planes(0)((y * v0 / p.vMax) * p.strideC(0) + x * h0 / p.hMax) & 0xff
    val cb = (p.planes(1)((y * v1 / p.vMax) * p.strideC(1) + x * h1 / p.hMax) & 0xff) - 128
    val cr = (p.planes(2)((y * v2 / p.vMax) * p.strideC(2) + x * h2 / p.hMax) & 0xff) - 128
    def clamp(d: Double): Int = {
      val r = math.rint(d).toInt
      if (r < 0) 0 else if (r > 255) 255 else r
    }
    (clamp(yy + 1.402 * cr),
      clamp(yy - 0.344136 * cb - 0.714136 * cr),
      clamp(yy + 1.772 * cb))
  }

  /** Mean over the final image samples: raw luma for one component,
    * nearest-neighbor chroma upsample + JFIF YCbCr→RGB for three.
    */
  private def jpegPlanesMean(p: JpegPlanes): Option[Double] = {
    val imgW = p.imgW; val imgH = p.imgH
    var total = 0.0
    if (p.planes.length == 1) {
      val plane = p.planes(0); val stride = p.strideC(0)
      var y = 0
      while (y < imgH) {
        var x = 0
        while (x < imgW) { total += plane(y * stride + x) & 0xff; x += 1 }
        y += 1
      }
      Some(math.rint(total / (imgW.toLong * imgH) * 10000) / 10000)
    } else {
      var y = 0
      while (y < imgH) {
        var x = 0
        while (x < imgW) {
          val (r, g, b) = jpegRgbAt(p, x, y)
          total += r + g + b
          x += 1
        }
        y += 1
      }
      Some(math.rint(total / (imgW.toLong * imgH * 3) * 10000) / 10000)
    }
  }

  /** Full-resolution luma plane: the Y samples for grayscale frames, the
    * per-pixel RGB mean for color — the same convention as
    * [[decodePngGray]] (alpha-free channel mean).
    */
  private def jpegPlanesGray(p: JpegPlanes): (Int, Int, Array[Double]) = {
    val imgW = p.imgW; val imgH = p.imgH
    val out = new Array[Double](imgW * imgH)
    if (p.planes.length == 1) {
      val plane = p.planes(0); val stride = p.strideC(0)
      var y = 0
      while (y < imgH) {
        var x = 0
        while (x < imgW) {
          out(y * imgW + x) = (plane(y * stride + x) & 0xff).toDouble
          x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      while (y < imgH) {
        var x = 0
        while (x < imgW) {
          val (r, g, b) = jpegRgbAt(p, x, y)
          out(y * imgW + x) = (r + g + b) / 3.0
          x += 1
        }
        y += 1
      }
    }
    (imgW, imgH, out)
  }

  /** Decode ONE progressive scan (T.81 G.2) into the padded
    * per-component coefficient grids: spectral band [ss, se] at
    * successive-approximation stage (ah, al). A first DC scan (ah=0)
    * huffman-decodes shifted diffs; a DC refinement is one raw bit per
    * block. A first AC scan places coefficients with end-of-band runs;
    * an AC refinement interleaves correction bits for known-nonzero
    * coefficients with ±(1<<al) insertions — the libjpeg-documented
    * traversal. DC scans may interleave components (MCU order); AC scans
    * cover exactly one component in raster order over its NON-padded
    * block grid. Returns the blob offset of the marker terminating the
    * entropy segment, or -1 on malformed input.
    */
  private def jpegProgressiveScan(
      blob: Array[Byte], pos: Int,
      scanIdx: Array[Int], comps: Array[JComp],
      dc: Array[JpegHuff], ac: Array[JpegHuff],
      coefs: Array[Array[Short]],
      imgW: Int, imgH: Int,
      ss: Int, se: Int, ah: Int, al: Int,
      restartInterval: Int): Int = {
    val hMax = comps.map(_.hs).max; val vMax = comps.map(_.vs).max
    val mcusX = (imgW + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (imgH + 8 * vMax - 1) / (8 * vMax)
    val br = new JpegBits(blob, pos)
    val pred = new Array[Int](comps.length)
    var eobrun = 0
    def restartNow(): Unit = {
      if (!br.restart()) throw new ArrayIndexOutOfBoundsException("rst")
      java.util.Arrays.fill(pred, 0)
      eobrun = 0
    }
    def dcOne(ci: Int, off: Int): Unit = {
      val c = coefs(ci)
      if (ah == 0) {
        val t = dc(ci).decode(br)
        if (t > 15) throw new ArrayIndexOutOfBoundsException("dc cat")
        pred(ci) += jpegExtend(br.receive(t), t)
        c(off) = (pred(ci) << al).toShort
      } else if (br.bit() == 1) {
        c(off) = (c(off) | (1 << al)).toShort
      }
    }
    def acFirst(ci: Int, off: Int): Unit = {
      val c = coefs(ci)
      if (eobrun > 0) eobrun -= 1
      else {
        var k = ss
        var done = false
        while (!done && k <= se) {
          val rs = ac(ci).decode(br)
          val r = rs >> 4; val s = rs & 0xf
          if (s == 0) {
            if (r < 15) {
              // EOB run covers this block too, hence the -1
              eobrun = (1 << r) - 1 + (if (r > 0) br.receive(r) else 0)
              done = true
            } else k += 16 // ZRL
          } else {
            k += r
            if (k > se) throw new ArrayIndexOutOfBoundsException("ac band")
            c(off + ZigZag(k)) = (jpegExtend(br.receive(s), s) << al).toShort
            k += 1
          }
        }
      }
    }
    def acRefine(ci: Int, off: Int): Unit = {
      val c = coefs(ci)
      val p1 = 1 << al; val m1 = -(1 << al)
      def correct(j: Int): Unit =
        if (br.bit() == 1 && (c(j) & p1) == 0)
          c(j) = (c(j) + (if (c(j) >= 0) p1 else m1)).toShort
      var k = ss
      if (eobrun == 0) {
        var done = false
        while (!done && k <= se) {
          val rs = ac(ci).decode(br)
          var r = rs >> 4; val s = rs & 0xf
          var newVal = 0
          if (s == 0) {
            if (r < 15) {
              eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
              done = true // rest of the block = corrections, below
            }
            // r == 15 (ZRL): pass over 16 zero-history coefficients
          } else {
            if (s != 1) throw new ArrayIndexOutOfBoundsException("refine s")
            newVal = if (br.bit() == 1) p1 else m1
          }
          if (!done) {
            var placed = false
            while (!placed && k <= se) {
              val j = off + ZigZag(k)
              if (c(j) != 0) correct(j)
              else if (r == 0) {
                if (newVal != 0) c(j) = newVal.toShort
                placed = true
              } else r -= 1
              k += 1
            }
          }
        }
      }
      if (eobrun > 0) {
        // end-of-band: the remaining positions of THIS block still carry
        // correction bits for already-nonzero coefficients
        while (k <= se) {
          val j = off + ZigZag(k)
          if (c(j) != 0) correct(j)
          k += 1
        }
        eobrun -= 1
      }
    }
    // raster walk over a single component's non-padded block grid
    def nonInterleaved(ci: Int)(f: Int => Unit): Unit = {
      val hs = comps(ci).hs; val vs = comps(ci).vs
      val bw = mcusX * hs // storage grid width (padded)
      val compW = (imgW * hs + hMax - 1) / hMax
      val compH = (imgH * vs + vMax - 1) / vMax
      val nbw = (compW + 7) / 8; val nbh = (compH + 7) / 8
      val n = nbw * nbh
      var b = 0
      while (b < n) {
        if (restartInterval > 0 && b > 0 && b % restartInterval == 0)
          restartNow()
        f(((b / nbw) * bw + (b % nbw)) * 64)
        b += 1
      }
    }
    try {
      if (ss == 0) {
        if (se != 0) return -1 // DC scan must be the lone 0 band
        if (scanIdx.length > 1) {
          val nMcus = mcusX * mcusY
          var mcu = 0
          while (mcu < nMcus) {
            if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0)
              restartNow()
            val mx = mcu % mcusX; val my = mcu / mcusX
            var s = 0
            while (s < scanIdx.length) {
              val ci = scanIdx(s)
              val hs = comps(ci).hs; val vs = comps(ci).vs
              val bw = mcusX * hs
              var v = 0
              while (v < vs) {
                var h = 0
                while (h < hs) {
                  dcOne(ci, ((my * vs + v) * bw + (mx * hs + h)) * 64)
                  h += 1
                }
                v += 1
              }
              s += 1
            }
            mcu += 1
          }
        } else nonInterleaved(scanIdx(0))(off => dcOne(scanIdx(0), off))
      } else {
        if (scanIdx.length != 1 || ss > se || se > 63) return -1
        val ci = scanIdx(0)
        if (ah == 0) nonInterleaved(ci)(off => acFirst(ci, off))
        else nonInterleaved(ci)(off => acRefine(ci, off))
      }
    } catch { case _: ArrayIndexOutOfBoundsException => return -1 }
    // find the marker that terminates this entropy segment (tolerate
    // unconsumed pad bits / stray restarts after the last decoded block)
    var p = br.pos
    while (p + 1 < blob.length) {
      if ((blob(p) & 0xff) == 0xff) {
        val m = blob(p + 1) & 0xff
        if (m == 0x00) p += 2 // stuffed data byte
        else if (m == 0xff) p += 1 // fill byte
        else if (m >= 0xd0 && m <= 0xd7) p += 2 // stray restart
        else return p
      } else p += 1
    }
    -1
  }

  /** After all progressive scans: dequantize every block of every
    * component grid and IDCT into the sampled planes.
    */
  private def jpegFinishProgressive(comps: Array[JComp], qt: Array[Array[Int]],
      coefs: Array[Array[Short]], imgW: Int, imgH: Int): Option[JpegPlanes] = {
    val hMax = comps.map(_.hs).max; val vMax = comps.map(_.vs).max
    val mcusX = (imgW + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (imgH + 8 * vMax - 1) / (8 * vMax)
    val strideC = comps.map(c => mcusX * c.hs * 8)
    // same Int-overflow guard as the sequential path (the progressive
    // block bound keeps coef grids small but not the output planes)
    if (comps.indices.exists(c =>
        strideC(c).toLong * mcusY * comps(c).vs * 8 > Int.MaxValue) ||
        imgW.toLong * imgH > Int.MaxValue)
      return None
    val planes = Array.tabulate(comps.length)(c =>
      new Array[Byte](strideC(c) * mcusY * comps(c).vs * 8))
    val tmp = Array.ofDim[Double](8, 8)
    val deq = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val q = qt(comps(ci).tq)
      if (q == null) return None
      val bw = mcusX * comps(ci).hs
      val bh = mcusY * comps(ci).vs
      val cf = coefs(ci)
      var b = 0
      while (b < bw * bh) {
        val off = b * 64
        var k = 0
        while (k < 64) { val j = ZigZag(k); deq(j) = cf(off + j) * q(k); k += 1 }
        idctToPlane(deq, tmp, planes(ci), strideC(ci),
          (b % bw) * 8, (b / bw) * 8)
        b += 1
      }
      ci += 1
    }
    Some(JpegPlanes(planes, strideC, comps.map(c => (c.hs, c.vs)),
      imgW, imgH, hMax, vMax))
  }

  // ---- header encoders: synthesize minimal VALID containers so tests
  // and oracles can round-trip dimensions through the real parser ----

  /** Minimal PNG: signature + IHDR chunk (33 bytes). CRC is computed
    * properly so external tools also accept the header.
    */
  def pngBytes(w: Int, h: Int, colorType: Int = 6): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33)
    out.put(PngSig)
    out.putInt(13) // IHDR data length
    val ihdrStart = out.position()
    out.put("IHDR".getBytes("US-ASCII"))
    out.putInt(w).putInt(h)
    out.put(8.toByte).put(colorType.toByte) // bit depth 8
    out.put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    val crc = new java.util.zip.CRC32
    crc.update(out.array(), ihdrStart, 17)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** Full PNG with real pixels: signature + IHDR + IDAT + IEND. The
    * scanlines are FILTERED per spec §9 with filter type y % 5, so a
    * multi-row image exercises every filter; the zlib stream uses
    * hand-written STORED blocks, making the container size exactly
    * `8 + 25 + 12 + (2 + raw + 5*ceil(raw/65535) + 4) + 12` bytes with
    * `raw = h*(1 + w*channels)` — arithmetically predictable, so SQL
    * oracles can assert it. `px(x, y, c)` supplies sample values.
    */
  def pngPixelBytes(w: Int, h: Int, colorType: Int = 6)
      (px: (Int, Int, Int) => Int): Array[Byte] = {
    val ch = pngChannels(colorType)
    require(ch > 0 && colorType != 3, s"unsupported color type $colorType")
    val raw = filterPass(w, h, ch)(px)
    PngSig ++ pngChunk("IHDR", pngIhdr(w, h, colorType, 0)) ++
      pngChunk("IDAT", zlibStore(raw)) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** zlib with STORED deflate blocks (RFC 1950/1951): deterministic size
    * `2 + raw + 5·ceil(raw/65535) + 4`.
    */
  private def zlibStore(raw: Array[Byte]): Array[Byte] = {
    val z = new java.io.ByteArrayOutputStream()
    z.write(0x78); z.write(0x01) // CMF/FLG, (0x7801 % 31) == 0
    var off = 0
    var fin = false
    while (!fin) {
      val n = math.min(65535, raw.length - off)
      fin = off + n >= raw.length
      z.write(if (fin) 1 else 0) // BFINAL, BTYPE=00 (stored)
      z.write(n & 0xff); z.write((n >> 8) & 0xff)
      z.write(~n & 0xff); z.write((~n >> 8) & 0xff)
      z.write(raw, off, n)
      off += n
    }
    val ad = new java.util.zip.Adler32(); ad.update(raw)
    val av = ad.getValue
    z.write((av >> 24).toInt & 0xff); z.write((av >> 16).toInt & 0xff)
    z.write((av >> 8).toInt & 0xff); z.write(av.toInt & 0xff)
    z.toByteArray
  }

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(12 + data.length)
    out.putInt(data.length)
    out.put(typ.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(typ.getBytes("US-ASCII")); crc.update(data)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  private def pngIhdr(w: Int, h: Int, colorType: Int, interlace: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte)
      .array()

  /** Filter one sub-image's scanlines per spec §9 with filter type
    * `row % 5` (so multi-row images exercise every filter), returning
    * the raw pre-compression bytes. `px(i, j, c)` addresses the
    * SUB-IMAGE coordinate space.
    */
  private def filterPass(pw: Int, ph: Int, ch: Int)
      (px: (Int, Int, Int) => Int): Array[Byte] = {
    val rowLen = pw * ch
    val raw = new Array[Byte](ph * (1 + rowLen))
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val prev = new Array[Int](rowLen)
    val cur = new Array[Int](rowLen)
    var y = 0
    while (y < ph) {
      var x = 0
      while (x < rowLen) { cur(x) = px(x / ch, y, x % ch) & 0xff; x += 1 }
      val ft = y % 5
      val base = y * (1 + rowLen)
      raw(base) = ft.toByte
      x = 0
      while (x < rowLen) {
        val a = if (x >= ch) cur(x - ch) else 0
        val b = if (y > 0) prev(x) else 0
        val c = if (x >= ch && y > 0) prev(x - ch) else 0
        val f = ft match {
          case 0 => cur(x)
          case 1 => cur(x) - a
          case 2 => cur(x) - b
          case 3 => cur(x) - ((a + b) >> 1)
          case 4 => cur(x) - paeth(a, b, c)
        }
        raw(base + 1 + x) = (f & 0xff).toByte
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, rowLen)
      y += 1
    }
    raw
  }

  /** Full Adam7-INTERLACED PNG with real pixels: the 7 passes are
    * emitted in spec order, each filtered independently (spec §8.2 —
    * pass scanlines restart the filter context), then compressed as one
    * zlib stream. `px(x, y, c)` addresses the FULL image coordinate
    * space.
    */
  def pngInterlacedBytes(w: Int, h: Int, colorType: Int = 6)
      (px: (Int, Int, Int) => Int): Array[Byte] = {
    val ch = pngChannels(colorType)
    require(ch > 0 && colorType != 3, s"unsupported color type $colorType")
    val raw = new java.io.ByteArrayOutputStream()
    Adam7.zip(adam7Dims(w, h)).foreach {
      case ((xs, ys, xStep, yStep), (pw, ph)) =>
        if (pw > 0 && ph > 0)
          raw.write(filterPass(pw, ph, ch)((i, j, c) =>
            px(xs + i * xStep, ys + j * yStep, c)))
    }
    PngSig ++ pngChunk("IHDR", pngIhdr(w, h, colorType, 1)) ++
      pngChunk("IDAT", zlibStore(raw.toByteArray)) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Full INDEXED-color PNG (type 3) with real pixels: PLTE palette +
    * one index sample per pixel. `palette` entries are (r,g,b);
    * `px(x, y)` returns a palette index.
    */
  def pngIndexedBytes(w: Int, h: Int, palette: Seq[(Int, Int, Int)])
      (px: (Int, Int) => Int): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256)
    val plte = palette.flatMap { case (r, g, b) =>
      Seq(r.toByte, g.toByte, b.toByte)
    }.toArray
    val raw = filterPass(w, h, 1)((x, y, _) =>
      math.min(px(x, y), palette.length - 1))
    PngSig ++ pngChunk("IHDR", pngIhdr(w, h, 3, 0)) ++
      pngChunk("PLTE", plte) ++
      pngChunk("IDAT", zlibStore(raw)) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Minimal JPEG: SOI + APP0 JFIF + SOF0 + EOI (43 bytes for 3
    * components). The APP0 segment forces the parser's marker walk to
    * actually skip a segment before finding SOF0.
    */
  def jpegBytes(w: Int, h: Int, ncomp: Int = 3): Array[Byte] = {
    val sofLen = 8 + 3 * ncomp
    val out = java.nio.ByteBuffer.allocate(2 + 18 + 2 + sofLen + 2)
    out.put(0xff.toByte).put(0xd8.toByte) // SOI
    out.put(0xff.toByte).put(0xe0.toByte).putShort(16) // APP0, len 16
    out.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    out.putShort(0x0101.toShort) // version 1.1
    out.put(0.toByte).putShort(1).putShort(1) // aspect-ratio units 1:1
    out.put(0.toByte).put(0.toByte) // no thumbnail
    out.put(0xff.toByte).put(0xc0.toByte).putShort(sofLen.toShort) // SOF0
    out.put(8.toByte) // precision
    out.putShort(h.toShort).putShort(w.toShort)
    out.put(ncomp.toByte)
    (1 to ncomp).foreach { c =>
      out.put(c.toByte).put(0x11.toByte).put(0.toByte) // 1x1 sampling, qtable 0
    }
    out.put(0xff.toByte).put(0xd9.toByte) // EOI
    out.array()
  }

  /** Full baseline JPEG with real entropy-coded pixels: a solid-gray
    * single-component frame. With an all-ones quantization table a
    * constant block is EXACT under JPEG: the only nonzero coefficient is
    * DC = 8·(v−128), an integer, so decode returns exactly `v` for every
    * pixel — making `channel_mean` arithmetically predictable for SQL
    * oracles. Uses minimal custom huffman tables (12 four-bit DC
    * category codes; a single one-bit AC EOB code); the standard Annex K
    * table path is exercised by ImageIO-written fixtures in MediaSpec.
    * With `progressive` the same image is coded as an SOF2 frame in two
    * scans (DC first, then AC 1..63 as bare EOBs) — same exact decode.
    */
  def jpegSolidGrayBytes(w: Int, h: Int, v: Int, restartEvery: Int = 0,
      progressive: Boolean = false): Array[Byte] =
    jpegBlockGrayBytes(w, h, restartEvery, progressive)((_, _) => v)

  /** [[jpegSolidGrayBytes]] generalized to a PER-BLOCK constant: block
    * (bx, by) of the 8×8 grid carries the sample value `blockVal(bx, by)`
    * throughout. Still exact under decode (each block is DC-only with an
    * all-ones quant table), but no longer globally constant — a
    * pixel-indexed consumer (resize, crop) computes closed-form expected
    * values per block while a decode/indexing bug still breaks them.
    */
  def jpegBlockGrayBytes(w: Int, h: Int, restartEvery: Int = 0,
      progressive: Boolean = false)(blockVal: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0)
    val out = new java.io.ByteArrayOutputStream()
    def m(id: Int): Unit = { out.write(0xff); out.write(id) }
    def w16(x: Int): Unit = { out.write((x >> 8) & 0xff); out.write(x & 0xff) }
    m(0xd8) // SOI
    m(0xdb); w16(2 + 1 + 64); out.write(0x00) // DQT, Pq=0 Tq=0
    (0 until 64).foreach(_ => out.write(1))
    m(if (progressive) 0xc2 else 0xc0); w16(8 + 3) // SOF0/SOF2, 1 component
    out.write(8); w16(h); w16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0) // id 1, 1×1, qtable 0
    // DHT DC 0: 12 codes of length 4 → categories 0..11
    m(0xc4); w16(2 + 17 + 12); out.write(0x00)
    (1 to 16).foreach(l => out.write(if (l == 4) 12 else 0))
    (0 to 11).foreach(out.write)
    // DHT AC 0: one 1-bit code → EOB
    m(0xc4); w16(2 + 17 + 1); out.write(0x10)
    (1 to 16).foreach(l => out.write(if (l == 1) 1 else 0))
    out.write(0x00)
    if (restartEvery > 0) { m(0xdd); w16(4); w16(restartEvery) } // DRI
    var acc = 0L; var nbits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); nbits += len
      while (nbits >= 8) {
        val b = ((acc >> (nbits - 8)) & 0xff).toInt
        out.write(b); if (b == 0xff) out.write(0x00) // byte stuffing
        nbits -= 8
      }
    }
    def pad(): Unit = if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
    val blocksX = (w + 7) / 8
    val blocks = blocksX * ((h + 7) / 8)
    def dcOf(b: Int): Int = {
      val v = blockVal(b % blocksX, b / blocksX)
      require(v >= 0 && v <= 255, s"block value $v out of range")
      8 * (v - 128)
    }
    def sos(ss: Int, se: Int): Unit = {
      m(0xda); w16(6 + 2)
      out.write(1); out.write(1); out.write(0x00) // comp 1, DC 0 / AC 0
      out.write(ss); out.write(se); out.write(0) // Ss/Se/AhAl
    }
    // per block: a DC diff (8(v-128) after each predictor reset, 0
    // otherwise); restart markers byte-align. Baseline appends the AC
    // EOB inline; progressive defers all ACs to a second Ss=1..63 scan
    // whose blocks are bare EOBs.
    def scan(withAc: Boolean): Unit = {
      var pred = 0
      var b = 0
      while (b < blocks) {
        if (restartEvery > 0 && b > 0 && b % restartEvery == 0) {
          pad()
          m(0xd0 + ((b / restartEvery - 1) % 8))
          pred = 0
        }
        val dc = dcOf(b)
        val d = dc - pred
        val cat = 32 - Integer.numberOfLeadingZeros(math.abs(d)) // 0 for d==0
        put(cat, 4) // DC category (code == symbol under the canonical table)
        if (cat > 0) put(if (d < 0) d + (1 << cat) - 1 else d, cat)
        if (withAc) put(0, 1) // EOB
        pred = dc
        b += 1
      }
      pad()
    }
    if (!progressive) {
      sos(0, 63)
      scan(withAc = true)
    } else {
      sos(0, 0) // DC-first scan
      scan(withAc = false)
      sos(1, 63) // AC-first scan: every block is a bare EOB
      var b = 0
      while (b < blocks) {
        if (restartEvery > 0 && b > 0 && b % restartEvery == 0) {
          pad(); m(0xd0 + ((b / restartEvery - 1) % 8))
        }
        put(0, 1)
        b += 1
      }
      pad()
    }
    m(0xd9) // EOI
    out.toByteArray
  }

  /** Full GIF89a with real pixels: header + LSD + global color table +
    * image descriptor + LZW data + trailer. The LZW stream is the classic
    * uncompressed form — literal codes with a clear emitted before the
    * dictionary would force a width change — so the decoder's reset path
    * is exercised and the stream stays deterministic. `palette` entries
    * are (r,g,b); `px(x, y)` returns a palette index.
    */
  def gifPixelBytes(w: Int, h: Int, palette: Seq[(Int, Int, Int)])
      (px: (Int, Int) => Int): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256)
    // palette size field stores 2^(n+1) entries; LZW min code ≥ 2
    var n = 0
    while ((1 << (n + 1)) < palette.length) n += 1
    val entries = 1 << (n + 1)
    val minCode = math.max(2, n + 1)
    val clear = 1 << minCode
    val eoi = clear + 1
    val width = minCode + 1
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(w); w16(h)
    out.write(0x80 | n) // GCT present, size field n
    out.write(0); out.write(0) // bg index, aspect
    (0 until entries).foreach { c =>
      val (r, g, b) = if (c < palette.length) palette(c) else (0, 0, 0)
      out.write(r & 0xff); out.write(g & 0xff); out.write(b & 0xff)
    }
    out.write(0x2c); w16(0); w16(0); w16(w); w16(h); out.write(0) // descriptor
    out.write(minCode)
    // LZW literal stream with width kept constant by pre-emptive clears:
    // after a clear the first literal adds no entry, each later one adds
    // one; clear again before `next` reaches 1 << width
    val codes = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    def put(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) { codes.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
    }
    put(clear)
    var nextFree = eoi + 1
    var first = true
    for (y <- 0 until h; x <- 0 until w) {
      if (!first && nextFree + 1 >= (1 << width)) {
        put(clear); nextFree = eoi + 1; first = true
      }
      put(px(x, y) & (entries - 1))
      if (first) first = false else nextFree += 1
    }
    put(eoi)
    if (nbits > 0) codes.write((acc & 0xff).toInt)
    val bytes = codes.toByteArray
    var off = 0
    while (off < bytes.length) { // ≤255-byte sub-blocks
      val len = math.min(255, bytes.length - off)
      out.write(len); out.write(bytes, off, len)
      off += len
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Minimal GIF89a: header + logical screen descriptor (13 bytes). */
  def gifBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes("US-ASCII"))
    out.putShort(w.toShort).putShort(h.toShort)
    out.put(0.toByte).put(0.toByte).put(0.toByte) // no GCT, bg 0, square px
    out.array()
  }

  // ---- audio: real RIFF/WAVE PCM decode (JDK-only byte parsing) ----

  final case class WavInfo(
      sample_rate: Int,
      channels: Int,
      bits: Int,
      n_frames: Int,
      duration_ms: Long,
      peak: Int,
      mean_abs: Double)

  /** Real WAV decode: parse the RIFF container ("RIFF"+size+"WAVE",
    * then "fmt " and "data" chunks per the public WAVE spec), and for
    * integer PCM (format 1) compute peak and mean absolute amplitude
    * over every sample of every channel — 16-bit LE and 8-bit unsigned
    * (stored excess-128) layouts. None for float/compressed formats or
    * any malformed/truncated container — callers fall back, labeled.
    */
  def decodeWav(blob: Array[Byte]): Option[WavInfo] = {
    if (blob.length < 44) return None
    if (new String(blob.take(4), "US-ASCII") != "RIFF" ||
        new String(blob.slice(8, 12), "US-ASCII") != "WAVE") return None
    def le32(i: Int): Int =
      (blob(i) & 0xff) | ((blob(i + 1) & 0xff) << 8) |
        ((blob(i + 2) & 0xff) << 16) | ((blob(i + 3) & 0xff) << 24)
    var fmt: (Int, Int, Int, Int) = null // (audioFormat, channels, rate, bits)
    var i = 12
    while (i + 8 <= blob.length) {
      val id = new String(blob.slice(i, i + 4), "US-ASCII")
      val len = le32(i + 4)
      if (len < 0 || i.toLong + 8 + len > blob.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          fmt = (le16(blob, i + 8), le16(blob, i + 10), le32(i + 12), le16(blob, i + 22))
        case "data" =>
          if (fmt == null) return None
          val (audioFormat, ch, rate, bits) = fmt
          if (audioFormat != 1 || ch < 1 || rate <= 0) return None
          val bytesPer = bits / 8
          if (bits != 16 && bits != 8) return None
          val nSamples = len / bytesPer
          val nFrames = nSamples / ch
          if (nFrames == 0) return None
          var peak = 0
          var sumAbs = 0L
          var s = 0
          val base = i + 8
          while (s < nSamples) {
            val v =
              if (bits == 16) {
                val raw = le16(blob, base + 2 * s)
                (raw << 16) >> 16 // sign-extend
              } else (blob(base + s) & 0xff) - 128
            val a = math.abs(v)
            if (a > peak) peak = a
            sumAbs += a
            s += 1
          }
          return Some(WavInfo(rate, ch, bits, nFrames,
            nFrames * 1000L / rate, peak,
            math.rint(sumAbs.toDouble / nSamples * 10000) / 10000))
        case _ => // LIST/fact/cue/...: skip
      }
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    None
  }

  /** Spectral-shape statistics over the same PCM scan as [[decodeWav]]:
    * per-channel ZERO CROSSINGS (strict sign flip between consecutive
    * frames of the SAME channel — the de-interleaved walk a naive
    * sample-order scan would get wrong) summed across channels, and total
    * ENERGY (Σ sample², exact in Long for 16-bit PCM). Both are the
    * integer-exact voice/music/silence discriminators a closed-form SQL
    * oracle reproduces. None under the same conditions as [[decodeWav]].
    */
  def decodeWavStats(blob: Array[Byte]): Option[(Long, Long)] = {
    if (blob.length < 44) return None
    if (new String(blob.take(4), "US-ASCII") != "RIFF" ||
        new String(blob.slice(8, 12), "US-ASCII") != "WAVE") return None
    def le32(i: Int): Int =
      (blob(i) & 0xff) | ((blob(i + 1) & 0xff) << 8) |
        ((blob(i + 2) & 0xff) << 16) | ((blob(i + 3) & 0xff) << 24)
    var fmt: (Int, Int, Int, Int) = null
    var i = 12
    while (i + 8 <= blob.length) {
      val id = new String(blob.slice(i, i + 4), "US-ASCII")
      val len = le32(i + 4)
      if (len < 0 || i.toLong + 8 + len > blob.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          fmt = (le16(blob, i + 8), le16(blob, i + 10), le32(i + 12), le16(blob, i + 22))
        case "data" =>
          if (fmt == null) return None
          val (audioFormat, ch, rate, bits) = fmt
          if (audioFormat != 1 || ch < 1 || rate <= 0) return None
          val bytesPer = bits / 8
          if (bits != 16 && bits != 8) return None
          val nSamples = len / bytesPer
          val nFrames = nSamples / ch
          if (nFrames == 0) return None
          val base = i + 8
          def sampleAt(f: Int, c: Int): Int = {
            val s = f * ch + c
            if (bits == 16) (le16(blob, base + 2 * s) << 16) >> 16
            else (blob(base + s) & 0xff) - 128
          }
          var zc = 0L
          var energy = 0L
          var c = 0
          while (c < ch) {
            var prev = sampleAt(0, c)
            energy += prev.toLong * prev
            var f = 1
            while (f < nFrames) {
              val v = sampleAt(f, c)
              if (prev.toLong * v < 0) zc += 1
              energy += v.toLong * v
              prev = v
              f += 1
            }
            c += 1
          }
          return Some((zc, energy))
        case _ =>
      }
      i += 8 + len + (len & 1)
    }
    None
  }

  /** Real PCM16 WAV encoder: RIFF + fmt + data with interleaved LE
    * samples — so tests and oracles round-trip real audio through
    * [[decodeWav]]. `sample(frame, channel)` supplies the amplitude.
    */
  def wavBytes(sampleRate: Int, channels: Int, nFrames: Int)
      (sample: (Int, Int) => Int): Array[Byte] = {
    require(sampleRate > 0 && channels >= 1 && nFrames >= 1)
    val dataLen = nFrames * channels * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1) // PCM
    out.putShort(channels.toShort).putInt(sampleRate)
    out.putInt(sampleRate * channels * 2) // byte rate
    out.putShort((channels * 2).toShort).putShort(16) // block align, bits
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) { out.putShort(sample(f, c).toShort); c += 1 }
      f += 1
    }
    out.array()
  }

  final case class AudioFeatures(
      media_id: Long,
      mime: String,
      byte_len: Int,
      sample_rate: Int,
      channels: Int,
      n_frames: Int,
      duration_ms: Long,
      peak: Int,
      mean_abs: Double)

  /** Batch audio feature extraction, same scale contract as
    * [[extractFeatures]]: one decode pass per partition, blobs dropped
    * before any shuffle. Unparseable payloads → zeroed features (the
    * byte length still flows through for triage).
    */
  def extractAudioFeatures(ds: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        decodeWav(r.blob) match {
          case Some(w) =>
            AudioFeatures(r.media_id, r.mime, r.blob.length, w.sample_rate,
              w.channels, w.n_frames, w.duration_ms, w.peak, w.mean_abs)
          case None =>
            AudioFeatures(r.media_id, r.mime, r.blob.length, 0, 0, 0, 0L, 0, 0.0)
        }
      }
    }
  }

  // ---- video: real MP4 / ISO BMFF container metadata decode ----

  final case class Mp4Info(
      brand: String,
      n_tracks: Int,
      timescale: Int,
      duration_ms: Long,
      width: Int, // first video track, 0 when none
      height: Int,
      has_audio: Boolean)

  /** Real MP4 metadata decode: walk the ISO BMFF box tree (public spec
    * ISO/IEC 14496-12 — [size u32][type 4cc], size 1 = 64-bit largesize,
    * size 0 = to EOF), read the movie header (`moov/mvhd`: timescale +
    * duration), count `trak` boxes, classify them by `mdia/hdlr` handler
    * type, and take the presentation dimensions from the first video
    * track's `tkhd` (16.16 fixed point). None for any malformed or
    * non-BMFF payload — callers fall back, labeled. Only header boxes
    * are touched; `mdat` (the actual media data, ~all of the bytes at
    * scale) is skipped by its size field without being read.
    */
  /** Walk the child boxes of `blob[start, end)` per ISO/IEC 14496-12 —
    * [size u32][type 4cc], size 1 = 64-bit largesize, size 0 = to end —
    * calling `f(type, bodyStart, bodyEnd)` for each; stops at the first
    * malformed header.
    */
  private def walkBoxes(blob: Array[Byte], start: Int, end: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var i = start
    while (i + 8 <= end) {
      var sz = be32(blob, i)
      var body = i + 8
      if (sz == 1) { // 64-bit largesize
        if (i + 16 > end) return
        val hi = be32(blob, i + 8); val lo = be32(blob, i + 12)
        if (hi != 0 || lo < 16) return // > 2 GB headers: malformed here
        sz = lo; body = i + 16
      } else if (sz == 0) sz = end - i // box extends to the end
      if (sz < 8 || i + sz > end) return
      f(new String(blob.slice(i + 4, i + 8), "US-ASCII"), body, i + sz.toInt)
      i += sz.toInt
    }
  }

  def decodeMp4(blob: Array[Byte]): Option[Mp4Info] = {
    if (blob.length < 16) return None
    if (new String(blob.slice(4, 8), "US-ASCII") != "ftyp") return None
    val brand = new String(blob.slice(8, 12), "US-ASCII")
    try {
      var timescale = 0; var duration = 0L
      var nTracks = 0; var width = 0; var height = 0; var hasAudio = false
      def walk(start: Int, end: Int)(f: (String, Int, Int) => Unit): Unit =
        walkBoxes(blob, start, end)(f)
      walk(0, blob.length) {
        case ("moov", ms, me) =>
          walk(ms, me) {
            case ("mvhd", s, e) =>
              val v = blob(s) & 0xff
              if (v == 1) {
                if (s + 32 > e) throw new ArrayIndexOutOfBoundsException("mvhd")
                timescale = be32(blob, s + 20).toInt
                duration = (be32(blob, s + 24) << 32) | be32(blob, s + 28)
              } else {
                if (s + 20 > e) throw new ArrayIndexOutOfBoundsException("mvhd")
                timescale = be32(blob, s + 12).toInt
                duration = be32(blob, s + 16)
              }
            case ("trak", ts, te) =>
              nTracks += 1
              var tw = 0; var th = 0; var handler = ""
              walk(ts, te) {
                case ("tkhd", s, e) =>
                  // width/height are the LAST 8 bytes in both versions,
                  // 16.16 fixed point
                  if (e - 8 >= s) {
                    tw = (be32(blob, e - 8) >> 16).toInt
                    th = (be32(blob, e - 4) >> 16).toInt
                  }
                case ("mdia", ms2, me2) =>
                  walk(ms2, me2) {
                    case ("hdlr", s, e) =>
                      if (s + 12 <= e)
                        handler = new String(blob.slice(s + 8, s + 12), "US-ASCII")
                    case _ =>
                  }
                case _ =>
              }
              if (handler == "soun") hasAudio = true
              if (handler == "vide" && width == 0) { width = tw; height = th }
            case _ =>
          }
        case _ =>
      }
      if (timescale <= 0) None
      else Some(Mp4Info(brand, nTracks, timescale,
        duration * 1000L / timescale, width, height, hasAudio))
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  /** Minimal VALID MP4 encoder: ftyp + moov(mvhd + per-track
    * trak(tkhd + mdia(mdhd + hdlr))) + an empty mdat — so tests and
    * oracles round-trip real container metadata through [[decodeMp4]].
    * `tracks` entries are (handler 4cc e.g. "vide"/"soun", width, height).
    */
  def mp4Bytes(timescale: Int, duration: Long,
      tracks: Seq[(String, Int, Int)]): Array[Byte] = {
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + body.length)
      out.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
      out.array()
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0) ++
        "isomiso2".getBytes("US-ASCII"))
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0) // version 0 + flags
      b.putInt(0).putInt(0) // creation/modification
      b.putInt(timescale).putInt(duration.toInt)
      b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate/volume
      b.position(b.position() + 8) // reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(b.putInt) // unity matrix
      b.position(b.position() + 24) // predefined
      b.putInt(tracks.length + 1) // next track id
      box("mvhd", b.array())
    }
    val traks = tracks.zipWithIndex.map { case ((handler, w, h), ti) =>
      val tkhd = {
        val b = java.nio.ByteBuffer.allocate(84)
        b.putInt(0x00000007) // version 0, flags: enabled+in-movie+in-preview
        b.putInt(0).putInt(0) // creation/modification
        b.putInt(ti + 1).putInt(0) // track id, reserved
        b.putInt(duration.toInt)
        b.position(b.position() + 8) // reserved
        b.putShort(0).putShort(0) // layer, alternate group
        b.putShort(if (handler == "soun") 0x0100.toShort else 0).putShort(0)
        Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
          .foreach(b.putInt)
        b.putInt(w << 16).putInt(h << 16) // 16.16 fixed
        box("tkhd", b.array())
      }
      val mdhd = {
        val b = java.nio.ByteBuffer.allocate(24)
        b.putInt(0).putInt(0).putInt(0)
        b.putInt(timescale).putInt(duration.toInt)
        b.putShort(0x55c4.toShort).putShort(0) // language "und"
        box("mdhd", b.array())
      }
      val hdlr = box("hdlr",
        Array[Byte](0, 0, 0, 0, 0, 0, 0, 0) ++
          handler.getBytes("US-ASCII") ++ new Array[Byte](13))
      box("trak", tkhd ++ box("mdia", mdhd ++ hdlr))
    }
    val moov = box("moov", mvhd ++ traks.flatten.toArray)
    ftyp ++ moov ++ box("mdat", Array.emptyByteArray)
  }

  /** One sampled video frame: sample index + the absolute byte range of
    * its data in the file. At 100 TB the executor range-reads exactly
    * these bytes from object storage — the container header (a few KB) is
    * all that was parsed.
    */
  final case class FrameRange(idx: Int, offset: Long, size: Long)

  /** REAL frame sampling from the MP4 sample tables: walk the first video
    * track's `trak/mdia/minf/stbl`, read `stsz` (sample sizes, uniform or
    * per-sample), `stsc` (sample-to-chunk runs), and `stco`/`co64` (chunk
    * offsets), then replay the chunk layout to the absolute byte range of
    * every sample — returning every `step`-th one, up to `maxFrames`.
    * `mdat` itself is never read. None when the file has no video track
    * with a complete sample table, or any table is malformed
    * (ISO/IEC 14496-12 §8.5-8.7).
    */
  def frameSampleRanges(blob: Array[Byte], step: Int,
      maxFrames: Int): Option[Vector[FrameRange]] = {
    if (step <= 0 || maxFrames <= 0 || blob.length < 16) return None
    if (new String(blob.slice(4, 8), "US-ASCII") != "ftyp") return None
    var nSamples = 0; var uniform = 0L
    var sizes: Array[Long] = null
    var runs: Array[(Long, Long)] = null // (first_chunk 1-based, samples/chunk)
    var chunkOffs: Array[Long] = null
    var found = false
    try {
      walkBoxes(blob, 0, blob.length) {
        case ("moov", ms, me) => walkBoxes(blob, ms, me) {
          case ("trak", ts, te) if !found =>
            var handler = ""
            var szU = 0L; var szN = 0; var szT: Array[Long] = null
            var sc: Array[(Long, Long)] = null
            var co: Array[Long] = null
            walkBoxes(blob, ts, te) {
              case ("mdia", a, b) => walkBoxes(blob, a, b) {
                case ("hdlr", s, e) =>
                  if (s + 12 <= e)
                    handler = new String(blob.slice(s + 8, s + 12), "US-ASCII")
                case ("minf", c, d) => walkBoxes(blob, c, d) {
                  case ("stbl", g, h) => walkBoxes(blob, g, h) {
                    case ("stsz", s, e) =>
                      if (s + 12 > e) throw new ArrayIndexOutOfBoundsException("stsz")
                      szU = be32(blob, s + 4)
                      szN = be32(blob, s + 8).toInt
                      if (szU == 0) {
                        if (szN < 0 || s + 12 + 4L * szN > e)
                          throw new ArrayIndexOutOfBoundsException("stsz table")
                        szT = Array.tabulate(szN)(i => be32(blob, s + 12 + 4 * i))
                      }
                    case ("stsc", s, e) =>
                      val n = be32(blob, s + 4).toInt
                      if (n < 0 || s + 8 + 12L * n > e)
                        throw new ArrayIndexOutOfBoundsException("stsc")
                      sc = Array.tabulate(n)(i =>
                        (be32(blob, s + 8 + 12 * i), be32(blob, s + 12 + 12 * i)))
                    case ("stco", s, e) =>
                      val n = be32(blob, s + 4).toInt
                      if (n < 0 || s + 8 + 4L * n > e)
                        throw new ArrayIndexOutOfBoundsException("stco")
                      co = Array.tabulate(n)(i => be32(blob, s + 8 + 4 * i))
                    case ("co64", s, e) =>
                      val n = be32(blob, s + 4).toInt
                      if (n < 0 || s + 8 + 8L * n > e)
                        throw new ArrayIndexOutOfBoundsException("co64")
                      co = Array.tabulate(n)(i =>
                        (be32(blob, s + 8 + 8 * i) << 32) | be32(blob, s + 12 + 8 * i))
                    case _ =>
                  }
                  case _ =>
                }
                case _ =>
              }
              case _ =>
            }
            if (handler == "vide" && szN > 0 && sc != null && sc.nonEmpty &&
                co != null && co.nonEmpty) {
              found = true; nSamples = szN; uniform = szU; sizes = szT
              runs = sc; chunkOffs = co
            }
          case _ =>
        }
        case _ =>
      }
    } catch { case _: ArrayIndexOutOfBoundsException => return None }
    if (!found) return None
    // stsc first_chunk must be 1-based and strictly increasing
    if (runs.head._1 != 1L ||
        runs.sliding(2).exists(w => w.length == 2 && w(1)._1 <= w(0)._1))
      return None
    val out = Vector.newBuilder[FrameRange]
    var s = 0; var ci = 0; var ri = 0; var taken = 0
    while (s < nSamples && ci < chunkOffs.length && taken < maxFrames) {
      // samples/chunk of the run covering chunk ci+1 (runs extend until
      // the next entry's first_chunk)
      while (ri + 1 < runs.length && runs(ri + 1)._1 <= ci + 1) ri += 1
      val spc = runs(ri)._2
      var off = chunkOffs(ci)
      var k = 0L
      while (k < spc && s < nSamples && taken < maxFrames) {
        val sz = if (sizes != null) sizes(s) else uniform
        if (sz < 0) return None
        if (s % step == 0) { out += FrameRange(s, off, sz); taken += 1 }
        off += sz; s += 1; k += 1
      }
      ci += 1
    }
    Some(out.result())
  }

  /** [[mp4Bytes]] extended with a real sample table for one video track:
    * moov(mvhd + trak(tkhd + mdia(mdhd + hdlr + minf(stbl(stts + stsz +
    * stsc + stco|co64))))) followed by an mdat whose body is the samples
    * laid out chunk-contiguously in order. `samplesPerChunk` partitions
    * the `sampleSizes` sequence into chunks (consecutive equal counts
    * compress into stsc runs, as real muxers write them); `payload(s, j)`
    * fills byte j of sample s. stco offsets are absolute, so the box tree
    * is built once with zeroed offsets to fix the layout, then rebuilt
    * (same lengths) with the real ones.
    */
  def mp4BytesWithSamples(timescale: Int, duration: Long, w: Int, h: Int,
      sampleSizes: Seq[Int], samplesPerChunk: Seq[Int], co64: Boolean = false)(
      payload: (Int, Int) => Byte): Array[Byte] = {
    require(samplesPerChunk.sum == sampleSizes.length &&
      samplesPerChunk.forall(_ > 0), "chunks must partition the samples")
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + body.length)
      out.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
      out.array()
    }
    val n = sampleSizes.length
    // chunk start offsets RELATIVE to the mdat body
    val sampleChunks = samplesPerChunk
    val chunkStartSample = sampleChunks.scanLeft(0)(_ + _)
    val relOffsets = chunkStartSample.init.map(start =>
      sampleSizes.take(start).map(_.toLong).sum)
    // stsc runs: (first_chunk 1-based, samples_per_chunk, desc idx 1)
    val runsB = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    sampleChunks.zipWithIndex.foreach { case (spc, i) =>
      if (runsB.isEmpty || runsB.last._2 != spc) runsB += ((i + 1, spc))
    }
    def buildMoov(absOffsets: Seq[Long]): Array[Byte] = {
      val mvhd = {
        val b = java.nio.ByteBuffer.allocate(100)
        b.putInt(0)
        b.putInt(0).putInt(0)
        b.putInt(timescale).putInt(duration.toInt)
        b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
        b.position(b.position() + 8)
        Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
          .foreach(b.putInt)
        b.position(b.position() + 24)
        b.putInt(2)
        box("mvhd", b.array())
      }
      val tkhd = {
        val b = java.nio.ByteBuffer.allocate(84)
        b.putInt(0x00000007)
        b.putInt(0).putInt(0)
        b.putInt(1).putInt(0)
        b.putInt(duration.toInt)
        b.position(b.position() + 8)
        b.putShort(0).putShort(0)
        b.putShort(0).putShort(0)
        Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
          .foreach(b.putInt)
        b.putInt(w << 16).putInt(h << 16)
        box("tkhd", b.array())
      }
      val mdhd = {
        val b = java.nio.ByteBuffer.allocate(24)
        b.putInt(0).putInt(0).putInt(0)
        b.putInt(timescale).putInt(duration.toInt)
        b.putShort(0x55c4.toShort).putShort(0)
        box("mdhd", b.array())
      }
      val hdlr = box("hdlr",
        Array[Byte](0, 0, 0, 0, 0, 0, 0, 0) ++
          "vide".getBytes("US-ASCII") ++ new Array[Byte](13))
      val stts = {
        val b = java.nio.ByteBuffer.allocate(16)
        b.putInt(0).putInt(1).putInt(n).putInt(1)
        box("stts", b.array())
      }
      val stsz = {
        val b = java.nio.ByteBuffer.allocate(12 + 4 * n)
        b.putInt(0).putInt(0).putInt(n)
        sampleSizes.foreach(b.putInt)
        box("stsz", b.array())
      }
      val stsc = {
        val b = java.nio.ByteBuffer.allocate(8 + 12 * runsB.length)
        b.putInt(0).putInt(runsB.length)
        runsB.foreach { case (fc, spc) => b.putInt(fc).putInt(spc).putInt(1) }
        box("stsc", b.array())
      }
      val stcoBox =
        if (co64) {
          val b = java.nio.ByteBuffer.allocate(8 + 8 * absOffsets.length)
          b.putInt(0).putInt(absOffsets.length)
          absOffsets.foreach(b.putLong)
          box("co64", b.array())
        } else {
          val b = java.nio.ByteBuffer.allocate(8 + 4 * absOffsets.length)
          b.putInt(0).putInt(absOffsets.length)
          absOffsets.foreach(o => b.putInt(o.toInt))
          box("stco", b.array())
        }
      val stbl = box("stbl", stts ++ stsz ++ stsc ++ stcoBox)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      val trak = box("trak", tkhd ++ mdia)
      box("moov", mvhd ++ trak)
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0) ++
        "isomiso2".getBytes("US-ASCII"))
    val headerLen = ftyp.length + buildMoov(relOffsets.map(_ => 0L)).length + 8
    val moov = buildMoov(relOffsets.map(_ + headerLen))
    val body = new Array[Byte](sampleSizes.sum)
    var p = 0
    sampleSizes.zipWithIndex.foreach { case (sz, s) =>
      var j = 0
      while (j < sz) { body(p) = payload(s, j); p += 1; j += 1 }
    }
    ftyp ++ moov ++ box("mdat", body)
  }

  /** Byte offset of the mdat BODY (= offset of the first sample) in a
    * [[mp4BytesWithSamples]] file with `n` samples in one stsc run —
    * linear in n (the stsz table). Lets closed-form oracles predict the
    * absolute ranges the real stbl walk returns.
    */
  def mp4HeaderLen(n: Int, nChunks: Int, co64: Boolean = false): Int = {
    val ftypLen = 8 + 16
    val stcoLen = 8 + 8 + (if (co64) 8 else 4) * nChunks
    val stblLen = 8 + (8 + 16) + (8 + 12 + 4 * n) + (8 + 8 + 12) + stcoLen
    val moovLen = 8 + (8 + 100) +
      (8 + (8 + 84) + (8 + (8 + 24) + (8 + 8 + 4 + 13) + (8 + stblLen)))
    ftypLen + moovLen + 8
  }

  final case class VideoFeatures(
      media_id: Long,
      mime: String,
      byte_len: Int,
      brand: String,
      n_tracks: Int,
      duration_ms: Long,
      width: Int,
      height: Int,
      has_audio: Boolean)

  /** Batch video metadata extraction, same scale contract as
    * [[extractFeatures]]: one box-walk per partition, blobs dropped
    * before any shuffle, `mdat` never read.
    */
  def extractVideoFeatures(ds: Dataset[MediaRow]): Dataset[VideoFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        decodeMp4(r.blob) match {
          case Some(v) =>
            VideoFeatures(r.media_id, r.mime, r.blob.length, v.brand,
              v.n_tracks, v.duration_ms, v.width, v.height, v.has_audio)
          case None =>
            VideoFeatures(r.media_id, r.mime, r.blob.length, "", 0, 0L, 0, 0,
              has_audio = false)
        }
      }
    }
  }

  /** STUB fallback for unrecognized payloads: a real implementation
    * would hand the bytes to a codec; the fake derives stable
    * pseudo-features from byte content so the pipeline around it stays
    * fully exercisable.
    */
  def decodeStub(blob: Array[Byte]): (Int, Int, Double) = {
    val h = java.util.Arrays.hashCode(blob)
    val w = 16 + math.floorMod(h, 1024)
    val ht = 16 + math.floorMod(h >> 10, 1024)
    val mean =
      if (blob.isEmpty) 0.0
      else blob.iterator.map(b => (b & 0xff).toDouble).sum / blob.length
    (w, ht, math.rint(mean * 10000) / 10000)
  }

  /** Batch feature extraction: one decode pass per partition, payload
    * dropped on output (features only cross the shuffle boundary).
    * Recognized containers get real parsed dimensions; anything else
    * falls back to the labeled stub with format "unknown".
    */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val mean =
          if (r.blob.isEmpty) 0.0
          else math.rint(r.blob.iterator.map(b => (b & 0xff).toDouble).sum /
            r.blob.length * 10000) / 10000
        decode(r.blob) match {
          case Some(d) =>
            // PNG: real pixel decode (inflate + unfilter, sequential or
            // Adam7, truecolor/gray/indexed); GIF: real LZW index decode
            // through the palette; JPEG: real huffman + IDCT decode,
            // sequential or progressive. Byte-mean fallback only for
            // header-only payloads and exotic layouts (sub-8-bit PNG,
            // arithmetic-coded JPEG).
            val m = d.format match {
              case "png" => decodePngPixelMean(r.blob).getOrElse(mean)
              case "gif" => decodeGifPixelMean(r.blob).getOrElse(mean)
              case "jpeg" => decodeJpegPixelMean(r.blob).getOrElse(mean)
              case _ => mean
            }
            MediaFeatures(r.media_id, r.mime, r.blob.length,
              d.format, d.width, d.height, d.channels, m)
          case None =>
            val (w, h, m) = decodeStub(r.blob)
            MediaFeatures(r.media_id, r.mime, r.blob.length,
              "unknown", w, h, 0, m)
        }
      }
    }
  }

  /** Metadata-level resize: rescales the parsed dimensions of a feature
    * batch (aspect preserved). For REAL pixel resizing see [[thumbnails]]
    * (decode + nearest-neighbor over the actual plane).
    */
  def resize(ds: Dataset[MediaFeatures], maxDim: Int): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.map { f =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(f.width, f.height))
      f.copy(
        width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt))
    }
  }

  /** Frame sampling for "video" payloads: MP4 files with a video sample
    * table get their REAL per-frame byte ranges from the stbl walk
    * ([[frameSampleRanges]] — at scale the executor then range-reads only
    * those bytes from storage); anything else falls back to the labeled
    * virtual-frame grid (every k-th 64-byte stripe, byte_len = -1) so the
    * pipeline shape stays total.
    */
  def sampleFrameOffsets(ds: Dataset[MediaRow], everyK: Int,
      maxFrames: Int = 64): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      frameSampleRanges(r.blob, everyK, maxFrames) match {
        case Some(frames) =>
          frames.map(f => (r.media_id, f.idx, f.offset, f.size))
        case None =>
          val nFrames = math.max(1, r.blob.length / 64)
          (0 until nFrames by everyK).take(maxFrames)
            .map(i => (r.media_id, i, i * 64L, -1L))
      }
    }.toDF("media_id", "frame_idx", "byte_offset", "byte_len")
  }
}
