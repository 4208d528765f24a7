package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque binaries with typed
  * metadata — the training-data-pipeline pattern for media at 100 TB:
  * the bytes stay an opaque `binary` column that is never shuffled wider
  * than needed, metadata extraction is codegen'd expressions over the
  * first bytes, and the decode stage is a pluggable per-partition codec.
  *
  * Three codecs ship behind the [[MediaCodec]] seam: [[ImageIoCodec]]
  * (REAL decode-to-pixels via the JDK's javax.imageio readers — JPEG,
  * PNG, GIF, BMP, WBMP), [[HeaderCodec]] (real container-header parsing
  * for BMP/WAV/JPEG/PNG/GIF/MP4), and [[FakeCodec]] (a clearly-marked
  * deterministic fake — dims from the blob's md5 — for formats needing
  * native libraries this container lacks, and for oracle-replayable test
  * fixtures whose blobs are not real media). The Spark-side plumbing is
  * the same for all three and is what gets tested: typed `Dataset` rows,
  * `mapPartitions` batching with one codec instance per partition,
  * explicit output schema, and the downstream resize / frame-sample
  * operators as exact integer expressions.
  */
object Multimodal {

  // ---------------------------------------------------------------- sniff

  /** Content type from magic bytes — pure codegen'd expressions over the
    * head of the blob (JPEG / PNG / GIF / RIFF-WAVE / MP4-ftyp).
    */
  def sniffContentType(bin: Column): Column = {
    val head = hex(substring(bin, 1, 12))
    when(head.startsWith("FFD8FF"), "image/jpeg")
      .when(head.startsWith("89504E47"), "image/png")
      .when(head.startsWith("474946383"), "image/gif")
      .when(head.startsWith("52494646") && substring(head, 17, 8) === "57415645", "audio/wav")
      .when(substring(head, 9, 8) === "66747970", "video/mp4")
      .otherwise("application/octet-stream")
  }

  /** Typed metadata for an opaque binary column: byte length, head bytes,
    * sniffed content type. No decode, no shuffle.
    */
  def metadata(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(binCol)).cast("long").as("n_bytes"),
      upper(substring(hex(col(binCol)), 1, 16)).as("head_hex"),
      sniffContentType(col(binCol)).as("content_type"))

  // ---------------------------------------------------------------- codec

  /** Decoded-media header a codec reports for one blob. */
  case class MediaInfo(width: Int, height: Int, channels: Int, nFrames: Int)

  /** Pluggable decoder. Implementations must be Serializable — one instance
    * is shipped to each executor and reused across a partition's rows
    * (`open()` once per partition, `decode()` per blob), which is where a
    * real libjpeg/ffmpeg binding would hold its native context.
    */
  trait MediaCodec extends Serializable {
    /** Per-partition init hook (native context, scratch buffers). */
    def open(): Unit = ()
    def decode(bytes: Array[Byte]): MediaInfo
    /** Per-partition teardown hook. */
    def close(): Unit = ()
  }

  /** STUB codec — the container has no media libraries. Dimensions are
    * derived deterministically from md5 of the blob's uppercase-hex dump so
    * (a) output is stable across runs/engines and (b) an external SQL
    * engine can replay it exactly (`md5(hex(blob))` — DuckDB's md5 only
    * accepts VARCHAR):
    *   width    = 16 + (md5[0:7]   % 1905)   // 16..1920
    *   height   = 16 + (md5[7:14]  % 1065)   // 16..1080
    *   nFrames  = 1  + (md5[14:21] % 300)    // 1..300
    *   channels = 1  + (md5[21:22] % 4)      // 1..4
    * (hex substrings parsed base-16; 7 hex chars < 2^28 so no overflow.)
    */
  object FakeCodec extends MediaCodec {
    override def decode(bytes: Array[Byte]): MediaInfo = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hexDump = bytes.map("%02X".format(_)).mkString
      val hx = md.digest(hexDump.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def part(from: Int, until: Int): Long =
        java.lang.Long.parseLong(hx.substring(from, until), 16)
      MediaInfo(
        width = (16 + part(0, 7) % 1905).toInt,
        height = (16 + part(7, 14) % 1065).toInt,
        channels = (1 + part(21, 22) % 4).toInt,
        nFrames = (1 + part(14, 21) % 300).toInt)
    }
  }

  /** REAL codec for the formats whose headers are parseable with zero
    * native libraries (BMP/WAV below, plus JPEG, PNG, GIF and MP4 in
    * their own walks) — proof the [[MediaCodec]] seam carries an actual
    * decoder, not only [[FakeCodec]]:
    *
    *  - **BMP** (`BM` magic, BITMAPINFOHEADER): width/height are the int32
    *    little-endian fields at offsets 18/22 (height may be negative for
    *    top-down rows — dimensions report its magnitude), channels =
    *    biBitCount/8 (24-bit → 3), nFrames = 1.
    *  - **WAV** (`RIFF…WAVE`): walks the chunk list (id + int32-LE size,
    *    data padded to even) for `fmt ` and `data`; reports width = sample
    *    rate, height = bits per sample, channels = channel count, nFrames
    *    = dataSize / blockAlign (the number of sample frames — the audio
    *    meaning of "frame").
    *
    * Undecodable bytes throw `IllegalArgumentException` like any strict
    * decoder; route blobs by [[sniffContentType]] first if the corpus is
    * mixed.
    */
  object HeaderCodec extends MediaCodec {
    private def le16(b: Array[Byte], off: Int): Int = {
      require(off + 2 <= b.length, s"truncated header at offset $off")
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
    }
    private def le32(b: Array[Byte], off: Int): Int = {
      require(off + 4 <= b.length, s"truncated header at offset $off")
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
        ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
    }
    private def ascii(b: Array[Byte], off: Int, len: Int): String =
      if (off + len <= b.length) new String(b, off, len, "US-ASCII") else ""
    private def be32(b: Array[Byte], off: Int): Int = {
      require(off + 4 <= b.length, s"truncated header at offset $off")
      ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
        ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
    }
    private def be16(b: Array[Byte], off: Int): Int = {
      require(off + 2 <= b.length, s"truncated header at offset $off")
      ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)
    }
    private def be64(b: Array[Byte], off: Int): Long = {
      require(off + 8 <= b.length, s"truncated header at offset $off")
      ((be32(b, off) & 0xFFFFFFFFL) << 32) | (be32(b, off + 4) & 0xFFFFFFFFL)
    }
    /** Skip a GIF sub-block chain (size-prefixed blocks, 0 terminator);
      * returns the offset just past the terminator.
      */
    private def skipSubBlocks(b: Array[Byte], start: Int): Int = {
      var off = start
      while ({ require(off < b.length, "truncated GIF sub-blocks")
               (b(off) & 0xFF) != 0 }) {
        off += 1 + (b(off) & 0xFF)
      }
      off + 1
    }
    private def gifColorTableSize(flags: Int): Int =
      if ((flags & 0x80) != 0) 3 * (1 << ((flags & 7) + 1)) else 0

    /** JPEG (ITU T.81 / JFIF): walk the marker-segment list from SOI to the
      * frame header. Every segment is FF + marker + uint16-BE length
      * (length INCLUDES its own two bytes); fill bytes (repeated FF) before
      * a marker are legal padding (T.81 §B.1.1.2); RSTn/TEM/SOI are
      * standalone (no length). All SOFn frame headers share one layout —
      * precision(1), height(2 BE), width(2 BE), nComponents(1) — so
      * baseline SOF0, progressive SOF2 and the rarer SOF1/3/5-7/9-11/13-15
      * all decode through the same read. channels = nComponents (1 = gray,
      * 3 = YCbCr, 4 = CMYK). SOS or EOI before any SOF means a frameless
      * stream — throw, like every other truncation here.
      */
    private def decodeJpeg(bytes: Array[Byte]): MediaInfo = {
      var off = 2
      var out: MediaInfo = null
      while (out == null) {
        require(off + 2 <= bytes.length, "truncated JPEG marker stream")
        require((bytes(off) & 0xFF) == 0xFF,
          f"expected JPEG marker at offset $off, got 0x${bytes(off) & 0xFF}%02X")
        var p = off + 1
        while ({ require(p < bytes.length, "truncated JPEG marker stream")
                 (bytes(p) & 0xFF) == 0xFF }) p += 1 // fill bytes
        val m = bytes(p) & 0xFF
        val seg = p + 1 // first byte after the marker code
        m match {
          case 0x00 =>
            throw new IllegalArgumentException(
              "stuffed 0xFF00 outside entropy-coded data")
          case 0xD8 | 0x01 => off = seg // SOI / TEM: standalone
          case r if r >= 0xD0 && r <= 0xD7 => off = seg // RSTn: standalone
          case 0xD9 =>
            throw new IllegalArgumentException("JPEG EOI before any SOF frame header")
          case 0xDA =>
            throw new IllegalArgumentException("JPEG SOS before any SOF frame header")
          case sof if sof >= 0xC0 && sof <= 0xCF &&
              sof != 0xC4 && sof != 0xC8 && sof != 0xCC => // SOFn (not DHT/JPG/DAC)
            val len = be16(bytes, seg)
            require(seg + len <= bytes.length, s"SOF segment overruns the blob")
            val nComp = { require(len >= 8, s"SOF length $len < 8"); bytes(seg + 7) & 0xFF }
            require(len >= 8 + 3 * nComp,
              s"SOF length $len too short for $nComp components")
            val height = be16(bytes, seg + 3)
            val width = be16(bytes, seg + 5)
            require(width > 0 && height > 0 && nComp > 0,
              s"degenerate SOF dimensions ${width}x$height c=$nComp")
            out = MediaInfo(width = width, height = height,
              channels = nComp, nFrames = 1)
          case _ => // any other segment: length-prefixed, skip its payload
            val len = be16(bytes, seg)
            require(len >= 2, s"JPEG segment length $len < 2")
            require(seg + len <= bytes.length,
              f"segment 0x$m%02X length $len overruns the ${bytes.length}-byte blob")
            off = seg + len
        }
      }
      out
    }

    /** MP4 / ISO-BMFF (ISO/IEC 14496-12): walk the top-level box list
      * (uint32-BE size incl. the 8-byte header; size 1 → 64-bit
      * `largesize` follows; size 0 → box runs to the end of its
      * container) for `moov`, then moov's children for `mvhd` (movie
      * timescale + duration, v0/v1 layouts) and each `trak`'s `tkhd`
      * (presentation width/height as 16.16 fixed point at spec-exact
      * offsets, v0/v1). Reports width/height from the FIRST track with
      * nonzero dims (the video track; audio tracks carry 0×0), channels
      * = track count, nFrames = whole seconds of movie duration
      * (`duration / timescale` — the mvhd duration is in timescale
      * units; "frames" is per-modality, as WAV's sample frames are).
      * Strict on malformed input like every other arm: truncated box
      * headers, sizes that overrun their container, a missing moov/mvhd/
      * trak, or a zero timescale all throw.
      */
    private def decodeMp4(bytes: Array[Byte]): MediaInfo = {
      def walkChildren(start: Long, end: Long)(f: (String, Long, Long) => Unit): Unit = {
        var off = start
        while (off < end) {
          require(off + 8 <= end, s"truncated MP4 box header at offset $off")
          val size32 = be32(bytes, off.toInt) & 0xFFFFFFFFL
          val typ = ascii(bytes, off.toInt + 4, 4)
          var hdr = 8L
          val boxSize: Long =
            if (size32 == 1) { // 64-bit largesize follows the type
              require(off + 16 <= end, s"truncated largesize box at offset $off")
              hdr = 16L
              be64(bytes, off.toInt + 8)
            } else if (size32 == 0) end - off // box runs to container end
            else size32
          require(boxSize >= hdr,
            s"MP4 box '$typ' size $boxSize smaller than its $hdr-byte header")
          require(off + boxSize <= end,
            s"MP4 box '$typ' size $boxSize overruns its container at $end")
          f(typ, off + hdr, off + boxSize)
          off += boxSize
        }
      }
      var timescale = -1L; var duration = -1L
      var w = 0; var h = 0; var traks = 0
      var sawMoov = false
      walkChildren(0L, bytes.length.toLong) { (typ, ps, pe) =>
        if (typ == "moov") {
          sawMoov = true
          walkChildren(ps, pe) { (t2, cs, ce) =>
            if (t2 == "mvhd") {
              require(ce - cs >= 4, "truncated mvhd")
              if ((bytes(cs.toInt) & 0xFF) == 1) { // v1: 64-bit times
                require(ce - cs >= 32, "truncated v1 mvhd")
                timescale = be32(bytes, cs.toInt + 20) & 0xFFFFFFFFL
                duration = be64(bytes, cs.toInt + 24)
              } else {
                require(ce - cs >= 20, "truncated v0 mvhd")
                timescale = be32(bytes, cs.toInt + 12) & 0xFFFFFFFFL
                duration = be32(bytes, cs.toInt + 16) & 0xFFFFFFFFL
              }
            } else if (t2 == "trak") {
              traks += 1
              walkChildren(cs, ce) { (t3, ts, te) =>
                if (t3 == "tkhd") {
                  require(te - ts >= 4, "truncated tkhd")
                  // width/height offsets are spec-fixed per version:
                  // v0 payload is 84 bytes (dims at 76/80), v1 is 96
                  // (dims at 88/92) — 16.16 fixed point, integer part
                  val dimOff =
                    if ((bytes(ts.toInt) & 0xFF) == 1) {
                      require(te - ts >= 96, "truncated v1 tkhd"); 88
                    } else {
                      require(te - ts >= 84, "truncated v0 tkhd"); 76
                    }
                  val tw = be32(bytes, ts.toInt + dimOff) >>> 16
                  val th = be32(bytes, ts.toInt + dimOff + 4) >>> 16
                  if (w == 0 && h == 0 && tw > 0 && th > 0) { w = tw; h = th }
                }
              }
            }
          }
        }
      }
      require(sawMoov, "MP4 without a moov box")
      require(timescale > 0 && duration >= 0,
        "MP4 moov without a valid mvhd (timescale must be positive)")
      require(traks > 0, "MP4 moov without any trak box")
      MediaInfo(width = w, height = h, channels = traks,
        nFrames = (duration / timescale).toInt)
    }

    override def decode(bytes: Array[Byte]): MediaInfo =
      if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xFF &&
          (bytes(1) & 0xFF) == 0xD8 && (bytes(2) & 0xFF) == 0xFF) {
        decodeJpeg(bytes)
      } else if (bytes.length >= 12 && ascii(bytes, 4, 4) == "ftyp") {
        decodeMp4(bytes)
      } else if (bytes.length >= 8 && (bytes(0) & 0xFF) == 0x89 &&
          ascii(bytes, 1, 3) == "PNG") {
        // PNG: the IHDR chunk is mandatory and first (ISO 15948 §11.2.2)
        require(be32(bytes, 8) >= 13 && ascii(bytes, 12, 4) == "IHDR",
          "PNG without leading IHDR chunk")
        val colorType = { require(bytes.length > 25, "truncated IHDR"); bytes(25) & 0xFF }
        val channels = colorType match {
          case 0 => 1 // grayscale
          case 2 => 3 // truecolor
          case 3 => 1 // palette-indexed
          case 4 => 2 // gray + alpha
          case 6 => 4 // RGBA
          case t => throw new IllegalArgumentException(s"bad PNG color type $t")
        }
        MediaInfo(width = be32(bytes, 16), height = be32(bytes, 20),
          channels = channels, nFrames = 1)
      } else decodeAscii(bytes)

    private def decodeAscii(bytes: Array[Byte]): MediaInfo = ascii(bytes, 0, 2) match {
      case "GI" if ascii(bytes, 0, 6) == "GIF87a" || ascii(bytes, 0, 6) == "GIF89a" =>
        // GIF: real block walk (87a/89a §20-§25) — extensions are skipped
        // via their sub-block chains, image descriptors counted as frames;
        // 0x2C bytes inside data cannot fool the walk because sub-block
        // sizes delimit every data region.
        val width = le16(bytes, 6)
        val height = le16(bytes, 8)
        require(bytes.length > 12, "truncated GIF header")
        var off = 13 + gifColorTableSize(bytes(10) & 0xFF)
        var frames = 0
        var done = false
        while (!done) {
          require(off < bytes.length, "truncated GIF stream")
          (bytes(off) & 0xFF) match {
            case 0x3B => done = true
            case 0x21 => // extension: introducer + label, then sub-blocks
              off = skipSubBlocks(bytes, off + 2)
            case 0x2C =>
              frames += 1
              require(off + 10 <= bytes.length, "truncated image descriptor")
              off += 10 + gifColorTableSize(bytes(off + 9) & 0xFF)
              off += 1 // LZW minimum code size
              off = skipSubBlocks(bytes, off)
            case b =>
              throw new IllegalArgumentException(
                f"unknown GIF block introducer 0x$b%02X")
          }
        }
        require(frames > 0, "GIF with no image frames")
        // channels = 1: palette-INDEXED samples (one byte per pixel);
        // the palette itself is RGB but the sample stream is not
        MediaInfo(width = width, height = height, channels = 1,
          nFrames = frames)
      case "BM" =>
        // Reject the OS/2 BITMAPCOREHEADER (12-byte header, 16-bit dims):
        // its 'BM' magic passes but width/height live at different
        // offsets/widths, so reading the INFOHEADER int32 fields would
        // silently return garbage dimensions instead of throwing.
        val hdrSize = le32(bytes, 14)
        require(hdrSize >= 40,
          s"unsupported BMP header size $hdrSize (need BITMAPINFOHEADER)")
        MediaInfo(
          width = math.abs(le32(bytes, 18)),
          height = math.abs(le32(bytes, 22)),
          channels = math.max(1, le16(bytes, 28) / 8),
          nFrames = 1)
      case "RI" if ascii(bytes, 0, 4) == "RIFF" && ascii(bytes, 8, 4) == "WAVE" =>
        var off = 12L
        var channels = 0; var sampleRate = 0; var bits = 0
        var blockAlign = 0; var dataSize = -1L
        while (off + 8 <= bytes.length && (channels == 0 || dataSize < 0)) {
          val at = off.toInt // loop guard keeps off inside the array
          val id = ascii(bytes, at, 4)
          // RIFF chunk sizes are UNSIGNED 32-bit: mask into a Long so a
          // crafted size near 2^31 cannot flip the walk offset negative
          // and turn a malformed blob into ArrayIndexOutOfBounds instead
          // of this decoder's IllegalArgumentException contract.
          val size = le32(bytes, at + 4) & 0xFFFFFFFFL
          require(off + 8 + size <= bytes.length,
            s"chunk '$id' size $size overruns the ${bytes.length}-byte blob")
          if (id == "fmt ") {
            // A PCM fmt chunk is >= 16 bytes; a crafted shorter one would
            // pass the overrun check yet make the reads below land in the
            // NEXT chunk's bytes — fail loudly instead of decoding garbage.
            require(size >= 16, s"'fmt ' chunk size $size < 16")
            channels = le16(bytes, at + 10)
            sampleRate = le32(bytes, at + 12)
            blockAlign = le16(bytes, at + 20)
            bits = le16(bytes, at + 22)
          } else if (id == "data") dataSize = size
          off += 8 + size + (size & 1) // chunk data is padded to even length
        }
        require(channels > 0 && blockAlign > 0 && dataSize >= 0,
          "missing fmt /data chunk in WAVE stream")
        MediaInfo(width = sampleRate, height = bits, channels = channels,
          nFrames = (dataSize / blockAlign).toInt)
      case _ =>
        throw new IllegalArgumentException(
          "undecodable blob: no JPEG, BMP, RIFF/WAVE, PNG, GIF or MP4 magic")
    }
  }

  /** REAL decode-to-pixels codec over the JDK's built-in `javax.imageio`
    * readers (JPEG, PNG, GIF, BMP, WBMP — present in every JVM, no native
    * libraries): `decode` actually renders frame 0 to a raster (channels
    * = raster band count, not a header guess) and GIF reports its true
    * frame count. This closes the honestly-marked gap in the object
    * scaladoc — with it, the [[MediaCodec]] seam carries a genuine
    * decoder end-to-end for the formats the JDK ships.
    *
    * Throws `IllegalArgumentException` on bytes no JDK reader accepts or
    * that fail mid-decode (truncated/garbage payloads behind a valid
    * magic) — strict like [[HeaderCodec]]; wrap in [[routed]] to fall
    * back instead.
    *
    * [[grayThumb]] exposes the decode-to-pixels product the perceptual
    * hash chain needs: an area-averaged w×h grayscale thumbnail
    * (ITU-R BT.601 luma, row-major bytes) — byte-compatible with the
    * synthetic thumbnails [[grayPixels]]/[[dHash64]] consume, so a real
    * image can ride the deployed d164 hash chain unchanged.
    */
  object ImageIoCodec extends MediaCodec {
    private def withReader[T](bytes: Array[Byte])(
        f: javax.imageio.ImageReader => T): T = {
      // explicit memory-cache stream: ImageIO.createImageInputStream
      // defaults to a FILE-cache stream (one temp file created and
      // deleted PER BLOB) when the global use-cache flag is on — pure
      // I/O churn for bytes already in memory, and the kind of hidden
      // per-row filesystem traffic a 100 TB decode stage cannot carry
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext)
          throw new IllegalArgumentException(
            "undecodable blob: no JDK ImageIO reader accepts it")
        val r = readers.next()
        try { r.setInput(iis, false, true); f(r) }
        catch {
          case e: IllegalArgumentException => throw e
          case e: Exception => throw new IllegalArgumentException(
            s"ImageIO decode failed: ${e.getMessage}", e)
        }
        finally r.dispose()
      } finally iis.close()
    }

    override def decode(bytes: Array[Byte]): MediaInfo =
      withReader(bytes) { r =>
        val img = r.read(0) // the REAL decode: frame 0 to a raster
        // getNumImages(true) walks the whole stream — exact GIF frame
        // count; single-frame formats report 1
        val n = math.max(r.getNumImages(true), 1)
        MediaInfo(img.getWidth, img.getHeight,
          channels = img.getRaster.getNumBands, nFrames = n)
      }

    /** Area-averaged tw×th grayscale thumbnail of frame 0 (BT.601 luma,
      * row-major, one byte per pixel 0–255) — the [[dHash64]] input shape.
      */
    def grayThumb(bytes: Array[Byte], tw: Int = 9, th: Int = 8): Array[Byte] =
      withReader(bytes) { r =>
        val img = r.read(0)
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Byte](tw * th)
        var ty = 0
        while (ty < th) {
          val y0 = ty * h / th
          val y1 = math.max((ty + 1) * h / th, y0 + 1)
          var tx = 0
          while (tx < tw) {
            val x0 = tx * w / tw
            val x1 = math.max((tx + 1) * w / tw, x0 + 1)
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                // BT.601 integer luma on the /1000 grid
                sum += (299 * ((rgb >> 16) & 0xFF) +
                  587 * ((rgb >> 8) & 0xFF) + 114 * (rgb & 0xFF)) / 1000
                x += 1
              }
              y += 1
            }
            out(ty * tw + tx) = (sum / ((y1 - y0).toLong * (x1 - x0))).toByte
            tx += 1
          }
          ty += 1
        }
        out
      }
  }

  /** REAL audio decode-to-SAMPLES — the WAV/PCM counterpart of
    * [[ImageIoCodec]]'s decode-to-pixels (the [[HeaderCodec]] WAV arm
    * reads only the header; this walks to the `data` chunk and returns
    * the actual waveform). Strict contract like every decoder here:
    * PCM (format 1), 16-bit, mono, with the same unsigned-size /
    * overrun / short-fmt guards as the header walk — anything else
    * throws `IllegalArgumentException` rather than decoding garbage.
    */
  object WavPcm {
    private def le16(b: Array[Byte], off: Int): Int = {
      require(off + 2 <= b.length, s"truncated WAV at offset $off")
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
    }
    private def le32(b: Array[Byte], off: Int): Int = {
      require(off + 4 <= b.length, s"truncated WAV at offset $off")
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
        ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
    }
    private def ascii(b: Array[Byte], off: Int, len: Int): String =
      if (off + len <= b.length) new String(b, off, len, "US-ASCII") else ""

    /** The PCM16 mono sample array of a RIFF/WAVE blob. */
    def pcm16Samples(bytes: Array[Byte]): Array[Short] = {
      require(ascii(bytes, 0, 4) == "RIFF" && ascii(bytes, 8, 4) == "WAVE",
        "not a RIFF/WAVE blob")
      var off = 12L
      var fmt = 0; var channels = 0; var bits = 0
      var dataAt = -1; var dataSize = -1L
      while (off + 8 <= bytes.length && (fmt == 0 || dataAt < 0)) {
        val at = off.toInt
        val id = ascii(bytes, at, 4)
        val size = le32(bytes, at + 4) & 0xFFFFFFFFL
        require(off + 8 + size <= bytes.length,
          s"chunk '$id' size $size overruns the ${bytes.length}-byte blob")
        if (id == "fmt ") {
          require(size >= 16, s"'fmt ' chunk size $size < 16")
          fmt = le16(bytes, at + 8)
          channels = le16(bytes, at + 10)
          bits = le16(bytes, at + 22)
        } else if (id == "data") { dataAt = at + 8; dataSize = size }
        off += 8 + size + (size & 1)
      }
      require(fmt == 1 && bits == 16 && channels == 1,
        s"need PCM16 mono, got format=$fmt bits=$bits channels=$channels")
      require(dataAt >= 0, "missing data chunk in WAVE stream")
      require(dataSize % 2 == 0, s"odd PCM16 data size $dataSize")
      val n = (dataSize / 2).toInt
      val out = new Array[Short](n)
      var i = 0
      while (i < n) {
        out(i) = le16(bytes, dataAt + 2 * i).toShort
        i += 1
      }
      out
    }
  }

  /** Audio features from REAL PCM decode, on exact integer grids —
    * (id, n_samples, sum_sq, zero_crossings): sample count, the energy
    * numerator Σs² (BIGINT-exact, so any RMS/normalization downstream is
    * derived, not baked in float), and sign alternations
    * (s·s_prev < 0 — the zero-sample case counts for neither side, the
    * one convention with no sign(0) ambiguity to drift on). Runs through
    * the same `mapPartitions` codec seam as [[decode]]: bytes never
    * shuffle, one decoder per partition, columnar downstream.
    */
  def wavFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val s = WavPcm.pcm16Samples(bytes)
          var sumSq = 0L
          var zc = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toLong
            sumSq += v * v
            if (i > 0 && v * s(i - 1).toLong < 0) zc += 1
            i += 1
          }
          (id, s.length.toLong, sumSq, zc)
        }
      }
      .toDF(idCol, "n_samples", "sum_sq", "zero_crossings")
  }

  /** Primary-with-fallback codec composition: try `primary`, and on ANY
    * decode failure hand the blob to `fallback` (both share the partition
    * lifecycle — open/close are forwarded to both). The deployment shape
    * for a mixed corpus: `routed(ImageIoCodec, FakeCodec)` decodes real
    * images for real and keeps deterministic synthetic dims for blobs no
    * JDK reader accepts, so a flagged-on run degrades per-blob instead of
    * failing the partition.
    */
  def routed(primary: MediaCodec, fallback: MediaCodec): MediaCodec =
    new MediaCodec {
      override def open(): Unit = { primary.open(); fallback.open() }
      override def decode(bytes: Array[Byte]): MediaInfo =
        try primary.decode(bytes)
        catch {
          // NonFatal only: a bare `Exception` arm would also swallow an
          // InterruptedException delivered mid-decode by task
          // cancellation and convert it into a fallback result — the
          // cancellation must propagate, a decode failure must not
          case scala.util.control.NonFatal(_) => fallback.decode(bytes)
        }
      override def close(): Unit = { primary.close(); fallback.close() }
    }

  /** Decode stage: (id, blob) → (id, width, height, channels, n_frames).
    *
    * Runs the codec via `mapPartitions` — the batch shape a native decoder
    * needs (per-partition open/close, row-at-a-time decode, no per-row
    * driver round-trips). Everything downstream is columnar again.
    */
  def decode(df: DataFrame, idCol: String, binCol: String,
             codec: MediaCodec = FakeCodec): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        codec.open()
        closeOnTaskEnd(codec)
        it.map { case (id, bytes) =>
          val m = codec.decode(bytes)
          (id, m.width, m.height, m.channels, m.nFrames)
        }
      }
      .toDF(idCol, "width", "height", "channels", "n_frames")
  }

  /** Thumbnail stage: (id, blob) → (id, px) — a REAL decode + area-average
    * resize via [[ImageIoCodec.grayThumb]], through the same
    * `mapPartitions` seam as [[decode]] (bytes never shuffle; the blob is
    * consumed where it was scanned and only tw×th bytes continue). The
    * output is byte-compatible with the synthetic thumbnails
    * [[grayPixels]]/[[dHash64]] consume, so this is the decode+resize
    * step a real image rides into the d164 perceptual-hash band join.
    */
  def grayThumbs(df: DataFrame, idCol: String, binCol: String,
                 tw: Int = 9, th: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) =>
        (id, ImageIoCodec.grayThumb(bytes, tw, th))
      })
      .toDF(idCol, "px")
  }

  /** Release the codec when the TASK ends (success, failure, or an early
    * stop like limit/take) — an iterator-exhaustion hook would leak native
    * contexts whenever the consumer stops before the end, and double-close
    * on repeated hasNext probes.
    */
  private def closeOnTaskEnd(codec: MediaCodec): Unit =
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => codec.close()))

  /** One-pass metadata + decode: the expression-computed metadata columns
    * ride through the `mapPartitions` batch alongside the decode output, so
    * the blob column is scanned ONCE and nothing is re-joined afterwards —
    * at 100 TB the bytes never cross an exchange.
    * Output: (id, n_bytes, content_type, width, height, channels, n_frames).
    */
  def analyze(df: DataFrame, idCol: String, binCol: String,
              codec: MediaCodec = FakeCodec): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long"),
        octet_length(col(binCol)).cast("long"),
        sniffContentType(col(binCol)),
        col(binCol))
      .as[(Long, Long, String, Array[Byte])]
      .mapPartitions { it =>
        codec.open()
        closeOnTaskEnd(codec)
        it.map { case (id, nBytes, cType, bytes) =>
          val m = codec.decode(bytes)
          (id, nBytes, cType, m.width, m.height, m.channels, m.nFrames)
        }
      }
      .toDF(idCol, "n_bytes", "content_type", "width", "height", "channels", "n_frames")
  }

  /** Feature extraction over opaque binaries: byte histogram → Shannon
    * entropy (bits/byte) + dominant byte. Runs in the same `mapPartitions`
    * batch shape as [[decode]] — the stage where a real pipeline computes
    * perceptual hashes / embeddings; entropy is the codec-free example that
    * works on any blob (and separates compressed/encrypted media from text
    * at a glance). Output: (id, n_bytes, entropy, top_byte).
    */
  def byteFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val hist = new Array[Long](256) // reused across the partition
        it.map { case (id, bytes) =>
          java.util.Arrays.fill(hist, 0L)
          bytes.foreach(b => hist(b & 0xFF) += 1)
          val n = bytes.length.toDouble
          var entropy = 0.0
          var top = 0
          var i = 0
          while (i < 256) {
            if (hist(i) > 0) {
              val p = hist(i) / n
              entropy -= p * (math.log(p) / math.log(2))
              if (hist(i) > hist(top)) top = i
            }
            i += 1
          }
          (id, bytes.length.toLong, math.rint(entropy * 1e6) / 1e6, top)
        }
      }
      .toDF(idCol, "n_bytes", "entropy", "top_byte")
  }

  // ------------------------------------------------------- transformations

  /** Fit-in-box resize plan (no upscaling), exact integer arithmetic so any
    * engine reproduces it bit-for-bit: the binding side gets the box size,
    * the other side scales by the same integer ratio.
    */
  def resizePlan(w: Column, h: Column, maxW: Int, maxH: Int): (Column, Column) = {
    val outW = when(w <= maxW && h <= maxH, w)
      .when(w * maxH >= h * maxW, lit(maxW))
      .otherwise(greatest(lit(1), intDiv(w * maxH, h)))
    val outH = when(w <= maxW && h <= maxH, h)
      .when(w * maxH >= h * maxW, greatest(lit(1), intDiv(h * maxW, w)))
      .otherwise(lit(maxH))
    (outW, outH)
  }

  /** Number of frames kept when sampling every `stride`-th frame starting
    * at 0: ceil(nFrames / stride), integer-exact. 0 frames → 0 sampled
    * (a real codec plugged into the extension point may report 0 frames;
    * [[FakeCodec]] never does).
    */
  def frameSampleCount(nFrames: Column, stride: Int): Column =
    when(nFrames > 0, intDiv(nFrames + (stride - 1), lit(stride)))
      .when(nFrames.isNotNull, lit(0)) // 0 or negative frames: 0 sampled
      .cast("long")                    // NULL (unknown count) stays NULL

  /** Sampled frame indices [0, stride, 2·stride, …) as an array column;
    * empty for 0 frames (an unguarded `sequence(0, -1, +stride)` throws);
    * NULL for an unknown frame count — not conflated with a 0-frame blob.
    */
  def frameSampleIndices(nFrames: Column, stride: Int): Column =
    when(nFrames > 0, sequence(lit(0), nFrames - 1, lit(stride)))
      .when(nFrames.isNotNull, array().cast("array<int>"))

  /** Exact positive integer division. `floor(a / b)` is safe here: the true
    * quotient is a rational with denominator b < 2^31, so it sits ≥ 1/b away
    * from any non-attained integer — far beyond double rounding error.
    */
  private def intDiv(a: Column, b: Column): Column =
    floor(a.cast("double") / b.cast("double")).cast("int")

  /** The grayscale pixel array of a fixed-size thumbnail BLOB: byte i of
    * the blob is pixel i (row-major), decoded to INT 0–255. This is the
    * expression form of the step a perceptual hasher runs after decode +
    * resize: the blob IS the tiny grayscale thumbnail (a real codec
    * plugged into the [[MediaCodec]] seam produces it in production;
    * tests synthesize it), so pixel access is codegen'd byte math over
    * the scan — no UDF, no shuffle, and the blob never leaves its
    * partition. Fixed `nPixels` keeps the unrolled extraction inside
    * whole-stage codegen (a thumbnail grid is a constant of the hasher,
    * never data-dependent).
    */
  def grayPixels(bin: Column, nPixels: Int): Column =
    array((0 until nPixels).map(i =>
      conv(substring(hex(bin), i * 2 + 1, 2), 16, 10).cast("int")): _*)

  /** 64-bit difference hash (dHash) over a 9×8 grayscale grid (the
    * classic perceptual-hash layout: 8 rows × 8 left-vs-right
    * comparisons over 9 columns): bit r·8+c is set when
    * pixel(r,c) < pixel(r,c+1), pixels row-major as produced by
    * [[grayPixels]](bin, 72). Brightness/contrast-invariant (any
    * monotone per-image tone curve preserves every comparison), and a
    * single-pixel perturbation flips at most 2 bits — the locality the
    * hamming near-dup banding ([[SimHash.hammingPairs]]) exploits.
    * Distinct powers of two sum overflow-free left-to-right; the top
    * term is Long.MinValue (two's complement sign bit), added last —
    * the same assembly as [[SimHash]]'s sketch.
    *
    * Pass a MATERIALIZED pixel column (a named alias from a previous
    * projection), not an inline [[grayPixels]] expression: the hash
    * references the array 128 times, and outside codegen's CSE an
    * inlined array re-evaluates per reference — the shingleArrays
    * lesson; CollapseProject keeps a non-cheap multiply-referenced
    * alias apart, so the two-projection form evaluates it once per row
    * (measured 12× on the d164 chain).
    */
  def dHash64(pixels: Column): Column =
    (0 until 64).map { k =>
      val r = k / 8
      val c = k % 8
      when(element_at(pixels, r * 9 + c + 1) < element_at(pixels, r * 9 + c + 2),
        lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)
}
