package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.functions.Multimodal

/** Pins the REAL decode path behind the [[Multimodal.MediaCodec]] seam:
  * [[Multimodal.ImageIoCodec]] decodes genuine PNG/JPEG/GIF bytes to true
  * dimensions/channels (not header math, not md5 synthesis), its
  * grayThumb product rides the deployed dHash chain unchanged, the
  * routed composition falls back per-blob, and the per-partition
  * open/decode/close lifecycle holds under `mapPartitions`.
  */
class ImageIoCodecSpec extends SparkSpec {

  private def img(w: Int, h: Int)(px: (Int, Int) => Int): BufferedImage = {
    val b = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) b.setRGB(x, y, px(x, y))
    b
  }

  private def encode(b: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(b, fmt, out), s"JDK cannot write $fmt")
    out.toByteArray
  }

  test("ImageIoCodec decodes real PNG/JPEG/GIF bytes to true dims and channels") {
    val png = encode(img(37, 21)((x, y) => (x * 7 + y) % 256 << 16), "png")
    val m = Multimodal.ImageIoCodec.decode(png)
    assert(m.width === 37 && m.height === 21 && m.nFrames === 1)
    assert(m.channels === 3)

    val jpg = encode(img(64, 48)((_, _) => 0x808080), "jpg")
    val mj = Multimodal.ImageIoCodec.decode(jpg)
    assert(mj.width === 64 && mj.height === 48 && mj.channels === 3)

    val gif = encode(img(12, 9)((x, _) => if (x < 6) 0 else 0xFFFFFF), "gif")
    val mg = Multimodal.ImageIoCodec.decode(gif)
    assert(mg.width === 12 && mg.height === 9 && mg.nFrames === 1)
    // GIF decodes through a palette — 1 indexed band is a faithful
    // raster answer for a 2-color image
    assert(mg.channels >= 1)
  }

  test("ImageIoCodec is strict: garbage and magic-only blobs throw") {
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec.decode("not an image".getBytes("UTF-8"))
    }
    // a JPEG magic with a text payload selects the JPEG reader, whose
    // decode then fails — the d10 fixture shape under the flagged path
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec.decode(
        Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte) ++ "hello".getBytes)
    }
  }

  test("grayThumb feeds the deployed dHash chain: gradient image hashes all-ones") {
    import spark.implicits._
    // strictly increasing horizontal gradient: every left<right comparison
    // in every row is true after area-averaging, so dHash64 = all 64 bits
    val grad = encode(img(90, 80)((x, _) => {
      val v = x * 255 / 89; (v << 16) | (v << 8) | v
    }), "png")
    val thumb = Multimodal.ImageIoCodec.grayThumb(grad)
    assert(thumb.length === 72)
    val hash = Seq(Tuple1(thumb)).toDF("blob")
      .select(col("blob"), Multimodal.grayPixels(col("blob"), 72).as("px"))
      .select(Multimodal.dHash64(col("px")).as("h"))
      .head().getLong(0)
    assert(hash === -1L, f"expected all-ones dHash, got $hash%016x")
  }

  test("grayThumb of a near-identical image lands within the d164 hamming budget") {
    import spark.implicits._
    val base = img(90, 80)((x, _) => { val v = x * 255 / 89; (v << 16) | (v << 8) | v })
    val tweaked = img(90, 80)((x, y) =>
      if (x == 45 && y == 40) 0 else { val v = x * 255 / 89; (v << 16) | (v << 8) | v })
    def hashOf(b: BufferedImage): Long = {
      val t = Multimodal.ImageIoCodec.grayThumb(encode(b, "png"))
      Seq(Tuple1(t)).toDF("blob")
        .select(Multimodal.grayPixels(col("blob"), 72).as("px"))
        .select(Multimodal.dHash64(col("px")).as("h")).head().getLong(0)
    }
    val d = java.lang.Long.bitCount(hashOf(base) ^ hashOf(tweaked))
    assert(d <= 2, s"single-pixel perturbation flipped $d dHash bits")
  }

  test("routed falls back per-blob and real decodes win when possible") {
    val realPng = encode(img(17, 13)((_, _) => 0xFF0000), "png")
    val fake = Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte) ++ "payload".getBytes
    val codec = Multimodal.routed(Multimodal.ImageIoCodec, Multimodal.FakeCodec)
    val real = codec.decode(realPng)
    assert(real.width === 17 && real.height === 13)
    assert(codec.decode(fake) === Multimodal.FakeCodec.decode(fake))
  }

  test("codec lifecycle: open once per partition, close on task end, " +
    "decode per row") {
    import spark.implicits._
    ImageIoCodecSpec.reset()
    val df = (1L to 12L).map(i => (i, s"blob$i".getBytes)).toDF("id", "blob")
      .repartition(3)
    val out = Multimodal.decode(df, "id", "blob", ImageIoCodecSpec.CountingCodec)
    assert(out.count() === 12)
    assert(ImageIoCodecSpec.opens.get() === 3,
      "open() must run once per partition")
    assert(ImageIoCodecSpec.decodes.get() === 12)
    // close fires from the task-completion listener; tasks have all
    // finished once count() returned (local mode, same JVM)
    assert(ImageIoCodecSpec.closes.get() === 3,
      "close() must run once per partition at task end")
  }
}

/** Pins the REAL audio decode path: [[Multimodal.WavPcm]] recovers the
  * exact PCM16 waveform from a genuine RIFF/WAVE blob (the HeaderCodec
  * arm stops at the header), wavFeatures computes integer-exact features
  * over it, and malformed or non-PCM16-mono blobs are refused loudly.
  */
class WavPcmSpec extends SparkSpec {

  private def wav(samples: Array[Short], channels: Short = 1,
                  bits: Short = 16, fmt: Short = 1): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(fmt).putShort(channels)
      .putInt(8000).putInt(16000).putShort(2).putShort(bits)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  test("pcm16Samples round-trips the exact waveform; HeaderCodec agrees on the header") {
    val s = Array[Short](0, 1000, -1000, 32767, -32768, 7)
    val blob = wav(s)
    assert(Multimodal.WavPcm.pcm16Samples(blob).toSeq === s.toSeq)
    val m = Multimodal.HeaderCodec.decode(blob)
    assert(m.width === 8000 && m.height === 16 && m.channels === 1 &&
      m.nFrames === s.length)
  }

  test("wavFeatures: integer-exact energy and sign alternations") {
    import spark.implicits._
    val s = Array[Short](3, -2, 0, -1, 4) // zc: 3/-2 and -1/4; 0 counts never
    val df = Seq((1L, wav(s))).toDF("doc_id", "blob")
    val r = Multimodal.wavFeatures(df, "doc_id", "blob").head()
    assert(r.getLong(1) === 5L)
    assert(r.getLong(2) === (9 + 4 + 0 + 1 + 16).toLong)
    assert(r.getLong(3) === 2L)
  }

  test("WavPcm is strict: stereo, 8-bit, non-PCM and garbage refused") {
    val s = Array[Short](1, 2)
    intercept[IllegalArgumentException] {
      Multimodal.WavPcm.pcm16Samples(wav(s, channels = 2))
    }
    intercept[IllegalArgumentException] {
      Multimodal.WavPcm.pcm16Samples(wav(s, bits = 8))
    }
    intercept[IllegalArgumentException] {
      Multimodal.WavPcm.pcm16Samples(wav(s, fmt = 3)) // IEEE float
    }
    intercept[IllegalArgumentException] {
      Multimodal.WavPcm.pcm16Samples("RIFFxxxxWAVE".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.WavPcm.pcm16Samples("not audio".getBytes("US-ASCII"))
    }
  }
}

object ImageIoCodecSpec {
  val opens = new java.util.concurrent.atomic.AtomicInteger
  val decodes = new java.util.concurrent.atomic.AtomicInteger
  val closes = new java.util.concurrent.atomic.AtomicInteger
  def reset(): Unit = { opens.set(0); decodes.set(0); closes.set(0) }

  /** Same-JVM (local-mode) instrumented codec for the lifecycle contract. */
  object CountingCodec extends Multimodal.MediaCodec {
    override def open(): Unit = { opens.incrementAndGet(); () }
    override def decode(bytes: Array[Byte]): Multimodal.MediaInfo = {
      decodes.incrementAndGet()
      Multimodal.MediaInfo(1, 1, 1, 1)
    }
    override def close(): Unit = { closes.incrementAndGet(); () }
  }
}
