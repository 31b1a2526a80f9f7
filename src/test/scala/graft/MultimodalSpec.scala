package graft

import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, determinism, batch-shape operators, and
  * composition with the vector search ops. The codec layer is REAL for
  * images (ImageIO), audio (javax.sound WAV) and MJPEG-AVI video (RIFF
  * demux + per-frame JPEG decode) — each pinned by a round-trip here;
  * raw fixture formats pass through as declared.
  */
class MultimodalSpec extends SparkSuite {
  import graft.multimodal.Multimodal
  import graft.ops.Vector

  test("synthetic assets: deterministic, typed schema, sized payloads") {
    val a = Multimodal.syntheticAssets(spark, 12, seed = 5).collect()
    val b = Multimodal.syntheticAssets(spark, 12, seed = 5).collect()
    assert(a.map(_.asset_id).toSeq == b.map(_.asset_id).toSeq)
    assert(a.zip(b).forall { case (x, y) => x.media.sameElements(y.media) })
    a.foreach { as =>
      as.kind match {
        case "image" =>
          assert(as.media.length == as.meta.width * as.meta.height * 3)
        case "video" =>
          assert(as.media.length ==
            as.meta.width * as.meta.height * as.meta.nFrames)
        case "audio" =>
          // a REAL WAV container: RIFF magic + 16-bit samples of the
          // 250ms clip behind a 44-byte header, parseable by the codec
          assert(new String(as.media.slice(0, 4), "US-ASCII") == "RIFF")
          assert(as.media.length == 44 + 2 * (as.meta.sampleRate / 4))
          val (samples, sr) = Multimodal.Codec.decodeAudio(as.media, as.meta)
          assert(sr == as.meta.sampleRate)
          assert(samples.length == as.meta.sampleRate / 4)
      }
    }
  }

  test("featurize: fixed-dim vectors in [0,1], media bytes do not leave") {
    val feats = Multimodal.featurize(
      Multimodal.syntheticAssets(spark, 9, seed = 1), dim = 32)
    assert(feats.schema.fieldNames.toSeq ==
      Seq("asset_id", "kind", "embedding"))
    val rows = feats.collect()
    assert(rows.length == 9)
    rows.foreach { f =>
      assert(f.embedding.length == 32)
      assert(f.embedding.forall(v => v >= 0.0f && v <= 1.0f))
    }
  }

  test("resizeImages: raw-plane nearest-neighbor, meta updated, others untouched") {
    val out = Multimodal.resizeImages(
      Multimodal.syntheticAssets(spark, 9, seed = 2), 4, 4).collect()
    out.foreach {
      case a if a.kind == "image" =>
        assert(a.meta.width == 4 && a.meta.height == 4)
        assert(a.media.length == 4 * 4 * 3)
      case a if a.kind == "video" =>
        assert(a.meta.width == 8 && a.media.length == 8 * 8 * 12)
      case _ => ()
    }
    // corner pixel of the resize is the source corner pixel (sx=sy=0)
    val src = Multimodal.syntheticAssets(spark, 9, seed = 2).collect()
      .filter(_.kind == "image").head
    val dst = out.filter(_.asset_id == src.asset_id).head
    assert(dst.media(0) == src.media(0) && dst.media(2) == src.media(2))
  }

  test("sampleFrames: every Nth frame, correct slice, nothing for non-video") {
    val assets = Multimodal.syntheticAssets(spark, 9, seed = 3)
    val frames = Multimodal.sampleFrames(assets, everyN = 5).collect()
    val videos = assets.collect().filter(_.kind == "video")
    // 12 frames, stride 5 -> frames 0, 5, 10
    assert(frames.groupBy(_.asset_id).keySet == videos.map(_.asset_id).toSet)
    frames.groupBy(_.asset_id).values.foreach { fs =>
      assert(fs.map(_.frame_idx).sorted.toSeq == Seq(0, 5, 10))
    }
    val v = videos.head
    val f5 = frames.filter(f => f.asset_id == v.asset_id && f.frame_idx == 5).head
    val sz = v.meta.width * v.meta.height
    assert(f5.frame.sameElements(v.media.slice(5 * sz, 6 * sz)))
  }

  test("WAV decode is real: javax.sound round-trip recovers PCM16 exactly") {
    val sr = 16000
    val samples = Array.tabulate(400)(i => (math.sin(i * 0.1) * 0.8).toFloat)
    val wav = Multimodal.Codec.encodeWavPcm16(samples, sr)
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val (out, outSr) = Multimodal.Codec.decodeAudio(
      wav, Multimodal.AssetMeta(0, 0, sr, 1, "wav"))
    assert(outSr == sr && out.length == samples.length)
    // encode rounds to 1/32767, decode divides by 32768: one-quantum bound
    samples.zip(out).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1.5f / 32768.0f, s"$a vs $b")
    }
    // and the exact PCM16 words survive bit-for-bit (container is lossless)
    val reenc = Multimodal.Codec.encodeWavPcm16(out.map(v => v * 32768f / 32767f), sr)
    assert(java.util.Arrays.equals(
      reenc.drop(44), wav.drop(44)), "PCM payload must round-trip")
  }

  test("PNG decode is real: ImageIO round-trip recovers the exact RGB plane") {
    // draw a deterministic 6x4 image, encode it as a REAL PNG, and decode
    // through the pipeline's codec — pixel-exact (PNG is lossless)
    val (w, h) = (6, 4)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val want = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = ((x * 40) % 256, (y * 60) % 256, (x * y * 13) % 256)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      val o = (y * w + x) * 3
      want(o) = r.toByte; want(o + 1) = g.toByte; want(o + 2) = b.toByte
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray
    assert(png.take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte,
      'G'.toByte)), "fixture must be a real PNG container")
    val meta = Multimodal.AssetMeta(0, 0, 0, 1, "png") // dims come from decode
    val (plane, dw, dh) = Multimodal.Codec.decodeImage(png, meta)
    assert((dw, dh) == (w, h), "decoded dimensions must come from the pixels")
    assert(plane.sameElements(want), "decoded RGB plane must be pixel-exact")
    // garbage bytes must fail loudly, not decode to something
    intercept[IllegalArgumentException] {
      Multimodal.Codec.decodeImage(Array[Byte](1, 2, 3), meta)
    }
  }

  test("featurize and resize run on real PNG pixels end-to-end") {
    import spark.implicits._
    val (w, h) = (8, 8)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 32) << 16) | ((y * 32) << 8) | ((x + y) * 16))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray
    val raw = Multimodal.Codec.decodeImage(
      png, Multimodal.AssetMeta(0, 0, 0, 1, "png"))._1
    val pngAsset = Multimodal.Asset(1L, "image", png,
      Multimodal.AssetMeta(0, 0, 0, 1, "png"))
    val rawAsset = Multimodal.Asset(2L, "image", raw,
      Multimodal.AssetMeta(w, h, 0, 1, "raw-rgb"))
    val ds = spark.createDataset(Seq(pngAsset, rawAsset))
    // the PNG asset featurizes from its DECODED pixels: identical embedding
    // to the raw plane of the same image
    val feats = Multimodal.featurize(ds, dim = 16).collect()
      .map(f => f.asset_id -> f.embedding.toSeq).toMap
    assert(feats(1L) == feats(2L),
      "PNG must featurize from decoded pixels, not container bytes")
    // resize reads dimensions from the DECODE (meta declares none for png)
    val resized = Multimodal.resizeImages(ds, 4, 4).collect()
      .map(a => a.asset_id -> a).toMap
    assert(resized(1L).media.sameElements(resized(2L).media))
    assert(resized(1L).meta.format == "raw-rgb" &&
      resized(1L).meta.width == 4 && resized(1L).meta.height == 4)
  }

  test("MJPEG-AVI video decode is real: RIFF demux + per-frame JPEG decode") {
    import spark.implicits._
    val (w, h, n) = (16, 12, 6)
    // solid-color frames: JPEG is lossy, but a constant block decodes to
    // within a couple of quanta of itself — a content check that cannot
    // pass by byte-slicing the container
    val colors = (0 until n).map(f => ((20 + f * 35) % 256, 200 - f * 20, 40 + f * 30))
    val jpegs = colors.map { case (r, g, b) =>
      val plane = new Array[Byte](w * h * 3)
      for (i <- 0 until w * h) {
        plane(3 * i) = r.toByte; plane(3 * i + 1) = g.toByte
        plane(3 * i + 2) = b.toByte
      }
      Multimodal.Codec.encodeJpeg(plane, w, h)
    }
    val avi = Multimodal.Codec.encodeMjpegAvi(jpegs, w, h, fps = 10)
    assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF" &&
      new String(avi.slice(8, 12), "US-ASCII") == "AVI ",
      "fixture must be a real RIFF/AVI container")
    // the demux finds exactly the n frame chunks, each a complete JPEG
    val chunks = Multimodal.Codec.mjpegFrameChunks(avi)
    assert(chunks.length == n)
    chunks.foreach { case (off, len) =>
      assert((avi(off) & 0xFF) == 0xFF && (avi(off + 1) & 0xFF) == 0xD8,
        "each movi chunk must start with a JPEG SOI marker")
      assert(len == jpegs(chunks.indexOf((off, len))).length)
    }
    val asset = Multimodal.Asset(7L, "video", avi,
      Multimodal.AssetMeta(w, h, 0, n, "mjpeg-avi"))
    // sampleFrames decodes real pixels at the sampled indices
    val frames = Multimodal.sampleFrames(spark.createDataset(Seq(asset)), 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    frames.foreach { fr =>
      assert(fr.frame.length == w * h * 3)
      val (r, g, b) = colors(fr.frame_idx)
      // mean decoded channel within 3/255 of the encoded solid color
      def mean(c: Int) = (0 until w * h).map(i => fr.frame(3 * i + c) & 0xFF)
        .sum.toDouble / (w * h)
      assert(math.abs(mean(0) - r) <= 3 && math.abs(mean(1) - g) <= 3 &&
        math.abs(mean(2) - b) <= 3, s"frame ${fr.frame_idx} color drifted")
    }
    // featurize pools DECODED frame pixels, not container bytes: embedding
    // of the video equals the embedding of the concatenated decoded planes
    val planes = (0 until n).flatMap(f =>
      Multimodal.Codec.decodeFrame(avi, asset.meta, f))
    val rawEquiv = Multimodal.Asset(8L, "video", planes.toArray,
      Multimodal.AssetMeta(w, h * n, 0, n, "raw-gray-frames"))
    val feats = Multimodal.featurize(
        spark.createDataset(Seq(asset, rawEquiv)), dim = 16)
      .collect().map(f => f.asset_id -> f.embedding.toSeq).toMap
    assert(feats(7L) == feats(8L),
      "video must featurize from decoded pixels, not container bytes")
    // out-of-range frame fails loudly; garbage is not a container
    intercept[IllegalArgumentException] {
      Multimodal.Codec.decodeFrame(avi, asset.meta, n)
    }
    intercept[IllegalArgumentException] {
      Multimodal.Codec.mjpegFrameChunks(Array[Byte](1, 2, 3, 4))
    }
    // a corrupt chunk size (negative-as-u32 or parent-overrunning) must
    // throw, not stall or reverse the walk into an infinite loop
    // (ADVICE r9): flip the first movi chunk's size to 0xFFFFFFFF
    val corrupt = avi.clone()
    val (off0, _) = chunks.head
    (0 until 4).foreach(i => corrupt(off0 - 4 + i) = 0xFF.toByte)
    intercept[IllegalArgumentException] {
      Multimodal.Codec.mjpegFrameChunks(corrupt)
    }
  }

  test("end to end: featurize -> cosine top-k over asset embeddings") {
    val feats = Multimodal.featurize(
      Multimodal.syntheticAssets(spark, 30, seed = 4), dim = 16).toDF()
      .withColumnRenamed("asset_id", "vec_id")
    val probes = feats.filter(col("vec_id") < 2)
    val topk = Vector.cosineTopK(feats, probes, k = 5).collect()
    assert(topk.groupBy(_.getLong(0)).size == 2)
    assert(topk.length == 10)
  }
}
