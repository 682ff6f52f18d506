package graft.operators

import graft.SparkSpec

class MediaPipelineSpec extends SparkSpec {

  test("decodeBatch produces deterministic features over binary payloads") {
    import spark.implicits._
    val assets = Seq(
      MediaPipeline.MediaAsset(0L, "image", "hello world of pixels".getBytes("UTF-8")),
      MediaPipeline.MediaAsset(1L, "audio", Array[Byte]()),
      MediaPipeline.MediaAsset(2L, "video", ("x" * 100).getBytes("UTF-8")))
      .toDS()
    val feats = MediaPipeline.decodeBatch(assets, partitions = 2)
      .collect().map(f => f.assetId -> f).toMap

    assert(feats.size == 3)
    assert(feats(0L).nBytes == 21L)
    assert(feats(0L).mediaFormat == "image")
    assert(feats(0L).nFrames == 4)
    assert(feats(1L).nBytes == 0L)
    assert(feats(1L).meanByte == 0.0)
    assert(feats(2L).meanByte == 'x'.toInt.toDouble)
    // deterministic: re-run equals first run
    val again = MediaPipeline.decodeBatch(assets, partitions = 2)
      .collect().map(f => f.assetId -> f).toMap
    assert(feats(0L).frameSamples == again(0L).frameSamples)
    assert(feats(2L).width == again(2L).width)
  }

  test("resize fits every asset inside the target box preserving aspect") {
    import spark.implicits._
    val assets = MediaPipeline.assetsFromDocuments(spark, "/root/testdata/sf0.001")
    val feats = MediaPipeline.decodeBatch(assets, partitions = 2)
    val resized = MediaPipeline.resize(feats, 64, 48).collect()
    assert(resized.length == 500)
    resized.foreach { r =>
      assert(r.outWidth <= 64 && r.outHeight <= 48)
      assert(r.outWidth >= 1 && r.outHeight >= 1)
      // one dimension saturates the box (fit, not shrink-only): the
      // binding axis lands exactly on the target after rounding
      assert(r.outWidth == 64 || r.outHeight == 48,
        s"asset ${r.assetId}: ${r.outWidth}x${r.outHeight} fills neither axis")
      // aspect preserved within rounding of both axes
      val expectH = r.height * r.scale
      assert(math.abs(r.outHeight - expectH) <= 0.5 + 1e-9)
    }
  }

  test("assetsFromDocuments yields one asset per document with utf-8 payload") {
    val assets = MediaPipeline.assetsFromDocuments(spark, "/root/testdata/sf0.001")
    val n = assets.count()
    assert(n == 500L)
    val first = assets.filter(_.assetId == 0L).head()
    assert(first.mediaFormat == "image")
    assert(first.payload.nonEmpty)
  }
}
