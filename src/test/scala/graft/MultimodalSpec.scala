package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode stub: deterministic features, schema contract") {
    val df = Seq((1L, "abc".getBytes("UTF-8")), (2L, Array.emptyByteArray))
      .toDF("id", "payload")
    val out = Multimodal.decodeImages(df, "id", "payload")
    assert(out.columns.toSeq == Seq("id", "byte_length", "content_hash", "mean_intensity", "feature_vec"))
    val rows = out.orderBy($"id").collect()
    assert(rows(0).getAs[Long]("byte_length") == 3)
    assert(rows(1).getAs[Long]("byte_length") == 0)
    assert(rows(1).getAs[Double]("mean_intensity") == 0.0)
    assert(rows(0).getAs[scala.collection.Seq[Double]]("feature_vec").length == 8)
    // determinism
    val again = Multimodal.decodeImages(df, "id", "payload").orderBy($"id").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("media table wrapper adds typed metadata struct") {
    val df = Seq((1L, "x".getBytes("UTF-8"))).toDF("id", "payload")
    val media = Multimodal.asMediaTable(df, "payload", "image/png")
    val meta = media.select($"media_meta.media_type").head().getString(0)
    assert(meta == "image/png")
  }

  test("resize stub: payload replaced, metadata dims updated, deterministic") {
    val df = Multimodal.asMediaTable(
      Seq((1L, "image-bytes-here".getBytes("UTF-8"))).toDF("id", "payload"), "payload", "image/png")
    val out = Multimodal.resizeImages(df, "payload", 64, 64)
    val row = out.head()
    assert(row.getAs[Array[Byte]]("payload").length == 64 * 64 / 256)
    val meta = out.select($"media_meta.width", $"media_meta.height").head()
    assert(meta.getInt(0) == 64 && meta.getInt(1) == 64)
    val again = Multimodal.resizeImages(df, "payload", 64, 64).head()
    assert(row.getAs[Array[Byte]]("payload").toSeq == again.getAs[Array[Byte]]("payload").toSeq)
  }

  test("audio feature stub: schema contract, rms bounds, 13-dim vector") {
    val df = Seq((1L, "audio-bytes".getBytes("UTF-8")), (2L, Array.emptyByteArray))
      .toDF("id", "payload")
    val out = Multimodal.audioFeatures(df, "id", "payload").orderBy($"id").collect()
    assert(out(0).getAs[scala.collection.Seq[Double]]("mfcc_vec").length == 13)
    val rms = out(0).getAs[Double]("rms")
    assert(rms > 0.0 && rms <= 1.0)
    assert(out(1).getAs[Double]("rms") == 0.0)
  }

  test("frame sampling emits n deterministic rows per input") {
    val df = Seq((1L, "video-bytes".getBytes("UTF-8"))).toDF("id", "payload")
    val frames = Multimodal.sampleFrames(df, "id", "payload", 4)
    assert(frames.count() == 4)
    assert(frames.select($"frame_index").collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2, 3))
  }

  test("content dedup keeps lowest id per identical payload") {
    val df = Seq(
      (3L, "img-A".getBytes("UTF-8")),
      (1L, "img-A".getBytes("UTF-8")), // dup of 3 with lower id
      (2L, "img-B".getBytes("UTF-8"))
    ).toDF("id", "payload")
    val out = Multimodal.dedupByContent(df, "id", "payload")
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L))
  }

  test("perceptual pairs: identical payloads pair at hamming 0, distinct don't") {
    val df = Seq(
      (1L, "same-bytes-same-image".getBytes("UTF-8")),
      (2L, "same-bytes-same-image".getBytes("UTF-8")),
      (3L, "completely different content".getBytes("UTF-8"))
    ).toDF("id", "payload")
    val pairs = Multimodal.perceptualPairs(df, "id", "payload", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs == Seq((1L, 2L, 0)))
  }
}
