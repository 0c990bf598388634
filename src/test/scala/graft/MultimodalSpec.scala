package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary-column plumbing: batched feature extraction is deterministic and complete") {
    val df = Seq(
      (0L, "small payload"),
      (1L, "a somewhat longer payload with more bytes in it"),
      (2L, "")
    ).toDF("doc_id", "text")
    val records = Multimodal.fromBinaryColumn(df, "doc_id", "text", "video")
    val feats = Multimodal.extractFeatures(records).collect().sortBy(_.media_id)
    assert(feats.length == 3)
    assert(feats(0).n_bytes == "small payload".getBytes("UTF-8").length)
    // sha256 matches JVM-computed reference
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expected = md.digest("small payload".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(feats(0).sha256_hex == expected)
    // histogram buckets sum to payload length
    assert(feats(1).byte_histogram.sum == feats(1).n_bytes)
    // stub decode is deterministic
    assert(feats(0).decoded_width == 32 + feats(0).n_bytes % 480)
    // empty payload handled
    assert(feats(2).n_bytes == 0 && feats(2).n_frames_sampled == 0)
  }

  test("frame sampling expands videos to per-frame rows, skips other kinds") {
    val df = Seq(
      (0L, "0123456789abcdef0123456789abcdef"), // 32 bytes → 4 full frames at 8 bytes
      (1L, "")
    ).toDF("doc_id", "text")
    val video = Multimodal.fromBinaryColumn(df, "doc_id", "text", "video")
    val frames = Multimodal.sampleFrames(video, maxFrames = 4, frameBytes = 8)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    assert(frames.map(_.media_id).toSet == Set(0L)) // empty payload → no frames
    assert(frames.length == 4)
    assert(frames.map(_.byte_offset).toSeq == Seq(0L, 8L, 16L, 24L))
    assert(frames.forall(_.frame_bytes.length == 8))
    assert(new String(frames(1).frame_bytes, "UTF-8") == "89abcdef")

    // non-video kinds produce no frames at all
    val image = Multimodal.fromBinaryColumn(df, "doc_id", "text", "image")
    assert(Multimodal.sampleFrames(image, 4, 8).count() == 0)
  }
}
