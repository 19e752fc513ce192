package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._
import graft.vector.VectorSearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, 90).cache()

  test("decodeMeta parses the header for every kind; corrupt rows dropped") {
    val decoded = decodeMeta(media).collect()
    assert(decoded.length == 90)
    val img = decoded.find(_.media_id == 0).get
    assert(img.kind == "image" && img.width == 64 && img.height == 48)
    val aud = decoded.find(_.media_id == 1).get
    assert(aud.kind == "audio" && aud.sample_rate == 16000)
    val vid = decoded.find(_.media_id == 2).get
    assert(vid.kind == "video" && vid.n_frames == 10)
    // corrupt payload → dropped, not crashed
    val junk = Seq(MediaRow(999L, "image", Array[Byte](1, 2, 3))).toDS()
    assert(decodeMeta(junk).count() == 0)
  }

  test("extractFeatures: deterministic, right dim, unit norm") {
    val f1 = extractFeatures(media, 32).collect().sortBy(_.media_id)
    val f2 = extractFeatures(media, 32).collect().sortBy(_.media_id)
    assert(f1.length == 90)
    assert(f1.zip(f2).forall { case (a, b) => a.embedding.sameElements(b.embedding) })
    val norms = f1.map(_.embedding.map(x => x.toDouble * x).sum)
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-3))
  }

  test("features feed similarity search end-to-end") {
    val feats = extractFeatures(media, 32).toDF()
      .withColumnRenamed("media_id", "vec_id")
    val q = feats.where($"vec_id" === 0)
    val top = VectorSearch.cosineTopK(feats.where($"vec_id" =!= 0), q,
      "vec_id", "embedding", 5)
    assert(top.count() == 5)
  }

  test("resize rewrites image dims, leaves other kinds untouched") {
    val resized = decodeMeta(resize(media, 32, 24)).collect()
    val img = resized.filter(_.kind == "image")
    assert(img.nonEmpty && img.forall(r => r.width == 32 && r.height == 24))
    val aud = resized.filter(_.kind == "audio")
    assert(aud.forall(_.sample_rate == 16000))
  }

  test("q_m_embed_bucket_profile: pinned values (rows-only driver query)") {
    // The byte-histogram embedding → LSH banding path has no SQL oracle;
    // this pin is its correctness anchor (approx-twin convention).
    val rows = SparkEntry.queries("q_m_embed_bucket_profile")(spark, "")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((0, 8L, 500L), (1, 16L, 500L), (2, 8L, 500L), (3, 16L, 500L)))
  }

  test("q_m_embed_neardup: planted replicas found, nothing else (pinned)") {
    // 25 exact payload replicas planted over ids 0..24: 9 image (0 mod 3),
    // 8 audio, 8 video — the pair counts must be exactly those
    val rows = SparkEntry.queries("q_m_embed_neardup")(spark, "")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("audio", 8L), ("image", 9L), ("video", 8L)))
  }

  test("replica builder stays relational — no added object boundary") {
    // VERDICT r3 #3: the replica filter/shift must be column ops inside
    // codegen. syntheticMedia's typed map legitimately deserializes once;
    // building replicas from it must add ZERO further object boundaries.
    def nDeser(df: org.apache.spark.sql.DataFrame): Int =
      "DeserializeToObject".r
        .findAllIn(df.queryExecution.optimizedPlan.toString).size
    val base = Multimodal.syntheticMedia(spark, 50).toDF()
    val replicas = base.where(col("media_id") < 25)
      .select((col("media_id") + 50).as("media_id"), col("kind"),
        col("payload"))
    assert(nDeser(replicas) == nDeser(base),
      "replica builder added an object boundary:\n" +
        replicas.queryExecution.optimizedPlan.toString)
  }

  test("sampleFrames: every Nth frame, one row each, only video") {
    val frames = sampleFrames(media, 2).collect()
    val byId = frames.groupBy(_.media_id)
    val vids = decodeMeta(media).filter($"kind" === "video").collect()
    assert(byId.keySet == vids.map(_.media_id).toSet)
    vids.foreach { v =>
      val expected = (0 until v.n_frames by 2).size
      assert(byId(v.media_id).length == expected,
        s"media ${v.media_id}: ${byId(v.media_id).length} != $expected")
      assert(byId(v.media_id).map(_.frame_idx).sorted.toSeq
        == (0 until v.n_frames by 2).toSeq)
    }
    assert(frames.forall(_.frame.nonEmpty))
  }
}
