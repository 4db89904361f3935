package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Multimodal binary-column plumbing: schema, bounded-batch decode shape,
  * failure isolation, metadata ops. The decode internals are the
  * deterministic stub; everything asserted here is the real Spark surface. */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "hello world tokens", "es", "src0", 18L),
    (1L, "another doc body", "de", "src1", 16L),
    (2L, "third payload text", "en", "src2", 18L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("synthesizeMedia schema: opaque binary payload + typed metadata") {
    val media = Multimodal.synthesizeMedia(docs)
    val s = media.schema
    assert(s("payload").dataType.typeName == "binary")
    assert(s("meta").dataType.typeName == "struct")
    assert(media.select("kind").as[String].collect().toSet.subsetOf(
      Set("image", "audio", "video")))
  }

  test("decodeBatched appends fixed-dim features, deterministic across runs") {
    val media = Multimodal.synthesizeMedia(docs)
    val dec = new Multimodal.ByteHistogramDecoder(16)
    val run1 = Multimodal.decodeBatched(media, dec, batchSize = 2)
      .select("media_id", "ok", "features", "n_frames")
      .as[(Long, Boolean, Seq[Float], Int)].collect().sortBy(_._1)
    val run2 = Multimodal.decodeBatched(media, dec, batchSize = 2)
      .select("media_id", "ok", "features", "n_frames")
      .as[(Long, Boolean, Seq[Float], Int)].collect().sortBy(_._1)
    assert(run1.toSeq == run2.toSeq)
    assert(run1.forall(_._2))
    assert(run1.forall(_._3.length == 16))
    // histogram is normalized by payload length → sums to ~1
    assert(run1.forall(r => math.abs(r._3.sum - 1f) < 1e-5))
  }

  test("decodeBatch receives real bounded batches (not per-row calls)") {
    val acc = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val probe = new Multimodal.MediaDecoder {
      val featureDim = 2
      def decode(kind: String, payload: Array[Byte]): Multimodal.MediaFeatures =
        Multimodal.MediaFeatures(ok = true, new Array[Float](2), 1)
      override def decodeBatch(batch: Seq[(String, Array[Byte])]): Seq[Multimodal.MediaFeatures] = {
        acc.add(batch.size)
        super.decodeBatch(batch)
      }
    }
    val media = Multimodal.synthesizeMedia(docs).coalesce(1)
    Multimodal.decodeBatched(media, probe, batchSize = 2).collect()
    import scala.jdk.CollectionConverters._
    val sizes = acc.value.asScala.map(_.intValue).toSeq
    assert(sizes.nonEmpty && sizes.max <= 2 && sizes.contains(2)) // genuinely batched, bounded
  }

  test("a throwing decoder yields ok=false zero rows, not a failed task") {
    val boom = new Multimodal.MediaDecoder {
      val featureDim = 4
      def decode(kind: String, payload: Array[Byte]): Multimodal.MediaFeatures =
        throw new RuntimeException("codec missing")
    }
    val got = Multimodal.decodeBatched(Multimodal.synthesizeMedia(docs), boom)
      .select("ok", "features").as[(Boolean, Seq[Float])].collect()
    assert(got.forall(r => !r._1 && r._2 == Seq(0f, 0f, 0f, 0f)))
  }

  test("resizeMeta scales dims down proportionally, never up") {
    val media = Multimodal.synthesizeMedia(docs)
      .withColumn("meta", struct(
        lit("synthetic").as("format"), lit(1280).as("width"), lit(960).as("height"),
        lit(16000).as("sample_rate"), lit(1000L).as("duration_ms")))
    val (w, h) = media.select(Multimodal.resizeMeta(col("meta"), 640, 640).as("m"))
      .select(col("m.width"), col("m.height")).as[(Int, Int)].head()
    assert(w == 640 && h == 480)
    val small = media.withColumn("meta",
      col("meta").withField("width", lit(100)).withField("height", lit(50)))
    val (w2, h2) = small.select(Multimodal.resizeMeta(col("meta"), 640, 640).as("m"))
      .select(col("m.width"), col("m.height")).as[(Int, Int)].head()
    assert(w2 == 100 && h2 == 50)
  }

  test("frameSampleMs emits bounded stride timestamps") {
    val media = Multimodal.synthesizeMedia(docs.limit(1))
      .withColumn("meta", col("meta").withField("duration_ms", lit(500L)))
    val got = media.select(Multimodal.frameSampleMs(col("meta"), 100L, 4))
      .as[Seq[Long]].head()
    assert(got == Seq(0L, 100L, 200L, 300L))
  }
}
