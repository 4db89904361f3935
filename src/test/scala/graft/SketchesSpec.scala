package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Sketch invariants — the properties that make an APPROXIMATE structure
  * safe to ship: CMS never undercounts, Bloom never false-negatives, and
  * both collapse to exact answers when sized generously. */
class SketchesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // skewed occurrence stream: item "w0" 40 times ... "w19" 2 times
  private val stream =
    (0 until 20).flatMap(i => Seq.fill(2 + 2 * (19 - i))(s"w$i"))
  private val exact: Map[String, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("cms estimate is an overestimate for every seen item, exact when wide") {
    val items = stream.toDF("w")
    // width 8 is deliberately saturated (20 distinct keys ≫ capacity
    // ~46/ln2 per-row occupancy) — guard off to exercise the
    // overcount-only contract below the guard
    for ((width, guard) <- Seq(8 -> false, (1 << 16) -> true)) {
      val sk = Sketches.cmsBuild(items, col("w"), 4, width)
      val est = Sketches
        .cmsEstimate(items.distinct(), col("w"), sk, 4, width,
          failOnSaturation = guard)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est.keySet == exact.keySet)
      exact.foreach { case (w, c) =>
        assert(est(w) >= c, s"width=$width undercounted $w: ${est(w)} < $c")
      }
      if (width == (1 << 16))
        assert(est == exact, s"2^16 buckets for 20 items should be collision-free")
    }
    // narrow sketch MUST show collisions on this stream (else the
    // overestimate half of the property tested nothing)
    val skNarrow = Sketches.cmsBuild(items, col("w"), 4, 8)
    val estNarrow = Sketches
      .cmsEstimate(items.distinct(), col("w"), skNarrow, 4, 8,
        failOnSaturation = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.exists { case (w, c) => estNarrow(w) > c },
      "8 buckets for 20 items produced zero collisions — dead property")
  }

  test("cms saturation guard refuses to probe a data-swamped sketch (VERDICT r12 #3)") {
    // 20 distinct keys into width=8 fully occupies every hash row —
    // exactly the SCALE.md-r12 failure mode (w=2048 vs 20k keys) in
    // miniature. The DEFAULT estimate path must raise with the resize
    // rule, not return collision noise.
    val items = stream.toDF("w")
    val sk = Sketches.cmsBuild(items, col("w"), 4, 8)
    val ex = intercept[Exception] {
      Sketches.cmsEstimate(items.distinct(), col("w"), sk, 4, 8).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("saturated")),
      s"expected the saturation raise_error, got: $ex")
    // capacity arithmetic is what the message tells users to size by
    assert(Sketches.cmsCapacity(4, 2048) > 11000L &&
      Sketches.cmsCapacity(4, 2048) < 12500L)
  }

  test("cms estimate for an unseen item is >= 0 and bounded by bucket mass") {
    val sk = Sketches.cmsBuild(stream.toDF("w"), col("w"), 4, 1 << 16)
    val est = Sketches
      .cmsEstimate(Seq("never-seen").toDF("w"), col("w"), sk, 4, 1 << 16)
      .collect()
    assert(est.length == 1 && est(0).getLong(1) >= 0L)
  }

  test("kmv is exact below k, ~1/sqrt(k)-accurate above, partition-order-independent") {
    import org.apache.spark.sql.functions.col
    // below k: the sketch IS the distinct set
    val small = (0 until 50).map(i => s"v$i") ++ (0 until 50).map(i => s"v$i")
    val exactRow = Sketches.kmvDistinct(small.toDF("x"), col("x"), 256).head()
    assert(exactRow.getLong(1) == 50L && exactRow.getDouble(3) == 50.0)
    // above k: 2000 distinct, k=256 → expect within 3/sqrt(k) ≈ 19%
    val big = (0 until 2000).map(i => s"key$i")
    val est = Sketches.kmvDistinct(big.toDF("x"), col("x"), 256)
      .head().getDouble(3)
    assert(math.abs(est - 2000.0) / 2000.0 < 0.19,
      s"kmv estimate $est too far from 2000")
    // determinism: the k-minima set is a pure function of the value set —
    // partitioning and duplication must not move the estimate
    val shuffled = Sketches.kmvDistinct(
      (big ++ big).reverse.toDF("x").repartition(7), col("x"), 256)
      .head().getDouble(3)
    assert(shuffled == est)
  }

  test("bloom has no false negatives; generous m yields true negatives") {
    val state = (0 until 200).map(i => s"k$i").toDF("k")
    val probeKeys = (0 until 300).map(i => s"k$i")
    val bits = Sketches.bloomBuild(state, col("k"), 4, 1 << 14)
    val out = Sketches
      .bloomProbe(probeKeys.toDF("k"), col("k"), bits, 4, 1 << 14)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    (0 until 200).foreach(i =>
      assert(out(s"k$i") == 1, s"false negative on member k$i"))
    // 4·2^14 bits for 200 keys: essentially every non-member must miss
    val fp = (200 until 300).count(i => out(s"k$i") == 1)
    assert(fp < 10, s"implausible false-positive count at 16k-bit m: $fp")
    assert((200 until 300).exists(i => out(s"k$i") == 0))
  }

  test("bloom saturates safely: tiny m flags everything, never errors") {
    val state = (0 until 200).map(i => s"k$i").toDF("k")
    val bits = Sketches.bloomBuild(state, col("k"), 4, 4)
    val out = Sketches
      .bloomProbe(Seq("zzz").toDF("k"), col("k"), bits, 4, 4)
      .collect()
    assert(out.length == 1 && out(0).getInt(1) == 1)
  }

  test("bloomProbe preserves the probe's columns") {
    val state = Seq("a", "b").toDF("k")
    val bits = Sketches.bloomBuild(state, col("k"), 4, 64)
    val probe = Seq(("a", 1), ("z", 2)).toDF("k", "payload")
    val out = Sketches.bloomProbe(probe, col("k"), bits, 4, 64)
    assert(out.columns.toSeq == Seq("k", "payload", "maybe_member"))
    val rows = out.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(rows.find(_._1 == "a").get._3 == 1)
  }
}
