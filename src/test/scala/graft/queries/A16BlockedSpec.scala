package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The blocked full-class path for A16 distances: blockedSelfPairs must
  * expand every unordered pair exactly once through EQUI-joins (bounded
  * per-task memory at any class size — the a12 blocking applied to train
  * pairs), and the Van Rossum / Victor-Purpura kernels over it must equal
  * the direct theta-join formulation.
  */
class A16BlockedSpec extends SparkSuite {

  private def trains(nGids: Int, spikesPer: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until nGids).map { g =>
      (g.toLong, Array.fill(spikesPer)(rnd.nextDouble() * 1000.0).sorted.toSeq)
    }.toDF("gid", "train")
  }

  test("1k gids: exact pair count, no nested-loop join, bounded blocks") {
    val t = trains(1000, 5)
    val pairs = Spikes.blockedSelfPairs(t, nBlocks = 8)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "pair expansion must be equi-joins")
    assert(!plan.contains("CartesianProduct"))
    assert(pairs.count() === 1000L * 999 / 2)
    // normalized: gid1 < gid2 everywhere, no duplicates
    assert(pairs.filter(col("gid1") >= col("gid2")).count() === 0)
    assert(pairs.select("gid1", "gid2").distinct().count() === 1000L * 999 / 2)
  }

  test("payload columns swap together with the gid normalization") {
    val t = trains(40, 3).withColumn("tag", concat(lit("g"), col("gid")))
    val pairs = Spikes.blockedSelfPairs(t, nBlocks = 4)
    val bad = pairs.filter(
      (col("tag1") !== concat(lit("g"), col("gid1"))) ||
        (col("tag2") !== concat(lit("g"), col("gid2")))).count()
    assert(bad === 0)
  }

  test("blocked Van Rossum equals the direct theta-join formulation") {
    val tau = 250.0
    val t = trains(40, 4)
      .withColumn("kk",
        expr(s"aggregate(train, 0D, (acc, x) -> acc + " +
          s"aggregate(train, 0D, (a2, y) -> a2 + exp(-abs(x - y) / ${tau}D)))"))
    val blocked = Spikes.blockedSelfPairs(t, nBlocks = 4)
      .select(col("gid1"), col("gid2"),
        (col("kk1") + col("kk2") - lit(2) *
          expr(s"aggregate(train1, 0D, (acc, x) -> acc + " +
            s"aggregate(train2, 0D, (a2, y) -> a2 + exp(-abs(x - y) / ${tau}D)))")).as("vr2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // direct: per-event theta join (the pre-blocking shape), small enough here
    val ev = t.select(col("gid"), explode(col("train")).as("time"))
    val evB = ev.select(col("gid").as("gid_b"), col("time").as("time_b"))
    val kern = exp(-abs(col("time") - col("time_b")) / lit(tau))
    val selfk = ev.join(evB, col("gid") === col("gid_b"))
      .groupBy("gid").agg(sum(kern).as("kk"))
    val direct = ev.join(evB, col("gid") < col("gid_b"))
      .groupBy(col("gid").as("gid1"), col("gid_b").as("gid2"))
      .agg(sum(kern).as("kk"))
      .join(selfk.select(col("gid").as("gid1"), col("kk").as("kk1")), "gid1")
      .join(selfk.select(col("gid").as("gid2"), col("kk").as("kk2")), "gid2")
      .select(col("gid1"), col("gid2"),
        (col("kk1") + col("kk2") - lit(2) * col("kk")).as("vr2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(blocked.keySet === direct.keySet)
    blocked.foreach { case (k, v) =>
      assert(math.abs(v - direct(k)) < 1e-9, s"pair $k: $v vs ${direct(k)}")
    }
  }

  test("blocked Victor-Purpura equals the direct theta-join formulation") {
    graft.functions.GraftFunctions.register(spark)
    val q = 0.002
    val t = trains(30, 4)
    val blocked = Spikes.blockedSelfPairs(t, nBlocks = 3)
      .select(col("gid1"), col("gid2"),
        expr(s"vp_distance(train1, train2, ${q}d)").as("vp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val t2 = t.select(col("gid").as("gid2"), col("train").as("train2"))
    val direct = t.join(t2, col("gid") < col("gid2"))
      .select(col("gid").as("gid1"), col("gid2"),
        expr(s"vp_distance(train, train2, ${q}d)").as("vp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(blocked === direct)
  }
}
