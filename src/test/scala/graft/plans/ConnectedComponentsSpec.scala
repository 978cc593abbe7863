package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSuite {
  import spark.implicits._

  private def symmetric(pairs: Seq[(Long, Long)]) = {
    val p = pairs.toDF("a", "b")
    p.union(p.select(col("b"), col("a")))
  }

  test("minLabel labels every component by its minimum vertex") {
    // components: {1,2,3,4} (path), {5,6} (edge), {7} (isolated)
    val vertices = (1L to 7L).toDF("id")
    val edges = symmetric(Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)))
    val got = ConnectedComponents.minLabel(vertices, "id", edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("idCol/labelCol named like the edge columns don't collide") {
    // the edge-frame contract names are "a"/"b"; a caller whose vertex id
    // column is itself "a" (or label target "b") must get the same answer
    val vertices = (1L to 5L).toDF("a")
    val edges = symmetric(Seq((1L, 2L), (4L, 5L)))
    val got = ConnectedComponents.minLabel(vertices, "a", edges, labelCol = "b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 4L))
  }

  test("one Spark action per propagation round (convergence via observe)") {
    // a path of length 8: label 1 must travel 7 hops, so the round count
    // is known (diameter) and the action budget per round is checkable.
    // (Job count is NOT a usable proxy: AQE materializes each shuffle
    // stage as its own job — count Dataset actions instead.)
    val n = 8L
    val vertices = (1L to n).toDF("id")
    val edges = symmetric((1L until n).map(i => (i, i + 1)))
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        actions.add(funcName)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val labels = ConnectedComponents.minLabel(vertices, "id", edges)
      assert(labels.agg(max("label")).head.getLong(0) === 1L)
      // listener events are async: wait until the stream goes quiet
      var last = -1
      while (actions.size != last) { last = actions.size; Thread.sleep(300) }
      val counts = actions.toArray(Array.empty[String]).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      // the old shape's tell: a compare-and-count action every round
      assert(counts.getOrElse("count", 0) === 0,
        s"convergence must not run a count per round: $counts")
      // 7 improving rounds + 1 fixed-point round + 2 setup checkpoints,
      // + the max() assertion's own action
      assert(counts.getOrElse("localCheckpoint", 0) <= 10, counts.toString)
    } finally spark.listenerManager.unregister(listener)
  }
}
