package graft.engine

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** X1-registry pairwise features (class-level correlation and VR/VP
  * distance matrices — reference runs these per neuron_class inside the
  * features engine: external/bluecv/neuron_class.py:47-49 and
  * comparison.py:11-21 via features.py:392-446). The keyed blocked
  * expansion must equal the per-class unkeyed path that a12c/a16c gate
  * against DuckDB, and pairs must never cross class/window groups.
  */
class FeaturePairwiseSpec extends SparkSuite {

  import org.apache.spark.sql.DataFrame

  // two classes × two windows of deterministic spikes; gids overlap the
  // classes' id ranges so cross-group leakage would be visible
  private lazy val report: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = for {
      nc <- Seq("even", "odd")
      win <- Seq("w1", "w2")
      gid <- 0L until 12L
      _ <- 0 until (5 + rnd.nextInt(20))
    } yield (0, 0, nc, win, 0, rnd.nextDouble() * 24.0 * 3600e6, gid)
    rows.toDF("simulation_id", "circuit_id", "neuron_class", "window",
      "trial", "time", "gid")
  }

  private val groupby = Seq("simulation_id", "circuit_id", "neuron_class", "window")

  private def ctx(params: Map[String, Any]) = FeatureCtx(
    spark, groupby, params, report, null, null, null)

  private def rows(df: DataFrame): Set[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.head, cols.tail: _*).collect().map(_.toString).toSet
  }

  test("pairwise_correlation: registry-resolvable, keyed == per-group unkeyed") {
    val fn = FeatureFns.resolve("pairwise_correlation")
    val out = fn.compute(ctx(Map(
      "bin_size" -> 3600e6, "n_bins" -> 24, "n_blocks" -> 3)))("by_pair")
    assert(out.columns.toSeq ===
      groupby ++ Seq("gid1", "gid2", "r"))
    // every (class, window) group independently through the unkeyed path
    val expected = (for {
      nc <- Seq("even", "odd"); win <- Seq("w1", "w2")
    } yield {
      val binned = report
        .filter(col("neuron_class") === nc && col("window") === win)
        .withColumn("bin", floor(col("time") / lit(3600e6)).cast("int"))
        .filter(col("bin") >= 0 && col("bin") < 24)
        .groupBy("gid", "bin").agg(count(lit(1)).as("cnt"))
      graft.queries.Spikes.pairwiseCorrelation(binned, nBins = 24, nBlocks = 3)
        .select(lit(0).as("simulation_id"), lit(0).as("circuit_id"),
          lit(nc).as("neuron_class"), lit(win).as("window"),
          col("gid1"), col("gid2"), col("r"))
    }).reduce(_ unionByName _)
    assert(rows(out) === rows(expected))
    // 12 gids per group → C(12,2) pairs, no cross-group pairs
    assert(out.count() === 4L * 66)
  }

  test("pairwise_distances: van_rossum feature == direct per-class computation") {
    val tau = 3600e6
    val out = FeatureFns.resolve("pairwise_distances").compute(ctx(Map(
      "metric" -> "van_rossum", "tau" -> tau, "n_blocks" -> 3)))("by_pair")
    assert(out.columns.toSeq === groupby ++ Seq("gid1", "gid2", "vr2"))
    val expected = (for {
      nc <- Seq("even", "odd"); win <- Seq("w1", "w2")
    } yield {
      val trains = report
        .filter(col("neuron_class") === nc && col("window") === win)
        .groupBy("gid")
        .agg(sort_array(collect_list(col("time").cast("double"))).as("train"))
        .withColumn("kk", graft.queries.Spikes.vrKernel("train", "train", tau))
      graft.queries.Spikes.blockedSelfPairs(trains, nBlocks = 3)
        .select(lit(0).as("simulation_id"), lit(0).as("circuit_id"),
          lit(nc).as("neuron_class"), lit(win).as("window"),
          col("gid1"), col("gid2"),
          (col("kk1") + col("kk2") -
            lit(2) * graft.queries.Spikes.vrKernel("train1", "train2", tau)).as("vr2"))
    }).reduce(_ unionByName _)
    assert(rows(out) === rows(expected))
    assert(out.count() === 4L * 66)
  }

  test("pairwise_distances: victor_purpura through the codegen kernel") {
    val q = 1.0 / 3600e6
    val out = FeatureFns.resolve("pairwise_distances").compute(ctx(Map(
      "metric" -> "victor_purpura", "q" -> q, "n_blocks" -> 3)))("by_pair")
    assert(out.columns.toSeq === groupby ++ Seq("gid1", "gid2", "vp"))
    assert(out.count() === 4L * 66)
    // spot-check one pair against the standalone expression
    graft.functions.GraftFunctions.register(spark)
    val one = out.filter(col("neuron_class") === "even" && col("window") === "w1" &&
      col("gid1") === 0 && col("gid2") === 1).collect()
    assert(one.length === 1)
    val trains = report
      .filter(col("neuron_class") === "even" && col("window") === "w1" &&
        col("gid").isin(0L, 1L))
      .groupBy("gid")
      .agg(sort_array(collect_list(col("time").cast("double"))).as("train"))
      .orderBy("gid").collect().map(_.getSeq[Double](1))
    val direct = spark.sql(
      s"SELECT vp_distance(array(${trains(0).mkString(",")}), " +
        s"array(${trains(1).mkString(",")}), ${q}d) AS vp").collect()(0).getDouble(0)
    assert(math.abs(one(0).getAs[Double]("vp") - direct) < 1e-12)
  }

  test("unknown metric fails loudly") {
    val ex = intercept[IllegalArgumentException] {
      FeatureFns.resolve("pairwise_distances").compute(ctx(Map("metric" -> "nope")))
    }
    assert(ex.getMessage.contains("unknown metric"))
  }
}
