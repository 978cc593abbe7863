package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared synthetic fixtures for the routing specs: manifold-shaped cell
  * centroids (cells cluster around ~√nCells regions — the structure
  * k-means-derived IVF cells have on real embedding corpora) and queries
  * drawn near cell centroids. Deterministic (hash-derived, no RNG state)
  * so every suite regenerates identical frames.
  */
object RoutingFixtures {

  val dims = 64

  def centroids(spark: SparkSession, nCells: Int): DataFrame = {
    val nRegions = math.ceil(math.sqrt(nCells.toDouble)).toInt
    spark.range(nCells)
      .withColumn("region", pmod(abs(hash(col("id") * 31)), lit(nRegions)))
      .select(
        col("id").cast("int").as("cell"),
        expr(s"""transform(sequence(0, ${dims - 1}),
                  d -> cast(hash(region * 64 + d) / 2.147483647E9 * 0.8
                          + hash(id * 64 + d) / 2.147483647E9 * 0.3 as double))""")
          .as("centroid"))
  }

  /** An indexable corpus with MANY vectors per cell: each vector sits
    * near its home cell's centroid (label = home), so exact top-k
    * neighbors concentrate in-cell and the end-to-end recall measurement
    * has real structure to find. Deterministic like the rest.
    */
  def vectors(spark: SparkSession, nVec: Int, nCells: Int): DataFrame = {
    val nRegions = math.ceil(math.sqrt(nCells.toDouble)).toInt
    spark.range(nVec)
      .withColumn("home", pmod(abs(hash(col("id") * 7)), lit(nCells)))
      .withColumn("region", pmod(abs(hash(col("home") * 31)), lit(nRegions)))
      .select(
        col("id").as("vec_id"),
        col("home").cast("int").as("label"),
        expr(s"""transform(sequence(0, ${dims - 1}),
                  d -> cast(hash(region * 64 + d) / 2.147483647E9 * 0.8
                          + hash(home * 64 + d) / 2.147483647E9 * 0.3
                          + hash(id * 64 + d) / 2.147483647E9 * 0.05 as double))""")
          .as("embedding"))
  }

  def queries(spark: SparkSession, nQ: Int, nCells: Int): DataFrame = {
    val nRegions = math.ceil(math.sqrt(nCells.toDouble)).toInt
    spark.range(nQ)
      .withColumn("home", pmod(abs(hash(col("id") * 13)), lit(nCells)))
      .withColumn("hr", pmod(abs(hash(col("home") * 31)), lit(nRegions)))
      .select(
        col("id").as("q_id"),
        expr(s"""transform(sequence(0, ${dims - 1}),
                  d -> cast((hash(hr * 64 + d) / 2.147483647E9 * 0.8
                           + hash(home * 64 + d) / 2.147483647E9 * 0.3) * 0.9
                          + hash(id * 64 + d) / 2.147483647E9 * 0.2 as double))""")
          .as("q_emb"))
  }
}
