package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) joins at scale: assign point events to intervals
  * (`lo <= t < hi`) without broadcasting either side.
  *
  * The engine's window-assignment join (J4) broadcasts the intervals —
  * right when they are config-sized (windows × trials). When BOTH sides
  * are data-scale (per-entity dynamic intervals, sessions, validity
  * ranges), a broadcast nested loop is O(events × intervals) and the
  * broadcast itself may not fit. The standard restatement: bin the time
  * axis into buckets of width ≥ the longest interval, explode each
  * interval to the buckets it covers (≤ 2 for intervals up to one bucket
  * wide), tag each event with its single bucket, and EQUI-join on
  * (keys…, bucket) with the exact range as a residual filter. Both sides
  * shuffle once by bucket hash; no all-pairs work anywhere. A hot bucket
  * is ordinary join skew — AQE's skew-join split applies.
  */
object RangeJoin {

  /** Join `events` to `intervals` on `keys` equality plus
    * `lo <= timeCol < hi`. `binWidth` defaults to the longest interval
    * (computed with one tiny aggregate job); pass it explicitly when the
    * caller already knows the bound. Output: event columns + the matched
    * interval's columns (both sides' `keys` merged).
    */
  def binned(
      events: DataFrame,
      timeCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      keys: Seq[String] = Nil,
      binWidth: Option[Double] = None): DataFrame = {
    val width = binWidth.getOrElse {
      val row = intervals.agg(max(col(hiCol) - col(loCol))).collect()(0)
      require(!row.isNullAt(0), "intervals is empty: cannot derive binWidth (pass binWidth explicitly or supply a non-empty intervals frame)")
      val w = row.getDouble(0)
      require(w > 0, s"intervals must have positive extent, got max width $w")
      w
    }
    val ivB = intervals.withColumn(
      "_bin",
      explode(sequence(
        floor(col(loCol) / width).cast("long"),
        floor(col(hiCol) / width).cast("long"))))
    val evB = events.withColumn("_bin", floor(col(timeCol) / width).cast("long"))
    val cond: Column = (keys :+ "_bin")
      .map(k => evB(k) === ivB(k))
      .reduce(_ && _) &&
      evB(timeCol) >= ivB(loCol) && evB(timeCol) < ivB(hiCol)
    val dropRight = keys :+ "_bin"
    dropRight.foldLeft(evB.join(ivB, cond))((df, k) => df.drop(ivB(k)))
      .drop("_bin")
  }
}
