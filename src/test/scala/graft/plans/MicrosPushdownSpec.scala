package graft.plans

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** MicrosPushdown: time-window predicates over the derived micros column
  * must reach the parquet scan as bare `ts` comparisons (row-group
  * pruning at scale), with bit-identical results across every comparison
  * op, both on-disk ts encodings, the double-time path, and the guards
  * (DST zones, non-integral equality) falling back instead of rewriting.
  */
class MicrosPushdownSpec extends SparkSuite {

  private def pushed(df: DataFrame): String = {
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
  }

  private lazy val dualDir: String = {
    val dir = Files.createTempDirectory("graft-push").toString
    val originNs = Tables.EventsEpochMicros * 1000L
    val base = spark.range(1000)
      .select(
        col("id").as("event_id"),
        // ~100 s apart with sub-µs jitter; div/truncation paths exercised
        (lit(originNs) + col("id") * lit(100000000000L) +
          pmod(abs(hash(col("id"))), lit(999983L))).as("ts_ns"),
        pmod(col("id"), lit(7L)).as("user_id"),
        lit("e").as("event_type"),
        (col("id") * 1.5).as("value"))
    base.select(col("event_id"), col("ts_ns").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/nanos/events.parquet")
    base.select(col("event_id"),
        timestamp_micros(expr("ts_ns div 1000")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/micros/events.parquet")
    dir
  }

  test("time window on spikes pushes bare ts bounds to the parquet scan") {
    val q = Tables.spikes(spark, sf0001)
      .filter(col("time") >= 3600000000L && col("time") < 7200000000L)
    val p = pushed(q)
    assert(p.contains("GreaterThanOrEqual(ts,"), p)
    assert(p.contains("LessThan(ts,"), p)
    // and the result equals the unoptimized evaluation
    val expected = Tables.spikes(spark, sf0001).collect()
      .count(r => r.getLong(0) >= 3600000000L && r.getLong(0) < 7200000000L)
    assert(q.count() === expected)
  }

  test("long-nanos encoding: the div-1000 chain pushes scaled ts bounds") {
    val q = Tables.spikes(spark, s"$dualDir/nanos")
      .filter(col("time") >= 10000000000L && col("time") <= 20000000000L)
    val p = pushed(q)
    assert(p.contains("GreaterThanOrEqual(ts,"), p)
    // <= v over div is rewritten to < (v+1)*1000 on the nanos column
    assert(p.contains("LessThan(ts,"), p)
    val expected = Tables.spikes(spark, s"$dualDir/nanos").collect()
      .count(r => r.getLong(0) >= 10000000000L && r.getLong(0) <= 20000000000L)
    assert(expected > 0 && q.count() === expected)
  }

  test("every comparison op matches driver-side evaluation on both encodings") {
    for (enc <- Seq("nanos", "micros")) {
      val sp = Tables.spikes(spark, s"$dualDir/$enc")
      val times = sp.select("time").collect().map(_.getLong(0))
      // boundary-heavy literals: exact data values and off-by-one
      val probes = Seq(times(17), times(17) + 1, times(17) - 1, 0L, times.max)
      for (v <- probes) {
        assert(sp.filter(col("time") >= v).count() === times.count(_ >= v), s"$enc >= $v")
        assert(sp.filter(col("time") > v).count() === times.count(_ > v), s"$enc > $v")
        assert(sp.filter(col("time") <= v).count() === times.count(_ <= v), s"$enc <= $v")
        assert(sp.filter(col("time") < v).count() === times.count(_ < v), s"$enc < $v")
        assert(sp.filter(col("time") === v).count() === times.count(_ == v), s"$enc == $v")
      }
    }
  }

  test("double-time path (EventsAdapter): fractional literals keep exact semantics") {
    val ad = new graft.engine.EventsAdapter
    val fr = ad.spikes(spark, s"$dualDir/micros/events.parquet")
    val times = fr.select("time").collect().map(_.getDouble(0))
    val mid = times.sorted.apply(times.length / 2)
    for (v <- Seq(mid, mid + 0.5, mid - 0.5, math.floor(mid) + 0.25)) {
      assert(fr.filter(col("time") >= v).count() === times.count(_ >= v), s">= $v")
      assert(fr.filter(col("time") > v).count() === times.count(_ > v), s"> $v")
      assert(fr.filter(col("time") <= v).count() === times.count(_ <= v), s"<= $v")
      assert(fr.filter(col("time") < v).count() === times.count(_ < v), s"< $v")
    }
    // integral double bounds also get pushed all the way to ts
    val p = pushed(fr.filter(col("time") >= 1.0E9 && col("time") < 2.0E9))
    assert(p.contains("GreaterThanOrEqual(ts,"), p)
    assert(p.contains("LessThan(ts,"), p)
    // non-integral equality is NOT rewritten (guard) but stays correct
    assert(fr.filter(col("time") === mid + 0.5).count() === times.count(_ == mid + 0.5))
  }

  test("DST session zone: rewrite bails, results stay correct") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val sp = Tables.spikes(spark, s"$dualDir/micros")
      val q = sp.filter(col("time") >= 10000000000L)
      // the ntz→tz layer is no longer a fixed shift: no bare-ts pushdown
      assert(!pushed(q).contains("GreaterThanOrEqual(ts,"), pushed(q))
      val times = sp.select("time").collect().map(_.getLong(0))
      assert(q.count() === times.count(_ >= 10000000000L))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("Add unwrap bails on the Long.MinValue literal instead of wrapping") {
    // x + MinValue >= 0 ⇔ x >= 2^63: unsatisfiable for longs. The naive
    // rewrite addExact(v, -k) wraps -MinValue back to MinValue and emits
    // x >= v - 2^63 (here: x >= MinValue, i.e. ALL rows).
    import spark.implicits._
    val df = (0L until 100L).toDF("x")
    val q = df.filter(col("x") + lit(Long.MinValue) >= lit(0L))
    assert(q.count() === 0L)
    // sanity: a benign offset on the same shape still rewrites correctly
    assert(df.filter(col("x") + lit(5L) >= lit(100L)).count() === 5L)
  }
}
