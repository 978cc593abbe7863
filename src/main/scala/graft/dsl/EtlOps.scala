package graft.dsl

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The blueetl-core dataframe accessor surface (`df.etl.*` — reference:
  * blueetl-core, demonstrated in doc/source/notebooks/
  * 01_core_transformations.ipynb) as an implicit extension:
  * `import graft.dsl.EtlOps._` then `df.etl.q(...)`, `.one()`, `.first()`,
  * `.addConditions(...)`, `.labels(...)`.
  *
  * Index-level vs column unification is free (no index concept — SURVEY
  * §2.2 P1); `multi_index` is presentation-only, key columns simply lead.
  */
object EtlOps {

  implicit final class EtlDataFrame(private val df: DataFrame) extends AnyVal {
    def etl: Etl = new Etl(df)
  }

  final class Etl(private val df: DataFrame) {

    /** Filter by a spec (`etl.q`). */
    def q(spec: QSpec): DataFrame = Q.q(df, spec)

    /** Filter by the dict form (parsed), e.g. from config. */
    def q(spec: Map[String, Any]): DataFrame = Q.q(df, Q.parse(spec))

    /** Exactly-one-row fetch (`etl.one`): throws unless a single row
      * matches (reference use: extract/windows.py:277-287).
      */
    def one(spec: QSpec = QTrue): DataFrame = {
      val out = Q.q(df, spec)
      val rows = out.limit(2).collect()
      require(rows.length == 1, s"expected exactly 1 row, got ${rows.length}")
      out
    }

    def oneRow(spec: QSpec = QTrue): Row = one(spec).collect()(0)

    /** First-row fetch after optional filter (`etl.first`). Order must be
      * established by the caller — Spark frames are unordered.
      */
    def firstRow(spec: QSpec = QTrue, orderBy: Seq[String] = Nil): Row = {
      val filtered = Q.q(df, spec)
      val ordered =
        if (orderBy.nonEmpty) filtered.orderBy(orderBy.map(col): _*) else filtered
      ordered.head()
    }

    /** Prepend constant key columns (`etl.add_conditions` /
      * `insert_columns` — reference: features.py:434-439).
      */
    def addConditions(conditions: Seq[(String, Any)]): DataFrame = {
      val keyCols = conditions.map { case (k, v) => lit(v).as(k) }
      df.select(keyCols ++ df.columns.map(col): _*)
    }

    /** Drop key columns (`etl.remove_conditions`). */
    def removeConditions(names: Seq[String]): DataFrame = df.drop(names: _*)

    /** Keep only these key columns + data columns
      * (`etl.keep_conditions`).
      */
    def keepConditions(keys: Seq[String], dataCols: Seq[String]): DataFrame =
      df.select((keys ++ dataCols).map(col): _*)

    /** Distinct values of one key column (`etl.labels`). */
    def labels(name: String): Seq[Any] =
      df.select(name).distinct().orderBy(col(name)).collect().map(_.get(0)).toSeq

    /** Distinct key tuples over several columns (`etl.groups`). */
    def groups(names: Seq[String]): DataFrame =
      df.select(names.map(col): _*).distinct().orderBy(names.map(col): _*)

    /** Pandas-style conditional selection helper: filter by a plain
      * Column predicate but keep the etl chaining style.
      */
    def where(cond: Column): DataFrame = df.filter(cond)

    /** Row iteration (`etl.itertuples` — reference notebooks,
      * 01_core_transformations.ipynb): driver-side STREAMING via
      * `toLocalIterator` — one partition resident at a time, never a full
      * collect, so it holds at any frame size the driver can consume
      * row-by-row. Spark frames are unordered; pass `orderBy` when order
      * matters (pandas iterates in index order).
      */
    def itertuples(orderBy: Seq[String] = Nil): Iterator[Row] = {
      val ordered =
        if (orderBy.nonEmpty) df.orderBy(orderBy.map(col): _*) else df
      import scala.jdk.CollectionConverters._
      ordered.toLocalIterator().asScala
    }

    /** (index, row) iteration (`etl.iter`): positional index stands in for
      * the pandas row index (no index concept here — SURVEY §2.2 P1).
      */
    def iter(orderBy: Seq[String] = Nil): Iterator[(Long, Row)] =
      itertuples(orderBy).zipWithIndex.map { case (r, i) => (i.toLong, r) }

    /** Dict iteration (`etl.iterdict`): column-name → value maps. */
    def iterdict(orderBy: Seq[String] = Nil): Iterator[Map[String, Any]] = {
      val names = df.columns
      itertuples(orderBy).map(r =>
        names.iterator.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap)
    }

    /** (key, group-frame) iteration (`etl.groupby_iter` — reference use:
      * extract/report.py:142, analysis.py:165). Key tuples are collected
      * to the driver in key order (the reference iterates groups
      * driver-side too — the contract is low-cardinality grouping
      * columns); each group's frame is a LAZY filtered view, so the heavy
      * per-group work stays distributed.
      */
    def groupbyIter(keys: Seq[String]): Iterator[(Row, DataFrame)] = {
      val keySchema = StructType(keys.map(k => df.schema(k)))
      // atomic keys keep the literal-predicate path — those filters push
      // into a parquet scan (PushedFilters / row-group pruning), which a
      // join can never do. Only array/struct keys (whose collected Scala
      // form `functions.lit` rejects) take the broadcast one-row semi-join.
      val allAtomic = keySchema.fields.forall { f =>
        import org.apache.spark.sql.types.{ArrayType, MapType, StructType => ST}
        f.dataType match {
          case _: ArrayType | _: MapType | _: ST => false
          case _ => true
        }
      }
      groups(keys).collect().iterator.map { kr =>
        if (allAtomic) {
          val cond = keys.zipWithIndex.map { case (k, i) =>
            val v = kr.get(i)
            if (v == null) col(k).isNull else col(k) === lit(v)
          }.reduce(_ && _)
          (kr, df.filter(cond))
        } else {
          val one = df.sparkSession.createDataFrame(
            java.util.Collections.singletonList(kr), keySchema)
          val cond = keys.map(k => df(k) <=> one(k)).reduce(_ && _)
          (kr, df.join(broadcast(one), cond, "leftsemi"))
        }
      }
    }

    /** Group by every column except `excluded` (`etl.groupby_except`). */
    def groupbyExcept(excluded: Seq[String]): Iterator[(Row, DataFrame)] =
      groupbyIter(df.columns.filterNot(excluded.contains).toIndexedSeq)

    /** Per-group transform, results unioned (`etl.groupby_apply_parallel`
      * / `groupby_run_parallel`). All groups' plans are combined into ONE
      * union, so a single action schedules every group's distributed work
      * concurrently — the JVM analog of the reference's process pool
      * (features.py:478-496). Each group's branch re-filters the source
      * frame: for many groups prefer a native groupBy aggregation; this
      * is the escape hatch for per-group logic a groupBy can't express.
      *
      * With ZERO groups (empty input) the result is an empty frame with
      * an EMPTY schema — `fn`'s output schema is unknowable without a
      * group to apply it to (pandas groupby-apply degrades the same way);
      * callers that need a typed empty frame must branch on
      * `df.isEmpty` themselves.
      */
    def groupbyApply(keys: Seq[String])(fn: (Row, DataFrame) => DataFrame): DataFrame =
      groupbyIter(keys).map { case (k, g) => fn(k, g) }
        .reduceOption(_ unionByName _)
        .getOrElse(df.sparkSession.emptyDataFrame)
  }
}
