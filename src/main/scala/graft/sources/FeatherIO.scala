package graft.sources

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.dictionary.DictionaryEncoder
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Feather v2 (Arrow IPC file) ↔ Spark DataFrame, using the Arrow Java
  * libraries Spark already ships — the reference's feather cache store
  * (store/feather.py: pandas `to_feather`/`read_feather`, i.e. pyarrow's
  * IPC file writer). Lets this engine READ an existing blueetl feather
  * cache (the migration story) and write caches blueetl can read back.
  *
  * Semantics mirrored from store/feather.py:
  *  - pandas indexes are serialized as `_index:<i>:<name>` columns
  *    (feather.py:17-48 `_index_to_columns`); on read they surface as
  *    plain columns named `<name>` (or `level_<i>` when unnamed) — the
  *    relational equivalent of `_columns_to_index`;
  *  - pandas categoricals arrive dictionary-encoded and are decoded to
  *    plain strings.
  *
  * Cache frames are driver-sized by design (the reference's cache is a
  * single-machine pandas file per frame); dataset-scale interchange stays
  * parquet.
  */
object FeatherIO {

  def read(spark: SparkSession, path: String): DataFrame = {
    val alloc = new RootAllocator()
    val ch = java.nio.channels.FileChannel.open(Paths.get(path))
    val reader = new ArrowFileReader(ch, alloc)
    try {
      val root = reader.getVectorSchemaRoot
      val fields = root.getSchema.getFields.asScala.toSeq
      val rows = Seq.newBuilder[Row]
      while (reader.loadNextBatch()) {
        val vectors = root.getFieldVectors.asScala.toSeq.map { v =>
          Option(v.getField.getDictionary) match {
            case Some(enc) =>
              val dict = reader.getDictionaryVectors.get(enc.getId)
              DictionaryEncoder.decode(v, dict)
            case None => v
          }
        }
        try {
          for (i <- 0 until root.getRowCount)
            rows += Row.fromSeq(vectors.map(cell(_, i)))
        } finally vectors.zip(root.getFieldVectors.asScala).foreach {
          case (decoded, orig) => if (decoded ne orig) decoded.close()
        }
      }
      val schema = StructType(fields.map(f => StructField(
        renamed(f.getName), sparkType(f), nullable = true)))
      spark.createDataFrame(spark.sparkContext.parallelize(rows.result(), 1), schema)
    } finally { reader.close(); ch.close(); alloc.close() }
  }

  /** blueetl's index-column convention → plain column name. */
  private def renamed(n: String): String =
    if (n.startsWith("_index:")) {
      val parts = n.split(":", 3)
      if (parts.length == 3 && parts(2).nonEmpty) parts(2) else s"level_${parts(1)}"
    } else n

  private def sparkType(f: Field): DataType = {
    val t = Option(f.getDictionary)
      .map(_ => new ArrowType.Utf8: ArrowType) // categoricals decode to strings
      .getOrElse(f.getType)
    t match {
      case i: ArrowType.Int if i.getBitWidth <= 32 => IntegerType
      case _: ArrowType.Int => LongType
      case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.SINGLE =>
        FloatType
      case _: ArrowType.FloatingPoint => DoubleType
      case _: ArrowType.Utf8 | _: ArrowType.LargeUtf8 => StringType
      case _: ArrowType.Bool => BooleanType
      case other => throw new IllegalArgumentException(
        s"$other not supported by the feather store (column ${f.getName})")
    }
  }

  private def cell(v: ValueVector, i: Int): Any =
    if (v.isNull(i)) null
    else v match {
      case x: TinyIntVector => x.get(i).toInt
      case x: SmallIntVector => x.get(i).toInt
      case x: IntVector => x.get(i)
      case x: BigIntVector => x.get(i)
      case x: UInt1Vector => x.get(i).toInt
      case x: UInt2Vector => x.get(i).toInt
      case x: UInt4Vector => x.get(i)
      case x: UInt8Vector => x.get(i)
      case x: Float4Vector => x.get(i)
      case x: Float8Vector => x.get(i)
      case x: VarCharVector => new String(x.get(i), "UTF-8")
      case x: LargeVarCharVector => new String(x.get(i), "UTF-8")
      case x: BitVector => x.get(i) == 1
      case other => throw new IllegalArgumentException(
        s"feather read: unsupported vector ${other.getClass.getSimpleName}")
    }

  /** Rows per Arrow record batch on write. Bounds driver memory: the
    * writer holds one batch of vectors plus one fetched partition
    * (`toLocalIterator`), never the whole frame.
    */
  private[graft] val WriteBatchRows: Int = 1 << 16

  def write(df: DataFrame, path: String): Unit =
    write(df, path, WriteBatchRows)

  private[graft] def write(df: DataFrame, path: String, batchRows: Int): Unit = {
    val sparkSchema = df.schema
    val alloc = new RootAllocator()
    val fields = sparkSchema.fields.map { f =>
      val at: ArrowType = f.dataType match {
        case IntegerType => new ArrowType.Int(32, true)
        case LongType => new ArrowType.Int(64, true)
        case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
        case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
        case StringType => new ArrowType.Utf8
        case BooleanType => new ArrowType.Bool
        case other => throw new IllegalArgumentException(
          s"feather write: unsupported Spark type $other (column ${f.name})")
      }
      new Field(f.name, FieldType.nullable(at), null)
    }
    val root = VectorSchemaRoot.create(new Schema(fields.toSeq.asJava), alloc)
    Files.createDirectories(Paths.get(path).toAbsolutePath.getParent)
    val out = java.nio.channels.FileChannel.open(
      Paths.get(path),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    val writer = new ArrowFileWriter(root, null, out)
    try {
      writer.start()
      // stream one record batch at a time: a misconfigured data-scale frame
      // routed through the feather store degrades to a slow sequential
      // write, not a driver OOM (read side already loops loadNextBatch)
      val it = df.toLocalIterator()
      val batch = new scala.collection.mutable.ArrayBuffer[Row](batchRows)
      var wroteAny = false
      while (it.hasNext || !wroteAny) {
        batch.clear()
        while (it.hasNext && batch.length < batchRows) batch += it.next()
        val n = batch.length
        root.allocateNew()
        for ((f, ci) <- sparkSchema.fields.zipWithIndex) {
          val vec = root.getVector(ci)
          var ri = 0
          while (ri < n) {
            val value = batch(ri).get(ci)
            if (value == null) vec.setNull(ri)
            else (vec, value) match {
              case (x: IntVector, v: Int) => x.setSafe(ri, v)
              case (x: BigIntVector, v: Long) => x.setSafe(ri, v)
              case (x: Float4Vector, v: Float) => x.setSafe(ri, v)
              case (x: Float8Vector, v: Double) => x.setSafe(ri, v)
              case (x: VarCharVector, v: String) => x.setSafe(ri, v.getBytes("UTF-8"))
              case (x: BitVector, v: Boolean) => x.setSafe(ri, if (v) 1 else 0)
              case (x, v) => throw new IllegalArgumentException(
                s"feather write: $v into ${x.getClass.getSimpleName}")
            }
            ri += 1
          }
          vec.setValueCount(n)
        }
        root.setRowCount(n)
        writer.writeBatch()
        wroteAny = true
      }
      writer.end()
    } finally { writer.close(); out.close(); root.close(); alloc.close() }
  }
}
