package graft.sources

import org.apache.arrow.compression.CommonsCompressionFactory
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.compression.CompressionUtil
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnarBatch, ColumnVector}

import java.io.OutputStream
import java.nio.ByteBuffer
import java.nio.channels.{Channels, SeekableByteChannel}
import scala.jdk.CollectionConverters._

/** Arrow IPC file interop — the reference's native storage format
  * (LZ4-frame-compressed Arrow IPC batch files; reference
  * org.knime.core.columnar.arrow/src/main/java/org/knime/core/columnar/arrow/offheap/OffHeapArrowBatchStore.java:66,
  * ArrowReaderWriterUtils.java:93 footer handling, :229 batch offsets).
  * A user migrating existing columnar tables reads them here directly.
  *
  * Scale shape: one task per FILE (a store is a directory of IPC files,
  * each internally batched — the reference's batch-per-RecordBatch
  * layout), so a 1000-file store fans out across the cluster with no
  * driver materialization; batches stream through
  * [[org.apache.spark.sql.vectorized.ArrowColumnVector]] without a
  * per-value copy until row conversion. Filter/column pushdown does NOT
  * reach IPC files (no statistics footer) — for repeated analytics the
  * one-time `read → write parquet` migration is the intended path, which
  * is exactly what the reference's users migrating to this engine need.
  */
object ArrowIpc {

  /** Spark schema for an IPC file (driver-side footer read). */
  def schemaOf(spark: SparkSession, file: String): StructType = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new HPath(file)
    val fs = p.getFileSystem(conf)
    val alloc = new RootAllocator(Long.MaxValue)
    val ch = new HadoopSeekableChannel(fs, p)
    try {
      val reader = new ArrowFileReader(ch, alloc, CommonsCompressionFactory.INSTANCE)
      try fromArrowSchema(reader.getVectorSchemaRoot.getSchema)
      finally reader.close()
    } finally { ch.close(); alloc.close() }
  }

  /** Read a directory of (or single) Arrow IPC files into a DataFrame.
    * Every file must share one schema (the reference's store invariant).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
          .map(_.getPath.toString).sorted
      else Seq(path)
    require(files.nonEmpty, s"no Arrow IPC files under $path")
    val schema = schemaOf(spark, files.head)
    val confB = spark.sparkContext.broadcast(new SerializableWritable(conf))
    val rows = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap { file =>
        val c = confB.value.value
        val hp = new HPath(file)
        val hfs = hp.getFileSystem(c)
        val converter = CatalystTypeConverters.createToScalaConverter(schema)
        val it = new Iterator[Row] {
          private val alloc = new RootAllocator(Long.MaxValue)
          private val ch = new HadoopSeekableChannel(hfs, hp)
          private val reader = new ArrowFileReader(ch, alloc, CommonsCompressionFactory.INSTANCE)
          /** This file's schema (footer is already loaded — free). */
          def fileSchema: StructType = fromArrowSchema(reader.getVectorSchemaRoot.getSchema)
          private var batch: Iterator[Row] = Iterator.empty
          private var open = true
          /** Idempotent; also invoked from the task-completion listener so
            * a partially-drained iterator (limit/take/kill) cannot leak the
            * off-heap Arrow buffers, allocator, or file handle.
            */
          def closeAll(): Unit = if (open) {
            open = false
            reader.close(); ch.close(); alloc.close()
          }
          private def advance(): Unit =
            while (!batch.hasNext && open) {
              if (reader.loadNextBatch()) {
                val root = reader.getVectorSchemaRoot
                val cols = root.getFieldVectors.asScala
                  .map(v => new ArrowColumnVector(v): ColumnVector).toArray
                val cb = new ColumnarBatch(cols, root.getRowCount)
                batch = cb.rowIterator().asScala.map(ir => converter(ir).asInstanceOf[Row])
              } else closeAll()
            }
          override def hasNext: Boolean = { advance(); batch.hasNext }
          override def next(): Row = { advance(); batch.next() }
        }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => it.closeAll()))
        // store invariant, checked AFTER the cleanup listener is in place
        // (a construction-time throw must not leak the allocator): a file
        // whose schema diverges from the directory's fails with the
        // offending PATH, not a downstream vector-cast error.
        // names + types only: a nullability-flag delta is representable in
        // the directory schema and not worth failing a scan over.
        // read the schema BEFORE closeAll — the reader is closed after.
        val fSchema = it.fileSchema
        if (fSchema.map(f => (f.name, f.dataType)) != schema.map(f => (f.name, f.dataType))) {
          it.closeAll()
          throw new IllegalArgumentException(
            s"Arrow IPC file $file schema ${fSchema.simpleString} differs from " +
              s"the directory schema ${schema.simpleString}")
        }
        it
      }
    spark.createDataFrame(rows, schema)
  }

  /** Write a DataFrame as LZ4-frame-compressed Arrow IPC files, one per
    * partition (`part-NNNNN.arrow`) — the distributed mirror of the
    * reference's store writer. `batchRows` bounds per-batch memory.
    */
  def write(df: DataFrame, path: String, batchRows: Int = 4096): Unit = {
    val schema = df.schema
    schema.foreach(f => toArrowField(f)) // fail fast on unsupported types
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val out = new HPath(path)
    val fs = out.getFileSystem(conf)
    fs.mkdirs(out)
    val confB = spark.sparkContext.broadcast(new SerializableWritable(conf))
    df.queryExecution.toRdd // force analysis before the closure serializes
    val pathStr = out.toString
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val c = confB.value.value
      // attempt-private temp (dot-prefixed: read() skips it) + rename-on-
      // success = the minimal commit protocol: a failed/killed attempt
      // leaves only an ignorable temp file, a zombie attempt writes to its
      // OWN temp, and the final file appears atomically or not at all
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val part = new HPath(pathStr, f"part-$pid%05d.arrow")
      val tmp = new HPath(pathStr, f".part-$pid%05d-$attempt.arrow.tmp")
      val hfs = part.getFileSystem(c)
      val alloc = new RootAllocator(Long.MaxValue)
      val arrowSchema = new ArrowSchema(schema.map(toArrowField).asJava)
      val root = VectorSchemaRoot.create(arrowSchema, alloc)
      val os: OutputStream = hfs.create(tmp, true)
      try {
        val writer = new ArrowFileWriter(
          root, null, Channels.newChannel(os), null,
          org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
          CommonsCompressionFactory.INSTANCE, CompressionUtil.CodecType.LZ4_FRAME)
        writer.start()
        var n = 0
        def flush(): Unit = if (n > 0) {
          root.setRowCount(n); writer.writeBatch(); root.allocateNew(); n = 0
        }
        it.foreach { row =>
          var i = 0
          while (i < schema.length) {
            setValue(root.getVector(i), n, row, i, schema(i).dataType)
            i += 1
          }
          n += 1
          if (n >= batchRows) flush()
        }
        flush()
        writer.end(); writer.close(); os.close()
        hfs.delete(part, false) // replace any prior attempt's commit
        require(hfs.rename(tmp, part), s"rename $tmp -> $part failed")
      } finally {
        root.close(); alloc.close()
        hfs.delete(tmp, false); () // no-op when renamed
      }
      Iterator.empty[Int].iterator
    }.count() // trigger
    // job-level marker: a reader (or operator) can check completeness; our
    // own read() stays lenient because foreign (reference-written) stores
    // have no such marker
    val done = fs.create(new HPath(out, "_SUCCESS"), true)
    done.close()
  }

  // ---- schema mapping (core scalar types; the reference's logical types
  // map into these — SURVEY.md §1.3) ------------------------------------

  def toArrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case BooleanType => ArrowType.Bool.INSTANCE
      case ByteType => new ArrowType.Int(8, true)
      case ShortType => new ArrowType.Int(16, true)
      case IntegerType => new ArrowType.Int(32, true)
      case LongType => new ArrowType.Int(64, true)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case StringType => ArrowType.Utf8.INSTANCE
      case BinaryType => ArrowType.Binary.INSTANCE
      case DateType => new ArrowType.Date(DateUnit.DAY)
      case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
      case d: DecimalType => new ArrowType.Decimal(d.precision, d.scale, 128)
      case other => throw new IllegalArgumentException(
        s"Arrow IPC interop: unsupported type $other for column ${f.name}")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), null)
  }

  def fromArrowSchema(s: ArrowSchema): StructType =
    StructType(s.getFields.asScala.map { f =>
      val dt: DataType = f.getType match {
        case _: ArrowType.Bool => BooleanType
        case i: ArrowType.Int if i.getIsSigned => i.getBitWidth match {
          case 8 => ByteType
          case 16 => ShortType
          case 32 => IntegerType
          case 64 => LongType
          case w => throw new IllegalArgumentException(s"unsupported int width $w")
        }
        case fp: ArrowType.FloatingPoint => fp.getPrecision match {
          case FloatingPointPrecision.SINGLE => FloatType
          case FloatingPointPrecision.DOUBLE => DoubleType
          case p => throw new IllegalArgumentException(s"unsupported float precision $p")
        }
        case _: ArrowType.Utf8 => StringType
        case _: ArrowType.Binary => BinaryType
        case _: ArrowType.Date => DateType
        case t: ArrowType.Timestamp if t.getUnit == TimeUnit.MICROSECOND => TimestampType
        case d: ArrowType.Decimal => DecimalType(d.getPrecision, d.getScale)
        case other => throw new IllegalArgumentException(
          s"Arrow IPC interop: unsupported Arrow type $other for column ${f.getName}")
      }
      StructField(f.getName, dt, f.isNullable)
    }.toSeq)

  private def setValue(v: FieldVector, idx: Int, row: Row, col: Int, dt: DataType): Unit =
    if (row.isNullAt(col)) v.asInstanceOf[FieldVector] match {
      case fv: BaseFixedWidthVector => fv.setNull(idx)
      case vv: BaseVariableWidthVector => vv.setNull(idx)
      case o => throw new IllegalArgumentException(s"cannot set null on ${o.getClass}")
    } else dt match {
      case BooleanType => v.asInstanceOf[BitVector].setSafe(idx, if (row.getBoolean(col)) 1 else 0)
      case ByteType => v.asInstanceOf[TinyIntVector].setSafe(idx, row.getByte(col))
      case ShortType => v.asInstanceOf[SmallIntVector].setSafe(idx, row.getShort(col))
      case IntegerType => v.asInstanceOf[IntVector].setSafe(idx, row.getInt(col))
      case LongType => v.asInstanceOf[BigIntVector].setSafe(idx, row.getLong(col))
      case FloatType => v.asInstanceOf[Float4Vector].setSafe(idx, row.getFloat(col))
      case DoubleType => v.asInstanceOf[Float8Vector].setSafe(idx, row.getDouble(col))
      case StringType =>
        v.asInstanceOf[VarCharVector].setSafe(idx, row.getString(col).getBytes("UTF-8"))
      case BinaryType =>
        v.asInstanceOf[VarBinaryVector].setSafe(idx, row.getAs[Array[Byte]](col))
      case DateType =>
        v.asInstanceOf[DateDayVector].setSafe(idx, row.getAs[java.sql.Date](col).toLocalDate.toEpochDay.toInt)
      case TimestampType =>
        val ts = row.getAs[java.sql.Timestamp](col)
        v.asInstanceOf[TimeStampMicroTZVector].setSafe(idx, ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L)
      case d: DecimalType =>
        v.asInstanceOf[DecimalVector].setSafe(idx, row.getAs[java.math.BigDecimal](col).setScale(d.scale))
      case other => throw new IllegalArgumentException(s"unsupported write type $other")
    }
}

/** SeekableByteChannel over a Hadoop file — what ArrowFileReader needs to
  * walk the IPC footer and batch offsets on any Hadoop-visible filesystem
  * (local, HDFS, object stores).
  */
private[sources] class HadoopSeekableChannel(fs: FileSystem, p: HPath) extends SeekableByteChannel {
  private val in = fs.open(p)
  private val len = fs.getFileStatus(p).getLen
  private var closed = false
  override def read(dst: ByteBuffer): Int = {
    val buf = new Array[Byte](dst.remaining())
    val n = in.read(buf, 0, buf.length)
    if (n > 0) dst.put(buf, 0, n)
    n
  }
  override def write(src: ByteBuffer): Int = throw new UnsupportedOperationException("read-only")
  override def position(): Long = in.getPos
  override def position(newPosition: Long): SeekableByteChannel = { in.seek(newPosition); this }
  override def size(): Long = len
  override def truncate(size: Long): SeekableByteChannel = throw new UnsupportedOperationException("read-only")
  override def isOpen: Boolean = !closed
  override def close(): Unit = { closed = true; in.close() }
}
