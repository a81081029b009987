package graft.sources

import java.io.ByteArrayInputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Zero-egress Avro container source — the interchange format a
  * reference user's upstream systems hand over when the input is not a
  * spreadsheet or CSV (the reference's ETL ingests arbitrary tabular
  * drops, `/root/reference/etl_implementation.md`; Avro Object
  * Container Files are the de-facto Kafka-archive/data-drop format).
  * Built directly on `org.apache.avro` (already on Spark's runtime
  * classpath — no connector, no new dependency), mirroring
  * [[XlsxSource]]'s shape: a DISTRIBUTED partitioned writer (one
  * container per partition through the Hadoop FileSystem API, nothing
  * through the driver) and a distributed `binaryFile` reader (the
  * driver peeks ONE file header for the schema; the container bytes
  * themselves never shuffle — each file decodes inside its own task
  * and only typed rows flow on).
  *
  * Type bridge (both directions): int↔int, long↔long, float↔float,
  * double↔double, boolean↔boolean, string↔string, binary↔bytes,
  * timestamp↔long/timestamp-micros, date↔int/date; nullable columns
  * ride union(null, T). Anything else (decimal, nested) must be cast
  * upstream — loud error, not a silent coercion.
  *
  * Scale shape: Avro containers are block-splittable in principle, but
  * the partitioned layout makes file-level parallelism the unit — the
  * writer emits as many containers as upstream partitions, so read
  * parallelism equals write parallelism and `binaryFile` bin-packs
  * small containers. Deflate-compressed blocks keep the bytes small on
  * the wire.
  */
object AvroSource {

  private[sources] def toAvro(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType => Schema.create(Schema.Type.LONG)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case TimestampType =>
          LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case DateType =>
          LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case other => sys.error(
          s"AvroSource: unsupported column type $other for '${f.name}' — cast upstream")
      }
      val s = if (f.nullable)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, s, null, null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  /** The non-null branch of a (possibly union-with-null) field schema. */
  private def valueBranch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL)
        .getOrElse(sys.error("union of only null"))
    else s

  private def fromAvro(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD, s"expected record schema, got ${s.getType}")
    StructType(s.getFields.asScala.map { f =>
      val branch = valueBranch(f.schema())
      val nullable = f.schema().getType == Schema.Type.UNION
      val lt = Option(branch.getLogicalType).map(_.getName).getOrElse("")
      val dt = (branch.getType, lt) match {
        case (Schema.Type.INT, "date") => DateType
        case (Schema.Type.INT, _) => IntegerType
        case (Schema.Type.LONG, "timestamp-micros") => TimestampType
        case (Schema.Type.LONG, _) => LongType
        case (Schema.Type.FLOAT, _) => FloatType
        case (Schema.Type.DOUBLE, _) => DoubleType
        case (Schema.Type.BOOLEAN, _) => BooleanType
        case (Schema.Type.STRING, _) => StringType
        case (Schema.Type.BYTES, _) => BinaryType
        case (t, _) => sys.error(s"AvroSource: unsupported avro type $t for '${f.name}'")
      }
      StructField(f.name, dt, nullable)
    }.toSeq)
  }

  /** One partition's rows → one in-memory Avro container (deflate). */
  private[sources] def writeBytes(rows: Iterator[Row], st: StructType,
                                  schemaJson: String): Array[Byte] = {
    val schema = new Schema.Parser().parse(schemaJson)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      .setCodec(CodecFactory.deflateCodec(6))
    w.create(schema, bos)
    try {
      rows.foreach { r =>
        val rec = new GenericData.Record(schema)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          val v: AnyRef =
            if (r.isNullAt(i)) null
            else f.dataType match {
              case TimestampType =>
                val ts = r.getTimestamp(i)
                java.lang.Long.valueOf(ts.getTime * 1000L + (ts.getNanos / 1000) % 1000)
              case DateType =>
                java.lang.Integer.valueOf(r.getDate(i).toLocalDate.toEpochDay.toInt)
              case BinaryType => java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](i))
              case _ => r.get(i).asInstanceOf[AnyRef]
            }
          rec.put(f.name, v)
        }
        w.append(rec)
      }
    } finally w.close()
    bos.toByteArray
  }

  /** Distributed writer: one `.avro` container per non-empty partition
    * through the Hadoop FileSystem API (file:// locally, HDFS/object
    * stores on a cluster); retried tasks overwrite their own part
    * deterministically. The Avro schema ships to tasks as its JSON
    * (canonical, serialization-safe). */
  def write(df: DataFrame, dir: String, recordName: String = "row"): Unit = {
    val st = df.schema
    val schemaJson = toAvro(st, recordName).toString
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val bytes = writeBytes(it, st, schemaJson)
        val path = new org.apache.hadoop.fs.Path(dir,
          f"part-${org.apache.spark.TaskContext.getPartitionId()}%05d.avro")
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = fs.create(path, true)
        try out.write(bytes) finally out.close()
      }
    }
  }

  private def decodeFile(bytes: Array[Byte], st: StructType): Iterator[Row] = {
    val rdr = new DataFileStream(new ByteArrayInputStream(bytes),
      new GenericDatumReader[GenericRecord]())
    new Iterator[Row] {
      def hasNext: Boolean = { val h = rdr.hasNext; if (!h) rdr.close(); h }
      def next(): Row = {
        val rec = rdr.next()
        Row.fromSeq(st.fields.map { f =>
          rec.get(f.name) match {
            case null => null
            case u: org.apache.avro.util.Utf8 => u.toString
            case b: java.nio.ByteBuffer =>
              val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
            case l: java.lang.Long if f.dataType == TimestampType =>
              java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
                Math.floorDiv(l, 1000000L), Math.floorMod(l, 1000000L) * 1000L))
            case i: java.lang.Integer if f.dataType == DateType =>
              java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
            case v => v
          }
        }.toSeq)
      }
    }
  }

  /** Read every Avro container under `path` (glob ok) as one typed
    * DataFrame. The driver peeks the first file (by path order) for the
    * schema; every container must carry a compatible record schema
    * (Avro's own reader-schema resolution applies per file). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    val firstPath = bin.select("path").orderBy("path").limit(1)
      .collect().headOption.map(_.getString(0))
      .getOrElse(sys.error(s"no files at $path"))
    val headBytes = bin.filter(col("path") === firstPath)
      .select("content").head().getAs[Array[Byte]](0)
    val probe = new DataFileStream(new ByteArrayInputStream(headBytes),
      new GenericDatumReader[GenericRecord]())
    val st = try fromAvro(probe.getSchema) finally probe.close()
    val rows = bin.rdd.flatMap(r => decodeFile(r.getAs[Array[Byte]]("content"), st))
    spark.createDataFrame(rows, st)
  }
}
