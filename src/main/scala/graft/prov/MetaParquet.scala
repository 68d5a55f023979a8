package graft.prov

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.io.api.{Binary, RecordConsumer}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}

/** Driver-side writer for the store's SMALL metadata tables
  * (executions, tasks, transformation_groups, file_group_references).
  * These hold a handful of rows per execution; writing them through a
  * Spark job costs ~0.3s of scheduler/commit overhead per table per
  * session — pure fixed cost on every `close()`. This writes the same
  * byte layout Spark's writer produces (3-level LIST groups,
  * TIMESTAMP(MICROS) int64, path-embedded partition value) directly
  * from the driver, so readers — `spark.read.parquet` with partition
  * discovery, DuckDB, `ProvenanceQueries` — see an identical table.
  *
  * The reference pays this cost differently: per-row Cassandra inserts
  * from the driver at finish (DataflowProvenance.scala:60-98).
  */
private[prov] object MetaParquet {

  sealed trait FT
  case object FString extends FT
  case object FBool extends FT
  case object FTimestamp extends FT
  case object FStringList extends FT

  private def messageType(fields: Seq[(String, FT)]): MessageType = {
    val b = Types.buildMessage()
    fields.foreach { case (name, ft) =>
      ft match {
        case FString =>
          b.addField(Types.optional(PrimitiveType.PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.stringType()).named(name))
        case FBool =>
          b.addField(Types.optional(PrimitiveType.PrimitiveTypeName.BOOLEAN)
            .named(name))
        case FTimestamp =>
          b.addField(Types.optional(PrimitiveType.PrimitiveTypeName.INT64)
            .as(LogicalTypeAnnotation.timestampType(true,
              LogicalTypeAnnotation.TimeUnit.MICROS)).named(name))
        case FStringList =>
          b.addField(Types.optionalList()
            .optionalElement(PrimitiveType.PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.stringType()).named(name))
      }
    }
    b.named("spark_schema")
  }

  private final class RowWriteSupport(fields: Seq[(String, FT)])
      extends WriteSupport[Seq[Any]] {
    private var rc: RecordConsumer = _
    override def init(conf: Configuration): WriteSupport.WriteContext =
      new WriteSupport.WriteContext(
        messageType(fields), java.util.Collections.emptyMap[String, String]())
    override def prepareForWrite(r: RecordConsumer): Unit = rc = r
    override def getName: String = "graft-meta"
    override def write(row: Seq[Any]): Unit = {
      require(row.length == fields.length,
        s"row arity ${row.length} != schema arity ${fields.length}")
      rc.startMessage()
      fields.zip(row).zipWithIndex.foreach { case (((name, ft), v0), i) =>
        val v = v0 match {
          case Some(x) => x
          case None    => null
          case x       => x
        }
        if (v != null) {
          rc.startField(name, i)
          ft match {
            case FString =>
              rc.addBinary(Binary.fromString(v.asInstanceOf[String]))
            case FBool =>
              rc.addBoolean(v.asInstanceOf[Boolean])
            case FTimestamp =>
              val ts = v.asInstanceOf[java.sql.Timestamp]
              rc.addLong(ts.getTime / 1000 * 1000000L + ts.getNanos / 1000)
            case FStringList =>
              // standard 3-level LIST; empty list = empty outer group
              rc.startGroup()
              val xs = v.asInstanceOf[Seq[String]]
              if (xs.nonEmpty) {
                rc.startField("list", 0)
                xs.foreach { s =>
                  rc.startGroup()
                  rc.startField("element", 0)
                  rc.addBinary(Binary.fromString(String.valueOf(s)))
                  rc.endField("element", 0)
                  rc.endGroup()
                }
                rc.endField("list", 0)
              }
              rc.endGroup()
          }
          rc.endField(name, i)
        }
      }
      rc.endMessage()
    }
  }

  private final class Builder(out: HadoopOutputFile, fields: Seq[(String, FT)])
      extends ParquetWriter.Builder[Seq[Any], Builder](out) {
    override def self(): Builder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[Seq[Any]] =
      new RowWriteSupport(fields)
  }

  /** Append `rows` as one parquet file inside `dir` (created if needed;
    * typically a `table/execution_id=<id>` partition directory). The
    * file lands via temp + atomic rename, and the temp name is
    * DOT-PREFIXED — the part readers actually rely on: Spark's file
    * index (and DuckDB's `*.parquet` glob) hides `.`/`_`-prefixed
    * names but NOT a visible name with an `.inprogress` SUFFIX, so
    * the pre-round-16 `part-…parquet.inprogress` temp was a torn,
    * reader-visible parquet file whenever a crash hit mid-close
    * (found by the round-16 prov audit — the exact hidden-vs-visible
    * staging rule [[ElementSideWriter]] already followed with its
    * `_element_staging/` root). Any dot-prefixed debris an earlier
    * crash left in THIS directory sweeps here first — safe because a
    * partition directory belongs to one execution (ids are unique),
    * and within a driver the meta appends are sequential.
    */
  def append(conf: Configuration, dir: String,
             fields: Seq[(String, FT)], rows: Seq[Seq[Any]]): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    fs.mkdirs(d)
    fs.listStatus(d).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(".part-meta-") && n.endsWith(".inprogress"))
        fs.delete(st.getPath, false)
    }
    val name = s"part-meta-${ProvIds.newId()}.parquet"
    val tmp = new Path(d, "." + name + ".inprogress")
    val fin = new Path(d, name)
    val w = new Builder(HadoopOutputFile.fromPath(tmp, conf), fields)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try rows.foreach(w.write)
    finally w.close()
    if (!fs.rename(tmp, fin))
      throw new java.io.IOException(s"meta table write failed: $tmp -> $fin")
  }
}
