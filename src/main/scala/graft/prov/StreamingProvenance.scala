package graft.prov

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

/** Watermark-bounded streaming lineage — a capability the reference does
  * not have (its streaming layer is stock DStreams with no provenance,
  * SURVEY §1.3/§2.10). Design: per-RECORD deps across a stream are
  * unbounded state, so the scalable unit of streaming provenance is the
  * MICRO-BATCH — each triggered batch appends its updated aggregate rows
  * as elements depending on a synthetic batch element. The store then
  * answers "which batches fed this window aggregate", and state stays
  * O(1) per batch: exactly the boundedness the watermark guarantees for
  * the aggregation itself.
  *
  * Elements append from inside foreachBatch with the same path-embedded
  * partition layout as [[ProvSession.flush]], so all §3.3 provenance
  * queries work unchanged over streaming elements.
  */
object StreamingProvenance {

  /** Wrap a streaming aggregate in per-micro-batch provenance capture.
    *
    * @param session     open provenance session (its store receives rows)
    * @param agg         a streaming aggregate DataFrame (e.g.
    *                    EventStreams.hourlyCounts of a readStream)
    * @param queryName   task description in the provenance DAG
    * @return a writer in Update mode; caller starts/stops it
    */
  def tracked(session: ProvSession, agg: DataFrame,
              queryName: String = "streaming_agg"): DataStreamWriter[Row] = {
    val task = session.newTask(TransformationType.MAP, Nil,
      s"streaming: $queryName")
    task.schemaFields = agg.schema.fieldNames.toSeq
    // elements append per micro-batch below, not at flush
    task.elementThunk = None
    val execId = session.executionId
    val tid = task.id
    val store = session.storeDir
    val capture = session.captureEnabled
    agg.writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (capture && !batch.isEmpty) {
          // foreachBatch is at-least-once: a replayed batch re-appends its
          // rows. EVERY id here is deterministic in (executionId, batchId,
          // row values), so a replay appends byte-identical rows and the
          // read side (ProvenanceQueries.elements dropDuplicates on
          // element_id) collapses them — append-only store, idempotent
          // effect, no cross-batch coordination.
          val batchEl = ProvSinkUtil.fileElementId(execId, s"batch_$batchId")
          val cols = batch.schema.fieldNames.toSeq
          // `occ` disambiguates value-identical rows WITHIN the batch:
          // ids fold in a per-value occurrence index, so two distinct
          // rows with equal values stay two elements after the read
          // side's dropDuplicates(element_id) — multiplicity survives
          // even for non-aggregated sinks. The index assignment order is
          // arbitrary, but a replayed batch re-mints the same id SET
          // (occurrences 0..k-1 of each value), so idempotence holds.
          val occWindow = org.apache.spark.sql.expressions.Window
            .partitionBy(col("vs")).orderBy(monotonically_increasing_id())
          val els = batch
            .select(array(cols.map(c => col(c).cast("string")): _*).as("vs"))
            .withColumn("occ", row_number().over(occWindow) - 1)
            .as(Encoders.product[(Seq[String], Int)])
            .map { case (vs, occ) =>
              val id = ProvSinkUtil.fileElementId(execId,
                s"batch_${batchId}_row_${occ}_${vs.mkString("\u0001")}")
              ElementRow(execId, tid, id, Seq(vs), Seq(batchEl))
            }(ProvSession.elementRowEnc)
          val spark = batch.sparkSession
          val batchRow = spark.createDataset(Seq(ElementRow(
            execId, tid, batchEl, Seq(Seq(s"batch_$batchId")),
            Seq.empty[String])))(ProvSession.elementRowEnc)
          els.unionByName(batchRow).drop("execution_id")
            .write.mode("append")
            .parquet(s"$store/data_elements/execution_id=$execId")
        }
      }
  }
}
