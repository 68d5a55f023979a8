package graft.prov.javaapi.function;

import java.io.Serializable;
import java.util.Iterator;

import scala.Tuple2;

import graft.prov.ProvRecord;

/**
 * A function that returns zero or more key-value records from each input
 * record, with full control over the provenance of each output: the caller
 * builds the {@link ProvRecord}s, choosing their ids and dependency lists.
 *
 * <p>Mirror of the reference's one NEW Java functional interface
 * (core/src/main/java/org/apache/spark/api/java/function/
 * PairFlatMapFunctionWithDataElementAndTask.java:31-34), adapted to this
 * engine's model: records are immutable value objects rather than mutable
 * {@code DataElement}s attached to a {@code Task}, and the producing task —
 * a driver-side node that never ships to executors — is identified by its
 * id. Use {@code graft.prov.ProvIds.newId()} for fresh element ids and the
 * input record's {@code deps()}/{@code id()} to wire custom lineage.
 */
@FunctionalInterface
public interface PairFlatMapFunctionWithProvRecordAndTask<T, K, V> extends Serializable {
  Iterator<ProvRecord<Tuple2<K, V>>> call(ProvRecord<T> element, String taskId)
      throws Exception;
}
