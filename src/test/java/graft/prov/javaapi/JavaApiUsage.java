package graft.prov.javaapi;

import java.util.ArrayList;
import java.util.Arrays;
import java.util.Comparator;
import java.util.Iterator;
import java.util.List;
import java.util.Map;

import org.apache.spark.sql.Encoder;
import org.apache.spark.sql.Encoders;
import org.apache.spark.sql.SparkSession;

import scala.Tuple2;
import scala.jdk.javaapi.CollectionConverters;

import graft.prov.ProvIds;
import graft.prov.ProvRecord;

/**
 * Pure-Java exercise of the Java API mirror — javac compiling this file IS
 * the test that the surface is Java-reachable (no Scala implicits, no
 * TypeTags, no default arguments leak through). Invoked from JavaApiSpec,
 * which asserts the provenance wiring the pipelines produce.
 */
public final class JavaApiUsage {

  private JavaApiUsage() {}

  private static scala.collection.immutable.Seq<String> seqOf(List<String> xs) {
    return CollectionConverters.asScala(xs).toSeq();
  }

  /** word-count over the classic RDD surface. */
  public static Map<String, Long> wordCount(SparkSession spark, String storeDir) {
    JavaProvSession session = JavaProvSession.create(spark, "java-wordcount", storeDir);
    JavaProvDataset<String> lines = session.parallelize(
        Arrays.asList("to be or not", "to be", "that is"), Encoders.STRING());
    JavaPairProvDataset<String, Long> counts = lines
        .flatMap(line -> Arrays.asList(line.split(" ")).iterator(), Encoders.STRING())
        .filter(w -> !w.isEmpty())
        .mapToPair(w -> new Tuple2<>(w, 1L), Encoders.STRING(), Encoders.LONG())
        .reduceByKey(Long::sum);
    Map<String, Long> out = counts.collectAsMap();
    session.close();
    return out;
  }

  /** joins + grouped values + lookup; returns (joined rows, groups + lookups). */
  public static Tuple2<Long, Long> joinAndGroup(SparkSession spark, String storeDir) {
    JavaProvSession session = JavaProvSession.create(spark, "java-join", storeDir);
    Encoder<Long> longs = Encoders.LONG();
    JavaPairProvDataset<Long, Long> left = session
        .parallelize(Arrays.asList(1L, 2L, 3L, 4L), longs)
        .keyBy(x -> x % 2, longs);
    JavaPairProvDataset<Long, Long> right = session
        .parallelize(Arrays.asList(10L, 11L), longs)
        .keyBy(x -> x % 2, longs);
    long joined = left.join(right).count();
    long groups = left.groupByKey().count();
    long lookedUp = left.lookup(1L).size();
    session.close();
    return new Tuple2<>(joined, groups + lookedUp);
  }

  /**
   * The reference's signature Java entry point: caller-built provenance
   * records with explicit dependency wiring (each output token depends on
   * its input line element), then sorted with a serializable comparator.
   */
  public static List<Tuple2<String, Long>> customProvenance(
      SparkSession spark, String storeDir) {
    JavaProvSession session = JavaProvSession.create(spark, "java-custom-prov", storeDir);
    JavaProvDataset<String> docs = session.parallelize(
        Arrays.asList("aa bb", "cc"), Encoders.STRING());
    JavaPairProvDataset<String, Long> tokens = docs.flatMapToPairWithProvRecordAndTask(
        (ProvRecord<String> element, String taskId) -> {
          List<ProvRecord<Tuple2<String, Long>>> out = new ArrayList<>();
          for (String tok : element.value().split(" ")) {
            out.add(new ProvRecord<>(ProvIds.newId(),
                seqOf(Arrays.asList(element.id())),
                new Tuple2<>(tok, (long) tok.length())));
          }
          return out.iterator();
        },
        Encoders.STRING(), Encoders.LONG());
    List<Tuple2<String, Long>> collected = tokens
        .toJavaProvDataset()
        .sortBy(t -> t._1(), true,
            (Comparator<String> & java.io.Serializable) Comparator.naturalOrder())
        .collect();
    session.flush();
    session.close();
    return collected;
  }

  /**
   * Outer joins, cogroup, aggregateByKey, mapValues, sortByKey, countByKey —
   * the nested-encoder paths (Option-in-tuple, Seq-in-tuple) a Java caller
   * hits that the simple pipelines above don't.
   */
  public static Map<String, Long> wideSurface(SparkSession spark, String storeDir) {
    JavaProvSession session = JavaProvSession.create(spark, "java-wide", storeDir);
    Encoder<Long> longs = Encoders.LONG();
    JavaPairProvDataset<Long, Long> left = session
        .parallelize(Arrays.asList(1L, 2L, 3L), longs)
        .keyBy(x -> x % 2, longs);                       // keys 1,0,1
    JavaPairProvDataset<Long, Long> right = session
        .parallelize(Arrays.asList(10L, 12L), longs)
        .keyBy(x -> x % 3, longs);                       // keys 1,0
    Map<String, Long> out = new java.util.HashMap<>();
    out.put("left", left.leftOuterJoin(right).count());
    out.put("right", left.rightOuterJoin(right).count());
    out.put("full", left.fullOuterJoin(right).count());
    out.put("cogroup", left.cogroup(right).count());
    out.put("subtractByKey", left.subtractByKey(right).count());
    out.put("agg", left.aggregateByKey(0L,
        (acc, v) -> acc + v, Long::sum, longs).count());
    out.put("mapValues", left.mapValues(v -> v * 10, longs)
        .values().reduce(Long::sum));
    out.put("sorted", left.sortByKey(true,
            (Comparator<Long> & java.io.Serializable) Comparator.naturalOrder())
        .toJavaProvDataset().first()._2());
    out.put("countByKey", (long) left.countByKey().size());
    out.put("zip", session.parallelize(Arrays.asList(5L, 6L), longs)
        .zipWithIndex().count());
    session.close();
    return out;
  }

  /** record-level surface: mapPartitions over ProvRecords + action. */
  public static long recordSurface(SparkSession spark, String storeDir) {
    JavaProvSession session = JavaProvSession.create(spark, "java-records", storeDir);
    JavaProvDataset<Long> base = session.range(6);
    JavaProvDataset<Long> doubled = base.mapPartitionsWithProvRecords(
        (Iterator<ProvRecord<Long>> it) -> {
          List<ProvRecord<Long>> out = new ArrayList<>();
          while (it.hasNext()) {
            ProvRecord<Long> r = it.next();
            List<String> deps = new ArrayList<>(
                CollectionConverters.asJava(r.deps()));
            deps.add(r.id());
            out.add(new ProvRecord<>(ProvIds.newId(), seqOf(deps), r.value() * 2));
          }
          return out.iterator();
        }, Encoders.LONG());
    long n = doubled.count();
    session.close();
    return n;
  }

  /** fixed-length binary source from Java: record count and width. */
  public static long binaryRecordCount(SparkSession spark, String storeDir,
      String dataDir, int recordLength) {
    JavaProvSession session = JavaProvSession.create(spark, "java-bin", storeDir);
    long n = session.binaryRecords(dataDir, recordLength)
        .filter(rec -> rec.length == recordLength)
        .count();
    session.close();
    return n;
  }
}
