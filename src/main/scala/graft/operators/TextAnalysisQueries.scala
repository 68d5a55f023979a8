package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators over `documents`: token statistics, quality
  * scoring, language ID (stopword-profile heuristic), document
  * fingerprinting. All closed-form DataFrame expressions (codegen'd), all
  * one-pass over the corpus at scale.
  */
object TextAnalysisQueries {

  /** Token counting: whitespace tokens + distinct counts. */
  val t01TokenStats = QueryDef(
    "t01_token_stats",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          size(array_distinct(split(col("text"), " "))).cast("long").as("n_distinct"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
           |  len(string_split(text, ' ')) AS n_tokens,
           |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
           |  length(text) AS n_chars
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Quality scoring: mean token length, repetition ratio (1 - distinct/
    * total), and a composite score — the usual cheap pre-training
    * filters.
    */
  val t02QualityScore = QueryDef(
    "t02_quality_score",
    (s, d) => {
      val toks = size(split(col("text"), " ")).cast("double")
      val dist = size(array_distinct(split(col("text"), " "))).cast("double")
      val meanLen = (length(col("text")).cast("double") - toks + 1) / toks
      val repetition = lit(1.0) - dist / toks
      Tables.documents(s, d)
        .select(col("doc_id"),
          round(meanLen, 4).as("mean_token_len"),
          round(repetition, 4).as("repetition"),
          round(meanLen * 0.2 + (lit(1.0) - repetition) * 0.8, 4).as("quality"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
           |  round((length(text) - len(string_split(text, ' ')) + 1.0)
           |        / len(string_split(text, ' ')), 4) AS mean_token_len,
           |  round(1.0 - len(list_distinct(string_split(text, ' ')))
           |        * 1.0 / len(string_split(text, ' ')), 4) AS repetition,
           |  round(((length(text) - len(string_split(text, ' ')) + 1.0)
           |         / len(string_split(text, ' '))) * 0.2 +
           |        (len(list_distinct(string_split(text, ' ')))
           |         * 1.0 / len(string_split(text, ' '))) * 0.8, 4) AS quality
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Language ID via stopword-profile hit ratios: per language, the
    * fraction of the doc's tokens found in that language's profile;
    * prediction = argmax (ties → lexicographically first). Pure
    * relational logic — one explode + broadcast join + argmax at scale.
    */
  val t03LangId = QueryDef(
    "t03_langid",
    (s, d) => {
      val spark = s
      import spark.implicits._
      val profiles = Seq(
        "en" -> Seq("the", "a", "of", "and", "order", "group"),
        "de" -> Seq("der", "die", "das", "und", "customer", "hash"),
        "es" -> Seq("el", "la", "de", "y", "slow", "agg"),
        "fr" -> Seq("le", "la", "de", "et", "scan", "data"),
        "zh" -> Seq("de", "shi", "le", "join", "small", "column"))
        .flatMap { case (l, ws) => ws.map(w => (l, w)) }
        .toDF("cand_lang", "tok")
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"),
          explode(split(col("text"), " ")).as("tok"))
      val hits = toks.join(broadcast(profiles), Seq("tok"))
        .groupBy(col("doc_id"), col("n_tokens"), col("cand_lang"))
        .agg(count(lit(1)).as("hits"))
        .withColumn("score", round(col("hits") / col("n_tokens"), 6))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("cand_lang"))
      hits.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("cand_lang").as("predicted_lang"), col("score"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH profiles(cand_lang, tok) AS (VALUES
           |  ('en','the'),('en','a'),('en','of'),('en','and'),('en','order'),('en','group'),
           |  ('de','der'),('de','die'),('de','das'),('de','und'),('de','customer'),('de','hash'),
           |  ('es','el'),('es','la'),('es','de'),('es','y'),('es','slow'),('es','agg'),
           |  ('fr','le'),('fr','la'),('fr','de'),('fr','et'),('fr','scan'),('fr','data'),
           |  ('zh','de'),('zh','shi'),('zh','le'),('zh','join'),('zh','small'),('zh','column')),
           |toks AS (
           |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
           |    unnest(string_split(text, ' ')) AS tok
           |  FROM documents),
           |hits AS (
           |  SELECT doc_id, n_tokens, cand_lang, count(*) AS hits
           |  FROM toks JOIN profiles USING (tok)
           |  GROUP BY 1, 2, 3),
           |ranked AS (
           |  SELECT doc_id, cand_lang, round(hits * 1.0 / n_tokens, 6) AS score,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY round(hits * 1.0 / n_tokens, 6) DESC, cand_lang) AS rn
           |  FROM hits)
           |SELECT doc_id, cand_lang AS predicted_lang, score
           |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin))

  /** Document fingerprint: md5 over the sorted distinct token set —
    * a canonical content signature robust to word order.
    */
  val t04Fingerprint = QueryDef(
    "t04_fingerprint",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " "))
            .as("fingerprint"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
           |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
           |    AS fingerprint
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Per-language corpus rollup joining text stats — the "corpus report"
    * shape (group counts + quality aggregates).
    */
  val t05CorpusReport = QueryDef(
    "t05_corpus_report",
    (s, d) => {
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          round(avg(size(split(col("text"), " "))), 4).as("avg_tokens"))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang, count(*) AS n_docs,
           |  cast(sum(n_chars) AS BIGINT) AS total_chars,
           |  round(avg(len(string_split(text, ' '))), 4) AS avg_tokens
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  def all: Seq[QueryDef] = Seq(
    t01TokenStats, t02QualityScore, t03LangId, t04Fingerprint, t05CorpusReport)
}
