package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d14 — the end-to-end training-data curation pipeline, as ONE
  * declarative flow: the individual operators (language ID, quality
  * scoring, exact dedup, near-dup clustering, split assignment) are
  * what a reference user runs piecemeal; this is the production
  * composition that turns a raw crawl into a training corpus manifest.
  *
  * Stages (all set-oriented; the only driver loop is the label
  * propagation inside [[Dedup.clusterLabels]]):
  *   1. score: quality ([[TextStats.qualityScore]]) + language
  *      ([[TextStats.predLang]]) — map-side arithmetic on text;
  *   2. filter: quality ≥ 0.7 and an identified language;
  *   3. exact dedup: keep the min doc_id per content hash (one
  *      hash-aggregate + a semi join);
  *   4. near-dup dedup: keep the min SURVIVING doc_id per d11
  *      cluster (clusters computed on the full corpus — a dropped
  *      canonical must not resurrect its near-dups);
  *   5. assign: deterministic hash-mod train/val/test split.
  *
  * Output: one row per kept document — the curated-corpus manifest.
  */
object Pipeline {

  val QualityMin = 0.7

  def curatedCorpus(spark: SparkSession, dir: String): DataFrame = {
    // consumed by the exact-dedup aggregate AND the survivor semi-join:
    // cache so the regex scoring pass over the corpus text runs once
    val scored = Dedup.corpus(spark, dir)
      .select(col("doc_id"), col("text"),
        TextStats.qualityScore(col("text")).as("quality"),
        TextStats.predLang(col("text")).as("pred_lang"))
      .filter(col("quality") >= QualityMin && col("pred_lang") =!= "und")
      .persist()
    // exact dedup: survivors whose doc_id is the min of their content group
    val exactKeep = scored
      .groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    // consumed twice (cluster-min aggregation + final manifest join):
    // cache the survivor relation so the regex scoring + exact-dedup
    // pass over the corpus text runs once
    val s1 = scored.join(exactKeep, Seq("doc_id"), "left_semi")
      .select("doc_id", "quality", "pred_lang")
      .persist()
    // near-dup keep-one: min surviving member per full-corpus cluster
    val kept = s1
      .join(Dedup.clusterLabels(spark, dir), Seq("doc_id"))
      .groupBy(col("label").as("cluster_id"))
      .agg(min("doc_id").as("doc_id"))
    kept.join(s1, Seq("doc_id"))
      .select(col("doc_id"), col("cluster_id"), col("quality"), col("pred_lang"),
        Sampling.splitCol(col("doc_id")).as("split"))
      .orderBy("doc_id")
  }

  val oracleCuratedCorpus: String =
    s"""WITH RECURSIVE ${Dedup.pairsCteSql},
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION ALL
       |  SELECT id_b, id_a FROM pairs),
       |reach(u, v) AS (
       |  SELECT doc_id, doc_id FROM corpus
       |  UNION
       |  SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
       |labeled AS (
       |  SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
       |q AS (
       |  ${TextStats.qualityScoreSql("corpus")}),
       |lng AS (
       |  ${TextStats.predLangSelectSql("corpus")}),
       |filt AS (
       |  SELECT c.doc_id, c.text, q.quality, lng.pred_lang
       |  FROM corpus c JOIN q USING (doc_id) JOIN lng USING (doc_id)
       |  WHERE q.quality >= $QualityMin AND lng.pred_lang <> 'und'),
       |ek AS (SELECT min(doc_id) AS doc_id FROM filt GROUP BY md5(text)),
       |s1 AS (SELECT f.doc_id, f.quality, f.pred_lang FROM filt f
       |       WHERE f.doc_id IN (SELECT doc_id FROM ek)),
       |kept AS (
       |  SELECT l.cluster_id, min(s.doc_id) AS doc_id
       |  FROM s1 s JOIN labeled l USING (doc_id)
       |  GROUP BY l.cluster_id)
       |SELECT k.doc_id, k.cluster_id, s.quality, s.pred_lang,
       |       ${Sampling.splitCaseSql("k.doc_id")} AS split
       |FROM kept k JOIN s1 s USING (doc_id)
       |ORDER BY k.doc_id""".stripMargin
}
