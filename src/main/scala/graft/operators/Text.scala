package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * Everything is Catalyst column expressions (codegen'd, no UDFs):
  * at 100 TB these run inside the parquet scan stage with zero extra
  * shuffles.
  */
object Text {

  /** Whitespace tokenization of the lowercased text. */
  def tokens(c: Column): Column = split(lower(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Cheap BPE-ish token estimate: ~4 chars per subword token. */
  def bpeTokenEstimate(c: Column): Column =
    greatest(lit(1L), ceil(length(c) / 4.0).cast(LongType))

  def meanTokenLen(c: Column): Column =
    length(regexp_replace(c, "\\s+", "")) / tokenCount(c)

  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, x => x.isInCollection(words)))

  /** Per-language mini stopword lists for the n-gram/stopword
    * language-ID heuristic. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "les", "et", "des", "un"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "wo3"))

  /** Language-ID: argmax of stopword hits with a fixed priority order
    * on ties (deterministic). */
  def langId(c: Column): Column = {
    val toks = tokens(c)
    val counts = langStopwords.map { case (lang, words) =>
      lang -> stopwordCount(toks, words)
    }
    counts.init.zipWithIndex.foldRight(lit(counts.last._1): Column) {
      case (((lang, cnt), i), elseExpr) =>
        val laterCounts = counts.drop(i + 1).map(_._2)
        when(laterCounts.foldLeft(lit(true))((acc, o) => acc && cnt >= o), lang)
          .otherwise(elseExpr)
    }
  }

  /** Document quality score in [0, 1]: stopword density + length +
    * mean token length (the reference-style length/punct/stopword
    * ratio family). */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c)
    val stopRatio = stopwordCount(tokens(c), langStopwords.head._2) / nTok
    lit(0.5) * stopRatio +
      lit(0.3) * least(lit(1.0), nTok / 100.0) +
      lit(0.2) * least(lit(1.0), meanTokenLen(c) / 5.0)
  }

  /** Document fingerprint: md5 over the sorted distinct token set
    * (order-insensitive content identity). */
  def fingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(c)))))

  /** Distinct character k-shingles of the lowercased text. */
  def charShingles(c: Column, k: Int): Column = {
    val lc = lower(c)
    array_distinct(transform(
      sequence(lit(1), greatest(length(lc) - (k - 1), lit(1))),
      i => lc.substr(i, lit(k))))
  }

  /** Distinct word n-gram shingles. */
  def wordShingles(c: Column, n: Int): Column = {
    val t = tokens(c)
    array_distinct(transform(
      sequence(lit(1), greatest(size(t) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(t, i, lit(n)))))
  }

  /** Exact Jaccard similarity of two distinct-element arrays —
    * |A∩B| / (|A| + |B| − |A∩B|); int/int division, deterministic. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter / (size(a) + size(b) - inter)
  }

  /** Deterministic train/val/test assignment by id: an LCG over the
    * id picks a bucket in [0, 1000); split boundaries are per-mille.
    * How production pipelines split — stable under reshuffles,
    * reproducible across engines (pure integer arithmetic < 2^63,
    * same family as the poly minhash), no RNG state. Default
    * 800/100/100.
    */
  def hashSplit(id: Column, trainPerMille: Int = 800,
                valPerMille: Int = 100): Column = {
    // reduce mod 1e9+7 first so the LCG product stays < 2^63 for
    // arbitrarily large (nonnegative) ids — no ANSI overflow at scale
    val bucket = pmod(
      pmod(id.cast(LongType), lit(1000000007L)) * 1103515245L + 12345L, lit(1000L))
    when(bucket < trainPerMille, "train")
      .when(bucket < trainPerMille + valPerMille, "val")
      .otherwise("test")
  }

  /** SQL twin of [[hashSplit]] for the DuckDB oracle. */
  def hashSplitSql(idExpr: String, trainPerMille: Int = 800,
                   valPerMille: Int = 100): String = {
    val b = s"((($idExpr) % 1000000007) * 1103515245 + 12345) % 1000"
    s"""CASE WHEN $b < $trainPerMille THEN 'train'
             WHEN $b < ${trainPerMille + valPerMille} THEN 'val'
             ELSE 'test' END"""
  }
}
