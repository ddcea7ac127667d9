package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy record linkage (entity resolution): find pairs of records whose
  * identifying string is within a small edit distance — near-identical
  * customer/supplier/author records that exact keys can't collapse. The
  * standard two-phase shape every ER system uses (Fellegi-Sunter
  * blocking, Ed-Join's segment filter): a cheap equi-join candidate
  * front, then the expensive verifier only on candidates.
  */
object Linkage {

  /** Edit-distance pairs via pigeonhole segment blocking.
    *
    * Front: each record's string is cut into `maxDist + 1` contiguous
    * segments (equal split by character position). Two EQUAL-LENGTH
    * strings within edit distance `maxDist` differ in at most `maxDist`
    * positions, so by pigeonhole they agree on at least one whole
    * segment — a pair is a candidate iff it matches on
    * (blockCols…, length, segment index, segment text). That makes
    * candidate generation one self-equi-join on a narrow key; the
    * Levenshtein verifier (O(len²) per pair) runs only on candidates.
    *
    * DECLARED SEMANTICS — equal-length (substitution) matching: the
    * length in the block key means pairs whose strings differ in length
    * (edits containing an insert/delete) are NOT reported. That is the
    * right contract for fixed-width identifier schemas (codes, padded
    * names, SKUs) and is what makes the pigeonhole front EXACT — no
    * recall loss vs an all-pairs scan under the same length predicate
    * (asserted in OperatorsSuite). The oracle carries the same length
    * predicate.
    *
    * Scale shape: the front's join key includes the caller's blocking
    * columns (e.g. nation, zip prefix) — segment values on structured
    * names can be near-constant (every "Customer#0…" shares its first
    * segments), so WITHOUT a discriminating block column the degenerate
    * segment collapses toward blockwise all-pairs; with one, the
    * candidate count is Σ_b |b|² over co-block groups, AQE-splittable on
    * skewed blocks. Candidates are deduplicated on (id, id) BEFORE the
    * verifier so a pair agreeing on several segments is verified once.
    * Both sides of the self-join read one narrow staged projection.
    *
    * Output: (id1, id2, dist), id1 < id2, dist ≤ maxDist. */
  def editDistancePairs(df: DataFrame, idCol: String, nameCol: String,
                        blockCols: Seq[String], maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val segs = maxDist + 1
    // segment i of s (0-based, equal split): chars
    // [floor(i·L/segs)+1, floor((i+1)·L/segs)] in 1-based substring form
    val lo = (floor(col("__seg") * col("__len") / segs) + 1).cast("int")
    val hi = floor((col("__seg") + 1) * col("__len") / segs).cast("int")
    val staged = df.select(
      (Seq(col(idCol).as("__id"), col(nameCol).as("__nm"),
        length(col(nameCol)).as("__len")) ++ blockCols.map(col)): _*)
      .select((Seq(col("__id"), col("__nm"), col("__len"),
        explode(sequence(lit(0), lit(segs - 1))).as("__seg"))
        ++ blockCols.map(col)): _*)
      .select((Seq(col("__id"), col("__nm"), col("__len"), col("__seg"),
        col("__nm").substr(lo, hi - lo + 1).as("__segval"))
        ++ blockCols.map(col)): _*)
    val key = Seq("__len", "__seg", "__segval") ++ blockCols
    val a = staged.toDF(staged.columns.map {
      case "__id" => "__ida"; case "__nm" => "__nma"; case other => other
    }: _*)
    val b = staged.toDF(staged.columns.map {
      case "__id" => "__idb"; case "__nm" => "__nmb"; case other => other
    }: _*)
    a.join(b, key)
      .where(col("__ida") < col("__idb"))
      .select(col("__ida"), col("__idb"), col("__nma"), col("__nmb"))
      .distinct()
      .select(col("__ida").as("id1"), col("__idb").as("id2"),
        levenshtein(col("__nma"), col("__nmb")).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
  }
}
