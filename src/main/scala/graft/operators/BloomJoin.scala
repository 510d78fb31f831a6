package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sketch.Bloom

/** Bloom-pruned joins — the classic 100-TB join optimization: build a
  * small sketch over the dim/build side's keys and probe it ON THE
  * FACT SCAN, so fact rows that cannot possibly match are dropped
  * BEFORE the shuffle instead of after it. Spark's AQE injects this
  * itself only for some shapes (runtime row-level filtering); these
  * operators make it an explicit, composable step with exact
  * semantics.
  *
  * Exactness: a bloom probe is one-sided (false ⇒ true non-member), so
  * the pruned stream still flows into the EXACT join/anti-semantics —
  * false positives are eliminated there, never surfacing in the
  * output. The sketch only shrinks the shuffled byte count; results
  * are bit-identical to the unpruned join by construction, which is
  * what the oracle gate checks.
  *
  * Scale accounting: at 1% selectivity the fact-side shuffle shrinks
  * ~100× for the cost of one dim-side aggregation and a driver-held
  * ~numBits/8-byte literal (far below broadcast-hash-join thresholds
  * even when the exact key SET would strain the driver). When the dim
  * side is small enough to broadcast, Spark's broadcast join already
  * avoids the fact shuffle — the bloom path earns its keep when the
  * dim side is too big to broadcast but its KEY SKETCH is not.
  */
object BloomJoin {

  private val DefaultBits = 8L * 1024 * 1024 // 1 MiB sketch

  /** Inner equi-join with the fact side bloom-pruned before the
    * shuffle. `fact(factKey) ⋈ dim(dimKey)`, keys LONG.
    */
  def innerJoin(fact: DataFrame, dim: DataFrame,
                factKey: String, dimKey: String,
                expectedItems: Long = 1000000L,
                numBits: Long = DefaultBits): DataFrame = {
    val bf = Bloom.sketch(dim, col(dimKey), expectedItems, numBits)
    fact.filter(Bloom.mightContain(bf, col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }

  /** Left-semi (EXISTS) with bloom pre-prune: only might-contain rows
    * reach the exact semi join.
    */
  def semiJoin(fact: DataFrame, dim: DataFrame,
               factKey: String, dimKey: String,
               expectedItems: Long = 1000000L,
               numBits: Long = DefaultBits): DataFrame = {
    val bf = Bloom.sketch(dim, col(dimKey), expectedItems, numBits)
    fact.filter(Bloom.mightContain(bf, col(factKey)))
      .join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_semi")
  }

  /** Left-anti (NOT EXISTS) with the bloom SHORT-CIRCUIT: a definite
    * non-member (probe false) is in the answer with NO join at all —
    * only might-contain rows (the dim-sized sliver plus false
    * positives) go through the exact anti join, then union back. On
    * an ingest-dedup anti join where 99% of rows are new, 99% of the
    * fact side never shuffles.
    */
  def antiJoin(fact: DataFrame, dim: DataFrame,
               factKey: String, dimKey: String,
               expectedItems: Long = 1000000L,
               numBits: Long = DefaultBits): DataFrame = {
    val bf = Bloom.sketch(dim, col(dimKey), expectedItems, numBits)
    val probe = Bloom.mightContain(bf, col(factKey))
    // A NULL key never matches any dim row, so under anti-join
    // semantics it belongs in the answer — but might_contain(NULL) is
    // NULL, failing BOTH probe filters. Route NULL keys to the
    // definite-miss branch explicitly to keep bit-identity with the
    // plain left-anti join.
    val definiteMiss = fact.filter(col(factKey).isNull || !probe)
    val confirmed = fact.filter(probe)
      .join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_anti")
    definiteMiss.unionByName(confirmed)
  }
}
