package graft.queries

import graft.SparkSpec

/** The laws d38's data-loader contract rides on, pinned at sf0.001:
  *  - totality/bijection: each epoch covers every doc exactly once across
  *    its 4 shards (a doc lost or doubled would silently skew training);
  *  - contiguity: within an (epoch, shard), positions are exactly
  *    1..n — a resume can seek to an offset and trust it;
  *  - epochs actually reshuffle: the doc→(shard,pos) assignment of
  *    epoch 0 and epoch 1 must differ for a large fraction of docs
  *    (the whole point of re-salting the hash);
  *  - determinism: two runs produce the identical permutation
  *    (pure function of (doc_id, epoch), never rand()).
  */
class EpochShuffleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("each epoch is a total contiguous permutation; epochs differ; reruns identical") {
    val rows = TextQueries.d38EpochShuffle(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0, 1))
    val nDocs = rows.map(_._4).distinct.length
    for ((ep, es) <- byEpoch) {
      assert(es.map(_._4).distinct.length == nDocs && es.length == nDocs,
        s"epoch $ep is not a total permutation of the corpus")
      for ((shard, ss) <- es.groupBy(_._2)) {
        val pos = ss.map(_._3).sorted.toList
        assert(pos == (1 to ss.length).toList,
          s"epoch $ep shard $shard positions not contiguous: ${pos.take(5)}...")
      }
    }
    val a0 = byEpoch(0).map(t => t._4 -> ((t._2, t._3))).toMap
    val a1 = byEpoch(1).map(t => t._4 -> ((t._2, t._3))).toMap
    val moved = a0.keys.count(k => a0(k) != a1(k))
    assert(moved > nDocs / 2,
      s"re-salting must move most docs: only $moved of $nDocs changed")
    val rerun = TextQueries.d38EpochShuffle(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(rerun.sameElements(rows), "permutation must be rerun-identical")
  }

  test("e15 structure: every candidate ranked carries a full 8-block ADC; top-5 per query") {
    val out = SimilarityQueries.e15IvfPq(spark, dir).collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getLong(0))
    for ((q, rs) <- byQ) {
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length),
        s"query $q ranks not dense from 1")
      assert(rs.length <= 5, s"query $q returned more than top-5")
      rs.foreach(r => assert(r.getDouble(4) >= 0.0,
        s"ADC is a sum of squared distances, cannot be negative: $r"))
    }
  }
}
