package graft.transcripts

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.gen.TranscriptGen

/** Pins the BASELINE.json input_hint per-row invariant: per-turn text
  * equality under stable (conv_id, turn_idx) ordering, independent of how
  * the transcript table was partitioned or parallelized. */
class TranscriptsSpec extends AnyFunSuite with SparkTestBase {

  test("passThrough preserves per-turn text under stable ordering") {
    val cfg = TranscriptGen.Config(nConvs = 25, turnsPerConv = 12, nTools = 9)
    val distributed = TranscriptEdges.passThrough(
        TranscriptGen.generate(spark, cfg).toDF().repartition(7))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    val local = TranscriptGen.generateLocal(cfg)
      .map(t => (t.conv_id, t.turn_idx, t.text))
      .sortBy(t => (t._1, t._2))
    assert(distributed.toSeq == local)
  }

  test("tool dictionary + edge derivation are parallelism-invariant") {
    val cfg = TranscriptGen.Config(nConvs = 30, turnsPerConv = 10, nTools = 12)
    val ts = TranscriptGen.generate(spark, cfg).toDF()
    def edgeSet(parts: Int) =
      TranscriptEdges.toolToolEdges(ts.repartition(parts))
        .select("src", "dst", "w").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(e => (e._1, e._2)).view.mapValues(_.map(_._3).sum).toMap
    assert(edgeSet(2) == edgeSet(9))
  }
}
