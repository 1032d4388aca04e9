package graft.llm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q322 — the six-stage FineWeb-shaped ledger with the trained
  * classifier as stage 2. The oracle proves every count bit-for-bit
  * (including the embedded GD chain); this spec pins the LEDGER
  * properties: the stages actually chain (each stage's n_in is the
  * previous stage's n_kept), and every stage — the classifier
  * included — drops a non-vacuous count, so no stage is a silent
  * pass-through re-application of an earlier one.
  */
class PipelineYieldModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q322: six chained stages, each non-vacuous, classifier included") {
    val rows = CorpusQueries.queries("q322_pipeline_yield_model")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq("1_gate", "2_classifier",
      "3_exact_dedup", "4_near_dedup", "5_decontaminate", "6_sample"))
    // the chain wires: stage k+1 consumes exactly stage k's survivors
    rows.sliding(2).foreach { case Array((s1, _, kept1, _), (s2, in2, _, _)) =>
      assert(in2 == kept1, s"$s2 n_in $in2 != $s1 n_kept $kept1")
    }
    rows.foreach { case (stage, nIn, nKept, nDropped) =>
      assert(nIn == nKept + nDropped, s"$stage ledger identity")
      assert(nKept > 0, s"$stage kept nothing")
      assert(nDropped > 0, s"$stage dropped nothing - vacuous stage")
    }
  }
}
