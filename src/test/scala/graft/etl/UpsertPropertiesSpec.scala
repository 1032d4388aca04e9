package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants of the upsert kernel (SURVEY.md §5.3):
  * idempotence, PK uniqueness preservation, dedup fixpoint. Generated small
  * frames (raw ScalaCheck generators with fixed seeds — the
  * scalatest/scalacheck bridge isn't in the offline cache) — the algebra,
  * not the volume, is under test.
  */
class UpsertPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val asOf = expr("TIMESTAMP '2024-01-10 00:00:00'")

  private val rowGen = for {
    id  <- Gen.choose(0L, 15L)
    day <- Gen.choose(1, 9)
    v   <- Gen.stringOfN(4, Gen.alphaChar)
  } yield (id, f"2024-01-$day%02d 00:00:00", v)

  private val frameGen = Gen.listOfN(12, rowGen).map { rows =>
    rows.map { case (i, t, v) => Row0(i, java.sql.Timestamp.valueOf(t), v) }
  }

  private def sample(seed: Long) =
    frameGen.apply(Gen.Parameters.default, Seed(seed)).get

  private def cases = (0 until 8).map(i => (sample(i * 2L), sample(i * 2L + 1)))

  test("upsert is idempotent: applying the same delta twice is a no-op") {
    cases.foreach { case (oldRows, srcRows) =>
      val old = oldRows.toDF("id", "ts", "v").dropDuplicates("id")
      val src = srcRows.toDF("id", "ts", "v").dropDuplicates("id")
      val once  = UpsertKernel.upsert(old, src, "id", "ts", asOf, 240)
      val twice = UpsertKernel.upsert(once, src, "id", "ts", asOf, 240)
      assert(once.orderBy("id", "v").collect().toSeq ==
             twice.orderBy("id", "v").collect().toSeq)
    }
  }

  test("upsert preserves pk uniqueness whenever inputs are pk-unique") {
    cases.foreach { case (oldRows, srcRows) =>
      val old = oldRows.toDF("id", "ts", "v").dropDuplicates("id")
      val src = srcRows.toDF("id", "ts", "v").dropDuplicates("id")
      val out = UpsertKernel.upsert(old, src, "id", "ts", asOf, 240)
      assert(UpsertKernel.duplicatePks(out, "id").isEmpty)
    }
  }

  test("result pks are exactly (old ∪ delta) ∩ src") {
    cases.foreach { case (oldRows, srcRows) =>
      val old = oldRows.toDF("id", "ts", "v").dropDuplicates("id")
      val src = srcRows.toDF("id", "ts", "v").dropDuplicates("id")
      val out = UpsertKernel.upsert(old, src, "id", "ts", asOf, 240)
      val delta = src.filter(col("ts") >= expr(
        "TIMESTAMP '2024-01-10 00:00:00' - INTERVAL 240 HOURS"))
      val expected = old.select("id").union(delta.select("id")).distinct()
        .join(src.select("id"), Seq("id"), "left_semi")
      assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
             expected.collect().map(_.getLong(0)).sorted.toSeq)
    }
  }

  test("dedup-first is a fixpoint (q30 kernel)") {
    cases.map(_._1).foreach { rows =>
      val df = rows.toDF("id", "ts", "v")
      import org.apache.spark.sql.expressions.Window
      def dedup(d: org.apache.spark.sql.DataFrame) = {
        val w = Window.partitionBy(col("id")).orderBy(col("ts"), col("v"))
        d.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .drop("rn")
      }
      val once = dedup(df)
      assert(dedup(once).orderBy("id").collect().toSeq ==
             once.orderBy("id").collect().toSeq)
    }
  }
}
