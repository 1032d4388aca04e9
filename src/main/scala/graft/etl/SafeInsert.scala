package graft.etl

import org.apache.spark.sql.DataFrame

/** Conflict-safe insert — `HerokuWriter.safe_insert`
  * (`pyopenetl/operations.py:751-791`): the reference inserts and lets the
  * database raise `IntegrityError` on a primary-key conflict
  * (`operations.py:786-789`). In Spark a conflict is a non-empty semi-join;
  * the safe-to-insert set is the anti-join.
  */
object SafeInsert {
  /** Rows of `incoming` whose pk already exists — the reference's
    * `IntegrityError` set. */
  def conflicts(incoming: DataFrame, existing: DataFrame, pk: String): DataFrame =
    incoming.join(existing.select(pk), Seq(pk), "left_semi")

  /** Rows of `incoming` that can be appended without violating pk
    * uniqueness. */
  def insertable(incoming: DataFrame, existing: DataFrame, pk: String): DataFrame =
    incoming.join(existing.select(pk), Seq(pk), "left_anti")
}
